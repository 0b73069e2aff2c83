"""Per-stage TPU timing of the overlap block (scalar-reduced sync).

Usage: python tools/profile_block.py [n_reads] [read_len] [--mxu|--legacy]

TIMING PROTOCOL (axon tunnel): each timed jit reduces its outputs to ONE
scalar on device before the fetch — fetching an array ships the whole
buffer over the tunnel and corrupts the number (CLAUDE.md).
"""
import sys, time, numpy as np
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from hylight_tpu.io.readset import ReadSet
from hylight_tpu.ops.minimizers import minimizers
from hylight_tpu.overlap import seed as sm
from hylight_tpu.overlap.chain import refine_chains
from hylight_tpu.overlap.extend import extend_chains
from hylight_tpu.overlap.filters import admission_filter

args = [a for a in sys.argv[1:] if not a.startswith("--")]
n_reads = int(args[0]) if len(args) > 0 else 64
read_len = int(args[1]) if len(args) > 1 else 8192
w = int(args[2]) if len(args) > 2 else 10
max_occ = int(args[3]) if len(args) > 3 else 16
max_pairs = max(2048, n_reads * 16)

rng = np.random.default_rng(7)
glen = n_reads*read_len//12
g = rng.integers(0,4,glen).astype(np.uint8)
starts = rng.integers(0, glen-read_len, n_reads)
reads = [g[s:s+read_len].copy() for s in starts]
# ~1% substitution errors (corrected-LR realism)
for r in reads:
    e = rng.random(read_len) < 0.01
    r[e] = (r[e] + rng.integers(1,4,e.sum())) % 4
rs = ReadSet.from_seqs(reads)
seqs_np, lens_np = rs.to_padded(max_len=read_len)
seqs=jnp.asarray(seqs_np); lens=jnp.asarray(lens_np)
mcap = ((int(2 * read_len / (w + 1)) + 64) + 63) // 64 * 64


def scalarize(r):
    leaves = jax.tree.leaves(r)
    return sum(jnp.sum(x.astype(jnp.float32)) for x in leaves
               if x.dtype != jnp.bool_)


def timeit(name, f, *a):
    fs = jax.jit(lambda *a: scalarize(f(*a)))
    _ = float(np.asarray(fs(*a)))
    t0=time.time(); iters=10
    for _i in range(iters):
        r = fs(*a)
    float(np.asarray(r))
    print(name, round((time.time()-t0)/iters,4), flush=True)
    return f(*a)   # untimed, for downstream stages


ms = timeit("minimizers", lambda s,l: minimizers(s,l,k=15,w=w,cap=mcap), seqs, lens)
if "--mxu" in sys.argv:
    import jax.numpy as jnp
    from hylight_tpu.overlap.seed_mxu import (
        UINT_MAX, mxu_candidates, shared_count_matrix_rows)

    def _capped_hist(m):
        # what mxu_candidates stage 1 actually runs: histogram over the
        # join-capped (smallest-hash) columns of the row-sorted hashes
        B, M = m.hash.shape
        slot = jax.lax.broadcasted_iota(jnp.int32, (B, M), 1)
        valid = (slot < m.count[:, None]) & (m.pos >= 0)
        h = jnp.where(valid, m.hash, UINT_MAX)
        (h,) = jax.lax.sort((h,), num_keys=1, dimension=1, is_stable=False)
        Lp = 1 << (M - 1).bit_length()
        Lj = 1 << (max(256, int(Lp * 0.5)) - 1).bit_length()
        h = h[:, :min(Lj, M)]
        return shared_count_matrix_rows(h, bucket_bits=15, max_occ=max_occ)

    timeit("mxu_count_matrix", _capped_hist, ms)
    cand = timeit("mxu_candidates", lambda m,l: mxu_candidates(
        m,l.astype(jnp.int32),bandwidth=64,min_anchors=4,max_pairs=max_pairs,
        anchors_per_pair=256,max_occ=max_occ,k=15,n_reads=n_reads,
        max_len=read_len), ms, lens)
elif "--legacy" in sys.argv:
    idx = timeit("build_index", lambda m: sm.build_index(m,0,max_occ=max_occ), ms)
    an = timeit("collect_anchors", lambda m,i: sm.collect_anchors(m,0,i,max_hits=max_occ,dedup_self=True), ms, idx)
    cand = timeit("group_candidates", lambda a,l: sm.group_candidates(
        a,l.astype(jnp.int32),bandwidth=64,min_anchors=4,max_pairs=max_pairs,
        anchors_per_pair=256,row_size=mcap*max_occ,k=15), an, lens)
else:
    idx = timeit("build_index", lambda m: sm.build_index(m,0,max_occ=max_occ), ms)
    cand = timeit("self_join", lambda i,l: sm.self_join_candidates(
        i,l.astype(jnp.int32),bandwidth=64,min_anchors=4,max_pairs=max_pairs,
        anchors_per_pair=256,max_occ=max_occ,k=15,n_reads=n_reads,
        max_len=read_len), idx, lens)
ch = timeit("refine_chains", lambda c: refine_chains(c,k=15,min_score=100,max_gap=10000), cand)
ext = timeit("extend_chains", lambda c,s: extend_chains(c,s,k=15,max_mismatch=64), ch, seqs)
sc = timeit("admission", lambda c,e: admission_filter(c,e,min_len=2000,min_identity=0.9,max_overhang=1000,overhang_ratio=0.8), ch, ext)
print("admitted", int(jnp.sum(sc.valid)), "chained", int(jnp.sum(ch.valid)),
      "winners", int(cand.n_winners))
