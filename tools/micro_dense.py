"""Chip timing of the dense extend at bench shapes (scalar-reduced)."""
import sys, time, numpy as np
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from hylight_tpu.io.readset import ReadSet
from hylight_tpu.ops.minimizers import minimizers
from hylight_tpu.overlap.seed_mxu import mxu_candidates
from hylight_tpu.overlap.chain import refine_chains
from hylight_tpu.overlap.extend import extend_chains
from hylight_tpu.overlap.filters import admission_filter

n_reads = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
read_len = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
w, max_occ = 10, 16
rng = np.random.default_rng(7)
glen = n_reads * read_len // 12
g = rng.integers(0, 4, glen).astype(np.uint8)
reads = []
for s in rng.integers(0, glen - read_len, n_reads):
    r = g[s:s + read_len].copy()
    e = rng.random(read_len) < 0.01
    r[e] = (r[e] + rng.integers(1, 4, e.sum())) % 4
    reads.append(r)
rs = ReadSet.from_seqs(reads)
seqs_np, lens_np = rs.to_padded(max_len=read_len)
seqs = jnp.asarray(seqs_np); lens = jnp.asarray(lens_np)
mcap = ((int(2 * read_len / (w + 1)) + 64) + 63) // 64 * 64

ms = minimizers(seqs, lens, k=15, w=w, cap=mcap)
cand = mxu_candidates(ms, lens.astype(jnp.int32), bandwidth=64,
                      min_anchors=4, max_pairs=max(2048, 16 * n_reads),
                      anchors_per_pair=256, max_occ=max_occ, k=15,
                      n_reads=n_reads, max_len=read_len)
ch = refine_chains(cand, k=15, min_score=100, max_gap=10000)
_ = np.asarray(ch.score)[:1]


def timeit(name, f, *a, iters=10):
    r = f(*a)
    float(np.asarray(r))
    t0 = time.time()
    for _ in range(iters):
        r = f(*a)
    float(np.asarray(r))
    print(name, round((time.time() - t0) / iters * 1000, 1), "ms", flush=True)


@jax.jit
def dense_sum(ch, seqs):
    e = extend_chains(ch, seqs, k=15, max_mismatch=64)
    return jnp.sum(e.matches) + jnp.sum(e.mm_q) + jnp.sum(e.identity)


@jax.jit
def dense_admit(ch, seqs):
    e = extend_chains(ch, seqs, k=15, max_mismatch=64)
    sc = admission_filter(ch, e, min_len=2000, min_identity=0.9,
                          max_overhang=1000, overhang_ratio=0.8)
    return jnp.sum(sc.valid.astype(jnp.int32))


timeit("extend_dense", dense_sum, ch, seqs)
print("admitted", int(np.asarray(dense_admit(ch, seqs))),
      "chained", int(np.asarray(jnp.sum(ch.valid))))
