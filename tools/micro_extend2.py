"""Component-level timing of extend_chains at bench shapes (chip).

Builds real Chains via the mxu pipeline at 1024x8kb, then times each
extend sub-stage as its own jit: link classification + _select, window
fetch+compare per tier, banded DP + suffix, event compaction.
"""
import sys, time, numpy as np
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from hylight_tpu.io.readset import ReadSet
from hylight_tpu.ops.minimizers import minimizers
from hylight_tpu.overlap.seed_mxu import mxu_candidates
from hylight_tpu.overlap.chain import refine_chains
from hylight_tpu.overlap import extend as ex

n_reads, read_len, w, max_occ = 1024, 8192, 10, 16
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
                      min_anchors=4, max_pairs=16384, anchors_per_pair=256,
                      max_occ=max_occ, k=15, n_reads=n_reads,
                      max_len=read_len)
ch = refine_chains(cand, k=15, min_score=100, max_gap=10000)
jax.block_until_ready(ch.aq); _ = np.asarray(ch.score)[:1]

def timeit(name, f, *a):
    r = f(*a); np.asarray(jax.tree.leaves(r)[0]).ravel()[:1]
    t0 = time.time(); iters = 10
    for _ in range(iters): r = f(*a)
    np.asarray(jax.tree.leaves(r)[0]).ravel()[:1]
    print(name, round((time.time() - t0) / iters, 4), flush=True)
    return r

k, G, Gs = 15, 64, 8
AGes, AGel, AGi = 64, 16, 16
P, A = ch.aq.shape

@jax.jit
def classify_select(ch):
    dq = ch.aq[:, 1:] - ch.aq[:, :-1]
    dt = ch.at[:, 1:] - ch.at[:, :-1]
    link = ch.amask[:, 1:]
    equal = link & (dq == dt) & (dq > k)
    gap = jnp.where(equal, dq - k, 0)
    uneq = link & (dq != dt)
    gq, gt = dq - k, dt - k
    ver_u = uneq & (gq >= 0) & (gt >= 0) & (gq <= G) & (gt <= G) & \
        (jnp.abs(dq - dt) <= 8)
    colL = jax.lax.broadcasted_iota(jnp.int32, (P, A - 1), 1)
    outs = []
    for need, AG in (((equal & (gap > 0) & (gap <= Gs)), AGes),
                     ((equal & (gap > Gs)), AGel), (ver_u, AGi)):
        keyL = jnp.where(need, colL, jnp.int32(1 << 30))
        (keyS,) = jax.lax.sort((keyL,), num_keys=1, dimension=1,
                               is_stable=False)
        selL = jnp.minimum(keyS[:, :AG], A - 2)
        ok = keyS[:, :AG] < jnp.int32(1 << 30)
        outs.append(jnp.take_along_axis(ch.aq[:, :-1], selL, axis=1))
        outs.append(ok)
    return outs
timeit("classify_select", classify_select, ch)

@jax.jit
def packn(seqs):
    return ex._pack_nibbles(seqs, 16)
qpacked = timeit("pack_nibbles", packn, seqs)

aq_s = jnp.asarray(rng.integers(0, read_len - 128, (P, AGes)).astype(np.int32))
at_s = jnp.asarray(rng.integers(0, read_len - 128, (P, AGes)).astype(np.int32))
gap_s = jnp.asarray(rng.integers(1, Gs + 1, (P, AGes)).astype(np.int32))
ok_s = jnp.ones((P, AGes), bool)

@jax.jit
def eq_tier_small(qpacked, ch, aq_s, at_s, gap_s, ok_s):
    tid_row = jnp.clip(ch.tid, 0, qpacked.shape[0] - 1)
    return ex._verify_eq_tier(qpacked, qpacked, ch, tid_row, aq_s, at_s,
                              gap_s, ok_s, k=k, G=Gs, pad_bases=128)[0]
timeit("eq_tier_small_64x8", eq_tier_small, qpacked, ch, aq_s, at_s, gap_s, ok_s)

aq_l = aq_s[:, :AGel]; at_l = at_s[:, :AGel]
gap_l = jnp.asarray(rng.integers(Gs + 1, G, (P, AGel)).astype(np.int32))
ok_l = jnp.ones((P, AGel), bool)

@jax.jit
def eq_tier_large(qpacked, ch, aq_l, at_l, gap_l, ok_l):
    tid_row = jnp.clip(ch.tid, 0, qpacked.shape[0] - 1)
    return ex._verify_eq_tier(qpacked, qpacked, ch, tid_row, aq_l, at_l,
                              gap_l, ok_l, k=k, G=G, pad_bases=128)[0]
timeit("eq_tier_large_16x64", eq_tier_large, qpacked, ch, aq_l, at_l, gap_l, ok_l)

gq_i = jnp.asarray(rng.integers(4, 32, (P, AGi)).astype(np.int32))
gt_i = gq_i + 2

@jax.jit
def indel_tier(qpacked, ch, aq_l, at_l, gq_i, gt_i, ok_l):
    tid_row = jnp.clip(ch.tid, 0, qpacked.shape[0] - 1)
    return ex._verify_indel_tier(qpacked, qpacked, ch, tid_row, aq_l, at_l,
                                 gq_i, gt_i, ok_l, k=k, G=G,
                                 pad_bases=128, max_indel_band=8)[0]
timeit("indel_tier_16x64", indel_tier, qpacked, ch, aq_l, at_l, gq_i, gt_i, ok_l)

mmf = jnp.asarray(rng.random((P, 1536)) < 0.01)
pay = jnp.asarray(rng.integers(0, 1 << 20, (P, 1536)).astype(np.int32))

@jax.jit
def compact_events(mmf, pay):
    S = 64
    M = mmf.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (P, M), 1)
    key = jnp.where(mmf, col, jnp.int32(1 << 30))
    (keyS2,) = jax.lax.sort((key,), num_keys=1, dimension=1, is_stable=False)
    ok = keyS2[:, :S] < jnp.int32(1 << 30)
    topi = jnp.minimum(keyS2[:, :S], M - 1)
    prow = jax.lax.broadcasted_iota(jnp.int32, (P, S), 0)
    return jnp.where(ok, pay[prow, topi], -1)
timeit("compact_events_1536_1op", compact_events, mmf, pay)
