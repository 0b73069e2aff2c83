"""MXU all-vs-all seeding: candidate pairing as a matrix product.

The sort-based self-join (seed.self_join_candidates) generates every anchor
globally (max_occ-1 roll layers over the hash-sorted index) and pays one
giant multi-operand sort to group anchors by (pair, band) — measured 443 ms
of a 1.01 s block at 1024x8kb reads, bounded by XLA's TPU sort. This module
replaces the global sort with the unit the TPU is actually built around:

1. **Pair finding on the MXU.** Bucket-histogram each read's minimizer
   hashes into ``A[read, bucket]`` (2^bucket_bits buckets) and compute the
   shared-minimizer count matrix ``C = A @ A.T`` as one bf16 matmul with
   f32 accumulation. Hash-collision noise has exactly known expectation
   ``mu = n_i * n_j / 2^bits`` (subtracted) and Poisson-scale spread (the
   threshold keeps ``margin`` sigmas above it). For the corrected reads
   this path serves, a min_ovlp_len overlap shares hundreds of minimizers
   — orders of magnitude above the noise floor.
2. **Per-pair join, no global sort.** Each read's minimizer row is sorted
   by hash once ([B, M] row sort); a candidate pair's two rows merge in
   log2(2M) bitonic half-cleaner stages (pure elementwise min/max — rolls,
   no gathers), and equal-hash runs pair up query/target occurrences via
   short roll layers, giving the pair's anchors already grouped by row.
3. **Diagonal consensus instead of band voting.** A confirmed pair's
   anchors are overwhelmingly colinear (random k-mer collisions within one
   pair are ~4^-k), so the dominant diagonal is recovered by an iterative
   trimmed mean (3 elementwise passes) rather than a vote sort; anchors
   within 1.5 bandwidths of the consensus feed the chain refiner.

Semantics vs the sort path (deliberate, documented deviations):
- pair admission thresholds on the noise-adjusted shared-minimizer count
  (min_anchors + margin*sqrt(mu) + 2) rather than on per-band votes — for
  min_ovlp_len >> w this is strictly more permissive for true overlaps;
- per-(pair,hash) occurrence fan-out is bounded by the 3 roll layers
  (nearest different-source partner), not max_occ — repeats inside one
  pair contribute fewer duplicate anchors;
- repeat masking (max_occ) applies at bucket granularity in the C matmul;
  the per-pair join needs none (fan-out is bounded by construction);
- one candidate window per pair spanning the FULL overlap (the sort path
  may emit several band windows and dedup on host).

Reference parity: this replaces the same minimap2 index/seed/candidate
stages (``filter_overlap_slr2.py:51,55``) as seed.py; the downstream
chain/extend/admission stages are shared, and tests/test_seed_mxu.py
checks table-level equivalence against the sort path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from hylight_tpu.ops.minimizers import MinimizerSet
from hylight_tpu.overlap.seed import Candidates

INT_MAX = np.int32(0x7FFFFFFF)
UINT_MAX = np.uint32(0xFFFFFFFF)


def _row_next(x: jax.Array, d: int, fill) -> jax.Array:
    """x shifted left by d along axis 1, filled on the right."""
    P = x.shape[0]
    return jnp.concatenate(
        [x[:, d:], jnp.full((P, d), fill, x.dtype)], axis=1)


def bitonic_merge(ka: jax.Array, pa: jax.Array,
                  kb: jax.Array, pb: jax.Array):
    """Merge two row-wise ASCENDING (key, payload) arrays.

    ka/kb: [P, L] keys (L a power of two), pa/pb payloads. Returns
    ([P, 2L] keys ascending, payloads). log2(2L) half-cleaner stages of
    elementwise compare-exchange — no sort, no gathers.
    """
    P, L = ka.shape
    assert L & (L - 1) == 0, "bitonic_merge needs power-of-two rows"
    key = jnp.concatenate([ka, kb[:, ::-1]], axis=1)       # bitonic
    pay = jnp.concatenate([pa, pb[:, ::-1]], axis=1)
    n = 2 * L
    s = n // 2
    while s >= 1:
        k4 = key.reshape(P, n // (2 * s), 2, s)
        p4 = pay.reshape(P, n // (2 * s), 2, s)
        lo_k, hi_k = k4[:, :, 0, :], k4[:, :, 1, :]
        lo_p, hi_p = p4[:, :, 0, :], p4[:, :, 1, :]
        swap = lo_k > hi_k
        nlo_k = jnp.where(swap, hi_k, lo_k)
        nhi_k = jnp.where(swap, lo_k, hi_k)
        nlo_p = jnp.where(swap, hi_p, lo_p)
        nhi_p = jnp.where(swap, lo_p, hi_p)
        key = jnp.stack([nlo_k, nhi_k], axis=2).reshape(P, n)
        pay = jnp.stack([nlo_p, nhi_p], axis=2).reshape(P, n)
        s //= 2
    return key, pay


def _first_k_true(flat: jax.Array, K: int):
    """Indices of the first K true entries of a flat bool array (binary
    search into the cumsum — no N-sized sort). Returns (idx [K], ok [K],
    total true count)."""
    N = flat.shape[0]
    cum = jnp.cumsum(flat.astype(jnp.int32))
    target = jnp.arange(1, K + 1, dtype=jnp.int32)
    lo = jnp.zeros((K,), jnp.int32)
    hi = jnp.full((K,), N, jnp.int32)
    for _ in range(int(N).bit_length()):
        mid = (lo + hi) // 2
        go = cum[jnp.minimum(mid, N - 1)] < target
        lo = jnp.where(go, mid + 1, lo)
        hi = jnp.where(go, hi, mid)
    idx = jnp.minimum(lo, N - 1)
    ok = (target <= cum[N - 1]) & flat[idx]
    return idx, ok, cum[N - 1]


def shared_count_matrix(ms: MinimizerSet, *, bucket_bits: int,
                        max_occ: int):
    """C[i, j] ~= shared minimizers of reads i, j via one MXU matmul.

    Returns (C f32 [B, B], mu f32 [B, B] exact collision expectation).
    Buckets whose block-wide count exceeds max_occ are zeroed (the repeat
    filter of seed.build_index at bucket granularity)."""
    B, M = ms.hash.shape
    slot = jax.lax.broadcasted_iota(jnp.int32, (B, M), 1)
    valid = (slot < ms.count[:, None]) & (ms.pos >= 0)
    h = jnp.where(valid, ms.hash, UINT_MAX)
    return shared_count_matrix_rows(h, bucket_bits=bucket_bits,
                                    max_occ=max_occ)


def shared_count_matrix_rows(h: jax.Array, *, bucket_bits: int,
                             max_occ: int):
    """shared_count_matrix over explicit hash rows (UINT_MAX = empty slot).

    Used by mxu_candidates with the JOIN-CAPPED rows: the scatter-add
    histogram is the stage's cost (the ~7-10 ms/M-update scalar-core law),
    so building it from the capped columns cuts the update count by the
    retention fraction; C then counts shared minimizers among the kept
    (smallest-hash) subsample, consistent with what the per-pair join sees,
    and the mu/threshold math is exact for the kept counts."""
    B, M = h.shape
    nbuck = 1 << bucket_bits
    valid = h != UINT_MAX
    # LOW bits: minimizer hashes are window MINIMA, so their high bits are
    # biased toward zero (a top-bits bucket scheme collapses most entries
    # into a few buckets); the low bits of a murmur-mixed value stay
    # uniform even conditioned on the value being a window minimum
    # (minima sit near 2^32/w >> 2^bucket_bits).
    bucket = (h & np.uint32((1 << bucket_bits) - 1)).astype(jnp.int32)
    idx = jnp.where(valid, bucket, nbuck)          # OOB updates are dropped
    rows = jax.lax.broadcasted_iota(jnp.int32, (B, M), 0)
    A = jnp.zeros((B, nbuck), jnp.float32).at[rows, idx].add(
        1.0, mode="drop")
    colsum = jnp.sum(A, axis=0)
    # repeat masking at bucket granularity: a bucket's load is the sum of
    # its distinct hashes' run lengths, so the absolute max_occ rule only
    # works when buckets hold << 1 distinct hash. Scale by the MEAN load:
    # normal-coverage buckets sit near lam; a repeat family (run length
    # >> coverage) pushes its bucket far above. 2*lam + max_occ keeps
    # every normal bucket at any block size and still kills heavy repeats.
    lam = jnp.sum(colsum) / np.float32(nbuck)
    A = A * (colsum <= 2.0 * lam + max_occ).astype(jnp.float32)[None, :]
    # bf16 holds integers exactly only up to 256: clamp per-entry loads so
    # C never accumulates rounding error at high-lam configurations (a
    # bucket with >256 of ONE read's minimizers is a repeat family anyway)
    A = jnp.minimum(A, 256.0)
    nv = jnp.sum(A, axis=1)                        # masked count per read
    Ab = A.astype(jnp.bfloat16)
    C = jax.lax.dot_general(Ab, Ab, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    mu = nv[:, None] * nv[None, :] * np.float32(1.0 / nbuck)
    return C, mu


@functools.partial(jax.jit, static_argnames=(
    "bandwidth", "min_anchors", "max_pairs", "anchors_per_pair",
    "max_occ", "k", "n_reads", "max_len", "bucket_bits", "margin",
    "join_frac"))
def mxu_candidates(ms: MinimizerSet, lens: jax.Array, *,
                   bandwidth: int, min_anchors: int, max_pairs: int,
                   anchors_per_pair: int, max_occ: int, k: int,
                   n_reads: int, max_len: int,
                   bucket_bits: int = 15,
                   margin: float = 8.0,
                   join_frac: float = 0.5) -> Candidates:
    """All-vs-all overlap candidates via MXU pair finding + per-pair join.

    Same output contract as seed.self_join_candidates (one Candidates row
    per pair, anchors sorted by qpos, '-' windows rebased to revcomp target
    coordinates); requires max_len < 2^15.
    """
    B, M = ms.hash.shape
    P, A = max_pairs, anchors_per_pair
    assert max_len < (1 << 15), "mxu path needs read len < 32768"

    # ---- stage 0: per-read hash sort + join-width cap (shared by the
    # count matrix and the per-pair join)
    slot = jax.lax.broadcasted_iota(jnp.int32, (B, M), 1)
    valid = (slot < ms.count[:, None]) & (ms.pos >= 0)
    h = jnp.where(valid, ms.hash, UINT_MAX)
    pay = jnp.where(valid,
                    (ms.pos << 2) | (ms.strand.astype(jnp.int32) << 1), 0)
    h, pay = jax.lax.sort((h, pay), num_keys=1, dimension=1,
                          is_stable=False)
    Lp = 1 << (M - 1).bit_length()
    if Lp > M:
        h = jnp.pad(h, ((0, 0), (0, Lp - M)), constant_values=UINT_MAX)
        pay = jnp.pad(pay, ((0, 0), (0, Lp - M)))
    # join width cap: keep each read's Lp*join_frac SMALLEST hashes — a
    # hash-value subsample that is CONSISTENT across reads (a slot-stride
    # subsample would misalign the two reads' kept sets and destroy the
    # equal-hash runs for half the pairs).  Anchor density scales by the
    # retention fraction; at w=10 the spacing stays ~8 bp, far denser than
    # the anchors_per_pair=256 budget the chain keeps anyway.  Halving the
    # width halves the two [P, 2*Lp] sorts that dominate this stage.
    if join_frac < 1.0:
        Lj = max(256, int(Lp * join_frac))
        Lj = 1 << (Lj - 1).bit_length()
        if Lj < Lp:
            h, pay = h[:, :Lj], pay[:, :Lj]
            Lp = Lj

    # ---- stage 1: pair finding on the MXU (histogram over the CAPPED
    # rows: the scatter-add is the cost; C/mu/threshold are consistent —
    # both stages see the same smallest-hash subsample)
    C, mu = shared_count_matrix_rows(h, bucket_bits=bucket_bits,
                                     max_occ=max_occ)
    thr = np.float32(min_anchors + 2.0) + np.float32(margin) * jnp.sqrt(mu)
    ii = jnp.arange(B, dtype=jnp.int32)
    upper = ii[:, None] < ii[None, :]
    good = upper & ((C - mu) >= thr)
    # NOTE on overflow bias: when n_pairs > max_pairs the first max_pairs
    # entries in flat row-major order are kept, so HIGH-qid reads lose all
    # their candidates (the sort path drops by window score instead). The
    # engine detects n_winners > max_pairs and RETRIES the block at a
    # bucketed cap sized from the exact count (engine.py whole-set path).
    pidx, pok, n_pairs = _first_k_true(good.reshape(-1), P)
    pq = jnp.where(pok, pidx // B, 0)
    pt = jnp.where(pok, pidx % B, 0)

    # ---- stage 2: per-pair hash-merge join

    # packed join key: ONE uint32 per entry = (low-bit hash slice | pos |
    # strand | src), so the pair-level sort is 1-operand (a 2-op (key,
    # payload) sort was ~2x the cost at this width) and the payload concat
    # volume disappears. LOW hash bits again (window minima concentrate
    # near small values — top bits are mostly zero and would collapse the
    # runs); truncating the hash to HB bits admits ~(2Lp)^2/2^(HB+1)
    # false-equal collisions per pair (~16 at 8 kb reads), which land as
    # off-diagonal noise the trimmed-mean consensus + base-level extend
    # already reject.
    pos_bits = int(max_len - 1).bit_length()
    HB = 32 - 2 - pos_bits
    packed = ((h & np.uint32((1 << HB) - 1)) << np.uint32(2 + pos_bits)) \
        | pay.astype(jnp.uint32)
    packed = jnp.where(h == UINT_MAX, UINT_MAX, packed)
    kq = packed[pq]                                 # [P, Lp] row gathers
    kt = packed[pt] | np.uint32(1)                  # src bit: target = 1
    kq = jnp.where(pok[:, None], kq, UINT_MAX)
    kt = jnp.where(pok[:, None], kt, UINT_MAX)
    (key,) = jax.lax.sort(
        (jnp.concatenate([kq, kt], axis=1),),
        num_keys=1, dimension=1, is_stable=False)

    # nearest different-source partner within the equal-hash run
    real = key != UINT_MAX
    hash_shift = np.uint32(2 + pos_bits)
    m = []
    nxt = []
    for d in (1, 2, 3):
        kd = _row_next(key, d, UINT_MAX)
        m.append(real & (((key ^ kd) >> hash_shift) == 0)
                 & (((key ^ kd) & 1) == 1))
        nxt.append(kd)
    anc_ok = m[0] | m[1] | m[2]
    pd = jnp.where(m[0], nxt[0], jnp.where(m[1], nxt[1], nxt[2]))
    self_t = (key & 1) == 1
    q_pay = jnp.where(self_t, pd, key).astype(jnp.int32)
    t_pay = jnp.where(self_t, key, pd).astype(jnp.int32)
    pos_mask = np.int32((1 << pos_bits) - 1)
    qpos = (q_pay >> 2) & pos_mask
    tpos = (t_pay >> 2) & pos_mask
    astr = ((q_pay >> 1) ^ (t_pay >> 1)) & 1

    # ---- stage 3: strand majority + trimmed-mean diagonal consensus
    n_ok = jnp.sum(anc_ok, axis=1).astype(jnp.int32)
    s_votes = jnp.sum(jnp.where(anc_ok, astr, 0), axis=1).astype(jnp.int32)
    row_strand = (2 * s_votes > n_ok).astype(jnp.int32)
    ok2 = anc_ok & (astr == row_strand[:, None])
    diag = jnp.where(row_strand[:, None] == 1, qpos + tpos, qpos - tpos)
    diag_f = diag.astype(jnp.float32)
    n2 = jnp.maximum(jnp.sum(ok2, axis=1), 1).astype(jnp.float32)
    center = jnp.sum(jnp.where(ok2, diag_f, 0.0), axis=1) / n2
    for W in (max_len / 4.0, 4.0 * bandwidth, 1.5 * bandwidth):
        in_w = ok2 & (jnp.abs(diag_f - center[:, None]) <= np.float32(W))
        cnt = jnp.sum(in_w, axis=1).astype(jnp.float32)
        csum = jnp.sum(jnp.where(in_w, diag_f, 0.0), axis=1)
        center = jnp.where(cnt > 0, csum / jnp.maximum(cnt, 1.0), center)
    on_band = ok2 & (jnp.abs(diag_f - center[:, None])
                     <= np.float32(1.5 * bandwidth))
    n_anchors = jnp.sum(on_band, axis=1).astype(jnp.int32)

    # ---- stage 4: qpos-sort + strided subsample to [P, A]
    # (qpos, tpos) packed into one int32 -> a 1-operand sort. The sort
    # puts a row's on-band anchors at the front (invalid = INT_MAX), so
    # subsampling reduces to STATIC power-of-two stride slices selected
    # per row (a [P, 2Lp] take_along_axis gather costs ~56 ms at bench
    # scale; the static slices + select cost ~5 ms). A row with c_full
    # anchors uses the smallest stride s with c_full <= s*A, keeping
    # ceil(c_full/s) >= A/2 evenly spaced anchors spanning the overlap.
    packed = jnp.where(on_band, (qpos << 15) | tpos, INT_MAX)
    (packed,) = jax.lax.sort((packed,), num_keys=1, dimension=1,
                             is_stable=False)
    c_full = n_anchors
    width = packed.shape[1]
    strides = [1]
    while strides[-1] * A < width:
        strides.append(strides[-1] * 2)
    sel = None
    s_row = None
    for s in reversed(strides):
        v = packed[:, ::s][:, :A]
        if v.shape[1] < A:
            v = jnp.pad(v, ((0, 0), (0, A - v.shape[1])),
                        constant_values=INT_MAX)
        if sel is None:
            sel, s_row = v, jnp.full_like(c_full, s)
        else:
            use = c_full <= s * A
            sel = jnp.where(use[:, None], v, sel)
            s_row = jnp.where(use, s, s_row)
    c_len = jnp.minimum((c_full + s_row - 1) // s_row, A)
    ar = jnp.arange(A, dtype=jnp.int32)[None, :]
    aq = jnp.where(sel == INT_MAX, INT_MAX, sel >> 15)
    at = jnp.where(sel == INT_MAX, INT_MAX, sel & ((1 << 15) - 1))

    c_valid = pok & (n_anchors >= min_anchors)
    amask = (ar < c_len[:, None]) & c_valid[:, None]
    aq = jnp.where(amask, aq, INT_MAX)
    at = jnp.where(amask, at, INT_MAX)
    qlen = jnp.where(c_valid, lens[pq], 0).astype(jnp.int32)
    tlen = jnp.where(c_valid, lens[pt], 0).astype(jnp.int32)
    minus = (row_strand == 1)[:, None]
    at = jnp.where(amask & minus, tlen[:, None] - k - at, at)
    # qpos order is preserved; re-sort by (qpos, tpos) for tie order parity
    aq, at, amaski = jax.lax.sort(
        (aq, at, amask.astype(jnp.int32)), num_keys=2, is_stable=True,
        dimension=1)
    amask = amaski.astype(jnp.bool_)
    return Candidates(
        qid=jnp.where(c_valid, pq, INT_MAX),
        tid=jnp.where(c_valid, pt, INT_MAX),
        strand=jnp.where(c_valid, row_strand, 0),
        qlen=qlen, tlen=tlen,
        n_anchors=jnp.where(c_valid, n_anchors, 0),
        valid=c_valid,
        n_winners=n_pairs,
        aq=aq, at=at, amask=amask,
    )
