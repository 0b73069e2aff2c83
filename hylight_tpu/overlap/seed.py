"""Seeding + candidate pairing: minimizer hash join and diagonal-band voting.

Replaces minimap2's index/seed/chain-candidate stages (reference invocation
``filter_overlap_slr2.py:51,55``) with a TPU-native formulation built
entirely from sorts and segment ops — no hash tables, no per-read loops:

1. ``build_index``: flatten a target batch's minimizers, sort by hash,
   mask high-occurrence (repeat) hashes — the analogue of minimap2's
   ``-f``/max-occ repeat filter.
2. ``collect_anchors``: for every query minimizer, binary-search the sorted
   target hashes (``searchsorted``) and emit up to ``max_hits`` anchors
   (qid, tid, relative strand, qpos, tpos') with static shape [Nq, F].
   For '-' strand matches, target positions are rebased into the
   reverse-complemented target (tpos' = tlen - k - tpos) so every anchor of
   a pair lives in one coordinate frame.
3. ``group_candidates``: lexicographic sort of anchors by
   (qid, tid/strand, diagonal band, qpos); contiguous runs = votes for one
   (pair, band); neighbor bands merged to tolerate indel drift; best band
   per pair wins; pairs with >= min_anchors votes become overlap candidates
   with their anchor windows gathered into a dense [P, A] matrix.

The diagonal-band vote replaces minimap2's O(n*h) sequential chaining DP
with a data-parallel equivalent; the exact colinear chain score is then
computed on the tiny per-pair anchor matrix (see chain.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from hylight_tpu.ops.minimizers import MinimizerSet

INT_MAX = np.int32(0x7FFFFFFF)
UINT_MAX = np.uint32(0xFFFFFFFF)


class MinimizerIndex(NamedTuple):
    """Hash-sorted flat minimizer table for a target read block."""

    hash: jax.Array     # uint32 [Nt] sorted ascending (invalid = UINT_MAX)
    tid: jax.Array      # int32  [Nt] global target read id
    tpos: jax.Array     # int32  [Nt] k-mer start on forward target
    tstrand: jax.Array  # int8   [Nt]
    tlen: jax.Array     # int32  [Nt] length of the target read
    occ_ok: jax.Array   # bool   [Nt] occurrence <= max_occ (repeat filter)


class Anchors(NamedTuple):
    """Flat anchor list (static shape [N])."""

    qid: jax.Array      # int32 global query read id (INT_MAX if invalid)
    tid: jax.Array      # int32 global target read id
    strand: jax.Array   # int32 0 = same strand, 1 = query vs revcomp(target)
    qpos: jax.Array     # int32 k-mer start on query
    tpos: jax.Array     # int32 k-mer start on (possibly revcomp'd) target
    qlen: jax.Array     # int32
    tlen: jax.Array     # int32
    valid: jax.Array    # bool


class Candidates(NamedTuple):
    """Per-pair overlap candidates with dense anchor windows."""

    qid: jax.Array      # int32 [P]
    tid: jax.Array      # int32 [P]
    strand: jax.Array   # int32 [P]
    qlen: jax.Array     # int32 [P]
    tlen: jax.Array     # int32 [P]
    n_anchors: jax.Array  # int32 [P] anchors in the merged band window
    valid: jax.Array    # bool  [P]
    n_winners: jax.Array  # int32 scalar: winning pairs BEFORE the P cap
                          # (> P means the block overflowed max_pairs)
    aq: jax.Array       # int32 [P, A] anchor qpos (sorted by qpos)
    at: jax.Array       # int32 [P, A] anchor tpos
    amask: jax.Array    # bool  [P, A]


@functools.partial(jax.jit, static_argnames=("max_occ",))
def build_index(ms: MinimizerSet, lens: jax.Array, base_id, *,
                max_occ: int) -> MinimizerIndex:
    """Build a hash-sorted index from a target block's minimizers.

    base_id: scalar (static or traced) global id of read 0 of the block.
    """
    B, M = ms.hash.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (B, M), 0)
    slot = jax.lax.broadcasted_iota(jnp.int32, (B, M), 1)
    valid = (slot < ms.count[:, None]) & (ms.pos >= 0)

    h = jnp.where(valid, ms.hash, UINT_MAX).reshape(-1)
    tid = (rows + base_id).astype(jnp.int32).reshape(-1)
    tpos = ms.pos.reshape(-1)
    tstrand = ms.strand.reshape(-1)
    tlen = jnp.broadcast_to(lens[:, None].astype(jnp.int32), (B, M)).reshape(-1)

    # single-key sort with an index payload, then gather the satellite
    # columns — variadic TPU sorts move every operand through the sorting
    # network, so keeping it to (key, iota) is much cheaper
    iota = jnp.arange(h.shape[0], dtype=jnp.int32)
    h, perm = jax.lax.sort((h, iota), num_keys=1, is_stable=True)
    tid, tpos, tstrand, tlen = (tid[perm], tpos[perm], tstrand[perm],
                                tlen[perm])

    # occurrence count per entry via run-length over the sorted hashes
    # (jnp.searchsorted's default 'scan' method is pathologically slow on
    # TPU; this is a pure elementwise/scan formulation instead)
    n = h.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    first = jnp.concatenate([jnp.ones(1, jnp.bool_), h[1:] != h[:-1]])
    run_lo = jax.lax.associative_scan(
        jnp.maximum, jnp.where(first, iota, 0))
    last = jnp.concatenate([h[1:] != h[:-1], jnp.ones(1, jnp.bool_)])
    run_hi = jax.lax.associative_scan(
        jnp.minimum, jnp.where(last, iota, n - 1), reverse=True)
    occ_ok = (run_hi - run_lo + 1) <= max_occ
    return MinimizerIndex(hash=h, tid=tid, tpos=tpos, tstrand=tstrand,
                          tlen=tlen, occ_ok=occ_ok)


@functools.partial(jax.jit, static_argnames=("max_hits", "k", "dedup_self"))
def collect_anchors(ms: MinimizerSet, qlens: jax.Array, qbase,
                    index: MinimizerIndex, *, k: int, max_hits: int,
                    dedup_self: bool) -> Anchors:
    """Join query minimizers against the index -> flat anchors [Nq*F].

    dedup_self: when query and target sets are the same (all-vs-all),
    keep only qid < tid so each unordered pair is produced once
    (the reference dedups pairs in ``filter_trans_ovlp_inline_v4.py:35-44``).
    """
    B, M = ms.hash.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (B, M), 0)
    slot = jax.lax.broadcasted_iota(jnp.int32, (B, M), 1)
    qvalid = (slot < ms.count[:, None]) & (ms.pos >= 0)

    qh = jnp.where(qvalid, ms.hash, UINT_MAX).reshape(-1)
    qid = (rows + qbase).astype(jnp.int32).reshape(-1)
    qpos = ms.pos.reshape(-1)
    qstrand = ms.strand.reshape(-1)
    qlen = jnp.broadcast_to(qlens[:, None].astype(jnp.int32), (B, M)).reshape(-1)
    qvalid = qvalid.reshape(-1)

    lo = jnp.searchsorted(index.hash, qh, side="left", method="sort")

    F = max_hits
    Nq = qh.shape[0]
    f = jnp.arange(F, dtype=jnp.int32)[None, :]            # [1, F]
    t_idx = jnp.minimum(lo[:, None] + f, index.hash.shape[0] - 1)  # [Nq, F]
    # a slot is a real occurrence iff the gathered hash still matches
    # (replaces the 'right'-side searchsorted)
    in_range = index.hash[t_idx] == qh[:, None]

    tid = index.tid[t_idx]
    tpos = index.tpos[t_idx]
    tstrand = index.tstrand[t_idx]
    tlen = index.tlen[t_idx]
    occ_ok = index.occ_ok[t_idx]

    strand = (qstrand[:, None] != tstrand).astype(jnp.int32)
    # rebase '-' strand anchors into revcomp(target) coordinates
    tpos_adj = jnp.where(strand == 1, tlen - k - tpos, tpos)

    valid = in_range & occ_ok & qvalid[:, None]
    if dedup_self:
        valid = valid & (qid[:, None] < tid)
    else:
        valid = valid & (qid[:, None] != tid)

    def flat(x):
        return jnp.broadcast_to(x, (Nq, F)).reshape(-1)

    return Anchors(
        qid=jnp.where(valid, qid[:, None], INT_MAX).reshape(-1),
        tid=jnp.where(valid, tid, INT_MAX).reshape(-1),
        strand=jnp.where(valid, strand, 0).reshape(-1),
        qpos=flat(qpos[:, None]),
        tpos=tpos_adj.reshape(-1),
        qlen=flat(qlen[:, None]),
        tlen=tlen.reshape(-1),
        valid=valid.reshape(-1),
    )


def _seg_scan(x, flags, op, reverse: bool = False):
    """Segmented associative scan: ``op`` accumulates within segments whose
    FIRST element (in scan direction) has flags=True. All elementwise — no
    scatters (TPU segment_* ops lower to slow scatters)."""
    def comb(a, b):
        v1, f1 = a
        v2, f2 = b
        return jnp.where(f2, v2, op(v1, v2)), f1 | f2

    v, _ = jax.lax.associative_scan(comb, (x, flags), reverse=reverse)
    return v


@functools.partial(jax.jit, static_argnames=(
    "bandwidth", "min_anchors", "max_pairs", "anchors_per_pair"))
def group_candidates(a: Anchors, *, bandwidth: int, min_anchors: int,
                     max_pairs: int, anchors_per_pair: int) -> Candidates:
    """Diagonal-band voting: anchors -> per-pair overlap candidates.

    Everything after the sort is per-ELEMENT segmented-scan + gather work
    (zero scatters): run extents via cummax/cummin, neighbor-band merge via
    gathers at run boundaries, per-pair winner via bidirectional segmented
    max.
    """
    N = a.qid.shape[0]
    P, A = max_pairs, anchors_per_pair

    diag = a.qpos - a.tpos                       # in [-tlen, qlen]
    band = (diag + jnp.int32(1 << 28)) // bandwidth
    # (tid*2+strand only computed for valid anchors: INT_MAX*2 would overflow)
    pair2 = jnp.where(a.valid, a.tid * 2 + a.strand, INT_MAX)
    band = jnp.where(a.valid, band, INT_MAX)

    iota0 = jnp.arange(N, dtype=jnp.int32)
    qid, pair2, band, perm = jax.lax.sort(
        (a.qid, pair2, band, iota0), num_keys=3, is_stable=True)
    qpos, tpos = a.qpos[perm], a.tpos[perm]
    qlen, tlen = a.qlen[perm], a.tlen[perm]
    valid = a.valid[perm]

    idx = jnp.arange(N, dtype=jnp.int32)
    prev = jnp.maximum(idx - 1, 0)
    same_pair_prev = (qid == qid[prev]) & (pair2 == pair2[prev]) & (idx > 0)
    new_run = ~(same_pair_prev & (band == band[prev]))
    last_run = jnp.concatenate([new_run[1:], jnp.ones(1, jnp.bool_)])

    # per-element run extents (inclusive)
    run_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(new_run, idx, 0))
    run_end = jax.lax.associative_scan(
        jnp.minimum, jnp.where(last_run, idx, N - 1), reverse=True)

    # valid-anchor count per run via exclusive prefix sums + gathers
    cv = jnp.cumsum(valid.astype(jnp.int32))     # inclusive
    cv_before = jnp.where(run_start > 0, cv[jnp.maximum(run_start - 1, 0)], 0)
    count = cv[run_end] - cv_before              # [N], constant within run

    # neighbor-run merge (band +-1 within the same pair): gather at the
    # boundary elements
    jp = jnp.maximum(run_start - 1, 0)           # last element of prev run
    jn = jnp.minimum(run_end + 1, N - 1)         # first element of next run
    same_prev = (run_start > 0) & (qid[jp] == qid) & (pair2[jp] == pair2) \
        & (band - band[jp] == 1)
    same_next = (run_end < N - 1) & (qid[jn] == qid) & (pair2[jn] == pair2) \
        & (band[jn] - band == 1)
    merged = count + jnp.where(same_prev, count[jp], 0) \
        + jnp.where(same_next, count[jn], 0)
    merged_start = jnp.where(same_prev, run_start[jp], run_start)
    merged_end = jnp.where(same_next, run_end[jn], run_end) + 1

    is_real = qid != INT_MAX
    # per-pair max of merged (bidirectional segmented max)
    new_pair = (idx == 0) | (qid != qid[prev]) | (pair2 != pair2[prev])
    last_pair = jnp.concatenate([new_pair[1:], jnp.ones(1, jnp.bool_)])
    m = jnp.where(is_real, merged, -1)
    fwd = _seg_scan(m, new_pair, jnp.maximum)
    bwd = _seg_scan(m, last_pair, jnp.maximum, reverse=True)
    pairmax = jnp.maximum(fwd, bwd)
    achieves = is_real & (merged == pairmax)
    # earliest achieving run in the pair
    e = jnp.where(achieves, run_start, INT_MAX)
    efwd = _seg_scan(e, new_pair, jnp.minimum)
    ebwd = _seg_scan(e, last_pair, jnp.minimum, reverse=True)
    first_best = jnp.minimum(efwd, ebwd)
    is_winner = achieves & (run_start == first_best) & (idx == run_start) \
        & (merged >= min_anchors)

    # compact winning runs into P candidate slots. A scatter into P slots
    # serializes badly on TPU; instead sort (rank, iota) once and gather.
    rank = jnp.cumsum(is_winner.astype(jnp.int32)) - 1
    key = jnp.where(is_winner & (rank < P), rank, INT_MAX)
    _, perm_w = jax.lax.sort((key, idx), num_keys=1, is_stable=True)
    sel = perm_w[:P]
    sel_ok = is_winner[sel]

    def compact(x, fill):
        return jnp.where(sel_ok, x[sel], jnp.asarray(fill, x.dtype))

    run_qid, run_pair2 = qid, pair2              # constant within valid runs
    c_start = compact(merged_start, 0)
    c_full = compact(merged_end - merged_start, 0)   # uncapped run length
    c_len = jnp.minimum(c_full, A)
    c_valid = compact(is_winner, False)
    c_n = compact(merged, 0)

    # anchor coordinates live in the big sorted arrays; gather windows.
    # Runs longer than A are stride-subsampled across their FULL span so the
    # overlap extent (and identity sampling) stays unbiased — taking the
    # prefix would truncate long overlaps and mis-trigger the internal-match
    # (Algorithm 5) filter downstream.
    ar = jnp.arange(A, dtype=jnp.int32)[None, :]
    offs = (ar * c_full[:, None]) // jnp.maximum(c_len[:, None], 1)
    gi = jnp.minimum(c_start[:, None] + offs, N - 1)
    amask = (ar < c_len[:, None]) & c_valid[:, None]
    aq = jnp.where(amask, qpos[gi], INT_MAX)
    at = jnp.where(amask, tpos[gi], INT_MAX)
    # rows in the window are sorted by (band, qpos); re-sort by qpos then tpos
    aq, at, amaski = jax.lax.sort(
        (aq, at, amask.astype(jnp.int32)), num_keys=2, is_stable=True,
        dimension=1)
    amask = amaski.astype(jnp.bool_)

    first = jnp.minimum(c_start, N - 1)
    return Candidates(
        qid=compact(run_qid, INT_MAX),
        tid=compact(run_pair2, INT_MAX) // 2,
        strand=compact(run_pair2, 0) % 2,
        qlen=qlen[first],
        tlen=tlen[first],
        n_anchors=jnp.where(c_valid, c_n, 0),
        valid=c_valid,
        n_winners=jnp.sum(is_winner.astype(jnp.int32)),
        aq=aq, at=at, amask=amask,
    )
