"""Seeding + candidate pairing: minimizer hash join and diagonal-band voting.

Replaces minimap2's index/seed/chain-candidate stages (reference invocation
``filter_overlap_slr2.py:51,55``) with a TPU-native formulation built
entirely from sorts, cumulative primitives and small gathers — no hash
tables, no per-read loops, and (deliberately) no scatters or generic
associative scans, which lower poorly on TPU:

1. ``build_index``: flatten a target batch's minimizers, sort by hash; the
   per-entry occurrence count (repeat filter, minimap2 max-occ analogue)
   comes from run-length over the sorted array via ``lax.cummax/cummin``.
2. ``collect_anchors``: binary-search each query minimizer into the sorted
   target hashes and emit up to ``max_hits`` anchors (static [Nq*F] flat
   arrays) with RAW forward target positions — the revcomp rebase of
   '-' strand pairs is deferred to the few winner windows.
3. ``group_candidates``: sort anchors by (qid, tid/strand, diagonal band);
   contiguous runs vote for one (pair, band); candidate runs are compacted
   EARLY to a small run table where neighbor-band merging and local-max
   selection are roll/elementwise ops; winners' anchor windows are gathered
   into a dense [P, A] matrix. A pair may yield more than one window for
   very long overlaps — the engine dedups best-per-pair on host
   (matching the reference's fkey dedup, ``filter_overlap_slr2.py:133``).
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
    """Hash-sorted flat minimizer table for a target read block.

    Deliberately minimal: no per-entry read length — anchors keep RAW
    forward target positions through the join and band voting ('-' strand
    bands use the anti-diagonal qpos + tpos), and the revcomp rebase
    happens only for the few winner windows in group_candidates. This
    removes one multi-million-element gather per block."""

    hash: jax.Array     # uint32 [Nt] sorted ascending (invalid = UINT_MAX)
    tid2s: jax.Array    # int32  [Nt] tid*2 + strand, or -1 for repeat-masked
    tpos: jax.Array     # int32  [Nt] k-mer start on forward target


class Anchors(NamedTuple):
    """Flat anchor list (static shape [N]); invalid slots have qid=INT_MAX."""

    qid: jax.Array      # int32 global query read id
    tid: jax.Array      # int32 global target read id (INT_MAX if invalid)
    strand: jax.Array   # int32 0 = same strand, 1 = query vs revcomp(target)
    qpos: jax.Array     # int32 k-mer start on query
    tpos: jax.Array     # int32 k-mer start on the FORWARD target frame

    @property
    def valid(self) -> jax.Array:
        return self.qid != INT_MAX


class Candidates(NamedTuple):
    """Per-pair overlap candidates with dense anchor windows."""

    qid: jax.Array      # int32 [P]
    tid: jax.Array      # int32 [P]
    strand: jax.Array   # int32 [P]
    qlen: jax.Array     # int32 [P]
    tlen: jax.Array     # int32 [P]
    n_anchors: jax.Array  # int32 [P] anchors in the merged band window
    valid: jax.Array    # bool  [P]
    n_winners: jax.Array  # int32 scalar: winning windows BEFORE the P cap
    aq: jax.Array       # int32 [P, A] anchor qpos (sorted by qpos)
    at: jax.Array       # int32 [P, A] anchor tpos
    amask: jax.Array    # bool  [P, A]


@functools.partial(jax.jit, static_argnames=("max_occ",))
def build_index(ms: MinimizerSet, base_id, *,
                max_occ: int) -> MinimizerIndex:
    """Build a hash-sorted index from a target block's minimizers.

    base_id: scalar (static or traced) global id of read 0 of the block.
    """
    B, M = ms.hash.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (B, M), 0)
    slot = jax.lax.broadcasted_iota(jnp.int32, (B, M), 1)
    valid = (slot < ms.count[:, None]) & (ms.pos >= 0)

    h = jnp.where(valid, ms.hash, UINT_MAX).reshape(-1)
    tid2s = ((rows + base_id) * 2).astype(jnp.int32).reshape(-1) \
        + ms.strand.astype(jnp.int32).reshape(-1)
    tpos = ms.pos.reshape(-1)

    iota = jnp.arange(h.shape[0], dtype=jnp.int32)
    h, perm = jax.lax.sort((h, iota), num_keys=1, is_stable=True)
    tid2s, tpos = tid2s[perm], tpos[perm]

    # occurrence count via run-length over the sorted hashes; repeat-masked
    # entries get tid2s = -1 (join misses then fall out via the valid mask)
    n = h.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    first = jnp.concatenate([jnp.ones(1, jnp.bool_), h[1:] != h[:-1]])
    run_lo = jax.lax.cummax(jnp.where(first, iota, 0))
    last = jnp.concatenate([h[1:] != h[:-1], jnp.ones(1, jnp.bool_)])
    run_hi = jax.lax.cummin(jnp.where(last, iota, n - 1), reverse=True)
    occ_ok = (run_hi - run_lo + 1) <= max_occ
    tid2s = jnp.where(occ_ok, tid2s, -1)
    return MinimizerIndex(hash=h, tid2s=tid2s, tpos=tpos)


@functools.partial(jax.jit, static_argnames=("max_hits", "dedup_self"))
def collect_anchors(ms: MinimizerSet, qbase, index: MinimizerIndex, *,
                    max_hits: int, dedup_self: bool) -> Anchors:
    """Join query minimizers against the index -> flat anchors [Nq*F].

    tpos stays in the RAW forward target frame; group_candidates rebases
    '-' strand winner windows into revcomp coordinates.

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
    qstrand = ms.strand.astype(jnp.int32).reshape(-1)
    qvalid = qvalid.reshape(-1)

    lo = jnp.searchsorted(index.hash, qh, side="left", method="sort")

    F = max_hits
    Nq = qh.shape[0]
    f = jnp.arange(F, dtype=jnp.int32)[None, :]            # [1, F]
    t_idx = jnp.minimum(lo[:, None] + f, index.hash.shape[0] - 1)  # [Nq, F]
    # a slot is a real occurrence iff the gathered hash still matches
    in_range = index.hash[t_idx] == qh[:, None]

    tid2s = index.tid2s[t_idx]
    tpos = index.tpos[t_idx]

    tid = tid2s >> 1
    strand = (qstrand[:, None] != (tid2s & 1)).astype(jnp.int32)

    valid = in_range & (tid2s >= 0) & qvalid[:, None]
    if dedup_self:
        valid = valid & (qid[:, None] < tid)
    else:
        valid = valid & (qid[:, None] != tid)

    return Anchors(
        qid=jnp.where(valid, qid[:, None], INT_MAX).reshape(-1),
        tid=jnp.where(valid, tid, INT_MAX).reshape(-1),
        strand=jnp.where(valid, strand, 0).reshape(-1),
        qpos=jnp.broadcast_to(qpos[:, None], (Nq, F)).reshape(-1),
        tpos=tpos.reshape(-1),
    )


@functools.partial(jax.jit, static_argnames=(
    "bandwidth", "min_anchors", "max_pairs", "anchors_per_pair",
    "max_occ", "k", "n_reads", "max_len", "join_occ"))
def self_join_candidates(index: MinimizerIndex, lens: jax.Array, *,
                         bandwidth: int, min_anchors: int, max_pairs: int,
                         anchors_per_pair: int, max_occ: int, k: int,
                         n_reads: int, max_len: int,
                         join_occ: int = 0) -> Candidates:
    """All-vs-all candidate pairing directly from the hash-sorted index —
    the fast path for one read block (replaces collect_anchors +
    group_candidates for the self-join case).

    Two structural facts make this cheap on TPU:

    1. ``build_index``'s stable sort keeps each hash run in original
       (read-major) order, and runs longer than ``max_occ`` are fully
       repeat-masked. So every anchor pair within a run is (slot i,
       slot i+d) for some d in [1, max_occ-1] with read(i) <= read(i+d) —
       the whole join is ``max_occ-1`` array ROLLS, no [N, F] gathers and
       no searchsorted (the round-1 path spent ~65% of block time there).
    2. Band voting needs anchors grouped by (pair, band); packing
       (qid, tid, strand) into one int32 key and (band, qpos) into a
       second makes the global sort 3 operands / 2 keys instead of
       5 operands — and leaves each run pre-sorted by qpos.

    Anchor multiset is identical to collect_anchors(dedup_self=True) +
    group_candidates (validated by tests/test_seed.py). Requires
    ``n_reads * 2 * nbands < 2^31``; reads up to 2^15 use the fused
    one-key packing, ULTRALONG reads (up to (nbands << qshift) < 2^31 —
    128 kb at bandwidth 64, 256 kb at 256) use the 3-operand layout with
    qshift = bit_length(max_len) so >32 kb ONT reads never fall back to
    the legacy gather join (round-4 W4)."""
    h, tid2s, tpos = index.hash, index.tid2s, index.tpos
    Nt = h.shape[0]
    P, A = max_pairs, anchors_per_pair
    nbands = (3 * max_len) // bandwidth + 2
    qshift = max(15, int(max_len - 1).bit_length())
    bandbits = max(int(nbands - 1).bit_length(), 1)
    pairbits = int(2 * n_reads - 1).bit_length() + \
        int(n_reads - 1).bit_length()
    one_key = (pairbits + bandbits) <= 30 and max_len < (1 << 15)
    assert 2 * n_reads * nbands < (1 << 31), "key packing overflow"
    assert (nbands << qshift) < (1 << 31), \
        "band/qpos packing overflow (raise bandwidth for ultralong blocks)"

    iota = jnp.arange(Nt, dtype=jnp.int32)
    last = jnp.concatenate([h[1:] != h[:-1], jnp.ones(1, jnp.bool_)])
    run_hi = jax.lax.cummin(jnp.where(last, iota, Nt - 1), reverse=True)
    ok_i = tid2s >= 0

    # join fan-out: layers beyond the LONGEST surviving run are empty; the
    # caller can right-size join_occ from the measured max run length
    # (find_overlaps does) — full pair coverage needs join_occ >= that
    D = join_occ if 0 < join_occ <= max_occ else max_occ
    key1_l, key2_l, tpos_l = [], [], []
    for d in range(1, D):
        t2_j = jnp.roll(tid2s, -d)
        tpos_j = jnp.roll(tpos, -d)
        in_run = (iota + d) <= run_hi
        qid = tid2s >> 1
        tid = t2_j >> 1
        strand = ((tid2s ^ t2_j) & 1)
        v = in_run & ok_i & (t2_j >= 0) & (qid < tid)
        qpos = tpos
        diag = jnp.where(strand == 1, qpos + tpos_j, qpos - tpos_j)
        band = (diag + max_len) // bandwidth
        pair2 = tid * 2 + strand
        grp = qid * (2 * n_reads) + pair2
        if one_key:
            # single sort key (group, band); payload packs (qpos, tpos).
            # Within-run qpos order is then arbitrary — the strided window
            # subsample stays a uniform sample and windows re-sort by qpos.
            key1_l.append(jnp.where(v, (grp << bandbits) | band, INT_MAX))
            key2_l.append((qpos << qshift) | tpos_j)
        else:
            key1_l.append(jnp.where(v, grp, INT_MAX))
            key2_l.append(jnp.where(v, (band << qshift) | qpos, INT_MAX))
            tpos_l.append(tpos_j)
    key1 = jnp.concatenate(key1_l)
    key2 = jnp.concatenate(key2_l)
    N = key1.shape[0]

    if one_key:
        # payload doubles as 2nd key: (qpos << 15 | tpos) orders runs by
        # qpos so the strided window subsample matches the legacy path
        key1, key2 = jax.lax.sort((key1, key2), num_keys=2, is_stable=False)
        valid = key1 != INT_MAX
        qpos = key2 >> qshift
        tposf = key2 & ((1 << qshift) - 1)
        band = jnp.where(valid, key1 & ((1 << bandbits) - 1), INT_MAX)
        grp_key = key1
    else:
        tposf = jnp.concatenate(tpos_l)
        key1, key2, tposf = jax.lax.sort((key1, key2, tposf), num_keys=2,
                                         is_stable=False)
        valid = key1 != INT_MAX
        band = jnp.where(valid, key2 >> qshift, INT_MAX)
        qpos = key2 & ((1 << qshift) - 1)
        grp_key = key1

    idx = jnp.arange(N, dtype=jnp.int32)
    prev = jnp.maximum(idx - 1, 0)
    if one_key:
        new_run = (idx == 0) | (key1 != key1[prev])
    else:
        new_run = (idx == 0) | (key1 != key1[prev]) | (band != band[prev])
    last_run = jnp.concatenate([new_run[1:], jnp.ones(1, jnp.bool_)])
    run_start = jax.lax.cummax(jnp.where(new_run, idx, 0))
    run_end = jax.lax.cummin(jnp.where(last_run, idx, N - 1), reverse=True)
    run_len = run_end - run_start + 1

    R = min(max(8 * max_pairs, 4096), N)
    thr = min(2, max(1, min_anchors))
    is_cand = new_run & valid & (run_len >= thr)
    # compact the first R candidate run-starts WITHOUT another N-sized
    # sort: binary-search each rank into the cumsum (24ish gathers at [R])
    cum = jnp.cumsum(is_cand.astype(jnp.int32))
    target = jnp.arange(1, R + 1, dtype=jnp.int32)
    lo = jnp.zeros((R,), jnp.int32)
    hi = jnp.full((R,), N, jnp.int32)
    for _ in range(int(N).bit_length()):
        mid = (lo + hi) // 2
        go = cum[jnp.minimum(mid, N - 1)] < target
        lo = jnp.where(go, mid + 1, lo)
        hi = jnp.where(go, hi, mid)
    rs = jnp.minimum(lo, N - 1)
    r_ok = (target <= cum[N - 1]) & is_cand[rs]
    key1_r = jnp.where(r_ok, grp_key[rs], INT_MAX)
    if one_key:
        band_r = key1_r     # band lives in the low bits: +1 band == +1 key
    else:
        band_r = jnp.where(r_ok, band[rs], INT_MAX)
    end_r = jnp.where(r_ok, run_end[rs], 0)
    start_r = jnp.where(r_ok, rs, 0)
    len_r = jnp.where(r_ok, end_r - start_r + 1, 0)

    def roll_prev(x, fill):
        return jnp.concatenate([jnp.full((1,), fill, x.dtype), x[:-1]])

    def roll_next(x, fill):
        return jnp.concatenate([x[1:], jnp.full((1,), fill, x.dtype)])

    if one_key:
        same_prev = r_ok & (key1_r - roll_prev(key1_r, INT_MAX) == 1) \
            & roll_prev(r_ok, False)
        same_next = r_ok & (roll_next(key1_r, INT_MAX) - key1_r == 1) \
            & roll_next(r_ok, False)
    else:
        same_prev = (roll_prev(key1_r, INT_MAX) == key1_r) \
            & (band_r - roll_prev(band_r, INT_MAX) == 1)
        same_next = (roll_next(key1_r, INT_MAX) == key1_r) \
            & (roll_next(band_r, INT_MAX) - band_r == 1)
    merged = len_r + jnp.where(same_prev, roll_prev(len_r, 0), 0) \
        + jnp.where(same_next, roll_next(len_r, 0), 0)
    merged_start = jnp.where(same_prev, roll_prev(start_r, 0), start_r)
    merged_end = jnp.where(same_next, roll_next(end_r, 0), end_r) + 1

    mprev = jnp.where(same_prev, roll_prev(merged, 0), -1)
    mnext = jnp.where(same_next, roll_next(merged, 0), -1)
    is_winner = r_ok & (merged >= min_anchors) & (merged > mprev) \
        & (merged >= mnext)

    wrank = jnp.cumsum(is_winner.astype(jnp.int32)) - 1
    wkey = jnp.where(is_winner & (wrank < P), wrank, INT_MAX)
    ridx = jnp.arange(R, dtype=jnp.int32)
    _, perm_w = jax.lax.sort((wkey, ridx), num_keys=1, is_stable=True)
    sel = perm_w[:P]
    sel_ok = is_winner[sel]

    def compact(x, fill):
        return jnp.where(sel_ok, x[sel], jnp.asarray(fill, x.dtype))

    c_start = compact(merged_start, 0)
    c_full = compact(merged_end - merged_start, 0)
    c_len = jnp.minimum(c_full, A)
    c_valid = sel_ok
    c_n = compact(merged, 0)
    c_key1 = compact(key1_r, INT_MAX)
    if one_key:
        c_key1 = c_key1 >> bandbits    # back to the (qid, pair2) group
    c_qid = jnp.where(c_valid, c_key1 // (2 * n_reads), INT_MAX)
    c_pair2 = jnp.where(c_valid, c_key1 - c_qid * (2 * n_reads), 0)
    c_tid = jnp.where(c_valid, c_pair2 >> 1, INT_MAX)
    qlen = jnp.where(c_valid, lens[jnp.where(c_valid, c_qid, 0)], 0) \
        .astype(jnp.int32)
    tlen = jnp.where(c_valid, lens[jnp.where(c_valid, c_tid, 0)], 0) \
        .astype(jnp.int32)

    ar = jnp.arange(A, dtype=jnp.int32)[None, :]
    offs = (ar * c_full[:, None]) // jnp.maximum(c_len[:, None], 1)
    gi = jnp.minimum(c_start[:, None] + offs, N - 1)
    amask = (ar < c_len[:, None]) & c_valid[:, None]
    aq = jnp.where(amask, qpos[gi], INT_MAX)
    at = jnp.where(amask, tposf[gi], INT_MAX)
    minus = (c_pair2 % 2)[:, None] == 1
    at = jnp.where(amask & minus, tlen[:, None] - k - at, at)
    aq, at, amaski = jax.lax.sort(
        (aq, at, amask.astype(jnp.int32)), num_keys=2, is_stable=True,
        dimension=1)
    amask = amaski.astype(jnp.bool_)
    return Candidates(
        qid=c_qid,
        tid=c_tid,
        strand=jnp.where(c_valid, c_pair2 % 2, 0),
        qlen=qlen, tlen=tlen,
        n_anchors=jnp.where(c_valid, c_n, 0),
        valid=c_valid,
        n_winners=jnp.sum(is_winner.astype(jnp.int32)),
        aq=aq, at=at, amask=amask,
    )


@functools.partial(jax.jit, static_argnames=(
    "bandwidth", "min_anchors", "max_pairs", "anchors_per_pair",
    "row_size", "k"))
def group_candidates(a: Anchors, lens: jax.Array, *, bandwidth: int,
                     min_anchors: int, max_pairs: int,
                     anchors_per_pair: int,
                     row_size: int = 0, k: int = 0) -> Candidates:
    """Diagonal-band voting: anchors -> per-pair overlap candidate windows.

    lens: int32 [n_rows] global read lengths (indexed by qid/tid).
    row_size: when > 0, the flat anchor arrays are row-major per query
      read with this many slots per read (collect_anchors layout) — the
      big (qid, pair, band) sort then runs SEGMENTED per query row
      (2 keys over short rows instead of 3 keys over millions), which is
      substantially cheaper on TPU.
    """
    N = a.qid.shape[0]
    P, A = max_pairs, anchors_per_pair
    # static cap on candidate runs: scales with the pair budget, not the
    # anchor count (N//8 made the run-compaction sort and every run-level
    # array ~360k entries at bench scale for a few thousand real runs)
    R = min(max(8 * max_pairs, 4096), N)

    # '+' pairs band on the diagonal qpos - tpos; '-' pairs keep RAW
    # forward tpos, where the invariant is the ANTI-diagonal qpos + tpos
    diag = jnp.where(a.strand == 1, a.qpos + a.tpos, a.qpos - a.tpos)
    band = (diag + jnp.int32(1 << 28)) // bandwidth
    valid0 = a.qid != INT_MAX
    # (tid*2+strand only computed for valid anchors: INT_MAX*2 overflows)
    pair2 = jnp.where(valid0, a.tid * 2 + a.strand, INT_MAX)
    band = jnp.where(valid0, band, INT_MAX)

    if row_size > 0 and N % row_size == 0 and N > row_size:
        rows = N // row_size
        shape2 = (rows, row_size)
        p2, b2, q2, qp2, tp2 = jax.lax.sort(
            (pair2.reshape(shape2), band.reshape(shape2),
             a.qid.reshape(shape2), a.qpos.reshape(shape2),
             a.tpos.reshape(shape2)),
            num_keys=2, is_stable=True, dimension=1)
        pair2, band, qid = p2.reshape(-1), b2.reshape(-1), q2.reshape(-1)
        qpos, tpos = qp2.reshape(-1), tp2.reshape(-1)
        # invalid slots sorted to each row's tail carry qid = INT_MAX
        qid = jnp.where(pair2 == INT_MAX, INT_MAX, qid)
    else:
        qid, pair2, band, qpos, tpos = jax.lax.sort(
            (a.qid, pair2, band, a.qpos, a.tpos), num_keys=3,
            is_stable=True)
    valid = qid != INT_MAX

    idx = jnp.arange(N, dtype=jnp.int32)
    prev = jnp.maximum(idx - 1, 0)
    new_run = (idx == 0) | (qid != qid[prev]) | (pair2 != pair2[prev]) \
        | (band != band[prev])
    last_run = jnp.concatenate([new_run[1:], jnp.ones(1, jnp.bool_)])
    run_start = jax.lax.cummax(jnp.where(new_run, idx, 0))
    run_end = jax.lax.cummin(jnp.where(last_run, idx, N - 1), reverse=True)
    run_len = run_end - run_start + 1

    # candidate runs: could contribute to a window that clears min_anchors
    thr = min(2, max(1, min_anchors))
    is_cand = new_run & valid & (run_len >= thr)
    crank = jnp.cumsum(is_cand.astype(jnp.int32)) - 1
    n_runs = jnp.sum(is_cand.astype(jnp.int32))

    # compact candidate run-start indices to [R]
    key = jnp.where(is_cand & (crank < R), crank, INT_MAX)
    _, perm_r = jax.lax.sort((key, idx), num_keys=1, is_stable=True)
    rs = perm_r[:R]                      # element index of each cand run
    r_ok = is_cand[rs]
    # run-level metadata (gathers at only R indices)
    qid_r = jnp.where(r_ok, qid[rs], INT_MAX)
    pair2_r = jnp.where(r_ok, pair2[rs], INT_MAX)
    band_r = jnp.where(r_ok, band[rs], INT_MAX)
    end_r = jnp.where(r_ok, run_end[rs], 0)
    start_r = jnp.where(r_ok, rs, 0)
    len_r = jnp.where(r_ok, end_r - start_r + 1, 0)

    def roll_prev(x, fill):
        return jnp.concatenate([jnp.full((1,), fill, x.dtype), x[:-1]])

    def roll_next(x, fill):
        return jnp.concatenate([x[1:], jnp.full((1,), fill, x.dtype)])

    same_prev = (roll_prev(qid_r, INT_MAX) == qid_r) \
        & (roll_prev(pair2_r, INT_MAX) == pair2_r) \
        & (band_r - roll_prev(band_r, INT_MAX) == 1)
    same_next = (roll_next(qid_r, INT_MAX) == qid_r) \
        & (roll_next(pair2_r, INT_MAX) == pair2_r) \
        & (roll_next(band_r, INT_MAX) - band_r == 1)
    merged = len_r + jnp.where(same_prev, roll_prev(len_r, 0), 0) \
        + jnp.where(same_next, roll_next(len_r, 0), 0)
    merged_start = jnp.where(same_prev, roll_prev(start_r, 0), start_r)
    merged_end = jnp.where(same_next, roll_next(end_r, 0), end_r) + 1

    # local-max window selection (strictly beats prev, ties lose to next ->
    # exactly one of two equal neighbours wins); non-mergeable neighbours
    # auto-win that side. Distant windows of one pair may both survive; the
    # engine dedups best-per-pair on host.
    mprev = jnp.where(same_prev, roll_prev(merged, 0), -1)
    mnext = jnp.where(same_next, roll_next(merged, 0), -1)
    is_winner = r_ok & (merged >= min_anchors) & (merged > mprev) \
        & (merged >= mnext)

    # compact winners to P slots
    wrank = jnp.cumsum(is_winner.astype(jnp.int32)) - 1
    wkey = jnp.where(is_winner & (wrank < P), wrank, INT_MAX)
    ridx = jnp.arange(R, dtype=jnp.int32)
    _, perm_w = jax.lax.sort((wkey, ridx), num_keys=1, is_stable=True)
    sel = perm_w[:P]
    sel_ok = is_winner[sel]

    def compact(x, fill):
        return jnp.where(sel_ok, x[sel], jnp.asarray(fill, x.dtype))

    c_start = compact(merged_start, 0)
    c_full = compact(merged_end - merged_start, 0)   # uncapped window length
    c_len = jnp.minimum(c_full, A)
    c_valid = sel_ok
    c_n = compact(merged, 0)
    c_qid = compact(qid_r, INT_MAX)
    c_pair2 = compact(pair2_r, 0)

    # anchor windows: runs longer than A are stride-subsampled across their
    # FULL span so the overlap extent (and identity sampling) stays unbiased
    c_tid = jnp.where(c_valid, c_pair2 // 2, INT_MAX)
    qlen = jnp.where(c_valid, lens[jnp.where(c_valid, c_qid, 0)], 0) \
        .astype(jnp.int32)
    tlen = jnp.where(c_valid, lens[jnp.where(c_valid, c_tid, 0)], 0) \
        .astype(jnp.int32)

    ar = jnp.arange(A, dtype=jnp.int32)[None, :]
    offs = (ar * c_full[:, None]) // jnp.maximum(c_len[:, None], 1)
    gi = jnp.minimum(c_start[:, None] + offs, N - 1)
    amask = (ar < c_len[:, None]) & c_valid[:, None]
    aq = jnp.where(amask, qpos[gi], INT_MAX)
    at = jnp.where(amask, tpos[gi], INT_MAX)
    # rebase '-' strand winner windows into revcomp(target) coordinates
    # (deferred from collect_anchors: P*A winner slots instead of Nq*F)
    minus = (c_pair2 % 2)[:, None] == 1
    at = jnp.where(amask & minus, tlen[:, None] - k - at, at)
    # window rows are sorted by (band, qpos); re-sort by qpos then tpos
    aq, at, amaski = jax.lax.sort(
        (aq, at, amask.astype(jnp.int32)), num_keys=2, is_stable=True,
        dimension=1)
    amask = amaski.astype(jnp.bool_)
    return Candidates(
        qid=c_qid,
        tid=c_tid,
        strand=jnp.where(c_valid, c_pair2 % 2, 0),
        qlen=qlen, tlen=tlen,
        n_anchors=jnp.where(c_valid, c_n, 0),
        valid=c_valid,
        n_winners=jnp.sum(is_winner.astype(jnp.int32)),
        aq=aq, at=at, amask=amask,
    )


def roll_join_packed(h: jax.Array, tid2s: jax.Array, tpos: jax.Array, *,
                     max_occ: int, bandwidth: int, max_len: int,
                     n_reads: int, qshift: int = 15):
    """Roll-based self-join over a hash-sorted entry list -> packed anchor
    key arrays (key1 = qid*(2*n_reads)+pair2, key2 = band<<qshift|qpos,
    payload tpos). Entries must be sorted by (hash, tid2s) so runs are
    read-major; runs longer than max_occ must be pre-masked (tid2s = -1).

    Used by the self-join block path and the minimizer-bucket all_to_all
    exchange (each bucket device joins its hash range)."""
    Nt = h.shape[0]
    assert 2 * n_reads * ((3 * max_len) // bandwidth + 2) < (1 << 31)
    assert max_len < (1 << qshift)
    iota = jnp.arange(Nt, dtype=jnp.int32)
    last = jnp.concatenate([h[1:] != h[:-1], jnp.ones(1, jnp.bool_)])
    run_hi = jax.lax.cummin(jnp.where(last, iota, Nt - 1), reverse=True)
    ok_i = tid2s >= 0
    key1_l, key2_l, tpos_l = [], [], []
    for d in range(1, max_occ):
        t2_j = jnp.roll(tid2s, -d)
        tpos_j = jnp.roll(tpos, -d)
        in_run = (iota + d) <= run_hi
        qid = tid2s >> 1
        tid = t2_j >> 1
        strand = ((tid2s ^ t2_j) & 1)
        v = in_run & ok_i & (t2_j >= 0) & (qid < tid)
        diag = jnp.where(strand == 1, tpos + tpos_j, tpos - tpos_j)
        band = (diag + max_len) // bandwidth
        key1_l.append(jnp.where(v, qid * (2 * n_reads) + tid * 2 + strand,
                                INT_MAX))
        key2_l.append(jnp.where(v, (band << qshift) | tpos, INT_MAX))
        tpos_l.append(tpos_j)
    return (jnp.concatenate(key1_l), jnp.concatenate(key2_l),
            jnp.concatenate(tpos_l))


def group_packed_candidates(key1: jax.Array, key2: jax.Array,
                            tposf: jax.Array, lens: jax.Array, *,
                            min_anchors: int, max_pairs: int,
                            anchors_per_pair: int, n_reads: int, k: int,
                            qshift: int = 15) -> Candidates:
    """Band voting over packed anchor keys (the two-key flavor of
    self_join_candidates's voting stage, reusable over arbitrary packed
    anchor streams — e.g. anchors routed home by the bucket exchange)."""
    P, A = max_pairs, anchors_per_pair
    N = key1.shape[0]
    key1, key2, tposf = jax.lax.sort((key1, key2, tposf), num_keys=2,
                                     is_stable=False)
    valid = key1 != INT_MAX
    band = jnp.where(valid, key2 >> qshift, INT_MAX)
    qpos = key2 & ((1 << qshift) - 1)

    idx = jnp.arange(N, dtype=jnp.int32)
    prev = jnp.maximum(idx - 1, 0)
    new_run = (idx == 0) | (key1 != key1[prev]) | (band != band[prev])
    last_run = jnp.concatenate([new_run[1:], jnp.ones(1, jnp.bool_)])
    run_start = jax.lax.cummax(jnp.where(new_run, idx, 0))
    run_end = jax.lax.cummin(jnp.where(last_run, idx, N - 1), reverse=True)
    run_len = run_end - run_start + 1

    R = min(max(8 * max_pairs, 4096), N)
    thr = min(2, max(1, min_anchors))
    is_cand = new_run & valid & (run_len >= thr)
    cum = jnp.cumsum(is_cand.astype(jnp.int32))
    target = jnp.arange(1, R + 1, dtype=jnp.int32)
    lo = jnp.zeros((R,), jnp.int32)
    hi = jnp.full((R,), N, jnp.int32)
    for _ in range(int(N).bit_length()):
        mid = (lo + hi) // 2
        go = cum[jnp.minimum(mid, N - 1)] < target
        lo = jnp.where(go, mid + 1, lo)
        hi = jnp.where(go, hi, mid)
    rs = jnp.minimum(lo, N - 1)
    r_ok = (target <= cum[N - 1]) & is_cand[rs]
    key1_r = jnp.where(r_ok, key1[rs], INT_MAX)
    band_r = jnp.where(r_ok, band[rs], INT_MAX)
    end_r = jnp.where(r_ok, run_end[rs], 0)
    start_r = jnp.where(r_ok, rs, 0)
    len_r = jnp.where(r_ok, end_r - start_r + 1, 0)

    def roll_prev(x, fill):
        return jnp.concatenate([jnp.full((1,), fill, x.dtype), x[:-1]])

    def roll_next(x, fill):
        return jnp.concatenate([x[1:], jnp.full((1,), fill, x.dtype)])

    same_prev = (roll_prev(key1_r, INT_MAX) == key1_r) \
        & (band_r - roll_prev(band_r, INT_MAX) == 1)
    same_next = (roll_next(key1_r, INT_MAX) == key1_r) \
        & (roll_next(band_r, INT_MAX) - band_r == 1)
    merged = len_r + jnp.where(same_prev, roll_prev(len_r, 0), 0) \
        + jnp.where(same_next, roll_next(len_r, 0), 0)
    merged_start = jnp.where(same_prev, roll_prev(start_r, 0), start_r)
    merged_end = jnp.where(same_next, roll_next(end_r, 0), end_r) + 1

    mprev = jnp.where(same_prev, roll_prev(merged, 0), -1)
    mnext = jnp.where(same_next, roll_next(merged, 0), -1)
    is_winner = r_ok & (merged >= min_anchors) & (merged > mprev) \
        & (merged >= mnext)

    wrank = jnp.cumsum(is_winner.astype(jnp.int32)) - 1
    wkey = jnp.where(is_winner & (wrank < P), wrank, INT_MAX)
    ridx = jnp.arange(R, dtype=jnp.int32)
    _, perm_w = jax.lax.sort((wkey, ridx), num_keys=1, is_stable=True)
    sel = perm_w[:P]
    sel_ok = is_winner[sel]

    def compact(x, fill):
        return jnp.where(sel_ok, x[sel], jnp.asarray(fill, x.dtype))

    c_start = compact(merged_start, 0)
    c_full = compact(merged_end - merged_start, 0)
    c_len = jnp.minimum(c_full, A)
    c_valid = sel_ok
    c_n = compact(merged, 0)
    c_key1 = compact(key1_r, INT_MAX)
    c_qid = jnp.where(c_valid, c_key1 // (2 * n_reads), INT_MAX)
    c_pair2 = jnp.where(c_valid, c_key1 - c_qid * (2 * n_reads), 0)
    c_tid = jnp.where(c_valid, c_pair2 >> 1, INT_MAX)
    qlen = jnp.where(c_valid, lens[jnp.where(c_valid, c_qid, 0)], 0) \
        .astype(jnp.int32)
    tlen = jnp.where(c_valid, lens[jnp.where(c_valid, c_tid, 0)], 0) \
        .astype(jnp.int32)

    ar = jnp.arange(A, dtype=jnp.int32)[None, :]
    offs = (ar * c_full[:, None]) // jnp.maximum(c_len[:, None], 1)
    gi = jnp.minimum(c_start[:, None] + offs, N - 1)
    amask = (ar < c_len[:, None]) & c_valid[:, None]
    aq = jnp.where(amask, qpos[gi], INT_MAX)
    at = jnp.where(amask, tposf[gi], INT_MAX)
    minus = (c_pair2 % 2)[:, None] == 1
    at = jnp.where(amask & minus, tlen[:, None] - k - at, at)
    aq, at, amaski = jax.lax.sort(
        (aq, at, amask.astype(jnp.int32)), num_keys=2, is_stable=True,
        dimension=1)
    amask = amaski.astype(jnp.bool_)
    return Candidates(
        qid=c_qid, tid=c_tid,
        strand=jnp.where(c_valid, c_pair2 % 2, 0),
        qlen=qlen, tlen=tlen,
        n_anchors=jnp.where(c_valid, c_n, 0),
        valid=c_valid,
        n_winners=jnp.sum(is_winner.astype(jnp.int32)),
        aq=aq, at=at, amask=amask,
    )
