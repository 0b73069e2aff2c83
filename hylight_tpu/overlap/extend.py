"""Dense diagonal verification of chained overlaps (gather-free extend).

The reference obtains per-base overlap info from minimap2 ``--eqx`` CIGARs
re-parsed in Python (``filter_overlap_slr2.py:289-367`` SNP scan,
``:142-152`` rescoring).  The tile-based extend (rounds 1-4) verified only
inter-anchor gap windows, but its per-link window gathers dominate the
block on TPU: element gathers cost ~7-10 ms per million on v5e while row
gathers and elementwise work are practically free (tools/micro_peak.py).

This implementation verifies every column of the overlap with NO
per-element gathers:

1. fetch BOTH reads' nibble-packed rows with contiguous ROW gathers;
2. strand-adjust the target row in word space (SWAR nibble reverse +
   complement + row flip);
3. split the chain into SEGMENTS = maximal runs of anchors sharing one
   diagonal d = at - aq (inside a run every inter-anchor gap is an
   equal-size substitution gap, so the whole q-span [aq_first,
   aq_last + k) aligns column-for-column at offset d);
4. for each of the first K segments, LEFT-ROLL the adjusted target row by
   its diagonal (3 base-level funnel stages + log2(Wn) word-level pow2
   stages — per-row dynamic rolls are cheap, ~6 ms at [16K, 1024]) and
   compare nibbles SWAR-style: matches, mismatches, and N columns are
   per-word popcounts;
5. columns between segments (the indel gaps), beyond the K-segment
   budget, or in partial edge words of the event map fall back to the
   calibrated estimate: ``unverified`` columns + ``indels = sum |delta
   diag|``, exactly like the tile path's out-of-budget accounting;
6. mismatch EVENTS (for the SNP pileup) compact in two keyed sorts:
   event words (key packs word index + relative diagonal, payloads are
   the q word and a sentinel-masked t word so eligibility reconstructs
   from the words alone), then event columns (payloads pack coords+bases)
   — no take_along gathers anywhere.

Identity estimate (same contract as extend.py):
  id = (m_v + u * m_v / c_v) / (c_v + u + g).

Events beyond the ``event_words`` word budget or in words shared by two
segments are dropped from the EMITTED coordinate set but still counted in
``mm_n`` (the SNP filter can only under-kill — same conservative direction
as the tile path's cap, documented there).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hylight_tpu.overlap.chain import Chains


class Extensions(NamedTuple):
    matches: jax.Array      # int32 [P] verified matching columns
    columns: jax.Array      # int32 [P] verified columns
    unverified: jax.Array   # int32 [P] aligned columns not base-checked
    indels: jax.Array       # int32 [P] |delta diag| summed over anchor links
    identity: jax.Array     # float32 [P] extrapolated identity estimate
    mm_q: jax.Array         # int32 [P, S] mismatch column qpos (fwd coords)
    mm_t: jax.Array         # int32 [P, S] mismatch column tpos (fwd coords)
    mm_qb: jax.Array        # int8 [P, S] query base at the column
    mm_tb: jax.Array        # int8 [P, S] target base at the column
    mm_n: jax.Array         # int32 [P] mismatch count (exact; may exceed S)
    mm_mask: jax.Array      # bool [P, S] emitted-event slots


def extend_kwargs(cfg) -> dict:
    """The OverlapConfig-driven static kwargs of extend_chains, for call
    sites that thread a config through."""
    return dict(k=cfg.k, segments=cfg.verify_segments,
                event_words=cfg.verify_event_words)


_M1 = np.uint32(0x11111111)   # per-nibble lsb
_M3 = np.uint32(0x33333333)
_BIG = np.int32(0x40000000)
_DGR_SPAN = 4096              # |relative diagonal| cap for emitted events


def pack_rows(seqs: jax.Array) -> jax.Array:
    """[N, L] base matrix (0..4+) -> [N, ceil(L/8)] uint32 nibble words,
    base j of row r at bits 4*(j%8) of word j//8; pad nibbles are 4."""
    N, L = seqs.shape
    Wn = (L + 7) // 8
    s = jnp.minimum(seqs, 4).astype(jnp.uint32)
    s = jnp.pad(s, ((0, 0), (0, Wn * 8 - L)), constant_values=4)
    s = s.reshape(N, Wn, 8)
    sh = (jnp.arange(8, dtype=jnp.uint32) * 4)[None, None, :]
    return jnp.sum(s << sh, axis=-1).astype(jnp.uint32)


def _revcomp_rows(x: jax.Array) -> jax.Array:
    """Reverse-complement packed rows in the PADDED frame: output base j is
    the complement of input base (Wn*8-1-j); sentinel nibbles (>=4) kept."""
    # nibble-reverse within each word
    x = ((x & jnp.uint32(0x0F0F0F0F)) << 4) | ((x >> 4) & jnp.uint32(0x0F0F0F0F))
    x = ((x & jnp.uint32(0x00FF00FF)) << 8) | ((x >> 8) & jnp.uint32(0x00FF00FF))
    x = (x << 16) | (x >> 16)
    # complement bases < 4 (b -> b^3), keep sentinels
    m4 = (x >> 2) & _M1                      # lsb set where nibble == 4
    x = x ^ (_M3 & ~(m4 * 15))
    return jnp.flip(x, axis=-1)


def _roll_rows(x: jax.Array, r_bases: jax.Array, Wn: int) -> jax.Array:
    """Per-row circular LEFT roll by r_bases bases: out[j] = in[(j+r) % W8]."""
    r = jnp.remainder(r_bases.astype(jnp.int32), Wn * 8)
    sh = (4 * (r & 7)).astype(jnp.uint32)[:, None]
    nxt = jnp.concatenate([x[:, 1:], x[:, :1]], axis=1)
    hi = jnp.where(sh == 0, jnp.uint32(0),
                   nxt << ((jnp.uint32(32) - sh) & jnp.uint32(31)))
    x = jnp.where(sh == 0, x, (x >> sh) | hi)
    a = (r >> 3)[:, None]
    for bit in range((Wn - 1).bit_length()):
        s = 1 << bit
        if s >= Wn:
            break
        rolled = jnp.concatenate([x[:, s:], x[:, :s]], axis=1)
        x = jnp.where((a & s) != 0, rolled, x)
    return x


def _popcount_lsb(bits: jax.Array) -> jax.Array:
    """Sum of per-nibble-lsb flags of each word ([..., Wn] uint32 -> int32
    per-row totals)."""
    s = bits
    s = s + (s >> 4)
    s = s + (s >> 8)
    s = s + (s >> 16)
    return jnp.sum((s & jnp.uint32(0xF)).astype(jnp.int32), axis=-1)


def _nibble_range_mask(lo: jax.Array, hi: jax.Array, Wn: int) -> jax.Array:
    """[P, Wn] uint32: per-nibble lsb set where column j=8w+n is in
    [lo, hi) (lo/hi are [P] base coords, lo <= hi)."""
    w8 = jnp.arange(Wn, dtype=jnp.int32)[None, :] * 8
    nlo = jnp.clip(lo[:, None] - w8, 0, 8).astype(jnp.uint32)
    nhi = jnp.clip(hi[:, None] - w8, 0, 8).astype(jnp.uint32)
    # bits set where n >= nlo (shift-by-32 guarded via &31 + where)
    mlo = jnp.where(nlo >= 8, jnp.uint32(0), _M1 << ((4 * nlo) & 31))
    mhi = jnp.where(nhi >= 8, jnp.uint32(0), _M1 << ((4 * nhi) & 31))
    return mlo ^ mhi  # nlo <= n < nhi


@functools.partial(jax.jit, static_argnames=(
    "k", "max_mismatch", "segments", "event_words", "toff"))
def extend_chains(ch: Chains, seqs: jax.Array, *, k: int,
                        max_mismatch: int, segments: int = 4,
                        event_words: int = 64,
                        seqs_t: Optional[jax.Array] = None,
                        toff: int = 0) -> Extensions:
    """Dense gather-free verification; same Extensions contract as
    previous rounds.

    Args:
      ch: refined chains.
      seqs: uint8 [Nq, Lq] padded forward base matrix for QUERY rows.
      seqs_t: optional target matrix (row tid - toff); defaults to seqs.
      k: anchor k-mer length.
      max_mismatch: static cap S on emitted mismatch events per pair.
      segments: diagonal-run budget K per chain.
      event_words: word budget E for the mismatch-event map.
    """
    if seqs_t is None:
        seqs_t = seqs
        toff = 0
    P, A = ch.aq.shape
    K, S = segments, max_mismatch

    qpacked = pack_rows(seqs)
    tpacked = qpacked if seqs_t is seqs else pack_rows(seqs_t)
    Wn = max(qpacked.shape[1], tpacked.shape[1])
    if qpacked.shape[1] < Wn:
        qpacked = jnp.pad(qpacked, ((0, 0), (0, Wn - qpacked.shape[1])),
                          constant_values=np.uint32(0x44444444))
    if tpacked.shape[1] < Wn:
        tpacked = jnp.pad(tpacked, ((0, 0), (0, Wn - tpacked.shape[1])),
                          constant_values=np.uint32(0x44444444))
    W8 = Wn * 8
    E = min(event_words, Wn)

    tid_row = jnp.clip(ch.tid - toff, 0, tpacked.shape[0] - 1)
    qrow = qpacked[jnp.clip(ch.qid, 0, qpacked.shape[0] - 1)]  # [P, Wn]
    trow = tpacked[tid_row]
    minus = ch.strand == 1
    # adjusted-frame target rows: base j of t_adj = strand-adjusted coord j,
    # realized lazily: for '-' rows, revcomp in the PADDED frame then fold
    # the (W8 - tlen) offset into each segment's roll amount
    trow = jnp.where(minus[:, None], _revcomp_rows(trow), trow)
    radj = jnp.where(minus, W8 - ch.tlen, 0)

    # ---- segments: maximal runs of anchors on one diagonal --------------
    d = ch.at - ch.aq                                    # [P, A]
    prev_d = jnp.concatenate([d[:, :1] - 1, d[:, :-1]], axis=1)
    runstart = ch.amask & (d != prev_d)
    runstart = runstart.at[:, 0].set(ch.amask[:, 0])
    n_runs = jnp.sum(runstart, axis=1).astype(jnp.int32)
    aidx = jax.lax.broadcasted_iota(jnp.int32, (P, A), 1)
    key = jnp.where(runstart, aidx, _BIG)
    (keyS,) = jax.lax.sort((key,), num_keys=1, dimension=1, is_stable=False)
    sel = jnp.minimum(keyS[:, :K + 1], A - 1)            # [P, K+1]
    sel_ok = keyS[:, :K + 1] < _BIG

    n_anch = jnp.maximum(ch.n_anchors, 1)
    # run m spans anchors [sel[m], end_m] with end_m = next run start - 1
    # (or the last anchor for the final run)
    nxt_start = jnp.where(sel_ok[:, 1:], sel[:, 1:], n_anch[:, None])  # [P, K]
    end = jnp.clip(nxt_start - 1, 0, A - 1)

    take = lambda x, i: jnp.take_along_axis(x, i, axis=1)
    sel_k = sel[:, :K]
    seg_qlo = take(ch.aq, sel_k)                          # [P, K]
    seg_qhi = take(ch.aq, end) + k
    seg_d = take(d, sel_k)
    seg_tlo = take(ch.at, sel_k)
    seg_thi = take(ch.at, end) + k
    used = sel_ok[:, :K] & ch.valid[:, None]

    # indels: total diagonal change over ALL anchor links
    link = ch.amask[:, 1:]
    dd = jnp.abs(d[:, 1:] - d[:, :-1])
    indels = jnp.sum(jnp.where(link, dd, 0), axis=1).astype(jnp.int32)

    # unverified: inter-segment gaps between used segments, plus the whole
    # remaining span when runs exceed the K budget
    gq = seg_qlo[:, 1:] - seg_qhi[:, :-1]                 # [P, K-1]
    gt = seg_tlo[:, 1:] - seg_thi[:, :-1]
    unverified = jnp.sum(jnp.where(
        used[:, 1:], jnp.maximum(jnp.minimum(gq, gt), 0), 0), axis=1)
    overflow = sel_ok[:, K] & ch.valid
    last_hi = jnp.max(jnp.where(used, seg_qhi, 0), axis=1)
    unverified = unverified + jnp.where(
        overflow, jnp.maximum(ch.qe - jnp.minimum(last_hi, ch.qe), 0), 0)

    # ---- per-segment roll + SWAR compare --------------------------------
    matches = jnp.zeros(P, jnp.int32)
    ver_cols = jnp.zeros(P, jnp.int32)
    n_cols = jnp.zeros(P, jnp.int32)
    mm_n = jnp.zeros(P, jnp.int32)
    widx = jax.lax.broadcasted_iota(jnp.int32, (P, Wn), 1)
    evbits = jnp.zeros((P, Wn), jnp.uint32)
    ev_tw = jnp.full((P, Wn), np.uint32(0xFFFFFFFF), jnp.uint32)
    ev_dgr = jnp.zeros((P, Wn), jnp.int32)
    owned = jnp.zeros((P, Wn), bool)
    d0 = seg_d[:, 0]

    vq_all = ~(qrow >> 2) & _M1                           # q nibble < 4
    # inter-segment gap events ("single-indel suffix model", matching the
    # tile path and filter_overlap_slr2's CIGAR walk near indels): within
    # the gap before segment m, columns after the FIRST mismatch on the
    # PREVIOUS diagonal (plus max(gq-gt, 0)) align on segment m's diagonal
    # and their mismatches are emitted as events.  Carried across the loop:
    p_star = jnp.zeros(P, jnp.int32)     # first prefix-diag mm in next gap
    for m in range(K):
        ok_m = used[:, m]
        lo = jnp.where(ok_m, seg_qlo[:, m], 0)
        hi = jnp.where(ok_m, seg_qhi[:, m], 0)
        troll = _roll_rows(trow, seg_d[:, m] + radj, Wn)
        x = qrow ^ troll
        nz = (x | (x >> 1) | (x >> 2) | (x >> 3)) & _M1
        vt = ~(troll >> 2) & _M1
        valid = vq_all & vt
        seg_mask = _nibble_range_mask(lo, hi, Wn)
        match_b = valid & ~nz & seg_mask
        mm_b = valid & nz & seg_mask
        matches = matches + _popcount_lsb(match_b)
        vcols = _popcount_lsb(valid & seg_mask)
        ver_cols = ver_cols + vcols
        n_cols = n_cols + (jnp.where(ok_m, hi - lo, 0) - vcols)

        # suffix events in the PRECEDING gap, on THIS segment's diagonal
        ev_lo = lo
        if m > 0:
            prev_ok = used[:, m - 1] & ok_m
            gq_m = seg_qlo[:, m] - seg_qhi[:, m - 1]
            gt_m = seg_tlo[:, m] - seg_thi[:, m - 1]
            suf_lo = p_star + jnp.maximum(gq_m - gt_m, 0)
            suf_lo = jnp.where(prev_ok, jnp.minimum(suf_lo, lo), lo)
            suf_mask = _nibble_range_mask(suf_lo, lo, Wn)
            mm_suf = valid & nz & suf_mask
            mm_b = mm_b | mm_suf
            ev_lo = suf_lo

        mm_n = mm_n + _popcount_lsb(mm_b)

        # first mismatch on THIS diagonal inside the FOLLOWING gap (becomes
        # p_star for segment m+1's suffix window)
        if m < K - 1:
            nxt_lo = jnp.where(used[:, m + 1], seg_qlo[:, m + 1], hi)
            gap_mask = _nibble_range_mask(hi, nxt_lo, Wn)
            gmm = valid & nz & gap_mask
            smear = gmm
            smear = smear | (smear << 4)
            smear = smear | (smear << 8)
            smear = smear | (smear << 16)
            s = smear
            s = s + (s >> 4); s = s + (s >> 8); s = s + (s >> 16)
            n0 = 8 - (s & jnp.uint32(0xF)).astype(jnp.int32)  # 8 if empty
            wpos = jnp.where(gmm != 0, widx * 8 + n0, _BIG)
            first = jnp.min(wpos, axis=1)
            # default when the prefix diagonal shows no difference:
            # min(gq, gt) into the gap (tile-path p_star fallback)
            gq_n = jnp.where(used[:, m + 1], seg_qlo[:, m + 1], hi) - hi
            gt_n = jnp.where(used[:, m + 1], seg_tlo[:, m + 1],
                             seg_thi[:, m]) - seg_thi[:, m]
            p_star = jnp.where(first < _BIG, first,
                               hi + jnp.maximum(jnp.minimum(gq_n, gt_n), 0))

        # event map: words owned by the FIRST segment touching them (the
        # suffix window extends the touch range into the preceding gap)
        touches = (widx * 8 + 8 > ev_lo[:, None]) & (widx * 8 < hi[:, None]) \
            & ok_m[:, None]
        own_m = touches & ~owned
        owned = owned | touches
        dgr = jnp.clip(seg_d[:, m] - d0, -_DGR_SPAN + 1, _DGR_SPAN - 1)
        in_span = (jnp.abs(seg_d[:, m] - d0) < _DGR_SPAN)[:, None]
        emit = own_m & in_span
        evbits = jnp.where(emit, mm_b, evbits)
        # sentinel-mask ineligible nibbles of the t word so event
        # eligibility reconstructs from (qw, tw) alone after compaction
        tw_m = troll | ~((mm_b) * 15)
        ev_tw = jnp.where(emit, tw_m, ev_tw)
        ev_dgr = jnp.where(emit, dgr[:, None], ev_dgr)

    unverified = unverified + n_cols

    # ---- event compaction 1: first E event words ------------------------
    has_ev = evbits != 0
    wkey = jnp.where(has_ev, widx * (2 * _DGR_SPAN) + ev_dgr + _DGR_SPAN,
                     _BIG)
    qw_i = jax.lax.bitcast_convert_type(qrow, jnp.int32)
    tw_i = jax.lax.bitcast_convert_type(ev_tw, jnp.int32)
    wkeyS, qwS, twS = jax.lax.sort((wkey, qw_i, tw_i), num_keys=1,
                                   dimension=1, is_stable=False)
    w_ok = wkeyS[:, :E] < _BIG
    w_sel = jnp.where(w_ok, wkeyS[:, :E] // (2 * _DGR_SPAN), 0)
    dgr_sel = jnp.where(w_ok, wkeyS[:, :E] % (2 * _DGR_SPAN) - _DGR_SPAN, 0)
    qw_sel = jax.lax.bitcast_convert_type(
        jnp.where(w_ok, qwS[:, :E], 0), jnp.uint32)
    tw_sel = jax.lax.bitcast_convert_type(
        jnp.where(w_ok, twS[:, :E], -1), jnp.uint32)

    # ---- decode event words to columns, compact to [P, S] ---------------
    nib = jnp.arange(8, dtype=jnp.uint32)[None, None, :] * 4
    qb = ((qw_sel[..., None] >> nib) & 15).astype(jnp.int32)   # [P, E, 8]
    tb = ((tw_sel[..., None] >> nib) & 15).astype(jnp.int32)
    is_ev = (qb < 4) & (tb < 4) & (qb != tb)
    qcol = (w_sel[..., None] * 8
            + jnp.arange(8, dtype=jnp.int32)[None, None, :])
    tcol_adj = qcol + (d0[:, None, None] + dgr_sel[..., None])

    M2 = E * 8
    is_ev = is_ev.reshape(P, M2)
    colk = jax.lax.broadcasted_iota(jnp.int32, (P, M2), 1)
    # payloads: p1 = qcol*8 + qb  (qcol < 2^18*8), p2 = tcol_adj*8 + tb
    p1 = (qcol.reshape(P, M2) << 3) | qb.reshape(P, M2)
    p2 = (tcol_adj.reshape(P, M2) << 3) | tb.reshape(P, M2)
    ckey = jnp.where(is_ev, colk, _BIG)
    ckeyS, p1S, p2S = jax.lax.sort((ckey, p1, p2), num_keys=1,
                                   dimension=1, is_stable=False)
    e_ok = ckeyS[:, :S] < _BIG
    mm_q = jnp.where(e_ok, p1S[:, :S] >> 3, -1)
    mm_qb = jnp.where(e_ok, p1S[:, :S] & 7, 4).astype(jnp.int8)
    t_adj = p2S[:, :S] >> 3
    tb_adj = jnp.where(e_ok, p2S[:, :S] & 7, 4).astype(jnp.int8)
    # forward target frame (same convention as extend.py)
    mm_t = jnp.where(e_ok, jnp.where(minus[:, None],
                                     ch.tlen[:, None] - 1 - t_adj, t_adj), -1)
    mm_tb = jnp.where((minus[:, None]) & (tb_adj < 4), 3 - tb_adj, tb_adj)
    mm_mask = e_ok  # exactly the emitted events (word budget may drop some
    #                 counted in mm_n; mask must never cover fill slots)

    m = matches.astype(jnp.float32)
    c = jnp.maximum(ver_cols, 1).astype(jnp.float32)
    u = unverified.astype(jnp.float32)
    g = indels.astype(jnp.float32)
    identity = (m + u * (m / c)) / (c + u + g)
    identity = jnp.where(ch.valid, identity, 0.0)

    return Extensions(matches=matches, columns=ver_cols,
                      unverified=unverified, indels=indels,
                      identity=identity, mm_q=mm_q, mm_t=mm_t,
                      mm_qb=mm_qb, mm_tb=mm_tb, mm_n=mm_n, mm_mask=mm_mask)
