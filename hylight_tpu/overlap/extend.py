"""Anchor-skeleton extension: base-level verification of chained overlaps.

The reference obtains per-base overlap info by having minimap2 produce full
``--eqx`` CIGARs which are then re-parsed in Python (SNP scan
``filter_overlap_slr2.py:289-367``, identity/score rescoring ``:142-152``).
Here the chain's exact k-mer anchors already pin the alignment skeleton, so
base-level work reduces to verifying the short inter-anchor gaps:

- equal-size gaps (dq == dt): pure substitution columns — direct vectorized
  base compare gives matches AND the mismatch coordinates the SNP filter
  needs (no CIGAR text ever exists, per SURVEY.md §7.4);
- unequal gaps (contain indels): verified by a banded LCS-style DP when the
  shift |dq-dt| fits the band (``max_indel_band``) and both gap sides fit
  the gap tile. The DP runs in off-diagonal coordinates: row i holds
  r[off] = best matches aligning q-gap[:i] with t-gap[:i+off]; the
  intra-row left-to-right propagation of the LCS recurrence is exactly a
  cummax over the band axis, so one ``lax.scan`` step is two elementwise
  maxes plus a W-lane cummax — no scatter, no antidiagonal bookkeeping.
  Gaps outside the band budget fall back to the calibrated estimate
  (min(gq, gt) columns unverified, |gq-gt| indel bases);
- anchor k-mers: exact matches by construction (chain score bases).

Identity estimate: verified-match rate extrapolated over unverified columns,
discounted by indel bases:
  id = (m_v + u * m_v / c_v) / (c_v + u + g)
where m_v/c_v = verified matches/columns, u = unverified columns, g = indels.

Mismatch (candidate SNP) events are emitted as [P, S] coordinate pairs in
FORWARD coordinates of both reads — directly consumable by the pileup-based
cross-strain filter (snp.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hylight_tpu.overlap.chain import Chains

INT_MAX = np.int32(0x7FFFFFFF)


class Extensions(NamedTuple):
    matches: jax.Array      # int32 [P] verified matching columns (incl anchors)
    columns: jax.Array      # int32 [P] verified columns
    unverified: jax.Array   # int32 [P] aligned columns not base-checked
    indels: jax.Array       # int32 [P] |dq-dt| summed over links
    identity: jax.Array     # float32 [P] extrapolated identity estimate
    mm_q: jax.Array         # int32 [P, S] mismatch column qpos (fwd coords)
    mm_t: jax.Array         # int32 [P, S] mismatch column tpos (fwd coords)
    mm_qb: jax.Array        # int8 [P, S] query base at the column
    mm_tb: jax.Array        # int8 [P, S] target base at the column
    mm_n: jax.Array         # int32 [P] mismatch count (may exceed S; capped)
    mm_mask: jax.Array      # bool [P, S]


def _gather_q(seqs, qid, pos, in_bounds):
    idx = jnp.clip(pos, 0, seqs.shape[1] - 1)
    return jnp.where(in_bounds, seqs[qid, idx], 4)


def _gather_t(seqs, tid, pos, strand, tlen, in_bounds):
    """Base of target read at strand-adjusted position (4 outside/N)."""
    fwd = jnp.where(strand[..., None] == 1, tlen[..., None] - 1 - pos, pos)
    idx = jnp.clip(fwd, 0, seqs.shape[1] - 1)
    b = seqs[tid, idx]
    b = jnp.where((strand[..., None] == 1) & (b < 4), 3 - b, b)
    return jnp.where(in_bounds & (fwd >= 0) & (fwd < seqs.shape[1]), b, 4)


_NIBBLE_SENTINEL = np.int32(0x44444444)   # 8 packed 'N' bases


def _pack_nibbles(seqs: jax.Array, pad_words: int) -> jax.Array:
    """Pack a [N, L] base matrix (values 0..4+) into int32 nibble words,
    8 bases per word, with ``pad_words`` sentinel words on both sides.

    Elementwise gathers of small elements are the overlap block's dominant
    cost on TPU (~160 ms per 8.4M u8 gather at bench scale); gap windows
    are CONTIGUOUS spans, so fetching whole nibble words cuts the gather
    count 8x and the rest is VPU shifts."""
    N, L = seqs.shape
    Wn = (L + 7) // 8
    s = jnp.minimum(seqs, 4).astype(jnp.int32)
    s = jnp.pad(s, ((0, 0), (0, Wn * 8 - L)), constant_values=4)
    s = s.reshape(N, Wn, 8)
    sh = (jnp.arange(8, dtype=jnp.int32) * 4)[None, None, :]
    packed = jnp.sum(s << sh, axis=-1).astype(jnp.int32)
    return jnp.pad(packed, ((0, 0), (pad_words, pad_words)),
                   constant_values=_NIBBLE_SENTINEL)


def _extract_windows(packed: jax.Array, rid: jax.Array, start: jax.Array,
                     G: int, pad_bases: int) -> jax.Array:
    """[*, G] int32 base values (0..4) at forward columns start..start+G-1.

    ``packed`` is a _pack_nibbles matrix whose column 0 is base index
    ``-pad_bases``; ``start`` may be negative down to -pad_bases and large
    up to L + pad_bases - G."""
    W = ((G + 6) >> 3) + 1
    s = start + pad_bases
    w0 = s >> 3
    off = s & 7
    widx = jnp.arange(W, dtype=jnp.int32)
    words = packed[rid[..., None], w0[..., None] + widx]      # [..., W]
    j = jnp.arange(G, dtype=jnp.int32)
    t = off[..., None] + j                                     # [..., G]
    wsel = t >> 3
    val = jnp.zeros(t.shape, jnp.int32)
    for w in range(W):
        val = val | jnp.where(wsel == w, words[..., w][..., None], 0)
    return (val >> ((t & 7) * 4)) & 15


def _gap_windows(qpacked, tpacked, qid, tid_row, strand, tlen, aq_s, at_s, *,
                 k: int, G: int, pad_bases: int):
    """Fetch the [P, AG, G] query/target gap windows from nibble-packed
    matrices. Query columns q0 = aq_s + k + j ascend in the read; the
    target's strand-adjusted columns map to a contiguous forward span too
    (reversed for '-' rows), so one extraction + flip + complement serves
    both strands."""
    q_all = _extract_windows(qpacked, qid[:, None], aq_s + k, G, pad_bases)

    t0 = at_s + k                                    # adjusted-frame start
    minus = strand[:, None] == 1
    fwd_start = jnp.where(minus, tlen[:, None] - G - t0, t0)
    t_raw = _extract_windows(tpacked, tid_row[:, None], fwd_start, G,
                             pad_bases)
    t_rev = jnp.flip(t_raw, axis=-1)
    t_rev = jnp.where(t_rev < 4, 3 - t_rev, t_rev)
    return q_all, jnp.where(minus[..., None], t_rev, t_raw)


def _banded_gap_matches(qgap: jax.Array, tgap: jax.Array, dmax: int
                        ) -> jax.Array:
    """Max matches (banded LCS) between per-link gap strings.

    Args:
      qgap: uint8 [..., G] query-gap bases, sentinel-padded (>=4) past the
        real length.
      tgap: uint8 [..., G] target-gap bases, sentinel-padded with a
        DIFFERENT sentinel so padding never matches.
      dmax: band half-width (covers indel shifts |gq-gt| <= dmax).

    Returns int32 [...] match count of the best banded alignment. Both
    strings being padded to the same length G makes the answer land in the
    centre lane: LCS(q_pad, t_pad) = LCS(q, t) since sentinels match
    nothing and LCS charges nothing for indels.
    """
    G = qgap.shape[-1]
    W = 2 * dmax + 1
    NEG = jnp.int32(-(1 << 28))
    lead = qgap.shape[:-1]

    # pad t so a [W]-window gather at j = i-1+off is always in range
    tpad = jnp.pad(tgap, [(0, 0)] * (len(lead)) + [(dmax, dmax + 1)],
                   constant_values=255)
    offs = jnp.arange(W, dtype=jnp.int32) - dmax      # off in [-dmax, dmax]

    # r0[off] = 0 for off >= 0 (empty query vs t-prefix), else invalid
    r0 = jnp.where(offs >= 0, 0, NEG)
    r0 = jnp.broadcast_to(r0, lead + (W,)).astype(jnp.int32)

    def step(r, i):
        # i is 1-based row index; a_i = qgap[i-1], b at j = (i-1) + off
        a_i = jax.lax.dynamic_slice_in_dim(qgap, i - 1, 1, axis=-1)
        b_w = jax.lax.dynamic_slice_in_dim(tpad, i - 1, W, axis=-1)
        eq = ((a_i == b_w) & (a_i < 4) & (b_w < 4)).astype(jnp.int32)
        # m[i-1, j]: same j means off+1 in row i's coordinates
        up = jnp.concatenate([r[..., 1:],
                              jnp.full(lead + (1,), NEG, jnp.int32)], -1)
        base = jnp.maximum(r + eq, up)
        # j = i + off must be >= 0
        valid = (jnp.int32(i) + offs) >= 0
        base = jnp.where(valid, base, NEG)
        # m[i, j-1] propagation == cummax along the band axis
        r_new = jax.lax.cummax(base, axis=base.ndim - 1)
        return r_new, None

    rG, _ = jax.lax.scan(step, r0, jnp.arange(1, G + 1, dtype=jnp.int32))
    return jnp.maximum(rG[..., dmax], 0)


def _verify_eq_tier(qpacked, tpacked, ch, tid_row, aq_s, at_s, gap_s, ok_s,
                    *, k: int, G: int, pad_bases: int):
    """Window-gather + direct compare for ONE tier of EQUAL-gap links.

    Equal gaps (dq == dt) are pure substitution columns: no DP, no suffix
    machinery — just fetch both windows and compare. Inputs are [P, AG]-
    compacted link arrays; returns (matches_add, ver_cols_add, n_cols,
    mm event tuple).
    """
    P = aq_s.shape[0]
    j = jnp.arange(G, dtype=jnp.int32)[None, None, :]
    incol = (j < jnp.minimum(gap_s, G)[..., None]) & ok_s[..., None]
    q_raw, t_raw = _gap_windows(qpacked, tpacked, ch.qid, tid_row,
                                ch.strand, ch.tlen, aq_s, at_s,
                                k=k, G=G, pad_bases=pad_bases)
    qb = jnp.where(incol, q_raw, 4)
    tb = jnp.where(incol, t_raw, 4)

    both_acgt = (qb < 4) & (tb < 4) & incol
    eq = both_acgt & (qb == tb)
    mm = both_acgt & (qb != tb)

    ver_cols = jnp.sum(both_acgt, axis=(1, 2)).astype(jnp.int32)
    matches = jnp.sum(eq, axis=(1, 2)).astype(jnp.int32)
    n_cols = jnp.sum(incol & ~both_acgt, axis=(1, 2)).astype(jnp.int32)
    q0 = (aq_s + k)[..., None] + j
    t0 = (at_s + k)[..., None] + j
    return matches, ver_cols, n_cols, (
        mm.reshape(P, -1), q0.reshape(P, -1), t0.reshape(P, -1),
        qb.reshape(P, -1), tb.reshape(P, -1))


def _verify_indel_tier(qpacked, tpacked, ch, tid_row, aq_s, at_s,
                       gq_s, gt_s, ver_s, *, k: int, G: int,
                       pad_bases: int, max_indel_band: int):
    """Banded LCS DP + single-indel suffix mismatch scan for INDEL links.

    Only links with dq != dt reach this tier, so the DP scan runs over the
    (small) indel link budget instead of every selected link — equal-gap
    verification never pays for the scan (round-4 split; previously both
    tiers ran the DP over their full width).
    """
    P = aq_s.shape[0]
    j = jnp.arange(G, dtype=jnp.int32)[None, None, :]
    inq = (j < gq_s[..., None]) & ver_s[..., None]
    int_ = (j < gt_s[..., None]) & ver_s[..., None]
    q_raw, t_raw = _gap_windows(qpacked, tpacked, ch.qid, tid_row,
                                ch.strand, ch.tlen, aq_s, at_s,
                                k=k, G=G, pad_bases=pad_bases)
    qgap = jnp.where(inq, q_raw, 4)
    tgap = jnp.where(int_, t_raw, 4)

    band = min(max_indel_band, G)
    m_u = _banded_gap_matches(qgap, tgap, band)        # [P, AG]
    matches = jnp.sum(jnp.where(ver_s, m_u, 0), axis=1).astype(jnp.int32)
    ver_cols = jnp.sum(
        jnp.where(ver_s, jnp.minimum(gq_s, gt_s), 0), axis=1
    ).astype(jnp.int32)

    # single-indel suffix model: see extend_chains docstring
    delta = (gq_s - gt_s)[..., None]
    scan_m = (j < jnp.minimum(gq_s, gt_s)[..., None])
    both_g = (qgap < 4) & (tgap < 4)
    difm = (qgap != tgap) & both_g & scan_m
    has_d = jnp.any(difm, axis=-1)
    p_star = jnp.where(has_d, jnp.argmax(difm, axis=-1),
                       jnp.minimum(gq_s, gt_s)).astype(jnp.int32)
    jt = j - delta
    t0s = at_s + k - (gq_s - gt_s)
    minus2 = ch.strand[:, None] == 1
    fwd_start2 = jnp.where(minus2, ch.tlen[:, None] - G - t0s, t0s)
    tb2_raw = _extract_windows(tpacked, tid_row[:, None], fwd_start2,
                               G, pad_bases)
    tb2_rev = jnp.flip(tb2_raw, axis=-1)
    tb2_rev = jnp.where(tb2_rev < 4, 3 - tb2_rev, tb2_rev)
    tb2 = jnp.where(minus2[..., None], tb2_rev, tb2_raw)
    suff = ver_s[..., None] & \
        (j >= (p_star[..., None] + jnp.maximum(delta, 0))) & \
        (j < gq_s[..., None]) & (jt >= 0) & (jt < gt_s[..., None])
    mm2 = suff & (qgap < 4) & (tb2 < 4) & (qgap != tb2)
    q0 = (aq_s + k)[..., None] + j
    t0_suffix = (at_s + k)[..., None] + j - delta
    return matches, ver_cols, jnp.zeros_like(matches), (
        mm2.reshape(P, -1), q0.reshape(P, -1), t0_suffix.reshape(P, -1),
        qgap.reshape(P, -1), tb2.reshape(P, -1))


def extend_kwargs(cfg) -> dict:
    """The OverlapConfig-driven static kwargs of extend_chains (tier
    budgets + tile sizes), for call sites that thread a config through."""
    return dict(k=cfg.k, gap_tile=cfg.gap_tile,
                max_indel_band=cfg.max_indel_band,
                gap_tile_small=cfg.gap_tile_small,
                links_eq_small=cfg.gap_links_eq_small,
                links_eq_large=cfg.gap_links_eq_large,
                links_indel=cfg.gap_links_indel)


@functools.partial(jax.jit, static_argnames=("k", "gap_tile", "max_mismatch",
                                              "max_indel_band",
                                              "gap_tile_small",
                                              "links_eq_small",
                                              "links_eq_large",
                                              "links_indel"))
def extend_chains(ch: Chains, seqs: jax.Array, *, k: int, gap_tile: int,
                  max_mismatch: int, max_indel_band: int = 8,
                  gap_tile_small: int = 8, links_eq_small: int = 64,
                  links_eq_large: int = 16, links_indel: int = 16,
                  seqs_t: Optional[jax.Array] = None,
                  toff=0) -> Extensions:
    """Verify inter-anchor gaps of every chained pair.

    Args:
      ch: refined chains (anchors compacted to row prefixes).
      seqs: uint8 [Nq, Lq] padded forward base matrix for QUERY rows
        (indexed by qid). When seqs_t is None it also serves the targets.
      seqs_t: optional uint8 [Nt, Lt] padded matrix for TARGET rows —
        queries and targets may use different length buckets so a
        150 bp short-read query set is never padded to a 100 kb contig
        bucket (row tid - toff indexes seqs_t).
      toff: global id of seqs_t's row 0.
      k: anchor k-mer length.
      gap_tile: max columns verified per gap (G).
      max_mismatch: static cap S on emitted mismatch events per pair.
    """
    if seqs_t is None:
        seqs_t = seqs
        toff = 0
    tid_row = jnp.clip(ch.tid - toff, 0, seqs_t.shape[0] - 1)
    P, A = ch.aq.shape
    G, S = gap_tile, max_mismatch

    dq = ch.aq[:, 1:] - ch.aq[:, :-1]             # [P, A-1]
    dt = ch.at[:, 1:] - ch.at[:, :-1]
    link = ch.amask[:, 1:]
    equal = link & (dq == dt) & (dq > k)
    gap = jnp.where(equal, dq - k, 0)             # equal-gap length
    uneq = link & (dq != dt)
    gq, gt = dq - k, dt - k                        # per-side gap lengths
    shift = jnp.abs(dq - dt)
    if max_indel_band > 0:
        ver_u = uneq & (gq >= 0) & (gt >= 0) & (gq <= G) & (gt <= G) & \
            (shift <= max_indel_band)
    else:
        ver_u = jnp.zeros_like(uneq)
    est_u = uneq & ~ver_u                          # fall back to estimate
    unverified = jnp.sum(jnp.where(est_u, jnp.minimum(dq, dt) - jnp.minimum(
        jnp.minimum(dq, dt), k), 0), axis=1) \
        + jnp.sum(jnp.maximum(gap - G, 0), axis=1)
    indels = jnp.sum(jnp.where(uneq, jnp.abs(dq - dt), 0), axis=1)

    # Compact the links that actually need base work to a short prefix:
    # minimizer anchors sit ~(w+1)/2 bp apart, so with k-mer anchors most
    # links have NO gap at all (dq <= k) and a dense [P, A-1, G] gather
    # wastes >4x HBM traffic (measured 411 ms -> the dominant block cost).
    # THREE TIERS (round 4; budgets are config-driven via OverlapConfig):
    # equal gaps are overwhelmingly 1-5 bp (single error shadows), so most
    # of the equal budget goes to a small tile (Gs bases) and a few slots
    # carry the full gap_tile; indel links get their OWN tier so the
    # banded-DP scan only ever runs over links_indel slots — equal-gap
    # verification never pays for the scan. Links beyond the budgets fall
    # back to the estimate (counted as unverified below).
    Gs = min(gap_tile_small, G)
    need_es = equal & (gap > 0) & (gap <= Gs)
    need_el = equal & (gap > Gs)
    need_i = ver_u
    AGes = min(A - 1, max(8, links_eq_small))
    AGel = min(A - 1, max(4, links_eq_large))
    AGi = min(A - 1, max(4, links_indel))
    colL = jax.lax.broadcasted_iota(jnp.int32, (P, A - 1), 1)

    def _select(need, AG):
        # earliest needy links first: a 1-operand row sort of (col or BIG)
        # + static slice beats top_k on TPU (top_k at [P, A] costs ~10x
        # the sort; see CLAUDE.md micro facts), and the payload gathers
        # happen at the compacted [P, AG] width
        keyL = jnp.where(need, colL, jnp.int32(1 << 30))
        (keyS,) = jax.lax.sort((keyL,), num_keys=1, dimension=1,
                               is_stable=False)
        selL = jnp.minimum(keyS[:, :AG], A - 2)
        sel_okL = keyS[:, :AG] < jnp.int32(1 << 30)

        def _take(x, fill):
            v = jnp.take_along_axis(x, selL, axis=1)
            return jnp.where(sel_okL, v, jnp.asarray(fill, v.dtype))

        return (_take(ch.aq[:, :-1], 0), _take(ch.at[:, :-1], 0),
                _take(gap, 0), _take(gq, 0), _take(gt, 0), sel_okL)

    sel_es = _select(need_es, AGes)
    sel_el = _select(need_el, AGel)
    sel_i = _select(need_i, AGi) if max_indel_band > 0 else None

    # budget-overflow accounting: verification that didn't happen becomes
    # unverified columns (identity stays calibrated, never inflated)
    tot_eq = jnp.sum(jnp.where(equal, jnp.minimum(gap, G), 0), axis=1)
    tot_uv = jnp.sum(jnp.where(ver_u, jnp.minimum(gq, gt), 0), axis=1)
    sel_eq = (jnp.sum(jnp.where(sel_es[5], jnp.minimum(sel_es[2], Gs), 0),
                      axis=1)
              + jnp.sum(jnp.where(sel_el[5], jnp.minimum(sel_el[2], G), 0),
                        axis=1))
    sel_uv = jnp.sum(jnp.where(sel_i[5], jnp.minimum(sel_i[3], sel_i[4]), 0),
                     axis=1) if sel_i is not None else jnp.int32(0)
    unverified = unverified + (tot_eq - sel_eq) + (tot_uv - sel_uv)

    pad_bases = ((G + k) // 8 + 2) * 8
    pad_words = pad_bases // 8
    qpacked = _pack_nibbles(seqs, pad_words)
    tpacked = qpacked if seqs_t is seqs else _pack_nibbles(seqs_t, pad_words)

    matches = ch.score
    ver_cols = ch.score
    mm_parts = []
    for (aq_s, at_s, gap_s, gq_s, gt_s, ok_s), Gt in (
            (sel_es, Gs), (sel_el, G)):
        m_add, vc_add, n_cols_t, mm_t = _verify_eq_tier(
            qpacked, tpacked, ch, tid_row, aq_s, at_s, gap_s, ok_s,
            k=k, G=Gt, pad_bases=pad_bases)
        matches = matches + m_add
        ver_cols = ver_cols + vc_add
        # N columns inside equal gaps are neither matched nor mismatched:
        # fold them into unverified
        unverified = unverified + n_cols_t
        mm_parts.append(mm_t)
    if sel_i is not None:
        aq_s, at_s, _, gq_s, gt_s, ok_s = sel_i
        m_add, vc_add, _, mm_t = _verify_indel_tier(
            qpacked, tpacked, ch, tid_row, aq_s, at_s, gq_s, gt_s, ok_s,
            k=k, G=G, pad_bases=pad_bases, max_indel_band=max_indel_band)
        matches = matches + m_add
        ver_cols = ver_cols + vc_add
        mm_parts.append(mm_t)

    m = matches.astype(jnp.float32)
    c = jnp.maximum(ver_cols, 1).astype(jnp.float32)
    u = unverified.astype(jnp.float32)
    g = indels.astype(jnp.float32)
    identity = (m + u * (m / c)) / (c + u + g)
    identity = jnp.where(ch.valid, identity, 0.0)

    # compact mismatch events to [P, S]; emit forward coordinates. All
    # tiers' events concatenate along the flattened column axis
    # (coordinates travel with each event). Compaction is a 1-operand row
    # sort of (col or BIG) + static slice + payload gathers at [P, S]
    # (row-wise scatters serialize badly on TPU, and top_k costs ~4x the
    # sort at this width; reconstructing coordinates after compaction was
    # measured SLOWER than carrying the payload arrays — see BASELINE.md).
    mmf = jnp.concatenate([t[0] for t in mm_parts], axis=1)
    qpos_f = jnp.concatenate([t[1] for t in mm_parts], axis=1)
    tpos_adj = jnp.concatenate([t[2] for t in mm_parts], axis=1)
    tpos_fwd = jnp.where(ch.strand[:, None] == 1,
                         ch.tlen[:, None] - 1 - tpos_adj, tpos_adj)
    qb_f = jnp.concatenate([t[3] for t in mm_parts], axis=1)
    tb_f = jnp.concatenate([t[4] for t in mm_parts], axis=1)
    # base pair in forward target frame: complement if '-' strand
    tb_fwd = jnp.where((ch.strand[:, None] == 1) & (tb_f < 4), 3 - tb_f, tb_f)

    M = mmf.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (P, M), 1)
    key = jnp.where(mmf, col, jnp.int32(1 << 30))
    (keyS2,) = jax.lax.sort((key,), num_keys=1, dimension=1,
                            is_stable=False)
    sel_ok = keyS2[:, :S] < jnp.int32(1 << 30)   # earliest columns first
    topi = jnp.minimum(keyS2[:, :S], M - 1)
    prow = jax.lax.broadcasted_iota(jnp.int32, (P, S), 0)

    def compact(x, fill, dtype):
        return jnp.where(sel_ok, x[prow, topi].astype(dtype),
                         jnp.asarray(fill, dtype))

    mm_q = compact(qpos_f, -1, jnp.int32)
    mm_t = compact(tpos_fwd, -1, jnp.int32)
    mm_qb = compact(qb_f, 4, jnp.int8)
    mm_tb = compact(tb_fwd, 4, jnp.int8)
    mm_n = jnp.sum(mmf, axis=1).astype(jnp.int32)
    mm_mask = jax.lax.broadcasted_iota(jnp.int32, (P, S), 1) < \
        jnp.minimum(mm_n, S)[:, None]

    return Extensions(matches=matches, columns=ver_cols,
                      unverified=unverified, indels=indels,
                      identity=identity, mm_q=mm_q, mm_t=mm_t,
                      mm_qb=mm_qb, mm_tb=mm_tb, mm_n=mm_n, mm_mask=mm_mask)
