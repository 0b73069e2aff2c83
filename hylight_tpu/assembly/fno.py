"""Induced-overlap projection — the FindNextOverlaps (FNO1) capability.

The reference derives the next iteration's overlap candidates from the
CURRENT graph instead of re-aligning from scratch: every surviving edge
(u, v) is projected onto the superreads that absorbed u and v using each
member's stored placement (clique index minus trimmed prefix), producing
exact new offsets (``FindNextOverlaps.cpp:25-330``: ``updateOverlap`` +
``computeOverlapData``; new_pos1 = (pos1 + idx1) - idx2). Nonedge
(sub-threshold) overlaps are reconsidered the same way
(``reconsiderNonedgeOverlaps`` ``:635``) and pairs lost to inclusion
removal are rescued (``findInclusionOverlaps`` ``:816``). FNO is the ONLY
overlap source for the reference's stage-b loop (``pipeline_per_stage.py``
passes ``--FNO=1`` and never re-runs minimap2), while polyte additionally
re-aligns each iteration (``polyte.tune_params.py:748-755``).

TPU-native formulation: the projection is pure integer index arithmetic —
a numpy join of the old overlap table against the member-placement lists —
and the base-level truth of every projected pair is re-established by ONE
vectorized window compare over the new read matrix (``verify_pairs``), so
the downstream Bayesian scoring sees real match/mismatch counts rather
than trusting projected percentages (the reference rescores projected
overlaps the same way inside EdgeCalculator on the next iteration).

Orientation bookkeeping: an old edge lives in the iteration's plus frame
(every read flipped to its label); a member sits inside its superread
either aligned with that frame (flip == label) or opposite (trivial rows
are emitted UNFLIPPED, so a label-1 trivial row is anti-aligned). Aligned/
aligned and anti/anti memberships project to '+' pairs, mixed ones to '-'
pairs; shifts follow from composing the coordinate maps (see
``project_pairs``).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from hylight_tpu.io.readset import ReadSet
from hylight_tpu.overlap.table import OverlapTable


class Projection:
    """Candidate pairs for the next iteration's read set (new-row ids)."""

    __slots__ = ("qid", "tid", "shift", "strand")

    def __init__(self, qid, tid, shift, strand):
        self.qid = np.asarray(qid, dtype=np.int64)
        self.tid = np.asarray(tid, dtype=np.int64)
        self.shift = np.asarray(shift, dtype=np.int64)
        self.strand = np.asarray(strand, dtype=np.int8)

    @property
    def n(self) -> int:
        return len(self.qid)


def project_pairs(table: OverlapTable, labels: np.ndarray,
                  placements: Sequence[Sequence[Tuple[int, int, int]]],
                  new_lens: np.ndarray, *,
                  max_pairs: int = 500_000) -> Projection:
    """Project old overlaps onto the new read set.

    Args:
      table: the old iteration's FULL overlap table (admitted and
        sub-threshold rows alike — the nonedge reconsideration role).
      labels: int8 [n_old] orientation labels the iteration used.
      placements: for each NEW row, list of (old_row, offset, flip) member
        placements — offset is where flip^flip(old row) starts inside the
        new row (trivial rows are [(r, 0, 0)]).
      new_lens: int64 [n_new] new row lengths.

    Returns candidate pairs (qid < tid... not guaranteed; qid != tid) with
    ``shift`` = start of tid's row (or its revcomp for strand 1) in qid's
    coordinates.
    """
    n_old = len(labels)
    # invert placements: old row -> arrays of (new_sid, offset, flip)
    o_rows: List[int] = []
    o_sid: List[int] = []
    o_off: List[int] = []
    o_flip: List[int] = []
    for sid, mems in enumerate(placements):
        for (r, off, fl) in mems:
            o_rows.append(r)
            o_sid.append(sid)
            o_off.append(off)
            o_flip.append(fl)
    if not o_rows or table.n == 0:
        return Projection([], [], [], [])
    o_rows = np.asarray(o_rows, dtype=np.int64)
    o_sid = np.asarray(o_sid, dtype=np.int64)
    o_off = np.asarray(o_off, dtype=np.int64)
    o_flip = np.asarray(o_flip, dtype=np.int64)
    order = np.argsort(o_rows, kind="stable")
    o_rows, o_sid, o_off, o_flip = (o_rows[order], o_sid[order],
                                    o_off[order], o_flip[order])
    start = np.searchsorted(o_rows, np.arange(n_old + 1))
    cnt = np.diff(start)

    # plus-frame offset of v relative to u per old edge
    lq = labels[table.qid].astype(np.int64)
    lt = labels[table.tid].astype(np.int64)
    qs = np.where(lq == 1, table.qlen - table.qe, table.qs).astype(np.int64)
    ts = np.where(lt == 1, table.tlen - table.te, table.ts).astype(np.int64)
    d_uv = qs - ts

    # expand edges x memberships(u) x memberships(v)
    cu = cnt[table.qid]
    cv = cnt[table.tid]
    fan = cu * cv
    total = int(fan.sum())
    if total == 0:
        return Projection([], [], [], [])
    if total > max_pairs:
        # prefer admitted/high-score edges first under the cap
        order_e = np.argsort(-table.score, kind="stable")
        csum = np.cumsum(fan[order_e])
        keep_e = order_e[csum <= max_pairs]
        sel = np.zeros(table.n, dtype=bool)
        sel[keep_e] = True
    else:
        sel = np.ones(table.n, dtype=bool)

    e_idx = np.nonzero(sel & (fan > 0))[0]
    # flat cartesian expansion per edge
    reps = fan[e_idx]
    e_flat = np.repeat(e_idx, reps)
    # within-edge rank 0..fan-1
    offs_in_e = np.arange(len(e_flat)) - np.repeat(
        np.concatenate([[0], np.cumsum(reps)[:-1]]), reps)
    cv_f = cv[e_flat]
    iu = offs_in_e // np.maximum(cv_f, 1)
    iv = offs_in_e - iu * cv_f
    u = table.qid[e_flat].astype(np.int64)
    v = table.tid[e_flat].astype(np.int64)
    mu = start[u] + iu
    mv = start[v] + iv

    s1, p1, f1 = o_sid[mu], o_off[mu], o_flip[mu]
    s2, p2, f2 = o_sid[mv], o_off[mv], o_flip[mv]
    lu = lq[e_flat]
    lv = lt[e_flat]
    len_u = table.qlen[e_flat].astype(np.int64)
    len_v = table.tlen[e_flat].astype(np.int64)
    d = d_uv[e_flat]
    a1 = f1 == lu          # u aligned with the edge's plus frame inside s1
    a2 = f2 == lv
    L2 = new_lens[s2]

    strand = (a1 != a2).astype(np.int8)
    # '+' cases
    sh_pp = p1 + d - p2                                   # aligned/aligned
    sh_aa = p1 - p2 - d + len_u - len_v                   # anti/anti
    # '-' cases (t compared as revcomp of s2)
    sh_pm = d + p1 + p2 + len_v - L2                      # u aligned, v anti
    sh_mp = p1 + len_u - L2 - d + p2                      # u anti, v aligned
    shift = np.where(a1 & a2, sh_pp,
                     np.where(~a1 & ~a2, sh_aa,
                              np.where(a1, sh_pm, sh_mp)))
    ok = s1 != s2
    qid, tid, shift, strand = s1[ok], s2[ok], shift[ok], strand[ok]
    # normalize to qid < tid (strand-symmetric: swapping reads of a '+'
    # pair negates the shift; for '-' pairs the shift maps to the twin via
    # the length identity below)
    swap = qid > tid
    lenq = new_lens[qid]
    lent = new_lens[tid]
    n_shift = np.where(swap,
                       np.where(strand == 1, lent - lenq + shift, -shift),
                       shift)
    n_qid = np.where(swap, tid, qid)
    n_tid = np.where(swap, qid, tid)
    # dedup (pair, shift, strand)
    key = np.stack([n_qid, n_tid, n_shift, strand.astype(np.int64)], axis=1)
    _, first = np.unique(key, axis=0, return_index=True)
    first.sort()
    return Projection(n_qid[first], n_tid[first], n_shift[first],
                      strand[first])


def project_shared_subreads(subreads: Sequence[Sequence[Tuple[int, int,
                                                              int]]],
                            new_lens: np.ndarray,
                            orig_lens: Optional[np.ndarray], *,
                            max_group: int = 64,
                            max_pairs: int = 500_000) -> Projection:
    """FNO3: induced overlaps from superreads sharing an ORIGINAL subread.

    The reference's alternative projection (``FindNextOverlaps3.cpp:20-173``)
    skips the edge table entirely: it maps each original read to the
    superreads containing it and deduces one overlap per superread pair
    from the two stored subread indices (``deduceOverlap``: pos = idx1 -
    idx2). Here that is a numpy groupby over the flattened (orig, row,
    offset, ori) placement table; mixed-orientation placements induce '-'
    pairs (shift composed through the revcomp frame, needs orig_lens).

    Deliberate deviation: the reference keeps only the FIRST shared
    original per superread pair (``overlaps_found`` set); we emit every
    distinct (pair, shift, strand) candidate — strictly more thorough, and
    the downstream base-level verify + best-per-pair dedup keeps one.

    Args:
      subreads: per new row, list of (orig_id, offset_in_row, ori).
      new_lens: int64 [n_new] row lengths.
      orig_lens: int64 lengths of original reads (None: '-' candidates
        from mixed-orientation placements are skipped).
      max_group: originals shared by more than this many rows are skipped
        (repeat guard; the d-loop pairs rows at rank distance <= max_group).
    """
    o_orig: List[int] = []
    o_sid: List[int] = []
    o_off: List[int] = []
    o_ori: List[int] = []
    for sid, mems in enumerate(subreads):
        for (orig, off, ori) in mems:
            o_orig.append(orig)
            o_sid.append(sid)
            o_off.append(off)
            o_ori.append(ori)
    if not o_orig:
        return Projection([], [], [], [])
    o_orig = np.asarray(o_orig, dtype=np.int64)
    o_sid = np.asarray(o_sid, dtype=np.int64)
    o_off = np.asarray(o_off, dtype=np.int64)
    o_ori = np.asarray(o_ori, dtype=np.int64)
    order = np.lexsort((o_sid, o_orig))
    o_orig, o_sid, o_off, o_ori = (o_orig[order], o_sid[order],
                                   o_off[order], o_ori[order])
    n = len(o_orig)
    new_lens = np.asarray(new_lens, dtype=np.int64)

    qs, ts, sh, st = [], [], [], []
    total = 0
    for d in range(1, max_group + 1):
        if d >= n:
            break
        same = o_orig[:-d] == o_orig[d:]
        if not same.any():
            break
        i = np.nonzero(same)[0]
        j = i + d
        s1, s2 = o_sid[i], o_sid[j]
        ok = s1 != s2
        i, j, s1, s2 = i[ok], j[ok], s1[ok], s2[ok]
        if len(i) == 0:
            continue
        off1, off2 = o_off[i], o_off[j]
        ori1, ori2 = o_ori[i], o_ori[j]
        plus = ori1 == ori2
        shift_p = off1 - off2
        if orig_lens is not None:
            lo = np.asarray(orig_lens, dtype=np.int64)[
                np.minimum(o_orig[i], len(orig_lens) - 1)]
            shift_m = off1 - (new_lens[s2] - off2 - lo)
            keep = np.ones(len(i), dtype=bool)
        else:
            shift_m = shift_p            # unused
            keep = plus
        qs.append(s1[keep])
        ts.append(s2[keep])
        sh.append(np.where(plus, shift_p, shift_m)[keep])
        st.append((~plus[keep]).astype(np.int8))
        total += int(keep.sum())
        if total > max_pairs:
            break
    if not qs:
        return Projection([], [], [], [])
    qid = np.concatenate(qs)
    tid = np.concatenate(ts)
    shift = np.concatenate(sh)
    strand = np.concatenate(st)
    # normalize to qid < tid (same identities as project_pairs)
    swap = qid > tid
    lenq = new_lens[qid]
    lent = new_lens[tid]
    n_shift = np.where(swap,
                       np.where(strand == 1, lent - lenq + shift, -shift),
                       shift)
    n_qid = np.where(swap, tid, qid)
    n_tid = np.where(swap, qid, tid)
    key = np.stack([n_qid, n_tid, n_shift, strand.astype(np.int64)], axis=1)
    _, first = np.unique(key, axis=0, return_index=True)
    first.sort()
    return Projection(n_qid[first], n_tid[first], n_shift[first],
                      strand[first])


def verify_pairs(reads: ReadSet, proj: Projection, *,
                 snp_cap: int = 64,
                 min_span: int = 1) -> OverlapTable:
    """Base-level verification of projected pairs -> OverlapTable.

    One vectorized compare over [P, W] windows (W = longest overlap span,
    padded): matches / columns / identity / the three PAF scores
    (``filter_overlap_slr2.py:142-152`` conventions, exact here since every
    column is compared) and capped mismatch events for the SNP filter.
    """
    if proj.n == 0:
        return _empty(snp_cap)
    lens = reads.lengths.astype(np.int64)
    qlen = lens[proj.qid]
    tlen = lens[proj.tid]
    # overlap span in q coords: t (or revcomp t) occupies [shift, shift+tlen)
    lo = np.maximum(proj.shift, 0)
    hi = np.minimum(qlen, proj.shift + tlen)
    span = hi - lo
    keep = span >= max(min_span, 1)
    if not keep.any():
        return _empty(snp_cap)
    qid = proj.qid[keep]
    tid = proj.tid[keep]
    shift = proj.shift[keep]
    strand = proj.strand[keep]
    lo, hi, span = lo[keep], hi[keep], span[keep]
    qlen, tlen = qlen[keep], tlen[keep]

    P = len(qid)
    W = int(span.max())
    seqs, _ = reads.to_padded(max_len=int(lens.max()))  # uint8 [n, L], pad=4
    Lpad = seqs.shape[1]                   # to_padded rounds width up
    rc = np.where(seqs < 4, 3 - seqs, seqs)[:, ::-1]  # revcomp rows
    # column j of the window = q position lo + j
    j = np.arange(W, dtype=np.int64)[None, :]
    qpos = lo[:, None] + j
    inw = j < span[:, None]
    qb = seqs[qid[:, None], np.minimum(qpos, qlen[:, None] - 1)]
    # t-side position in the (possibly revcomp) t frame
    tpos_adj = qpos - shift[:, None]
    t_rows = np.where(strand[:, None] == 1,
                      (Lpad - tlen)[:, None] + tpos_adj,  # rc rows are
                      tpos_adj)                            # right-aligned
    tb = np.where(strand[:, None] == 1,
                  rc[tid[:, None], np.minimum(np.maximum(t_rows, 0),
                                              Lpad - 1)],
                  seqs[tid[:, None], np.minimum(np.maximum(t_rows, 0),
                                                Lpad - 1)])
    both = inw & (qb < 4) & (tb < 4)
    eqm = both & (qb == tb)
    matches = eqm.sum(axis=1).astype(np.int32)
    columns = both.sum(axis=1).astype(np.int32)
    ident = matches / np.maximum(columns, 1)

    # mismatch events (forward coords both sides), capped at snp_cap
    mm = both & (qb != tb)
    mm_q = np.full((P, snp_cap), -1, dtype=np.int32)
    mm_t = np.full((P, snp_cap), -1, dtype=np.int32)
    mm_qb = np.full((P, snp_cap), 4, dtype=np.int8)
    mm_tb = np.full((P, snp_cap), 4, dtype=np.int8)
    mm_mask = np.zeros((P, snp_cap), dtype=bool)
    rows_i, cols_i = np.nonzero(mm)
    if len(rows_i):
        rank = np.cumsum(np.concatenate(
            [[0], (np.diff(rows_i) == 0).astype(np.int64)]))
        # rank within row: restart at each new row
        row_start = np.concatenate([[0], np.nonzero(np.diff(rows_i))[0] + 1])
        rank = np.arange(len(rows_i)) - np.repeat(
            row_start, np.diff(np.concatenate([row_start, [len(rows_i)]])))
        m = rank < snp_cap
        ri, ci, rk = rows_i[m], cols_i[m], rank[m]
        qp = lo[ri] + ci
        tp_adj = qp - shift[ri]
        tp_fwd = np.where(strand[ri] == 1, tlen[ri] - 1 - tp_adj, tp_adj)
        mm_q[ri, rk] = qp.astype(np.int32)
        mm_t[ri, rk] = tp_fwd.astype(np.int32)
        mm_qb[ri, rk] = qb[ri, ci]
        tb_fwd = np.where((strand[ri] == 1) & (tb[ri, ci] < 4),
                          3 - tb[ri, ci], tb[ri, ci])
        mm_tb[ri, rk] = tb_fwd
        mm_mask[ri, rk] = True

    qs = lo.astype(np.int32)
    qe = hi.astype(np.int32)
    ts_adj = (lo - shift).astype(np.int64)
    te_adj = (hi - shift).astype(np.int64)
    ts_fwd = np.where(strand == 1, tlen - te_adj, ts_adj).astype(np.int32)
    te_fwd = np.where(strand == 1, tlen - ts_adj, te_adj).astype(np.int32)

    maplen = span.astype(np.float64)
    minlen = np.minimum(qlen, tlen).astype(np.float64)
    m = matches.astype(np.float64)
    score = 0.4 * m / np.maximum(maplen, 1.0) + 0.6 * m / np.maximum(
        minlen, 1.0)
    return OverlapTable(
        qid=qid.astype(np.int32), tid=tid.astype(np.int32),
        strand=strand.astype(np.int8),
        qs=qs, qe=qe, ts=ts_fwd, te=te_fwd,
        qlen=qlen.astype(np.int32), tlen=tlen.astype(np.int32),
        matches=matches, columns=columns,
        identity=ident.astype(np.float32),
        score=score.astype(np.float32),
        score2=ident.astype(np.float32),
        score3=(m / np.maximum(minlen, 1.0)).astype(np.float32),
        mm_q=mm_q, mm_t=mm_t, mm_qb=mm_qb, mm_tb=mm_tb, mm_mask=mm_mask,
    )


def _empty(snp_cap: int) -> OverlapTable:
    from hylight_tpu.overlap.engine import _empty_table
    return _empty_table(snp_cap)
