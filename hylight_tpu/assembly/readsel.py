"""miniasm-exact 2-pass read selection over an OverlapTable.

The reference's long-read layout runs, before any graph is built, a
hit-level read-selection cascade (``miniasm/main.c:119-142``):

  pass 1 (crude):  ma_hit_sub(min_dp)   -> ma_hit_cut(min_span)
                   -> ma_hit_flt(max_hang*1.5, int_frac=.5, min_ovlp*.5)
  pass 2 (fine):   ma_hit_sub(min_dp)   -> ma_hit_cut(min_span)
                   -> ma_sub_merge      -> ma_hit_contained

``ma_hit_sub`` (``hit.c:110-160``) selects, per read, the longest region
covered by >= min_dp hits (the coverage plateau — chimeric junctions show
up as coverage dips and split/trim the read); ``ma_hit_cut``
(``hit.c:163-193``) rebases every hit onto the selected sub-regions;
``ma_hit_flt`` (``hit.c:195-216``) drops hits that classify as internal
or short under RELAXED hang bounds; ``ma_hit_contained`` (``hit.c:225``)
deletes contained reads.

miniasm reads each PAF line in BOTH directions (``bi_dir=1`` default,
``hit.c:92-99``); our OverlapTable stores each pair once, so
:func:`duplicate_hits` materializes the swapped copies first and every
pass below runs on the duplicated array — byte-for-byte the reference
control flow, but vectorized (no per-read Python loops).

The earlier rounds folded this cascade into admission filtering +
``coverage_trim``; this module replaces that fold with the exact passes
(the golden differential test now runs the bundled miniasm binary WITHOUT
``-1 -2`` and compares unitig sequences).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from hylight_tpu.graph.string_graph import ArcSet
from hylight_tpu.io.readset import ReadSet
from hylight_tpu.overlap.table import OverlapTable
from hylight_tpu.utils import get_logger

log = get_logger()

# ma_hit2arc return codes (miniasm.h:80-83); r >= 0 means dovetail arc
HT_INT, HT_QCONT, HT_TCONT, HT_SHORT = -1, -2, -3, -4


@dataclass
class Hits:
    """Bi-directional hit array (every overlap present in both (q,t) and
    (t,q) directions — the shape ``ma_hit_read`` produces)."""

    qid: np.ndarray   # int64 [H]
    tid: np.ndarray   # int64 [H]
    qs: np.ndarray    # int64 [H]
    qe: np.ndarray    # int64 [H]
    ts: np.ndarray    # int64 [H] forward target frame (PAF convention)
    te: np.ndarray    # int64 [H]
    rev: np.ndarray   # int64 [H] 0/1
    ml: np.ndarray    # int64 [H] matching bases (PAF col 10)
    bl: np.ndarray    # int64 [H] block length  (PAF col 11)

    @property
    def n(self) -> int:
        return len(self.qid)

    def select(self, mask: np.ndarray) -> "Hits":
        return Hits(*(getattr(self, f)[mask]
                      for f in self.__dataclass_fields__))


@dataclass
class SubRegions:
    """Per-read selected sub-region [s, e) + deletion flag (ma_sub_t)."""

    s: np.ndarray        # int64 [n_reads]
    e: np.ndarray        # int64 [n_reads]
    deleted: np.ndarray  # bool  [n_reads]

    def length(self) -> np.ndarray:
        return self.e - self.s


def duplicate_hits(table: OverlapTable, *, min_span: int,
                   min_match: int) -> Hits:
    """OverlapTable -> bi-directional Hits with the read-time admission
    filter of ``ma_hit_read`` (``hit.c:87``): spans >= min_span on both
    reads and ml >= min_match. The swapped copy exchanges the q/t fields
    verbatim (``hit.c:92-99``)."""
    i64 = lambda a: a.astype(np.int64)  # noqa: E731
    qs, qe = i64(table.qs), i64(table.qe)
    ts, te = i64(table.ts), i64(table.te)
    ml, bl = i64(table.matches), i64(table.columns)
    keep = (qe - qs >= min_span) & (te - ts >= min_span) & (ml >= min_match)
    def cat(a, b):
        return np.concatenate([a[keep], b[keep]])
    return Hits(
        qid=cat(i64(table.qid), i64(table.tid)),
        tid=cat(i64(table.tid), i64(table.qid)),
        qs=cat(qs, ts), qe=cat(qe, te),
        ts=cat(ts, qs), te=cat(te, qe),
        rev=cat(i64(table.strand), i64(table.strand)),
        ml=cat(ml, ml), bl=cat(bl, bl),
    )


def hit_sub(h: Hits, n_reads: int, *, min_dp: int, min_iden: float = 0.05,
            end_clip: int = 0) -> SubRegions:
    """Coverage-plateau selection (``ma_hit_sub``, ``hit.c:110-160``):
    per read, the LONGEST region where >= min_dp query-side hit intervals
    stack (earliest region wins ties, matching the strict `>` compare).

    Vectorized: interval endpoints become (read, pos*2+is_end) events;
    depth is a per-read cumulative sum; up/down min_dp crossings mark
    region bounds."""
    s = np.zeros(n_reads, dtype=np.int64)
    e = np.zeros(n_reads, dtype=np.int64)
    deleted = np.ones(n_reads, dtype=bool)
    # skip self matches and low-identity hits (hit.c:125)
    ok = (h.tid != h.qid) & (h.ml >= h.bl * min_iden)
    iqs = h.qs[ok] + end_clip
    iqe = h.qe[ok] - end_clip
    pos_ok = iqe > iqs
    rid = h.qid[ok][pos_ok]
    iqs, iqe = iqs[pos_ok], iqe[pos_ok]
    # reads with hits but no admissible interval are deleted (max span 0);
    # reads with NO hits keep s=e=0, del=0 like the reference's calloc'd
    # ma_sub_t (they are isolated in the graph either way)
    has_hit = np.zeros(n_reads, dtype=bool)
    has_hit[np.unique(h.qid)] = True
    deleted[:] = has_hit
    if len(rid) == 0:
        return SubRegions(s=s, e=e, deleted=deleted)

    ev_rid = np.concatenate([rid, rid])
    # start events sort before end events at equal pos (qs<<1 vs qe<<1|1)
    ev_key = np.concatenate([iqs * 2, iqe * 2 + 1])
    ev_delta = np.concatenate([np.ones(len(rid), np.int64),
                               np.full(len(rid), -1, np.int64)])
    order = np.lexsort((ev_key, ev_rid))
    ev_rid, ev_key, ev_delta = ev_rid[order], ev_key[order], ev_delta[order]
    E = len(ev_rid)

    # per-read depth: global cumsum minus the cumsum baseline at read start
    cum = np.cumsum(ev_delta)
    new_read = np.concatenate([[True], ev_rid[1:] != ev_rid[:-1]])
    starts = np.nonzero(new_read)[0]
    base_vals = cum[starts] - ev_delta[starts]
    seg = np.searchsorted(starts, np.arange(E), side="right") - 1
    depth = cum - base_vals[seg]
    old = depth - ev_delta

    up = (old < min_dp) & (depth >= min_dp)
    down = (old >= min_dp) & (depth < min_dp)
    pos = ev_key >> 1
    # latest up-crossing before each event (within the read: depth starts
    # at 0 < min_dp, so a down is always preceded by an up of its own read)
    up_idx = np.maximum.accumulate(np.where(up, np.arange(E), -1))
    d_idx = np.nonzero(down)[0]
    if len(d_idx) == 0:
        return SubRegions(s=s, e=e, deleted=deleted)
    d_rid = ev_rid[d_idx]
    d_start = pos[up_idx[d_idx]]
    d_end = pos[d_idx]
    d_len = d_end - d_start
    # earliest max per read: strict '>' compare walking regions in position
    # order == first of the longest; lexsort tie-breaks by event order
    sel = np.lexsort((d_idx, -d_len, d_rid))
    first = np.concatenate([[True], d_rid[sel][1:] != d_rid[sel][:-1]])
    win = sel[first]
    w_rid = d_rid[win]
    w_len = d_len[win]
    good = w_len > 0
    s[w_rid[good]] = d_start[win][good] - end_clip
    e[w_rid[good]] = d_end[win][good] + end_clip
    deleted[w_rid[good]] = False
    return SubRegions(s=s, e=e, deleted=deleted)


def hit_cut(h: Hits, sub: SubRegions, *, min_span: int) -> Hits:
    """Rebase hits onto the selected sub-regions (``ma_hit_cut``,
    ``hit.c:163-193``); drop hits touching deleted reads or whose rebased
    span falls below min_span on either read."""
    rq_s, rq_e = sub.s[h.qid], sub.e[h.qid]
    rt_s, rt_e = sub.s[h.tid], sub.e[h.tid]
    alive = ~(sub.deleted[h.qid] | sub.deleted[h.tid])

    r = h.rev == 1
    qs = np.where(r, np.where(h.te < rt_e, h.qs, h.qs + (h.te - rt_e)),
                  np.where(h.ts > rt_s, h.qs, h.qs + (rt_s - h.ts)))
    qe = np.where(r, np.where(h.ts > rt_s, h.qe, h.qe - (rt_s - h.ts)),
                  np.where(h.te < rt_e, h.qe, h.qe - (h.te - rt_e)))
    ts = np.where(r, np.where(h.qe < rq_e, h.ts, h.ts + (h.qe - rq_e)),
                  np.where(h.qs > rq_s, h.ts, h.ts + (rq_s - h.qs)))
    te = np.where(r, np.where(h.qs > rq_s, h.te, h.te - (rq_s - h.qs)),
                  np.where(h.qe < rq_e, h.te, h.te - (h.qe - rq_e)))

    qs = np.maximum(qs, rq_s) - rq_s
    qe = np.minimum(qe, rq_e) - rq_s
    ts = np.maximum(ts, rt_s) - rt_s
    te = np.minimum(te, rt_e) - rt_s
    keep = alive & (qe - qs >= min_span) & (te - ts >= min_span)
    out = h.select(keep)
    out.qs, out.qe = qs[keep], qe[keep]
    out.ts, out.te = ts[keep], te[keep]
    return out


def classify(h: Hits, ql: np.ndarray, tl: np.ndarray, *, max_hang: int,
             int_frac: float, min_ovlp: int):
    """Vectorized ``ma_hit2arc`` (``miniasm.h:86-105``). Returns
    (r, v, w, l, ol): r = code array (>= 0 encoded as 0 for arcs, else
    HT_*), and for arc rows the arc fields v -> w with length l and
    overlap ol = ql - l."""
    tl5 = np.where(h.rev == 1, tl - h.te, h.ts)
    tl3 = np.where(h.rev == 1, h.ts, tl - h.te)
    qs, qe3 = h.qs, ql - h.qe
    ext5 = np.minimum(qs, tl5)
    ext3 = np.minimum(qe3, tl3)
    span = h.qe - h.qs
    internal = (ext5 > max_hang) | (ext3 > max_hang) | \
        (span < (span + ext5 + ext3) * int_frac)
    qcont = ~internal & (qs <= tl5) & (qe3 <= tl3)
    tcont = ~internal & ~qcont & (qs >= tl5) & (qe3 >= tl3)
    short = ~internal & ~qcont & ~tcont & \
        ((span + ext5 + ext3 < min_ovlp) |
         ((h.te - h.ts) + ext5 + ext3 < min_ovlp))
    r = np.zeros(h.n, dtype=np.int64)
    r[internal] = HT_INT
    r[qcont] = HT_QCONT
    r[tcont] = HT_TCONT
    r[short] = HT_SHORT

    case_a = qs > tl5
    v = np.where(case_a, h.qid * 2, h.qid * 2 + 1)
    w = np.where(case_a, h.tid * 2 + h.rev, h.tid * 2 + (1 - h.rev))
    l = np.where(case_a, qs - tl5, qe3 - tl3)
    ol = ql - l
    return r, v, w, l, ol


def hit_flt(h: Hits, sub: SubRegions, *, max_hang: int,
            min_ovlp: int) -> Hits:
    """Chimera/junk filter (``ma_hit_flt``, ``hit.c:195-216``): keep hits
    classifying as dovetail arc or containment under RELAXED bounds
    (callers pass max_hang*1.5, min_ovlp*0.5; int_frac is the hardcoded
    0.5 of ``hit.c:205``)."""
    ql = sub.length()[h.qid]
    tl = sub.length()[h.tid]
    r, *_ = classify(h, ql, tl, max_hang=max_hang, int_frac=0.5,
                     min_ovlp=min_ovlp)
    keep = (r == 0) | (r == HT_QCONT) | (r == HT_TCONT)
    keep &= ~(sub.deleted[h.qid] | sub.deleted[h.tid])
    return h.select(keep)


def sub_merge(a: SubRegions, b: SubRegions) -> SubRegions:
    """Compose sub-regions: b is relative to a (``ma_sub_merge``,
    ``hit.c:218-223``)."""
    return SubRegions(s=a.s + b.s, e=a.s + b.e,
                      deleted=a.deleted | b.deleted)


def hit_contained(h: Hits, sub: SubRegions, *, max_hang: int,
                  int_frac: float, min_ovlp: int) -> Hits:
    """Delete contained reads and their hits (``ma_hit_contained``,
    ``hit.c:225-256``; read ids are NOT renumbered here)."""
    ql = sub.length()[h.qid]
    tl = sub.length()[h.tid]
    r, *_ = classify(h, ql, tl, max_hang=max_hang, int_frac=int_frac,
                     min_ovlp=min_ovlp)
    np.logical_or.at(sub.deleted, h.qid[r == HT_QCONT], True)
    np.logical_or.at(sub.deleted, h.tid[r == HT_TCONT], True)
    keep = ~(sub.deleted[h.qid] | sub.deleted[h.tid])
    return h.select(keep)


def sg_arcs_from_hits(h: Hits, sub: SubRegions, *, max_hang: int,
                      int_frac: float, min_ovlp: int) -> ArcSet:
    """String-graph arcs from the selected hits (``ma_sg_gen``,
    ``asm.c:9-39``): one arc per bi-directional hit (the twin arc comes
    from the twin hit); QCONT reads are deleted and their arcs removed
    in the cleanup, exactly like ``asg_cleanup``."""
    n_reads = len(sub.s)
    ql = sub.length()[h.qid]
    tl = sub.length()[h.tid]
    r, v, w, l, ol = classify(h, ql, tl, max_hang=max_hang,
                              int_frac=int_frac, min_ovlp=min_ovlp)
    np.logical_or.at(sub.deleted, h.qid[r == HT_QCONT], True)
    arc = (r == 0) & ~(sub.deleted[h.qid] | sub.deleted[h.tid])
    return ArcSet(v=v[arc], w=w[arc], l=l[arc].astype(np.int32),
                  ol=ol[arc].astype(np.int32), n_reads=n_reads).sort()


def select_reads(table: OverlapTable, n_reads: int, *, min_dp: int,
                 min_span: int, min_match: int, max_hang: int,
                 int_frac: float, min_ovlp: int,
                 min_iden: float = 0.05) -> tuple[Hits, SubRegions]:
    """The full 2-pass selection of ``main.c:119-142``. Returns the
    surviving rebased hits plus the composed per-read sub-regions (hit
    coordinates are relative to the sub-regions)."""
    h = duplicate_hits(table, min_span=min_span, min_match=min_match)
    # pass 1 (crude): sub -> cut -> chimera filter with relaxed bounds
    sub = hit_sub(h, n_reads, min_dp=min_dp, min_iden=min_iden)
    h = hit_cut(h, sub, min_span=min_span)
    h = hit_flt(h, sub, max_hang=int(max_hang * 1.5),
                min_ovlp=int(min_ovlp * 0.5))
    # pass 2 (fine): sub -> cut -> merge -> containment removal
    sub2 = hit_sub(h, n_reads, min_dp=min_dp, min_iden=min_iden)
    h = hit_cut(h, sub2, min_span=min_span)
    sub = sub_merge(sub, sub2)
    h = hit_contained(h, sub, max_hang=max_hang, int_frac=int_frac,
                      min_ovlp=min_ovlp)
    log.info("[G::readsel] %d reads remain, %d bi-dir hits",
             int((~sub.deleted).sum()), h.n)
    return h, sub


def trimmed_reads(reads: ReadSet, sub: SubRegions) -> ReadSet:
    """Materialize the sub-region-trimmed read set (same ids; deleted or
    unselected reads become empty sequences — they carry no arcs)."""
    seqs = []
    for i in range(reads.n):
        if sub.deleted[i] or sub.e[i] <= sub.s[i]:
            seqs.append(np.zeros(0, dtype=np.uint8))
        else:
            seqs.append(reads.get(i)[int(sub.s[i]):int(sub.e[i])])
    names = list(reads.names) if reads.names else None
    return ReadSet.from_seqs(seqs, names=names)
