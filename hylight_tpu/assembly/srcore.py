"""Strain-aware short-read OLC core (the ViralQuasispecies-equivalent).

Reimplements the capability of the reference's C++ core + its POLYTE driver
(``tools/HaploConduct/src/`` + ``script/polyte.tune_params.py``): an
iterated overlap-layout-consensus loop over a read cluster,

  iteration 1 (error correction): overlap -> Bayesian-scored edges
    (threshold edge1=0.93) -> orientation labelling -> maximal cliques ->
    per-clique weighted consensus superreads with min-support trimming
    (EdgeCalculator.cpp / GraphAlgos.cpp / qc / SRBuilder.cpp);
  merge iterations: edge threshold edge2=1.0 (i.e. only mismatch-free
    overlaps merge), greedy disjoint edge pairing, 2-read consensus
    (getEdgesForMerging GraphAlgos.cpp:112, mergeAlongEdges SRBuilder.cpp:1238),
    repeated until the read count is stable;
  every iteration first runs the graph-cleaning cascade of
    ViralQuasispecies.cpp:297-367 (transitive reduction — double in EC,
    single otherwise —, branch clearing in merge iterations, transitive-
    branch deletions in branch-reduction iterations, DFS back-edge removal
    outside EC): graph/sr_graph.py;
  final iteration: cliques + read-evidence branch reduction against the
    statistical threshold table (BranchReduction.cpp + min_ev_table.py),
    then singleton cleanup.

Design deltas from the reference (deliberate, documented):
- overlaps are recomputed each iteration with the TPU overlap engine — this
  matches the ACTIVE reference path (polyte re-runs minimap2 per iteration,
  ``polyte.tune_params.py:748-755``) and replaces the FindNextOverlaps C++;
- Bayesian per-column phred scoring uses each read's mean error rate over
  the verified match/mismatch counts (per-column phred products degrade to
  this under near-uniform quals);
- paired-end fragments are mate-linked rows: edges touching a paired row
  need two >= L/2 end-overlaps between the fragments (EdgeCalculator PE
  admission), cliques pull mates into a dual-consensus superread
  (SRBuilder PE path), merges operate on whole fragments and collapse
  them to single contigs when a bridge places both sides in one frame
  (merge_self_overlap / join_mates), and branch-reduction evidence is
  unified per fragment. Insert-size statistics additionally enter through
  the evidence table's PE term.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from hylight_tpu.config import Config, SRCoreConfig
from hylight_tpu.assembly.evidence import EvidenceThresholds
from hylight_tpu.graph import sr_graph
from hylight_tpu.graph.cliques import max_cliques
from hylight_tpu.io.readset import ReadSet, revcomp_codes
from hylight_tpu.overlap.engine import find_overlaps
from hylight_tpu.overlap.table import OverlapTable
from hylight_tpu.utils import get_logger

log = get_logger()

DEFAULT_PHRED = 30


@dataclass
class SRContext:
    """Per-assembly original-read context (no module globals: cluster
    assemblies must be able to run concurrently in a task farm, the
    HyLight ``xargs -P`` equivalent)."""

    orig: ReadSet                       # the cluster's original reads
    lens: np.ndarray                    # orig read id -> length
    frag: Optional[np.ndarray] = None   # orig read id -> PE fragment id

    @staticmethod
    def from_reads(rs: ReadSet, mate: Optional[np.ndarray] = None
                   ) -> "SRContext":
        frag = None
        if mate is not None and (np.asarray(mate) >= 0).any():
            rows = np.arange(rs.n, dtype=np.int64)
            frag = np.where(mate >= 0, np.minimum(rows, mate), rows)
        return SRContext(orig=rs, lens=rs.lengths.astype(np.int64),
                         frag=frag)


@dataclass
class WorkingSet:
    """Current superreads + provenance of original reads inside them.

    Paired-end capability (FastqStorage paired1/paired2 + SRBuilder PE dual
    consensus, ``Read.h:144``, ``SRBuilder.cpp:654-871``): a PE fragment is
    two mate-linked rows — ``mate[i]`` is the row id of i's other end (-1
    for single). The pair travels together through cliques and merges and
    collapses to a single row when its sides are bridged (the reference's
    merge_self_overlap, ``SRBuilder.cpp:872``)."""

    reads: ReadSet
    # per working read: list of (orig_read_id, offset, ori)
    subreads: List[List[Tuple[int, int, int]]] = field(default_factory=list)
    mate: Optional[np.ndarray] = None   # int64 [n], -1 = single
    # True only for the initial raw-read set, whose PE rows keep the FR
    # sequencing layout — gates the strict find_paired_overlap-style PE
    # consistency check (superread sides lose FR, see _pe_admission)
    fr_layout: bool = False
    ctx: Optional["SRContext"] = None   # original-read context
    # previous iteration's FULL overlap table between rows that survived
    # unchanged, remapped to this set's ids — the reference's
    # nonedge_overlaps.txt carry (EdgeCalculator.cpp:410-413,548-555;
    # reconsiderNonedgeOverlaps FindNextOverlaps.cpp:635): sub-threshold
    # overlaps stay available to later iterations even if the engine's
    # sampled seeding misses them on a re-run
    carry: Optional[OverlapTable] = None
    # FNO1 projection: candidate pairs induced from the previous
    # iteration's edges via member placements (FindNextOverlaps.cpp:25-330)
    # — verified at base level by fno.verify_pairs before scoring. Covers
    # MERGED rows (the carry covers unchanged rows), so together they are
    # the full findNextOverlaps capability.
    proj: Optional["object"] = None

    def __post_init__(self):
        if self.mate is None:
            self.mate = np.full(self.reads.n, -1, dtype=np.int64)

    @staticmethod
    def from_reads(rs: ReadSet, mate: Optional[np.ndarray] = None,
                   ctx: Optional["SRContext"] = None) -> "WorkingSet":
        return WorkingSet(reads=rs,
                          subreads=[[(i, 0, 0)] for i in range(rs.n)],
                          mate=mate, ctx=ctx, fr_layout=True)

    @property
    def n(self) -> int:
        return self.reads.n


# ---------------------------------------------------------------------------
# edge admission

def _mean_err(rs: ReadSet) -> np.ndarray:
    """Per-read mean base-error probability from phreds (default 1e-3)."""
    out = np.full(rs.n, 10.0 ** (-DEFAULT_PHRED / 10.0))
    if rs.qual is not None:
        for i in range(rs.n):
            q = rs.get_qual(i)
            if q is not None and len(q):
                out[i] = float(np.mean(10.0 ** (-q.astype(np.float64) / 10.0)))
    return out


def score_edges(table: OverlapTable, rs: ReadSet,
                exact: bool = True) -> np.ndarray:
    """Bayesian overlap score per edge (EdgeCalculator.cpp:26-139).

    exact=True (default) walks every aligned column with BOTH reads'
    per-base phreds on device (ops/phred_score.py) — the reference math to
    1e-6 (ungapped overlap model, same as the SAVAGE overlap format).
    exact=False keeps the round-1 mean-error approximation (used only as a
    fallback; per-column phreds matter near the 0.93/1.0 thresholds)."""
    if table.n == 0:
        return np.zeros(0)
    if exact:
        from hylight_tpu.ops.phred_score import phred_edge_scores
        s, _ = phred_edge_scores(table, rs, default_phred=DEFAULT_PHRED)
        return s
    err = _mean_err(rs)
    p1 = err[table.qid]
    p2 = err[table.tid]
    p_match = (1 - p1) * (1 - p2) + p1 * p2 / 3.0
    p_mis = p1 * (1 - p2) / 3.0 + p2 * (1 - p1) / 3.0 + 2.0 / 9.0 * p1 * p2
    m = table.matches.astype(np.float64)
    cols = np.maximum(table.columns.astype(np.float64), 1.0)
    x = np.maximum(cols - m, 0.0)
    logp = (m * np.log(p_match) + x * np.log(np.maximum(p_mis, 1e-300))) / cols
    return np.exp(logp)


def admit_edges(table: OverlapTable, rs: ReadSet, *, min_overlap_len: int,
                edge_threshold: float, merge_eps: float = 0.0,
                mate: Optional[np.ndarray] = None,
                fr_pairs: bool = False) -> np.ndarray:
    """Admission rule (EdgeCalculator.cpp:404-409): score > threshold OR
    mismatch_rate <= merge_eps; plus the overlap length gate — the full
    min_overlap_len for single-single overlaps, or the PE rule (two
    end-overlaps of >= min_overlap_len/2 between the fragments,
    EdgeCalculator.cpp:612-632) when a paired row is involved."""
    if table.n == 0:
        return np.zeros(0, dtype=bool)
    score = score_edges(table, rs)
    mism_rate = 1.0 - table.identity
    score_ok = (score > edge_threshold) | (mism_rate <= merge_eps)
    ovl = np.minimum(table.qe - table.qs, table.te - table.ts)
    ss_ok = score_ok & (ovl >= min_overlap_len)
    if mate is None or not (np.asarray(mate) >= 0).any():
        return ss_ok
    return _pe_admission(table, score_ok, ss_ok, ovl, mate,
                         min_overlap_len, fr_pairs=fr_pairs)


def mate_from_names(rs: ReadSet) -> np.ndarray:
    """Mate-row links from '/1' '/2' name suffixes (FastqStorage pairing)."""
    mate = np.full(rs.n, -1, dtype=np.int64)
    first: Dict[str, int] = {}
    for i, nm in enumerate(rs.names or []):
        if nm.endswith(("/1", "/2")):
            base = nm[:-2]
            j = first.pop(base, None)
            if j is None:
                first[base] = i
            else:
                mate[i], mate[j] = j, i
    return mate


def _pe_admission(table: OverlapTable, score_ok: np.ndarray,
                  ss_ok: np.ndarray, ovl: np.ndarray, mate: np.ndarray,
                  min_overlap_len: int, fr_pairs: bool = False
                  ) -> np.ndarray:
    """PE admission (EdgeCalculator.cpp:612-632): an overlap involving a
    paired read is admitted only when the two fragments share TWO
    qualifying end-overlaps of >= min_overlap_len/2 each (S-S overlaps keep
    the full-length rule). Same-fragment rows never form graph edges
    (self-overlaps are skipped, EdgeCalculator.cpp:605-607; side bridging
    happens in join_mates instead).

    Mutual-consistency check (the ``find_paired_overlap`` conditions,
    ``sfo2overlaps.py:222-299``), applied with the REFERENCE'S SCOPE:
    sfo2overlaps preprocesses the sfo output of ORIGINAL FR reads once,
    before the first iteration — later superread iterations use VQ's own
    plain two-half rule (EdgeCalculator.cpp:612-632) because superread
    pair sides do not keep the FR layout (the accumulators emit both
    sides in the iteration's plus frame, and trivial rows unflipped).

    With ``fr_pairs=True`` the EXACT find_paired_overlap row semantics
    apply (golden-diffed in tests/test_sfo2overlaps_golden.py):
    - paired-paired: a row with normalized end-pair (ea, eb) qualifies
      iff its read-strand equals ea XOR eb (the only combination
      consistent with two FR fragments; sfo2overlaps.py:238-255 N needs
      congruent end order on both sides, I needs opposite) AND the
      complementary end-pair (1-ea, 1-eb) is present among the bucket's
      qualifying rows (same ori is then automatic);
    - paired-single: the two rows must share the read-strand ori, use
      DISTINCT ends of the paired fragment, and their positions along
      the single read (the signed left-overhang OHA of the lower-id
      side, sfo2overlaps.py:256-295) must be strictly ordered
      congruently with the end order for 'N' and oppositely for 'I';
    with ``fr_pairs=False`` the count>=2 rule applies."""
    n = len(mate)
    rows = np.arange(n, dtype=np.int64)
    unit = np.where(mate >= 0, np.minimum(rows, mate), rows)
    qU = unit[table.qid]
    tU = unit[table.tid]
    self_unit = qU == tU
    involves_pe = (mate[table.qid] >= 0) | (mate[table.tid] >= 0)
    half_ok = score_ok & ~self_unit & (ovl >= min_overlap_len / 2)

    # end bit: 0 = the unit's lower row (/1), 1 = its mate (/2)
    endq = ((mate[table.qid] >= 0) &
            (table.qid > mate[table.qid])).astype(np.int64)
    endt = ((mate[table.tid] >= 0) &
            (table.tid > mate[table.tid])).astype(np.int64)
    strand = table.strand.astype(np.int64)
    a = np.minimum(qU, tU)
    b = np.maximum(qU, tU)
    pairkey = a * n + b
    uniq, inv = np.unique(pairkey, return_inverse=True)
    if fr_pairs:
        q_is_a = qU <= tU                # A = the lower-unit (lower id) side
        # normalize the end-pair to (A, B) order
        ea = np.where(q_is_a, endq, endt)
        eb = np.where(q_is_a, endt, endq)
        pa = np.where(q_is_a, mate[table.qid] >= 0, mate[table.tid] >= 0)
        pb = np.where(q_is_a, mate[table.tid] >= 0, mate[table.qid] >= 0)

        # paired-paired: strand must equal ea^eb (FR geometry) and the
        # complementary end-pair must be present in the bucket
        both = pa & pb
        epair = ea * 2 + eb
        slot = (inv * 2 + strand) * 4 + epair
        present = np.zeros(len(uniq) * 8, dtype=bool)
        present[slot[half_ok & both]] = True
        comp = (inv * 2 + strand) * 4 + (3 - epair)
        ok_both = both & (strand == (ea ^ eb)) & present[comp] & half_ok

        # paired-single: same ori, distinct paired-side ends, strict
        # position order along the single read (OHA comparator)
        one = pa ^ pb
        e1 = np.where(pa, ea, eb)        # paired-side end bit
        # signed left overhang of A in the A-first alignment frame
        ts_a = np.where(strand == 1, table.tlen - table.te, table.ts)
        qs_a = np.where(strand == 1, table.qlen - table.qe, table.qs)
        oha = np.where(q_is_a, table.qs - ts_a, table.ts - qs_a)
        grp = (inv * 2 + strand) * 2 + e1
        NEG, POS = np.int64(-1 << 60), np.int64(1 << 60)
        gmax = np.full(len(uniq) * 4, NEG)
        gmin = np.full(len(uniq) * 4, POS)
        m1 = half_ok & one
        np.maximum.at(gmax, grp[m1], oha[m1])
        np.minimum.at(gmin, grp[m1], oha[m1])
        oppo = (inv * 2 + strand) * 2 + (1 - e1)
        want_greater = strand == e1      # N/end0 and I/end1 need a later
        ok_one = one & m1 & np.where(    # partner; the others an earlier one
            want_greater, gmax[oppo] > oha, gmin[oppo] < oha)

        unit_ok = ok_both | ok_one
    else:
        cnt = np.bincount(inv[half_ok], minlength=len(uniq))
        unit_ok = (cnt[inv] >= 2) & half_ok
    return np.where(involves_pe | self_unit, unit_ok, ss_ok)


def pe_edge_filter(table: OverlapTable, keep: np.ndarray, mate: np.ndarray,
                   min_overlap_len: int, fr_pairs: bool = False
                   ) -> np.ndarray:
    """Standalone PE admission over an already-admitted mask (see
    _pe_admission; used by tests and external callers)."""
    if table.n == 0 or not (mate >= 0).any():
        return keep
    ovl = np.minimum(table.qe - table.qs, table.te - table.ts)
    return _pe_admission(table, keep, keep & (ovl >= min_overlap_len),
                         ovl, mate, min_overlap_len, fr_pairs=fr_pairs)


# ---------------------------------------------------------------------------
# orientation labelling (vertexLabellingHeuristic, GraphAlgos.cpp:178-349)

def orient_reads(table: OverlapTable, n: int, admitted: np.ndarray,
                 tries: int = 100) -> Tuple[np.ndarray, np.ndarray]:
    """BFS parity labelling; returns (labels[n], keep_mask over edges).

    Edges whose strand disagrees with the label parity are dropped. Like
    the reference (vertexLabellingHeuristic, GraphAlgos.cpp:178-248) up to
    ``tries`` shuffled BFS orders are attempted (fixed seeds; seed order by
    increasing degree on try 1) and the labelling deleting the fewest
    conflicting edges wins, with early exit at zero. Runs in native C++
    (graphcore.hl_label_orientations); the pure-python fallback does one
    deterministic pass in read-id order."""
    labels = None
    idxs = np.nonzero(admitted)[0]
    if len(idxs) and tries > 0:
        from hylight_tpu import native
        res = native.label_orientations(
            table.qid[idxs], table.tid[idxs],
            table.strand[idxs].astype(np.uint8), n, max_tries=tries)
        if res is not None:
            labels = res[0].astype(np.int8)
    if labels is None:
        labels = np.full(n, -1, dtype=np.int8)
        adj: List[List[Tuple[int, int, int]]] = [[] for _ in range(n)]
        for e in idxs:
            q, t, s = int(table.qid[e]), int(table.tid[e]), \
                int(table.strand[e])
            adj[q].append((t, s, e))
            adj[t].append((q, s, e))
        from collections import deque
        for seed in range(n):
            if labels[seed] >= 0:
                continue
            labels[seed] = 0
            dq = deque([seed])
            while dq:
                u = dq.popleft()
                for v, s, _e in adj[u]:
                    want = labels[u] ^ s
                    if labels[v] < 0:
                        labels[v] = want
                        dq.append(v)
        labels[labels < 0] = 0
    keep = np.ones(table.n, dtype=bool)
    keep[:] = admitted
    strand = table.strand.astype(np.int8)
    conflict = (labels[table.qid] ^ labels[table.tid]) != strand
    keep &= ~conflict
    n_conf = int((admitted & conflict).sum())
    if n_conf:
        log.info("[SR::orient] dropped %d orientation-conflicting edges",
                 n_conf)
    return labels, keep


def _plus_frame_offsets(table: OverlapTable, labels: np.ndarray
                        ) -> np.ndarray:
    """Offset of t relative to q after flipping reads to their labels.

    In the flipped (all '+') frame: offset = qs' - ts'."""
    qs = np.where(labels[table.qid] == 1, table.qlen - table.qe, table.qs)
    ts = np.where(labels[table.tid] == 1, table.tlen - table.te, table.ts)
    return (qs - ts).astype(np.int64)


# ---------------------------------------------------------------------------
# consensus

def _member_arrays(ws: WorkingSet, labels: np.ndarray, rid: int):
    seq = ws.reads.get(rid)
    qual = ws.reads.get_qual(rid)
    if qual is None:
        qual = np.full(len(seq), DEFAULT_PHRED, dtype=np.uint8)
    if labels[rid] == 1:
        seq = revcomp_codes(seq)
        qual = qual[::-1]
    return seq, qual


def consensus_group(ws: WorkingSet, labels: np.ndarray,
                    members: Sequence[int], offsets: Sequence[int], *,
                    min_support: int = 1, trim: bool = False,
                    min_posterior: float = 0.0
                    ) -> Optional[Tuple[np.ndarray, np.ndarray,
                                        List[Tuple[int, int, int]],
                                        List[Tuple[int, int, int]]]]:
    """Weighted-majority consensus of oriented members at given offsets.

    Returns (codes, quals, subreads, member placements) or None if
    everything got trimmed — placements are (member_row, offset, flip)
    inside the consensus, the FNO projection's idx bookkeeping.
    Mirrors SRBuilder consensus (:297-533): phred-weighted votes per column,
    N below posterior gate, EC-mode prefix/suffix support trimming."""
    offs = np.asarray(offsets, dtype=np.int64)
    offs = offs - offs.min()
    seqs, quals = [], []
    for r in members:
        s, q = _member_arrays(ws, labels, int(r))
        seqs.append(s)
        quals.append(q)
    L = int(max(o + len(s) for o, s in zip(offs, seqs)))
    # one concatenated bincount instead of per-member np.add.at (the
    # per-clique host hot spot, VERDICT W3 / SRBuilder.cpp:958's OpenMP)
    all_pos = np.concatenate(
        [np.arange(o, o + len(s)) for o, s in zip(offs, seqs)])
    all_base = np.concatenate(seqs).astype(np.int64)
    all_qual = np.concatenate(quals).astype(np.int64)
    ok = all_base < 4
    votes = np.bincount(all_pos[ok] * 4 + all_base[ok],
                        weights=all_qual[ok],
                        minlength=L * 4).reshape(L, 4).astype(np.int64)
    support = np.zeros(L, dtype=np.int32)
    ends = np.zeros(L + 1, dtype=np.int32)
    np.add.at(ends, offs, 1)
    np.add.at(ends, offs + np.array([len(s) for s in seqs]), -1)
    support = np.cumsum(ends[:-1]).astype(np.int32)

    total = votes.sum(axis=1)
    best_b = votes.argmax(axis=1).astype(np.uint8)
    best = votes[np.arange(L), best_b]
    post = np.where(total > 0, best / np.maximum(total, 1), 0.0)
    cons = np.where((total > 0) & (post >= min_posterior), best_b, 4) \
        .astype(np.uint8)
    newq = np.clip(2 * best - total, 2, 60).astype(np.uint8)
    newq[cons == 4] = 2

    lo, hi = 0, L
    if trim:
        okcols = support >= min_support
        nz = np.nonzero(okcols)[0]
        if len(nz) == 0:
            return None
        lo, hi = int(nz[0]), int(nz[-1]) + 1
    cons = cons[lo:hi]
    newq = newq[lo:hi]
    if len(cons) == 0 or (cons == 4).mean() > 0.05:  # N-rate gate (Read.h:214)
        return None

    subs: List[Tuple[int, int, int]] = []
    places: List[Tuple[int, int, int]] = []
    for r, o in zip(members, offs):
        r = int(r)
        rl = len(ws.reads.get(r))
        flip = int(labels[r])
        places.append((r, int(o) - lo, flip))
        for orig, so, sori in ws.subreads[r]:
            if flip:
                so = rl - so - _orig_len(ws, orig, sori)
                sori ^= 1
            subs.append((orig, int(o) + so - lo, sori))
    return cons, newq, subs, places


def _orig_len(ws: WorkingSet, orig: int, ori: int) -> int:
    if ws.ctx is None or orig >= len(ws.ctx.lens):
        return 0
    return int(ws.ctx.lens[orig])


# ---------------------------------------------------------------------------
# iterations

def _overlaps(ws: WorkingSet, cfg: Config, min_len: int,
              reoverlap: bool = True) -> OverlapTable:
    from dataclasses import replace
    from hylight_tpu.overlap.engine import _dedup_best_per_pair
    parts = []
    if reoverlap or (ws.proj is None and ws.carry is None):
        # with PE rows present the engine must emit the >= min_len/2
        # end-overlaps that the PE admission rule evaluates
        eff = min_len // 2 if bool((ws.mate >= 0).any()) else min_len
        oc = replace(cfg.overlap_sr, min_ovlp_len=eff)
        qb = 256 if ws.n > 256 else max(8, ws.n)
        parts.append(find_overlaps(ws.reads, cfg=oc, query_block=qb))
    if ws.proj is not None and ws.proj.n:
        # FNO1-projected pairs, re-verified at base level (the reference
        # rescores projected overlaps in the next EdgeCalculator run). In
        # reoverlap=False mode (stage b / pipeline_per_stage semantics,
        # --FNO=1 with no minimap2 re-run) this is the only fresh source.
        from hylight_tpu.assembly import fno
        parts.append(fno.verify_pairs(ws.reads, ws.proj, snp_cap=128,
                                      min_span=min(min_len // 2, 70)))
    if cfg.sr_core.fno3 and ws.subreads:
        # FNO3 alternative: pairs induced by a SHARED original subread
        # (FindNextOverlaps3.cpp), base-verified like the FNO1 projection
        from hylight_tpu.assembly import fno
        p3 = fno.project_shared_subreads(
            ws.subreads, ws.reads.lengths.astype(np.int64),
            ws.ctx.lens if ws.ctx is not None else None)
        if p3.n:
            parts.append(fno.verify_pairs(ws.reads, p3, snp_cap=128,
                                          min_span=min(min_len // 2, 70)))
    if ws.carry is not None and ws.carry.n:
        parts.append(ws.carry)
    if not parts:
        from hylight_tpu.overlap.engine import _empty_table
        return _empty_table(128)
    table = parts[0] if len(parts) == 1 else _dedup_best_per_pair(
        OverlapTable.concat(parts))
    return table


def _remap_carry(table: Optional[OverlapTable],
                 old2new: np.ndarray) -> Optional[OverlapTable]:
    """Remap an iteration's full table onto the next working set: only
    overlaps between rows that survived UNCHANGED (trivial superreads) stay
    valid — merged rows get fresh coordinates from the re-overlap instead
    (the FNO projection role). old2new is monotone over trivial rows, so
    the qid < tid convention is preserved."""
    if table is None or table.n == 0:
        return None
    nq = old2new[table.qid]
    nt = old2new[table.tid]
    m = (nq >= 0) & (nt >= 0)
    if not m.any():
        return None
    t = table.select(m)
    t.qid = old2new[table.qid[m]]
    t.tid = old2new[table.tid[m]]
    return t


def _star_offsets(table, labels, clique: List[int], edge_of: Dict
                  ) -> Optional[List[int]]:
    """Offsets of clique members relative to the first member via their
    direct edges (SRBuilder sort_vertices star shape, :33-286)."""
    base = clique[0]
    offs = [0]
    offsets_rel = _plus_frame_offsets(table, labels)
    for r in clique[1:]:
        e = edge_of.get((base, r))
        if e is not None:
            # edge (q=base, t=r): r starts at qs'-ts' in base's frame
            offs.append(int(offsets_rel[e]))
            continue
        e = edge_of.get((r, base))
        if e is None:
            return None
        # edge (q=r, t=base): base starts at qs'-ts' in r's frame -> invert
        offs.append(int(-offsets_rel[e]))
    return offs


def clique_iteration(ws: WorkingSet, cfg: Config, *, min_overlap_len: int,
                     edge_threshold: float, min_clique_size: int,
                     trim: bool, merge_eps: float = 0.0,
                     thresholds: Optional[EvidenceThresholds] = None,
                     diploid: bool = False,
                     reoverlap: bool = True,
                     stats: Optional[List[dict]] = None,
                     dump_dir: Optional[str] = None,
                     dump_tag: str = "") -> WorkingSet:
    """One clique-based iteration (EC when trim=True).

    Graph-cleaning schedule mirrors one ViralQuasispecies invocation
    (``ViralQuasispecies.cpp:297-367`` with polyte's flags,
    ``polyte.tune_params.py:700-744``): EC iteration removes
    double-transitive edges and keeps back edges (remove_trans=2,
    remove_backedges=false); the branch-reduction iteration removes single
    transitive edges plus shorter-overlap branches around them
    (remove_trans=1 & branch_reduction>0), then read-evidence branch
    reduction, then back edges."""
    table = _overlaps(ws, cfg, min_overlap_len, reoverlap=reoverlap)
    admitted = admit_edges(table, ws.reads,
                           min_overlap_len=min_overlap_len,
                           edge_threshold=edge_threshold,
                           merge_eps=merge_eps, mate=ws.mate,
                           fr_pairs=ws.fr_layout)
    labels, keep = orient_reads(table, ws.n, admitted)
    keep, _ = sr_graph.clean_graph(
        table, labels, keep,
        remove_trans=2 if trim else 1,
        branch_deletions=thresholds is not None and not trim,
        remove_branches=False, remove_tips=False,
        remove_backedges=False)
    if thresholds is not None:
        keep = branch_reduction(table, ws, labels, keep, thresholds,
                                diploid=diploid,
                                careful=cfg.sr_core.careful,
                                min_overlap_len=min_overlap_len)
    if not trim:  # remove_backedges = !error_correction (VQ :361-367)
        g = sr_graph.build_digraph(table, labels, keep, ws.n)
        back = sr_graph.back_edge_mask(
            g, score=score_edges(table, ws.reads)[g.eidx],
            mism=1.0 - table.identity[g.eidx])
        if back.any():
            keep = keep.copy()
            keep[g.eidx[back]] = False
    if dump_dir:
        _dump_graphs(dump_dir, dump_tag, table, labels, keep, ws)
    idx = np.nonzero(keep)[0]
    edge_of = {(int(table.qid[e]), int(table.tid[e])): int(e) for e in idx}
    cliques = max_cliques(
        ws.n, table.qid[idx], table.tid[idx])
    cliques = [c for c in cliques if len(c) >= min_clique_size]

    out = _SuperreadAccum(ws)
    offsets_rel = _plus_frame_offsets(table, labels)
    for c in cliques:
        # skip cliques whose ends were all consumed already: with the graph
        # over fragment ENDS, the /2-side clique mirrors the /1-side clique
        # + mate-follow and would duplicate the superread (deviation from
        # the unit-vertex reference graph, documented in the module
        # docstring)
        if out.used[np.asarray(c)].all():
            continue
        offs = _star_offsets(table, labels, c, edge_of)
        if offs is None:
            continue
        res = consensus_group(ws, labels, c, offs,
                              min_support=min_clique_size, trim=trim,
                              min_posterior=cfg.consensus.min_qual)
        if res is None:
            continue
        i1 = out.emit(*res)
        out.used[np.asarray(c)] = True
        # mate-follow (PE dual consensus, SRBuilder.cpp:654-871): mates of
        # clique members not themselves in the clique form the second-side
        # consensus, placed by their own (pos2-equivalent) edges
        cset = {int(x) for x in c}
        mates = [int(ws.mate[r]) for r in c
                 if int(ws.mate[r]) >= 0 and int(ws.mate[r]) not in cset]
        mates = list(dict.fromkeys(mates))
        if mates:
            placed, m_offs = _place_by_edges(mates, edge_of, offsets_rel)
            if placed:
                res2 = consensus_group(ws, labels, placed, m_offs,
                                       min_support=1, trim=False,
                                       min_posterior=cfg.consensus.min_qual)
                if res2 is not None:
                    i2 = out.emit(*res2)
                    out.link(i1, i2)
                    out.used[np.asarray(placed)] = True

    out.emit_trivial()
    res = out.finish("clique_it", extra=f"{len(cliques)} cliques",
                     table=table, labels=labels)
    if stats is not None:
        # per-iteration observability row (ViralQuasispecies.cpp:471-489
        # stats.txt vertices/edges/overlaps + logfile clique/superread
        # counts, surfaced by cli.py into stats.txt)
        stats.append(dict(kind="clique", vertices=int(ws.n),
                          overlaps=int(table.n),
                          edges_admitted=int(np.sum(admitted)),
                          edges_kept=int(np.sum(keep)),
                          cliques=len(cliques), superreads=int(res.n),
                          paired=int((res.mate >= 0).sum()) // 2))
    return res


class _SuperreadAccum:
    """Accumulates superreads + mate links; copies unused rows through
    (trivial superreads) preserving their pair links."""

    def __init__(self, ws: WorkingSet):
        self.ws = ws
        self.used = np.zeros(ws.n, dtype=bool)
        self.reads: List[np.ndarray] = []
        self.quals: List[np.ndarray] = []
        self.subs: List[List[Tuple[int, int, int]]] = []
        self.places: List[List[Tuple[int, int, int]]] = []
        self.pairs: List[Tuple[int, int]] = []
        self.old2new = np.full(ws.n, -1, dtype=np.int64)

    def emit(self, seq, qual, subs,
             places: Optional[List[Tuple[int, int, int]]] = None) -> int:
        self.reads.append(seq)
        self.quals.append(qual)
        self.subs.append(subs)
        self.places.append(places or [])
        return len(self.reads) - 1

    def link(self, i: int, j: int) -> None:
        self.pairs.append((i, j))

    def emit_trivial(self) -> None:
        ws = self.ws
        zero_labels = np.zeros(ws.n, dtype=np.int8)
        for r in np.nonzero(~self.used)[0]:
            s, q = _member_arrays(ws, zero_labels, int(r))
            self.old2new[r] = self.emit(s, q, list(ws.subreads[r]),
                                        places=[(int(r), 0, 0)])
        # trivial PE rows whose mate also survived keep their link
        for r in np.nonzero(~self.used)[0]:
            m = int(ws.mate[r])
            if m > r and not self.used[m]:
                self.link(int(self.old2new[r]), int(self.old2new[m]))

    def finish(self, tag: str, extra: str = "",
               table: Optional[OverlapTable] = None,
               labels: Optional[np.ndarray] = None) -> WorkingSet:
        rs = ReadSet.from_seqs(self.reads, quals=self.quals,
                               names=[str(i) for i in range(len(self.reads))])
        mate = np.full(rs.n, -1, dtype=np.int64)
        for i, j in self.pairs:
            if mate[i] < 0 and mate[j] < 0:
                mate[i], mate[j] = j, i
        log.info("[SR::%s] %d reads -> %d superreads (%d paired) %s",
                 tag, self.ws.n, rs.n, int((mate >= 0).sum()) // 2, extra)
        proj = None
        if table is not None and table.n and labels is not None:
            from hylight_tpu.assembly import fno
            proj = fno.project_pairs(table, labels, self.places,
                                     rs.lengths.astype(np.int64))
        return WorkingSet(reads=rs, subreads=self.subs, mate=mate,
                          ctx=self.ws.ctx,
                          carry=_remap_carry(table, self.old2new),
                          proj=proj)


def _place_by_edges(members: List[int], edge_of: Dict,
                    offsets_rel: np.ndarray
                    ) -> Tuple[List[int], List[int]]:
    """BFS placement of members in a common frame using kept edges among
    them; members unreachable from the first placed member are dropped."""
    placed = {members[0]: 0}
    frontier = [members[0]]
    rest = set(members[1:])
    while frontier and rest:
        nxt = []
        for a in frontier:
            for b in list(rest):
                e = edge_of.get((a, b))
                if e is not None:
                    placed[b] = placed[a] + int(offsets_rel[e])
                elif (e := edge_of.get((b, a))) is not None:
                    placed[b] = placed[a] - int(offsets_rel[e])
                else:
                    continue
                rest.discard(b)
                nxt.append(b)
        frontier = nxt
    mem = list(placed)
    return mem, [placed[m] for m in mem]


def merge_iteration(ws: WorkingSet, cfg: Config, *, min_overlap_len: int,
                    edge_threshold: float, merge_eps: float = 0.0,
                    remove_branches: bool = True,
                    remove_tips: bool = False, max_tip_len: int = 150,
                    reoverlap: bool = True,
                    stats: Optional[List[dict]] = None,
                    dump_dir: Optional[str] = None,
                    dump_tag: str = ""
                    ) -> Tuple[WorkingSet, int]:
    """Greedy disjoint-edge merging (mergeAlongEdges path).

    Merge iterations run with cliques=false, which forces
    remove_branches=true in the driver (``polyte.tune_params.py:704-707``):
    transitive edges go first, branching nodes are disconnected, and edges
    crossing branch-free components are deleted before pairing. Pair
    selection follows getEdgesForMerging (``GraphAlgos.cpp:112-148``):
    scan nodes in id order, take the node's first unprocessed out-neighbor
    in sortEdges order (ascending non-overlap length, target-id tiebreak).

    remove_tips: polyte passes --remove_tips=false on its whole path
    (``polyte.tune_params.py:605,672``), but stage-b leaves the VQ default
    TRUE (``ViralQuasispecies.cpp:85,322``; pipeline_per_stage passes no
    flag) — so tips run in stage-b merge iterations with its
    --max_tip_len 1000 (``HyLight.py:320-323``)."""
    table = _overlaps(ws, cfg, min_overlap_len, reoverlap=reoverlap)
    admitted = admit_edges(table, ws.reads,
                           min_overlap_len=min_overlap_len,
                           edge_threshold=edge_threshold,
                           merge_eps=merge_eps, mate=ws.mate,
                           fr_pairs=ws.fr_layout)
    labels, keep0 = orient_reads(table, ws.n, admitted)
    if dump_dir:
        _dump_graphs(dump_dir, dump_tag, table, labels, keep0, ws)
    offsets_rel = _plus_frame_offsets(table, labels)
    edge_of = {(int(table.qid[e]), int(table.tid[e])): int(e)
               for e in np.nonzero(keep0)[0]}
    out = _SuperreadAccum(ws)
    n_merged = 0

    def _merge_edge_list(g: sr_graph.DiGraph, order: np.ndarray) -> int:
        merged = 0
        for j in order:
            u, v = int(g.u[j]), int(g.v[j])
            rows = [u, v] + [int(ws.mate[r]) for r in (u, v)
                             if int(ws.mate[r]) >= 0]
            rows = list(dict.fromkeys(rows))
            if out.used[np.asarray(rows)].any():
                continue
            # place every row of both fragments in one frame where edges
            # allow; connected groups each become one consensus row. One
            # group = bridged fragments -> a single superread (the
            # reference's S-P / P-P gap closure, SRBuilder.cpp:654-871);
            # two groups stay mates.
            groups: List[Tuple[List[int], List[int]]] = []
            remaining = list(rows)
            while remaining:
                placed, offs = _place_by_edges(remaining, edge_of,
                                               offsets_rel)
                groups.append((placed, offs))
                remaining = [r for r in remaining if r not in set(placed)]
            if len(groups[0][0]) < 2:
                continue  # the primary edge pair could not be placed
            new_ids = []
            emitted = []
            for mem, offs in groups:
                res = consensus_group(ws, labels, mem, offs)
                if res is None:
                    emitted = None
                    break
                emitted.append(res)
            if emitted is None:
                continue
            for res in emitted:
                new_ids.append(out.emit(*res))
            # re-link fragments split across groups (one mate slot per
            # row: first spanning fragment wins)
            grp_of = {}
            for gi, (mem, _) in enumerate(groups):
                for r in mem:
                    grp_of[r] = gi
            for r in rows:
                m = int(ws.mate[r])
                if m >= 0 and m in grp_of and grp_of[r] != grp_of[m]:
                    out.link(new_ids[grp_of[r]], new_ids[grp_of[m]])
            out.used[np.asarray(rows)] = True
            merged += 1
        return merged

    # phase 1 — containment absorption: a mismatch-free row fully inside
    # another merges into its container BEFORE branch clearing. Overlapping
    # cliques emit near-duplicate superreads whose parallel edges otherwise
    # read as branches and freeze the graph (the reference leaves such
    # duplicates to inclusion-edge merges, which branch clearing starves)
    ovl_q = (table.qe - table.qs).astype(np.int64)
    ovl_t = (table.te - table.ts).astype(np.int64)
    mism_ok = (1.0 - table.identity) <= max(merge_eps, 1e-6)
    contain = keep0 & mism_ok & ((ovl_q >= table.qlen) |
                                 (ovl_t >= table.tlen))
    if contain.any():
        g_c = sr_graph.build_digraph(table, labels, contain, ws.n)
        order_c = np.lexsort((g_c.v, g_c.sortkey, g_c.u))
        n_merged += _merge_edge_list(g_c, order_c)

    # phase 2 — the reference pass: transitive reduction, branch clearing,
    # back-edge removal, then getEdgesForMerging pairing over what remains
    keep = keep0 & ~(out.used[table.qid] | out.used[table.tid])
    keep, _ = sr_graph.clean_graph(
        table, labels, keep, remove_trans=1,
        remove_branches=remove_branches, remove_backedges=True,
        remove_tips=remove_tips, max_tip_len=max_tip_len)
    g = sr_graph.build_digraph(table, labels, keep, ws.n)
    order = np.lexsort((g.v, g.sortkey, g.u))
    n_merged += _merge_edge_list(g, order)

    out.emit_trivial()
    nws = out.finish("merge_it", extra=f"{n_merged} merges", table=table,
                     labels=labels)
    if stats is not None:
        stats.append(dict(kind="merge", vertices=int(ws.n),
                          overlaps=int(table.n),
                          edges_admitted=int(np.sum(admitted)),
                          edges_kept=int(np.sum(keep0)),
                          merges=int(n_merged), superreads=int(nws.n),
                          paired=int((nws.mate >= 0).sum()) // 2))
    return nws, n_merged


# ---------------------------------------------------------------------------
# branch reduction (BranchReduction.cpp capability, simplified single-end)

def branch_reduction(table: OverlapTable, ws: WorkingSet,
                     labels: np.ndarray, keep: np.ndarray,
                     thresholds: EvidenceThresholds,
                     orig: Optional[ReadSet] = None,
                     diploid: bool = False, careful: bool = True,
                     min_overlap_len: int = 0) -> np.ndarray:
    """Remove branch edges lacking unique original-read evidence at the
    branches' difference positions (readBasedBranchReduction,
    BranchReduction.cpp:41-227). Both out-branches (node with >=2
    out-edges) and in-branches (>=2 in-edges) are evaluated, with the
    reference's full component machinery:

    - an edge seen from both its in- and out-branch keeps the INTERSECTION
      of the two evidence sets (:360-391);
    - branch pairs whose relative offset leaves less than min_overlap_len
      of shared span are MISSING (inclusion) edges: the earlier branch is
      dropped from the event (dissolving two-way branches) and the event's
      component is a false branch — all its edges removed and archived for
      the next iteration (:447-463, the nonedge carry picks them up);
    - branch events connected through shared nodes form components
      evaluated together with component-wide unique evidence
      (findBranchingComponents :745, countUniqueEvidence :1009-1096);
    - careful mode (the VQ default, careful_diploid=true,
      ViralQuasispecies.cpp:97): a component sharing a node with an
      already-KEPT component is removed outright (:91-204's
      neighboring-component suppression).

    In diploid mode a two-edge component keeps both edges when each has
    unique support and the loads differ by at most 0.5x the threshold
    (typical-double-branch rule, :1098-1168). Returns updated keep mask."""
    orig_rs = orig if orig is not None else \
        (ws.ctx.orig if ws.ctx is not None else None)
    if orig_rs is None:
        return keep
    offsets_rel = _plus_frame_offsets(table, labels)
    idx = np.nonzero(keep)[0]
    out_edges: Dict[int, List[Tuple[int, int, int]]] = {}
    in_edges: Dict[int, List[Tuple[int, int, int]]] = {}
    for e in idx:
        q, t = int(table.qid[e]), int(table.tid[e])
        off = int(offsets_rel[e])    # t starts at off in q's frame
        if off > 0:
            out_edges.setdefault(q, []).append((t, off, int(e)))
            in_edges.setdefault(t, []).append((q, -off, int(e)))
        elif off < 0:
            out_edges.setdefault(t, []).append((q, -off, int(e)))
            in_edges.setdefault(q, []).append((t, off, int(e)))

    # ---- per-event evidence (+ missing-edge detection) -----------------
    events = []   # (hub, [(v, off, e)], is_out, ev per edge, dist, false?)
    edge_evidence: Dict[int, set] = {}
    for hub, branches, is_out in \
            [(u, o, True) for u, o in sorted(out_edges.items())] + \
            [(v, i, False) for v, i in sorted(in_edges.items())]:
        if len(branches) < 2:
            continue
        ev = _branch_event(ws, orig_rs, labels, hub, branches, is_out,
                           min_overlap_len)
        if ev is None:
            continue
        kept_branches, per_edge_ev, dist, has_missing = ev
        for e, ids in per_edge_ev.items():
            if e in edge_evidence:
                edge_evidence[e] &= ids        # in/out intersection
            else:
                edge_evidence[e] = set(ids)
        events.append((hub, kept_branches, dist, has_missing))

    # ---- components over shared nodes ----------------------------------
    comp_of: Dict[int, int] = {}

    def find(x):
        while comp_of.get(x, x) != x:
            comp_of[x] = comp_of.get(comp_of[x], comp_of[x])
            x = comp_of[x]
        return x

    comps: Dict[int, Dict] = {}
    for ei, (hub, kept_branches, dist, has_missing) in enumerate(events):
        nodes = [hub] + [v for v, _, _ in kept_branches]
        roots = {find(n) for n in nodes if n in comp_of}
        root = min(roots) if roots else min(nodes)
        for r in list(roots):
            comp_of[r] = root
        for n in nodes:
            comp_of.setdefault(n, root)
            comp_of[find(n)] = root
        c = comps.setdefault(root, dict(edges=set(), nodes=set(),
                                        dist=0, false=False))
        c["edges"].update(e for _, _, e in kept_branches)
        c["nodes"].update(nodes)
        c["dist"] = max(c["dist"], dist)
        c["false"] = c["false"] or has_missing
    # re-root after unions
    merged: Dict[int, Dict] = {}
    for root, c in comps.items():
        r = find(root)
        m = merged.setdefault(r, dict(edges=set(), nodes=set(),
                                      dist=0, false=False))
        m["edges"] |= c["edges"]
        m["nodes"] |= c["nodes"]
        m["dist"] = max(m["dist"], c["dist"])
        m["false"] = m["false"] or c["false"]

    drop = set()
    kept_nodes: set = set()
    for root in sorted(merged):
        c = merged[root]
        if c["false"]:
            drop |= c["edges"]
            continue
        if careful and (c["nodes"] & kept_nodes):
            drop |= c["edges"]               # neighboring-component suppress
            continue
        need = thresholds.min_ev(c["dist"])
        edges = sorted(c["edges"])
        # component-wide unique evidence: ids supporting >1 edge don't count
        from collections import Counter
        cnt = Counter(x for e in edges for x in edge_evidence.get(e, ()))
        uniq = {e: sum(1 for x in edge_evidence.get(e, ()) if cnt[x] == 1)
                for e in edges}
        if diploid and len(edges) == 2:
            e1, e2 = edges
            u1, u2 = uniq[e1], uniq[e2]
            if u1 > 0 and u2 > 0:
                if abs(u1 - u2) > 0.5 * max(need, 1):
                    drop.add(e2 if u1 > u2 else e1)
                kept_nodes |= c["nodes"]
                continue
            if u1 > 0 or u2 > 0:
                drop.add(e2 if u1 > 0 else e1)
                kept_nodes |= c["nodes"]
                continue
            drop |= {e1, e2}
            continue
        any_kept = False
        for e in edges:
            if need <= 0 or uniq[e] >= need:
                any_kept = True
            else:
                drop.add(e)
        if any_kept:
            kept_nodes |= c["nodes"]
    if drop:
        log.info("[SR::branch_red] removed %d branch edges", len(drop))
        keep = keep.copy()
        keep[list(drop)] = False
    return keep


def _branch_event(ws: WorkingSet, orig_rs: ReadSet, labels: np.ndarray,
                  hub: int, branches: List[Tuple[int, int, int]],
                  is_out: bool, min_overlap_len: int):
    """Evaluate one branching node: difference positions, missing-inclusion
    pairs, per-edge evidence. Returns (kept branches, evidence per edge id,
    max distance, has_missing) or None when the event dissolves."""
    seqs = {}
    for v, off, _e in branches:
        s, _ = _member_arrays(ws, labels, v)
        seqs[v] = (off, s)
    diffs = set()
    max_dist = 0
    has_missing = False
    missing_nodes = set()
    base_off = min(o for o, _ in seqs.values())
    for i in range(len(branches)):
        for j in range(i + 1, len(branches)):
            vi, oi, _ = branches[i]
            vj, oj, _ = branches[j]
            (o1, s1), (o2, s2) = seqs[vi], seqs[vj]
            if is_out and min_overlap_len > 0:
                # missing-inclusion pair (buildDiffListOut :447-463): the
                # later branch starts past the earlier one's admissible
                # overlap window -> they cannot share an edge
                early, late = (vi, vj) if o1 <= o2 else (vj, vi)
                rel = abs(o1 - o2)
                elen = len(seqs[early][1])
                if rel > elen - min_overlap_len:
                    missing_nodes.add(early)
                    has_missing = True
                    continue
            lo = max(o1, o2)
            hi = min(o1 + len(s1), o2 + len(s2))
            if hi <= lo:
                continue
            a = s1[lo - o1:hi - o1]
            b = s2[lo - o2:hi - o2]
            d = np.nonzero((a != b) & (a < 4) & (b < 4))[0] + lo
            for p in d:
                diffs.add(int(p))
            if len(d):
                if is_out:
                    max_dist = max(max_dist, int(d[-1]) - base_off + 1)
                else:
                    max_dist = max(max_dist, 1 - int(d[0]))
    kept_branches = [b for b in branches if b[0] not in missing_nodes]
    if len(kept_branches) < 2:
        return None if not has_missing else ([], {}, max_dist, True)
    if not diffs:
        return None
    diffs = sorted(diffs)
    frag = ws.ctx.frag if ws.ctx is not None else None
    per_edge_ev: Dict[int, set] = {}
    for v, off, e in kept_branches:
        _o, s = seqs[v]
        reads_ev = set()
        for orig_id, so, sori in ws.subreads[v]:
            oseq = orig_rs.get(orig_id)
            if sori:
                oseq = revcomp_codes(oseq)
            a, b = off + so, off + so + len(oseq)
            covered = [p for p in diffs if a <= p < b]
            if not covered:
                continue
            if all(oseq[p - a] == s[p - off] for p in covered
                   if s[p - off] < 4):
                reads_ev.add(int(frag[orig_id]) if frag is not None
                             else orig_id)
        per_edge_ev[e] = reads_ev
    return kept_branches, per_edge_ev, max_dist, has_missing


# ---------------------------------------------------------------------------
# mate-side bridging (merge_self_overlap, SRBuilder.cpp:872)

def join_mates(ws: WorkingSet, cfg: Config, min_overlap_len: int,
               merge_eps: float = 1e-6) -> Tuple[WorkingSet, int]:
    """Collapse PE superreads whose two sides overlap mismatch-free into a
    single row (the reference merges self-overlapping PE superreads during
    construction; here it runs as a pass over the paired rows)."""
    pr = np.nonzero(ws.mate >= 0)[0]
    if len(pr) < 2:
        return ws, 0
    sub = ws.reads.subset(pr)
    table = _overlaps(WorkingSet.from_reads(sub), cfg, min_overlap_len)
    if table.n == 0:
        return ws, 0
    gq = pr[table.qid]            # global row ids
    gt = pr[table.tid]
    same_unit = ws.mate[gq] == gt
    ovl = np.minimum(table.qe - table.qs, table.te - table.ts)
    good = same_unit & (ovl >= min_overlap_len) & \
        (1.0 - table.identity <= merge_eps)
    out = _SuperreadAccum(ws)
    n_joined = 0
    # best joining overlap per unit, highest score first
    gidx = np.nonzero(good)[0]
    for e in gidx[np.argsort(-table.score[gidx], kind="stable")]:
        a, b = int(gq[e]), int(gt[e])
        if out.used[a] or out.used[b]:
            continue
        labels = np.zeros(ws.n, dtype=np.int8)
        labels[b] = int(table.strand[e])
        qs = int(table.qs[e])
        ts = int(table.tlen[e] - table.te[e]) if table.strand[e] \
            else int(table.ts[e])
        res = consensus_group(ws, labels, [a, b], [0, qs - ts])
        if res is None:
            continue
        out.emit(*res)
        out.used[a] = out.used[b] = True
        n_joined += 1
    if n_joined == 0:
        return ws, 0
    out.emit_trivial()
    return out.finish("join_mates", extra=f"{n_joined} joined"), n_joined


# ---------------------------------------------------------------------------
# the per-cluster driver (polyte.tune_params.run_savage_assembly equivalent)

def _dump_graphs(dump_dir: str, tag: str, table: OverlapTable,
                 labels: np.ndarray, keep: np.ndarray,
                 ws: WorkingSet) -> None:
    """VQ debug artifacts per iteration: digraph.txt + graph.fastg
    (OverlapGraph.cpp:388,412; --graph_only comparison mode). Opt-in via
    SRCoreConfig.graph_dumps."""
    import os

    from hylight_tpu.graph.gfa import digraph_text, fastg_text

    os.makedirs(dump_dir, exist_ok=True)
    g = sr_graph.build_digraph(table, labels, keep, ws.n)
    with open(os.path.join(dump_dir, f"digraph{tag}.txt"), "w") as f:
        f.write(digraph_text(g))
    with open(os.path.join(dump_dir, f"graph{tag}.fastg"), "w") as f:
        f.write(fastg_text(g, ws.reads, labels))


def sr_assemble(reads: ReadSet, cfg: Config,
                use_branch_reduction: bool = True,
                stats: Optional[List[dict]] = None) -> ReadSet:
    """Assemble one read cluster into strain-resolved contigs.

    Paired-end reads (names ending '/1' '/2') enter as mate-linked rows;
    pairs travel through cliques/merges together and collapse to single
    contigs once bridged (join_mates). Final contigs are the single
    superreads, matching polyte's contigs = singles.fastq
    (``polyte.tune_params.py:367-369``); if a cluster produced no singles
    the remaining rows are emitted as-is (defensive deviation)."""
    sc: SRCoreConfig = cfg.sr_core
    if reads.n < 2:
        return ReadSet.from_seqs([])
    mate = mate_from_names(reads)
    has_pe = bool((mate >= 0).any())
    ws = WorkingSet.from_reads(reads, mate=mate,
                               ctx=SRContext.from_reads(reads, mate))

    # iteration 1: clique-based error correction
    ws = clique_iteration(ws, cfg, min_overlap_len=sc.min_overlap_len_ec,
                          edge_threshold=sc.edge_threshold_ec,
                          min_clique_size=sc.min_clique_size, trim=True,
                          stats=stats, dump_dir=sc.graph_dumps,
                          dump_tag="_it0")
    if has_pe:
        ws, _ = join_mates(ws, cfg, sc.min_overlap_len)

    # outer convergence loop (polyte run_savage_assembly :629-650): merge
    # simple paths until the read count is stable twice, then one clique +
    # branch-reduction iteration; repeat until nothing changes
    thresholds = EvidenceThresholds.from_config(sc) if use_branch_reduction \
        else None
    stable = 0
    its = 0
    # reoverlap=False: reference-exact overlap sourcing — every iteration
    # after the first consumes FNO1 projection + nonedge carry only, like
    # polyte's loop reading the previous VQ run's overlaps.txt (--FNO=1)
    reovl = sc.reoverlap
    while stable < 2 and its < sc.max_iterations:
        while stable < 2 and its < sc.max_iterations:
            prev = ws.n
            ws, n_merged = merge_iteration(
                ws, cfg, min_overlap_len=sc.min_overlap_len,
                edge_threshold=sc.edge_threshold, merge_eps=1e-4,
                reoverlap=reovl, stats=stats)
            if has_pe:
                ws, nj = join_mates(ws, cfg, sc.min_overlap_len)
                n_merged += nj
            its += 1
            stable = stable + 1 if (ws.n == prev or n_merged == 0) else 0
        prev = ws.n
        ws = clique_iteration(ws, cfg, min_overlap_len=sc.min_overlap_len,
                              edge_threshold=sc.edge_threshold,
                              min_clique_size=2, trim=False, merge_eps=1e-4,
                              thresholds=thresholds, reoverlap=reovl,
                              stats=stats)
        if has_pe:
            ws, _ = join_mates(ws, cfg, sc.min_overlap_len)
        its += 1
        stable = stable + 1 if ws.n == prev else 0

    # final cleanup: drop never-merged single-read superreads (tips/
    # singletons, polyte.tune_params.py:669-675) and rows still paired
    # (contigs = singles.fastq)
    keep = [i for i in range(ws.n)
            if len(ws.subreads[i]) > 1 and int(ws.mate[i]) < 0]
    if not keep:
        keep = [i for i in range(ws.n) if len(ws.subreads[i]) > 1]
    if keep:
        out = ws.reads.subset(keep)
    else:
        out = ws.reads
    out.names = [f"c{i}" for i in range(out.n)]
    if sc.diploid and out.n >= 2:
        out = diploid_stage(out, cfg,
                            subreads=[list(ws.subreads[i]) for i in keep]
                            if keep else [list(sr_) for sr_ in ws.subreads],
                            ctx=ws.ctx)
    return out


def diploid_stage(contigs: ReadSet, cfg: Config,
                  subreads: Optional[List] = None,
                  ctx: Optional[SRContext] = None) -> ReadSet:
    """Final diploid contig merging (polyte.tune_params.py:371-418): re-run
    the core over the assembly's contigs with mismatch-rate admission
    (edge_threshold=1), min_clique_size=2, diploid branch reduction
    (typical-double-branch rule), and a keep_singletons=max_tip_len length
    gate on the final output.

    When sr_assemble passes the contigs' subread provenance + original-read
    context, diploid branch evidence comes from the ORIGINAL reads — the
    reference re-reads the original fastq for its diploid BranchReduction
    (ViralQuasispecies.cpp:326-344). Without provenance (standalone calls)
    the stage's input contigs act as their own evidence (documented
    fallback)."""
    sc = cfg.sr_core
    mol = sc.diploid_overlap_len or sc.min_overlap_len
    work = contigs
    widx = np.arange(contigs.n)
    if sc.diploid_contig_len:
        idx = np.nonzero(contigs.lengths >= sc.diploid_contig_len)[0]
        if len(idx) < 2:
            return contigs
        work = contigs.subset(idx)
        widx = idx
    if subreads is not None and ctx is not None:
        ws = WorkingSet(reads=work,
                        subreads=[list(subreads[i]) for i in widx],
                        ctx=ctx)
    else:
        ws = WorkingSet.from_reads(work, ctx=SRContext.from_reads(work))
    thresholds = EvidenceThresholds.from_config(sc)

    stable = 0
    its = 0
    # the reference's diploid stage re-runs sfo ONCE on the contigs
    # (tune_params.py:393-398) — the first iteration here re-overlaps
    # regardless (fresh WorkingSet has no proj/carry), later ones follow
    # sc.reoverlap like the main loop
    reovl = sc.reoverlap
    while stable < 2 and its < sc.max_iterations:
        prev = ws.n
        ws = clique_iteration(ws, cfg, min_overlap_len=mol,
                              edge_threshold=1.0, min_clique_size=2,
                              trim=False, merge_eps=sc.seq_err,
                              thresholds=thresholds, diploid=True,
                              reoverlap=reovl)
        its += 1
        stable = stable + 1 if ws.n == prev else 0
        while stable < 2 and its < sc.max_iterations:
            prev = ws.n
            ws, n_merged = merge_iteration(
                ws, cfg, min_overlap_len=mol, edge_threshold=1.0,
                merge_eps=sc.seq_err, reoverlap=reovl)
            its += 1
            stable = stable + 1 if (ws.n == prev or n_merged == 0) else 0

    # keep_singletons = max_tip_len in the diploid final iteration
    keep = [i for i in range(ws.n)
            if len(ws.subreads[i]) > 1
            or int(ws.reads.lengths[i]) >= sc.max_tip_len]
    out = ws.reads.subset(keep) if keep else ws.reads
    out.names = [f"d{i}" for i in range(out.n)]
    log.info("[SR::diploid] %d contigs -> %d diploid contigs",
             contigs.n, out.n)
    return out
