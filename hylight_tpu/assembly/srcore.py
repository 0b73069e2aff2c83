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
- reads are single-end units; paired-end insert constraints enter through
  the evidence table's PE term (full PE dual-consensus is a later round).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from hylight_tpu.config import Config, SRCoreConfig
from hylight_tpu.assembly.evidence import EvidenceThresholds
from hylight_tpu.graph.cliques import max_cliques
from hylight_tpu.io.readset import ReadSet, revcomp_codes
from hylight_tpu.overlap.engine import find_overlaps
from hylight_tpu.overlap.table import OverlapTable
from hylight_tpu.utils import get_logger

log = get_logger()

DEFAULT_PHRED = 30


@dataclass
class WorkingSet:
    """Current superreads + provenance of original reads inside them."""

    reads: ReadSet
    # per working read: list of (orig_read_id, offset, ori)
    subreads: List[List[Tuple[int, int, int]]] = field(default_factory=list)

    @staticmethod
    def from_reads(rs: ReadSet) -> "WorkingSet":
        return WorkingSet(reads=rs,
                          subreads=[[(i, 0, 0)] for i in range(rs.n)])

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


def score_edges(table: OverlapTable, rs: ReadSet) -> np.ndarray:
    """Bayesian overlap score per edge (EdgeCalculator.cpp:26-139 math with
    mean-phred columns): exp(mean log p) over verified columns."""
    if table.n == 0:
        return np.zeros(0)
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
                edge_threshold: float, merge_eps: float = 0.0) -> np.ndarray:
    """Admission rule (EdgeCalculator.cpp:404-409): score > threshold OR
    mismatch_rate <= merge_eps; plus the overlap length gate."""
    if table.n == 0:
        return np.zeros(0, dtype=bool)
    score = score_edges(table, rs)
    mism_rate = 1.0 - table.identity
    length_ok = np.minimum(table.qe - table.qs, table.te - table.ts) \
        >= min_overlap_len
    return length_ok & ((score > edge_threshold) | (mism_rate <= merge_eps))


# ---------------------------------------------------------------------------
# orientation labelling (vertexLabellingHeuristic, GraphAlgos.cpp:178-349)

def orient_reads(table: OverlapTable, n: int, admitted: np.ndarray
                 ) -> Tuple[np.ndarray, np.ndarray]:
    """BFS parity labelling; returns (labels[n], keep_mask over edges).

    Edges whose strand disagrees with the label parity are dropped (the
    reference shuffles seeds x100 to minimize these; we do one
    deterministic pass in read-id order)."""
    labels = np.full(n, -1, dtype=np.int8)
    adj: List[List[Tuple[int, int, int]]] = [[] for _ in range(n)]
    idxs = np.nonzero(admitted)[0]
    for e in idxs:
        q, t, s = int(table.qid[e]), int(table.tid[e]), int(table.strand[e])
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
                                        List[Tuple[int, int, int]]]]:
    """Weighted-majority consensus of oriented members at given offsets.

    Returns (codes, quals, subreads) or None if everything got trimmed.
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
    votes = np.zeros((L, 4), dtype=np.int64)
    support = np.zeros(L, dtype=np.int32)
    for o, s, q in zip(offs, seqs, quals):
        pos = np.arange(o, o + len(s))
        ok = s < 4
        np.add.at(votes, (pos[ok], s[ok].astype(np.int64)),
                  q[ok].astype(np.int64))
        support[o:o + len(s)] += 1

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
    for r, o in zip(members, offs):
        r = int(r)
        rl = len(ws.reads.get(r))
        flip = int(labels[r])
        for orig, so, sori in ws.subreads[r]:
            if flip:
                so = rl - so - _orig_len(ws, orig, sori)
                sori ^= 1
            subs.append((orig, int(o) + so - lo, sori))
    return cons, newq, subs


_ORIG_LENS: Dict[int, int] = {}


def _orig_len(ws: WorkingSet, orig: int, ori: int) -> int:
    return _ORIG_LENS.get(orig, 0)


def set_orig_lens(rs: ReadSet) -> None:
    """Register original read lengths for subread reorientation."""
    global _ORIG_LENS
    _ORIG_LENS = {i: int(l) for i, l in enumerate(rs.lengths)}


# ---------------------------------------------------------------------------
# iterations

def _overlaps(ws: WorkingSet, cfg: Config, min_len: int) -> OverlapTable:
    from dataclasses import replace
    oc = replace(cfg.overlap_sr, min_ovlp_len=min_len)
    qb = 256 if ws.n > 256 else max(8, ws.n)
    return find_overlaps(ws.reads, cfg=oc, query_block=qb)


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
                     thresholds: Optional[EvidenceThresholds] = None
                     ) -> WorkingSet:
    """One clique-based iteration (EC when trim=True)."""
    table = _overlaps(ws, cfg, min_overlap_len)
    admitted = admit_edges(table, ws.reads,
                           min_overlap_len=min_overlap_len,
                           edge_threshold=edge_threshold,
                           merge_eps=merge_eps)
    labels, keep = orient_reads(table, ws.n, admitted)
    if thresholds is not None:
        keep = branch_reduction(table, ws, labels, keep, thresholds)
    idx = np.nonzero(keep)[0]
    edge_of = {(int(table.qid[e]), int(table.tid[e])): int(e) for e in idx}
    cliques = max_cliques(
        ws.n, table.qid[idx], table.tid[idx])
    cliques = [c for c in cliques if len(c) >= min_clique_size]

    new_reads: List[np.ndarray] = []
    new_quals: List[np.ndarray] = []
    new_subs: List[List[Tuple[int, int, int]]] = []
    in_clique = np.zeros(ws.n, dtype=bool)
    for c in cliques:
        offs = _star_offsets(table, labels, c, edge_of)
        if offs is None:
            continue
        res = consensus_group(ws, labels, c, offs,
                              min_support=min_clique_size, trim=trim)
        if res is None:
            continue
        seq, qual, subs = res
        new_reads.append(seq)
        new_quals.append(qual)
        new_subs.append(subs)
        in_clique[c] = True

    # trivial superreads: reads in no clique survive unchanged
    zero_labels = np.zeros(ws.n, dtype=np.int8)
    for r in np.nonzero(~in_clique)[0]:
        s, q = _member_arrays(ws, zero_labels, int(r))
        new_reads.append(s)
        new_quals.append(q)
        new_subs.append(list(ws.subreads[r]))

    rs = ReadSet.from_seqs(new_reads, quals=new_quals,
                           names=[str(i) for i in range(len(new_reads))])
    log.info("[SR::clique_it] %d reads -> %d cliques -> %d superreads",
             ws.n, len(cliques), rs.n)
    return WorkingSet(reads=rs, subreads=new_subs)


def merge_iteration(ws: WorkingSet, cfg: Config, *, min_overlap_len: int,
                    edge_threshold: float, merge_eps: float = 0.0
                    ) -> Tuple[WorkingSet, int]:
    """Greedy disjoint-edge merging (mergeAlongEdges path)."""
    table = _overlaps(ws, cfg, min_overlap_len)
    admitted = admit_edges(table, ws.reads,
                           min_overlap_len=min_overlap_len,
                           edge_threshold=edge_threshold,
                           merge_eps=merge_eps)
    labels, keep = orient_reads(table, ws.n, admitted)
    score = score_edges(table, ws.reads)
    idx = np.nonzero(keep)[0]
    idx = idx[np.argsort(-score[idx], kind="stable")]
    offsets_rel = _plus_frame_offsets(table, labels)

    used = np.zeros(ws.n, dtype=bool)
    new_reads, new_quals, new_subs = [], [], []
    n_merged = 0
    for e in idx:
        q, t = int(table.qid[e]), int(table.tid[e])
        if used[q] or used[t]:
            continue
        res = consensus_group(ws, labels, [q, t], [0, int(offsets_rel[e])])
        if res is None:
            continue
        seq, qual, subs = res
        new_reads.append(seq)
        new_quals.append(qual)
        new_subs.append(subs)
        used[q] = used[t] = True
        n_merged += 1
    zero_labels = np.zeros(ws.n, dtype=np.int8)
    for r in np.nonzero(~used)[0]:
        s, q = _member_arrays(ws, zero_labels, int(r))
        new_reads.append(s)
        new_quals.append(q)
        new_subs.append(list(ws.subreads[r]))
    rs = ReadSet.from_seqs(new_reads, quals=new_quals,
                           names=[str(i) for i in range(len(new_reads))])
    log.info("[SR::merge_it] %d reads, %d merges -> %d", ws.n, n_merged, rs.n)
    return WorkingSet(reads=rs, subreads=new_subs), n_merged


# ---------------------------------------------------------------------------
# branch reduction (BranchReduction.cpp capability, simplified single-end)

def branch_reduction(table: OverlapTable, ws: WorkingSet,
                     labels: np.ndarray, keep: np.ndarray,
                     thresholds: EvidenceThresholds,
                     orig: Optional[ReadSet] = None) -> np.ndarray:
    """Remove out-branch edges lacking unique original-read evidence at the
    branches' difference positions. Returns updated keep mask."""
    orig_rs = orig if orig is not None else _ORIG_READS
    if orig_rs is None:
        return keep
    offsets_rel = _plus_frame_offsets(table, labels)
    idx = np.nonzero(keep)[0]
    out_edges: Dict[int, List[Tuple[int, int, int]]] = {}
    for e in idx:
        q, t = int(table.qid[e]), int(table.tid[e])
        off = int(offsets_rel[e])    # t starts at off in q's frame
        if off > 0:
            out_edges.setdefault(q, []).append((t, off, int(e)))
        elif off < 0:
            out_edges.setdefault(t, []).append((q, -off, int(e)))

    drop = set()
    for u, outs in out_edges.items():
        if len(outs) < 2:
            continue
        seqs = {}
        for v, off, _e in outs:
            s, _ = _member_arrays(ws, labels, v)
            seqs[v] = (off, s)
        # difference positions (u-frame) over all branch pairs
        diffs = set()
        max_dist = 0
        base_off = min(o for o, _ in seqs.values())
        for i in range(len(outs)):
            for j in range(i + 1, len(outs)):
                (o1, s1), (o2, s2) = seqs[outs[i][0]], seqs[outs[j][0]]
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
                    max_dist = max(max_dist, int(d[-1]) - base_off + 1)
        if not diffs:
            continue
        diffs = sorted(diffs)
        need = thresholds.min_ev(max_dist)
        if need <= 0:
            continue
        # evidence: original subreads of each branch matching the branch's
        # bases at every covered diff position (>=1 covered)
        ev: Dict[int, set] = {}
        for v, off, _e in outs:
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
                    reads_ev.add(orig_id)
            ev[v] = reads_ev
        # unique evidence: reads supporting >1 branch don't count
        from collections import Counter
        cnt = Counter(x for s_ in ev.values() for x in s_)
        for v, off, e in outs:
            uniq = sum(1 for x in ev[v] if cnt[x] == 1)
            if uniq < need:
                drop.add(e)
    if drop:
        log.info("[SR::branch_red] removed %d branch edges", len(drop))
        keep = keep.copy()
        keep[list(drop)] = False
    return keep


_ORIG_READS: Optional[ReadSet] = None


# ---------------------------------------------------------------------------
# the per-cluster driver (polyte.tune_params.run_savage_assembly equivalent)

def sr_assemble(reads: ReadSet, cfg: Config,
                use_branch_reduction: bool = True) -> ReadSet:
    """Assemble one read cluster into strain-resolved contigs."""
    global _ORIG_READS
    sc: SRCoreConfig = cfg.sr_core
    if reads.n < 2:
        return ReadSet.from_seqs([])
    set_orig_lens(reads)
    _ORIG_READS = reads
    ws = WorkingSet.from_reads(reads)

    # iteration 1: clique-based error correction
    ws = clique_iteration(ws, cfg, min_overlap_len=sc.min_overlap_len_ec,
                          edge_threshold=sc.edge_threshold_ec,
                          min_clique_size=sc.min_clique_size, trim=True)

    # merge iterations until stable twice (pipeline_per_stage.py:141-159)
    stable = 0
    for _ in range(sc.max_iterations):
        prev = ws.n
        ws, n_merged = merge_iteration(
            ws, cfg, min_overlap_len=sc.min_overlap_len,
            edge_threshold=sc.edge_threshold, merge_eps=1e-4)
        if ws.n == prev or n_merged == 0:
            stable += 1
            if stable >= 2:
                break
        else:
            stable = 0

    # clique + branch-reduction iteration
    thresholds = EvidenceThresholds.from_config(sc) if use_branch_reduction \
        else None
    ws = clique_iteration(ws, cfg, min_overlap_len=sc.min_overlap_len,
                          edge_threshold=sc.edge_threshold,
                          min_clique_size=2, trim=False, merge_eps=1e-4,
                          thresholds=thresholds)

    # final cleanup: drop never-merged single-read superreads (tips/singletons,
    # polyte.tune_params.py:669-675)
    keep = [i for i in range(ws.n) if len(ws.subreads[i]) > 1]
    if keep:
        out = ws.reads.subset(keep)
    else:
        out = ws.reads
    out.names = [f"c{i}" for i in range(out.n)]
    _ORIG_READS = None
    return out
