"""SR overlap-graph cleaning passes (GraphAlgos.cpp capability).

The reference cleans the short-read overlap graph between edge scoring and
superread construction in every ViralQuasispecies iteration
(``ViralQuasispecies.cpp:297-367``):

  sortEdges -> vertexLabelling -> [removeInclusions] -> removeTransitiveEdges
  -> [removeTips] -> BranchReduction | removeBranches -> cycleRemovalHeuristic

This module provides those passes as vectorized numpy ops over the directed
edge list derived from an OverlapTable + orientation labels. Semantics are
taken from ``tools/HaploConduct/src/GraphAlgos.cpp`` (cited per function);
the graphs here are small (post-admission cluster graphs), so host numpy is
the right altitude — device work stays in the overlap/consensus kernels.

Directionality: an overlap edge points u -> v when v starts strictly after u
in the common plus-strand frame (offset > 0); offset == 0 ties (inclusions /
equal starts) point from the longer read to the shorter, then from the lower
id to the higher — matching the reference's convention that the contained
read is the edge's "read 2" (EdgeCalculator.cpp:143-385 case analysis).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np


@dataclass
class DiGraph:
    """Directed edge-list view over kept overlap-table edges."""

    n: int
    u: np.ndarray        # int64 [E] source read
    v: np.ndarray        # int64 [E] dest read (starts at/after u)
    eidx: np.ndarray     # int64 [E] row index into the OverlapTable
    ovlen: np.ndarray    # int64 [E] overlap span (min of the two sides)
    ext_u: np.ndarray    # int64 [E] u's prefix before v starts (>= 0)
    ext_v: np.ndarray    # int64 [E] v's suffix past u's end (0 => inclusion)
    sortkey: np.ndarray  # int64 [E] non-overlap length (sortEdges key,
    #                      OverlapGraph.cpp:722-764: len1+len2-2*ovlen)

    @property
    def n_edges(self) -> int:
        return len(self.u)


def build_digraph(table, labels: np.ndarray, keep: np.ndarray,
                  n: Optional[int] = None) -> DiGraph:
    """Directed graph from admitted edges in the all-'+' label frame."""
    if n is None:
        n = len(labels)
    idx = np.nonzero(keep)[0]
    q = table.qid[idx].astype(np.int64)
    t = table.tid[idx].astype(np.int64)
    qlen = table.qlen[idx].astype(np.int64)
    tlen = table.tlen[idx].astype(np.int64)
    # plus-frame start offsets (srcore._plus_frame_offsets inlined)
    qs = np.where(labels[q] == 1, qlen - table.qe[idx], table.qs[idx])
    ts = np.where(labels[t] == 1, tlen - table.te[idx], table.ts[idx])
    off = (qs - ts).astype(np.int64)  # t starts at +off in q's frame

    fwd = (off > 0) | ((off == 0) & ((qlen > tlen) |
                                     ((qlen == tlen) & (q < t))))
    u = np.where(fwd, q, t)
    v = np.where(fwd, t, q)
    ulen = np.where(fwd, qlen, tlen)
    vlen = np.where(fwd, tlen, qlen)
    aoff = np.abs(off)

    ovlen = np.minimum(ulen - aoff, vlen)
    ext_v = np.maximum(aoff + vlen - ulen, 0)
    return DiGraph(n=int(n),
                   u=u, v=v, eidx=idx.astype(np.int64),
                   ovlen=ovlen.astype(np.int64),
                   ext_u=aoff, ext_v=ext_v.astype(np.int64),
                   sortkey=(ulen + vlen - 2 * ovlen).astype(np.int64))


# ---------------------------------------------------------------------------
# transitive edges (findTransEdges, GraphAlgos.cpp:746-776)

def _edge_hits(n: int, u: np.ndarray, v: np.ndarray,
               pu: np.ndarray, pv: np.ndarray) -> np.ndarray:
    """Membership of probe edges (pu, pv) in edge set (u, v)."""
    if len(u) == 0 or len(pu) == 0:
        return np.zeros(len(pu), dtype=bool)
    skey = np.sort(u * n + v)
    probe = pu * n + pv
    pos = np.searchsorted(skey, probe)
    pos = np.minimum(pos, len(skey) - 1)
    return skey[pos] == probe


def transitive_once(n: int, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """bool[E]: edge (u,v) is transitive — ∃w: u→w ∧ w→v (nonemptyIntersect
    of out(u) and in(v), GraphAlgos.cpp:756)."""
    E = len(u)
    if E == 0:
        return np.zeros(0, dtype=bool)
    order = np.argsort(u, kind="stable")
    us, vs = u[order], v[order]
    start = np.searchsorted(us, np.arange(n + 1))
    deg = (start[u + 1] - start[u]).astype(np.int64)
    tot = int(deg.sum())
    if tot == 0:
        return np.zeros(E, dtype=bool)
    eids = np.repeat(np.arange(E), deg)
    ofs = np.arange(tot) - np.repeat(np.cumsum(deg) - deg, deg)
    w = vs[start[u[eids]] + ofs]
    hit = _edge_hits(n, u, v, w, v[eids]) & (w != v[eids])
    return np.bincount(eids[hit], minlength=E) > 0


def transitive_mask(n: int, u: np.ndarray, v: np.ndarray,
                    level: int = 1) -> np.ndarray:
    """Edges removed by removeTransitiveEdges with remove_trans=level
    (GraphAlgos.cpp:938-1123): level 1 removes transitive edges of G; level k
    iterates findTransEdges on the transitive-edge graph and removes only the
    LAST level's edges (the EC iteration uses level 2, polyte
    ``run_viralquasispecies``: remove_trans = 2 if EC else 1)."""
    cur = np.ones(len(u), dtype=bool)  # current-level edge subset
    t = np.zeros(len(u), dtype=bool)
    for _ in range(level):
        sub = np.nonzero(cur)[0]
        if len(sub) == 0:
            return np.zeros(len(u), dtype=bool)
        t = np.zeros(len(u), dtype=bool)
        t[sub] = transitive_once(n, u[sub], v[sub])
        cur = t
    return t


def trans_branch_deletions(g: DiGraph, trans: np.ndarray) -> np.ndarray:
    """Extra deletions when remove_trans==1 and branch_reduction>0
    (GraphAlgos.cpp:967-993): for every transitive edge u→v with overlap
    length L, delete out-edges of u and in-edges of v whose overlap ≤ L.
    Returns bool[E] marking edges to delete (the transitive edges
    themselves are handled by the caller)."""
    E = g.n_edges
    out = np.zeros(E, dtype=bool)
    tidx = np.nonzero(trans)[0]
    if len(tidx) == 0:
        return out
    # max transitive overlap threshold per source node / per dest node
    thr_out = np.full(g.n, -1, dtype=np.int64)
    np.maximum.at(thr_out, g.u[tidx], g.ovlen[tidx])
    thr_in = np.full(g.n, -1, dtype=np.int64)
    np.maximum.at(thr_in, g.v[tidx], g.ovlen[tidx])
    out = (g.ovlen <= thr_out[g.u]) | (g.ovlen <= thr_in[g.v])
    return out


# ---------------------------------------------------------------------------
# removeBranches (GraphAlgos.cpp:835-936 + findBranchfreeGraph :714-743)

def _components(n: int, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Connected components via numpy union-find with path halving."""
    parent = np.arange(n, dtype=np.int64)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(u.tolist(), v.tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # compress
    for i in range(n):
        parent[i] = find(i)
    return parent


def branch_removal_mask(g: DiGraph) -> np.ndarray:
    """Edges deleted by removeBranches(): transitive-reduce, clear out-edges
    of out-branching nodes and in-edges of in-branching nodes (an edge
    survives the branch-free graph only if kept on BOTH sides — the
    reference's asymmetric clears are reconciled at traversal time,
    GraphAlgos.cpp:877-909), connected components of the survivor graph,
    then delete every original edge crossing components."""
    E = g.n_edges
    if E == 0:
        return np.zeros(0, dtype=bool)
    trans = transitive_once(g.n, g.u, g.v)
    ru, rv = g.u[~trans], g.v[~trans]
    outdeg = np.bincount(ru, minlength=g.n)
    indeg = np.bincount(rv, minlength=g.n)
    surv = (outdeg[ru] <= 1) & (indeg[rv] <= 1)
    comp = _components(g.n, ru[surv], rv[surv])
    return comp[g.u] != comp[g.v]


# ---------------------------------------------------------------------------
# removeTips (GraphAlgos.cpp:543-637)

def tip_removal(g: DiGraph, max_tip_len: int
                ) -> Tuple[np.ndarray, np.ndarray]:
    """(remove bool[E], tip_read bool[n]).

    Out-side: for a node with >=2 out-edges, an out-neighbor with no further
    out-edges is a tip when its extension is short; inclusion tips
    (ext == 0) are always removed, proper tips only when the node keeps at
    least one non-dead-end out-neighbor. Symmetric on the in-side."""
    E = g.n_edges
    remove = np.zeros(E, dtype=bool)
    tip_read = np.zeros(g.n, dtype=bool)
    if E == 0:
        return remove, tip_read
    outdeg = np.bincount(g.u, minlength=g.n)
    indeg = np.bincount(g.v, minlength=g.n)

    # out-tips: u has >=2 out-edges, v is an out-dead-end
    dead_v = outdeg[g.v] == 0
    cand = (outdeg[g.u] >= 2) & dead_v & (g.ext_v < max_tip_len)
    incl = cand & (g.ext_v == 0)
    # node keeps a non-dead-end out-neighbor?
    has_live = np.bincount(g.u[~dead_v], minlength=g.n) > 0
    rm = incl | (cand & has_live[g.u])
    remove |= rm
    tip_read[g.v[rm]] = True

    # in-tips: v has >=2 in-edges, u is an in-dead-end
    dead_u = indeg[g.u] == 0
    cand = (indeg[g.v] >= 2) & dead_u & (g.ext_u < max_tip_len)
    incl = cand & (g.ext_u == 0)
    has_live = np.bincount(g.v[~dead_u], minlength=g.n) > 0
    rm = incl | (cand & has_live[g.v])
    remove |= rm
    tip_read[g.u[rm]] = True
    return remove, tip_read


# ---------------------------------------------------------------------------
# cycleRemovalHeuristic (GraphAlgos.cpp:352-541)

def back_edge_mask(g: DiGraph, score: Optional[np.ndarray] = None,
                   mism: Optional[np.ndarray] = None,
                   tries: int = 20) -> np.ndarray:
    """Back edges to delete, best of ``tries`` DFS neighbor orders
    (cycleRemovalHeuristic, GraphAlgos.cpp:487-541): try 1 orders
    out-neighbors by ascending start offset (pos1), 2 by descending score,
    3 by descending overlap length, 4 by ascending mismatch rate, further
    tries shuffle with fixed seeds; the try leaving the fewest back edges
    wins (early exit at zero). Runs in native C++
    (graphcore.hl_find_backedges); without the native lib it falls back to
    one deterministic DFS in sortEdges order (OverlapGraph.cpp:722-764).

    score/mism are per-edge arrays aligned with g (strategy keys 2 and 4);
    when absent those strategies reuse the overlap length / offset keys."""
    E = g.n_edges
    back = np.zeros(E, dtype=bool)
    if E == 0:
        return back
    if tries > 1:
        from hylight_tpu import native
        k2 = score if score is not None else g.ovlen
        k4 = mism if mism is not None else g.ext_u
        res = native.find_backedges(g.u, g.v, g.ext_u, k2, g.ovlen, k4,
                                    g.n, max_tries=tries)
        if res is not None:
            return res
    order = np.lexsort((g.v, g.sortkey, g.u))
    us = g.u[order]
    start = np.searchsorted(us, np.arange(g.n + 1))
    color = np.zeros(g.n, dtype=np.int8)  # 0 white, 1 gray, 2 black
    for seed in range(g.n):
        if color[seed]:
            continue
        # iterative DFS with explicit edge cursors
        stack = [(seed, int(start[seed]))]
        color[seed] = 1
        while stack:
            node, cur = stack[-1]
            if cur >= start[node + 1]:
                color[node] = 2
                stack.pop()
                continue
            stack[-1] = (node, cur + 1)
            e = order[cur]
            if back[e]:
                continue
            w = int(g.v[e])
            if color[w] == 1:
                back[e] = True
            elif color[w] == 0:
                color[w] = 1
                stack.append((w, int(start[w])))
    return back


# ---------------------------------------------------------------------------
# removeInclusions (GraphAlgos.cpp:20-48; marking EdgeCalculator.cpp:459-466)

def inclusion_vertices(table, keep: np.ndarray, n: int) -> np.ndarray:
    """Reads marked as inclusions: a mismatch-free overlap covering the whole
    of the shorter read marks that read (perc==100 & mismatch_rate≈0)."""
    marked = np.zeros(n, dtype=bool)
    if table.n == 0:
        return marked
    idx = np.nonzero(keep)[0]
    qspan = (table.qe[idx] - table.qs[idx]).astype(np.int64)
    tspan = (table.te[idx] - table.ts[idx]).astype(np.int64)
    full_q = qspan >= table.qlen[idx]
    full_t = tspan >= table.tlen[idx]
    clean = table.identity[idx] >= 1.0 - 1e-9
    shorter_is_q = table.qlen[idx] <= table.tlen[idx]
    mark_q = clean & full_q & shorter_is_q
    mark_t = clean & full_t & ~shorter_is_q
    marked[table.qid[idx][mark_q]] = True
    marked[table.tid[idx][mark_t]] = True
    return marked


def drop_inclusion_edges(table, keep: np.ndarray,
                         marked: np.ndarray) -> np.ndarray:
    """removeInclusions: drop every edge incident to a marked vertex."""
    if table.n == 0 or not marked.any():
        return keep
    hit = marked[table.qid] | marked[table.tid]
    return keep & ~hit


# ---------------------------------------------------------------------------
# reduceDiploidBranching (GraphAlgos.cpp:50-110)

def diploid_prune_mask(g: DiGraph, mism_rate: np.ndarray,
                       min_diploid_overlap: int = 30) -> np.ndarray:
    """Edges deleted by the diploid unique-extension rule: where a node u has
    a unique out-edge u→w (overlap >= 30, mismatch-free), every other in-edge
    of w is deleted; where w has a unique in-edge u→w, every other out-edge
    of u is deleted. mism_rate is per-edge (aligned with g arrays)."""
    E = g.n_edges
    out = np.zeros(E, dtype=bool)
    if E == 0:
        return out
    outdeg = np.bincount(g.u, minlength=g.n)
    indeg = np.bincount(g.v, minlength=g.n)

    uniq_out = (outdeg[g.u] == 1) & (g.ovlen >= min_diploid_overlap) & \
        (mism_rate < 1e-6)
    # target nodes that are the unique out-extension of some source
    uo_target = np.zeros(g.n, dtype=bool)
    uo_target[g.v[uniq_out]] = True
    # delete in-edges of such targets that are NOT themselves unique-out
    out |= uo_target[g.v] & ~uniq_out

    uniq_in = indeg[g.v] == 1
    ui_source = np.zeros(g.n, dtype=bool)
    ui_source[g.u[uniq_in]] = True
    out |= ui_source[g.u] & ~uniq_in
    return out


# ---------------------------------------------------------------------------
# composite cleaning pass (ViralQuasispecies.cpp:297-367 order)

def clean_graph(table, labels: np.ndarray, keep: np.ndarray, *,
                remove_trans: int = 1, branch_deletions: bool = False,
                remove_branches: bool = False, remove_tips: bool = False,
                max_tip_len: int = 150, remove_backedges: bool = True,
                ignore_inclusions: bool = False,
                diploid: bool = False,
                mism_rate: Optional[np.ndarray] = None
                ) -> Tuple[np.ndarray, np.ndarray]:
    """Run the reference's cleaning cascade over the kept edges.

    Returns (keep mask over table rows, tip_read bool[n]). BranchReduction
    (read-evidence) is NOT here — it sits between tips and cycles and needs
    the working set (srcore.branch_reduction)."""
    n = len(labels)
    tip_read = np.zeros(n, dtype=bool)
    if table.n == 0 or not keep.any():
        return keep, tip_read

    if ignore_inclusions:
        marked = inclusion_vertices(table, keep, n)
        keep = drop_inclusion_edges(table, keep, marked)

    g = build_digraph(table, labels, keep, n)
    trans = transitive_mask(g.n, g.u, g.v, level=remove_trans)
    drop = trans.copy()
    if branch_deletions and remove_trans == 1:
        drop |= trans_branch_deletions(g, trans)
    keep = keep.copy()
    keep[g.eidx[drop]] = False

    if remove_tips:
        g = build_digraph(table, labels, keep, n)
        rm, tip_read = tip_removal(g, max_tip_len)
        keep[g.eidx[rm]] = False

    if diploid:
        g = build_digraph(table, labels, keep, n)
        mr = mism_rate[g.eidx] if mism_rate is not None else \
            (1.0 - table.identity[g.eidx])
        rm = diploid_prune_mask(g, mr)
        keep[g.eidx[rm]] = False

    if remove_branches:
        g = build_digraph(table, labels, keep, n)
        rm = branch_removal_mask(g)
        keep[g.eidx[rm]] = False

    if remove_backedges:
        g = build_digraph(table, labels, keep, n)
        rm = back_edge_mask(g, score=_edge_score(table, g),
                            mism=1.0 - table.identity[g.eidx])
        keep[g.eidx[rm]] = False

    return keep, tip_read


def _edge_score(table, g: DiGraph) -> np.ndarray:
    sc = getattr(table, "score", None)
    if sc is None:
        return g.ovlen.astype(np.float64)
    return np.asarray(sc)[g.eidx].astype(np.float64)
