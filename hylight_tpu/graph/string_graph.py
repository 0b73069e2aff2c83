"""Long-read string-graph layout (the miniasm-equivalent engine).

Rebuilds the capability of the reference's bundled miniasm
(``tools/miniasm/``, invoked ``HyLight.py:137,140`` as
``miniasm -d <tip> -n 1 -e 1 -c 1``) as vectorized array passes over arc
lists. Graphs here are post-filter (SNP-cleaned, capped-degree) and small
relative to the alignment workload, so these passes run on host numpy at
stage boundaries; the FLOP-heavy work stays on device.

Vertex encoding follows miniasm: vertex = read_id * 2 + dir, dir 0 = read
forward, 1 = reverse-complement; an arc v -> w means "w extends v to the
right", arc length l = offset from start(v) to start(w) in v's frame.

Components and their reference counterparts:
- overlaps_to_arcs      <- ma_hit2arc (asm.c:9-39 caller; classification per
                           minimap-paper Algorithm 5) + containment drop
                           (ma_hit_contained, hit.c:225)
- transitive_reduction  <- asg_arc_del_trans (asg.c:148-190, Myers-style)
- cut_tips              <- asg_cut_tip (asg.c:238) with read-count bound
- pop_bubbles           <- asg_pop_bubble (asg.c:360-433, Kahn-like BFS)
- unitigs/unitig_seqs   <- ma_ug_gen/ma_ug_seq (asm.c:117,232)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

from hylight_tpu.io.readset import ReadSet, revcomp_codes
from hylight_tpu.overlap.table import OverlapTable
from hylight_tpu.utils import get_logger

log = get_logger()


@dataclass
class ArcSet:
    """Directed arc list; always kept symmetric (arc and rc-arc both present)."""

    v: np.ndarray    # int64 [E] source vertex (read*2+dir)
    w: np.ndarray    # int64 [E] destination vertex
    l: np.ndarray    # int32 [E] arc length (bases v contributes before w)
    ol: np.ndarray   # int32 [E] overlap length on the source read
    n_reads: int

    @property
    def n_vtx(self) -> int:
        return 2 * self.n_reads

    def select(self, mask: np.ndarray) -> "ArcSet":
        return ArcSet(self.v[mask], self.w[mask], self.l[mask],
                      self.ol[mask], self.n_reads)

    def sort(self) -> "ArcSet":
        """Sort by (v, l) — the adjacency order miniasm's passes assume."""
        order = np.lexsort((self.l, self.v))
        return self.select(order)

    def out_index(self) -> Tuple[np.ndarray, np.ndarray]:
        """CSR-style (start, count) per vertex; requires sorted arcs."""
        start = np.searchsorted(self.v, np.arange(self.n_vtx))
        end = np.searchsorted(self.v, np.arange(self.n_vtx), side="right")
        return start, end - start

    def out_degree(self) -> np.ndarray:
        return np.bincount(self.v, minlength=self.n_vtx).astype(np.int64)


def overlaps_to_arcs(table: OverlapTable, n_reads: int, *,
                     min_ovlp: int = 0, max_hang: int = 1000,
                     int_frac: float = 0.8,
                     drop_contained: bool = True
                     ) -> Tuple[ArcSet, np.ndarray]:
    """Classify overlaps into dovetail arcs; returns (arcs, contained mask).

    Mirrors ``ma_hit2arc`` exactly, then (like ``ma_hit_contained``) removes
    every arc touching a contained read. Each table row yields the arc AND
    its reverse-complement twin (the reference gets the twin from the
    symmetric duplicate hit of ava mode; our table stores each pair once).
    """
    ql, tl = table.qlen.astype(np.int64), table.tlen.astype(np.int64)
    qs, qe = table.qs.astype(np.int64), table.qe.astype(np.int64)
    ts_a, te_a = table.ts_adj().astype(np.int64), table.te_adj().astype(np.int64)
    rev = table.strand.astype(np.int64)
    qid, tid = table.qid.astype(np.int64), table.tid.astype(np.int64)

    tl5, tl3 = ts_a, tl - te_a
    ql5, ql3 = qs, ql - qe
    ext5 = np.minimum(ql5, tl5)
    ext3 = np.minimum(ql3, tl3)
    span = qe - qs
    internal = (ext5 > max_hang) | (ext3 > max_hang) | \
        (span < (span + ext5 + ext3) * int_frac)
    q_cont = (~internal) & (ql5 <= tl5) & (ql3 <= tl3)
    t_cont = (~internal) & ~q_cont & (ql5 >= tl5) & (ql3 >= tl3)
    short = (span + ext5 + ext3 < min_ovlp) | \
        ((te_a - ts_a) + ext5 + ext3 < min_ovlp)
    dovetail = ~(internal | q_cont | t_cont | short)

    contained = np.zeros(n_reads, dtype=bool)
    if drop_contained:
        # ma_sg_gen deletes the QCONT read of every hit (asm.c:34); minimap2
        # ava emits both hit directions, so with exact ties (ql5==tl5 and
        # ql3==tl3, e.g. duplicate reads) BOTH reads are deleted — the
        # containment masks are therefore NOT mutually exclusive
        np.logical_or.at(contained, qid[q_cont], True)
        np.logical_or.at(contained,
                         tid[(~internal) & (ql5 >= tl5) & (ql3 >= tl3)],
                         True)

    d = dovetail & ~(contained[qid] | contained[tid])
    case_a = ql5 > tl5          # query sticks out left: arc q+ -> t(rev)

    with np.errstate(all="ignore"):
        # primary arc
        v1 = np.where(case_a, qid * 2, tid * 2 + rev)
        w1 = np.where(case_a, tid * 2 + rev, qid * 2)
        l1 = np.where(case_a, ql5 - tl5, tl5 - ql5)
        src_len1 = np.where(case_a, ql, tl)
        # reverse-complement twin
        v2 = np.where(case_a, tid * 2 + (1 - rev), qid * 2 + 1)
        w2 = np.where(case_a, qid * 2 + 1, tid * 2 + (1 - rev))
        l2 = np.where(case_a, tl3 - ql3, ql3 - tl3)
        src_len2 = np.where(case_a, tl, ql)

    v = np.concatenate([v1[d], v2[d]])
    w = np.concatenate([w1[d], w2[d]])
    ln = np.concatenate([l1[d], l2[d]]).astype(np.int32)
    ol = (np.concatenate([src_len1[d], src_len2[d]]) - ln).astype(np.int32)
    arcs = ArcSet(v=v, w=w, l=ln, ol=ol, n_reads=n_reads).sort()
    return arcs, contained


def transitive_reduction(arcs: ArcSet, fuzz: int = 10) -> ArcSet:
    """Myers-style transitive reduction with the EXACT asg_arc_del_trans
    semantics (miniasm ``asg.c:148-187``): per vertex, out-neighbors are
    marked in-play, then processed in arc-length order — an already-
    eliminated middle does NOT propagate further — and a 2-hop target x is
    eliminated when ``l(v->w) + l(w->x) <= max_l(v) + fuzz``.  Runs in
    native C++ (graphcore.hl_transitive_reduction, linear constants at
    metagenome arc counts); the python fallback is the same per-vertex
    algorithm."""
    if len(arcs.v) == 0:
        return arcs
    a = arcs.sort()
    start, count = a.out_index()
    NV = a.n_vtx

    reduced = None
    lib = _native_lib()
    if lib is not None and hasattr(lib, "hl_transitive_reduction"):
        import ctypes
        w64 = np.ascontiguousarray(a.w, dtype=np.int64)
        l32 = np.ascontiguousarray(a.l, dtype=np.int32)
        st = np.ascontiguousarray(start, dtype=np.int64)
        ct = np.ascontiguousarray(count, dtype=np.int64)
        out = np.zeros(len(a.v), dtype=np.uint8)
        lib.hl_transitive_reduction.restype = ctypes.c_longlong
        lib.hl_transitive_reduction.argtypes = \
            [ctypes.c_void_p] * 4 + [ctypes.c_longlong] * 2 + [ctypes.c_void_p]
        lib.hl_transitive_reduction(
            st.ctypes.data_as(ctypes.c_void_p),
            ct.ctypes.data_as(ctypes.c_void_p),
            w64.ctypes.data_as(ctypes.c_void_p),
            l32.ctypes.data_as(ctypes.c_void_p),
            NV, int(fuzz), out.ctypes.data_as(ctypes.c_void_p))
        reduced = out.astype(bool)
    if reduced is None:
        reduced = np.zeros(len(a.v), dtype=bool)
        mark = np.zeros(NV, dtype=np.int8)
        w_arr, l_arr = a.w, a.l
        for v in range(NV):
            nv = int(count[v])
            if nv == 0:
                continue
            s = int(start[v])
            nbrs = w_arr[s:s + nv]
            mark[nbrs] = 1
            L = int(l_arr[s + nv - 1]) + fuzz
            for i in range(nv):
                ww = int(nbrs[i])
                if mark[ww] != 1:
                    continue
                s2, n2 = int(start[ww]), int(count[ww])
                li = int(l_arr[s + i])
                for j in range(n2):
                    if int(l_arr[s2 + j]) + li > L:
                        break
                    x = int(w_arr[s2 + j])
                    if mark[x]:
                        mark[x] = 2
            for i in range(nv):
                t = int(nbrs[i])
                if mark[t] == 2:
                    reduced[s + i] = True
                # reset INSIDE the loop (asg.c:181-183): with duplicate
                # arcs to one target only the FIRST (shortest) is deleted
                mark[t] = 0

    n_red = int(reduced.sum())
    if n_red:
        log.info("[G::trans_reduce] removed %d arcs", n_red)
    out = a.select(~reduced)
    if n_red:
        # asg.c:188-190: del_trans ends with asg_cleanup + asg_symm —
        # per-direction tie-breaks (fuzz, adjacency order, the duplicate-
        # arc first-only quirk) can reduce v->w without its twin; the
        # reference deletes the surviving lone arcs rather than keeping
        # an asymmetric graph (which _MutGraph's passes must not see).
        out = asg_symm_arcs(out)
    return out


def asg_symm_arcs(arcs: ArcSet) -> ArcSet:
    """``asg_symm`` (asg.c:140-145): delete multi-arcs, then asymmetric arcs.

    Multi-arc rule (asg_arc_del_multi, asg.c:104-121): per source vertex,
    only the FIRST arc to each target in (v, l)-sorted adjacency order —
    the shortest, i.e. largest-overlap, arc — survives. Asymmetric rule
    (asg_arc_del_asymm, asg.c:124-138): an arc survives iff its twin
    (w^1 -> v^1) is present among the survivors; one pass reaches the
    symmetric fixpoint (a deletion only mirrors an already-missing twin).
    """
    a = arcs.sort()
    E = len(a.v)
    if E == 0:
        return a
    NV = a.n_vtx
    key = a.v.astype(np.int64) * (2 * NV) + a.w
    order = np.lexsort((np.arange(E), key))     # by (v, w), stable in (v, l)
    ks = key[order]
    new = np.ones(E, dtype=bool)
    new[1:] = ks[1:] != ks[:-1]
    first = np.zeros(E, dtype=bool)
    first[order[new]] = True
    n_multi = E - int(first.sum())
    a = a.select(first)
    keys = np.sort(a.v.astype(np.int64) * (2 * NV) + a.w)
    twin = (a.w ^ 1).astype(np.int64) * (2 * NV) + (a.v ^ 1)
    pos = np.clip(np.searchsorted(keys, twin), 0, len(keys) - 1)
    sym = keys[pos] == twin
    if n_multi or not sym.all():
        log.info("[G::symm] removed %d multi + %d asymmetric arcs",
                 n_multi, int((~sym).sum()))
    return a.select(sym)


def _native_lib():
    from hylight_tpu import native
    return native.load()


def cut_tips(arcs: ArcSet, max_ext: int = 1) -> Tuple[ArcSet, np.ndarray]:
    """Remove dangling chains of <= max_ext reads (asg_cut_tip semantics).

    Returns (arcs, dropped_read_mask). A tip starts at a vertex with no
    predecessor (outdeg(v^1) == 0) and extends through unbranched vertices.
    """
    dropped = np.zeros(arcs.n_reads, dtype=bool)
    for _ in range(max_ext + 1):  # iterate: cutting can expose new tips
        if len(arcs.v) == 0:
            break
        a = arcs.sort()
        outdeg = a.out_degree()
        indeg = np.bincount(a.w, minlength=a.n_vtx).astype(np.int64)
        NV = a.n_vtx
        vids = np.arange(NV)
        # tip start: has successors, no predecessors, and is not the
        # mirror of a chain end (avoid cutting isolated pairs twice)
        is_start = (outdeg > 0) & (indeg == 0)
        kill_reads = []
        start, count = a.out_index()
        for v in vids[is_start]:
            path = [v]
            cur = v
            ok = False
            for _step in range(max_ext):
                if count[cur] != 1:
                    ok = count[cur] > 1  # ends at branch -> cuttable
                    break
                nxt = int(a.w[start[cur]])
                if indeg[nxt] > 1:
                    ok = True            # merges into a through-path
                    break
                path.append(nxt)
                cur = nxt
            else:
                ok = False               # chain longer than max_ext: keep
            if ok and len(path) <= max_ext:
                kill_reads.extend(p >> 1 for p in path)
        if not kill_reads:
            arcs = a
            break
        dropped[np.array(kill_reads, dtype=np.int64)] = True
        keep = ~(dropped[a.v >> 1] | dropped[a.w >> 1])
        arcs = a.select(keep)
    return arcs, dropped


def pop_bubbles(arcs: ArcSet, max_dist: int = 50000) -> ArcSet:
    """Pop simple bubbles (asg_pop_bubble-style bounded Kahn BFS).

    From every vertex with outdeg >= 2, find a closing sink reachable by all
    out-paths within max_dist; keep the single best path (max overlap
    support), delete arcs of the other paths. Host BFS per branching vertex
    (branch vertices are rare after reduction).
    """
    if len(arcs.v) == 0:
        return arcs
    a = arcs.sort()
    start, count = a.out_index()
    indeg = np.bincount(a.w, minlength=a.n_vtx).astype(np.int64)
    del_arc = np.zeros(len(a.v), dtype=bool)

    branch_vs = np.nonzero(count >= 2)[0]
    for src in branch_vs:
        src = int(src)
        # bounded Kahn traversal from src (asg_bub_pop1 structure): a vertex
        # is pushed once all its incoming arcs were traversed; the bubble
        # closes when the stack holds exactly one vertex with none pending.
        dist = {src: 0}
        remaining = {}
        order = [src]
        stack = [src]
        sink = None
        n_pending = 0
        failed = False
        while stack:
            v = stack.pop()
            s, c = int(start[v]), int(count[v])
            live = [e for e in range(s, s + c) if not del_arc[e]]
            if v != src and not live:
                failed = True            # dead end inside the bubble
                break
            for e in live:
                w = int(a.w[e])
                d = dist[v] + int(a.l[e])
                if d > max_dist or (w >> 1) == (src >> 1):
                    failed = True
                    break
                if w not in dist:
                    dist[w] = d
                    remaining[w] = int(indeg[w])
                    n_pending += 1
                else:
                    dist[w] = max(dist[w], d)
                remaining[w] -= 1
                if remaining[w] == 0:
                    stack.append(w)
                    order.append(w)
                    n_pending -= 1
            if failed:
                break
            if len(stack) == 1 and n_pending == 0:
                sink = stack[0]
                break
        if failed or sink is None or sink == src or (sink >> 1) == (src >> 1):
            continue
        # keep the best path src -> sink (greedy max-ol backtrack), delete
        # every other arc on vertices strictly inside the bubble
        inside = set(order[1:]) | {sink}
        inside.discard(int(src))
        # best path via DP over the recorded topological order
        best_prev = {int(src): (-1, -1)}
        best_score = {int(src): 0}
        for v in order:
            s, c = int(start[v]), int(count[v])
            for e in range(s, s + c):
                if del_arc[e]:
                    continue
                w = int(a.w[e])
                if w not in dist:
                    continue
                sc = best_score.get(v, -1) + int(a.ol[e])
                if sc > best_score.get(w, -1):
                    best_score[w] = sc
                    best_prev[w] = (v, e)
        keep_edges = set()
        v = sink
        while v != int(src):
            pv, pe = best_prev.get(v, (-1, -1))
            if pe < 0:
                break
            keep_edges.add(pe)
            v = pv
        # delete non-best arcs inside the bubble region
        for v in [int(src)] + list(inside - {sink}):
            s, c = int(start[v]), int(count[v])
            for e in range(s, s + c):
                if e not in keep_edges and int(a.w[e]) in (inside | {sink}):
                    del_arc[e] = True
    n_pop = int(del_arc.sum())
    if n_pop:
        log.info("[G::pop_bubbles] removed %d arcs", n_pop)
        a = a.select(~del_arc)
        # restore symmetry: drop arcs whose mirror vanished
        keys = set(zip(a.v.tolist(), a.w.tolist()))
        sym = np.array([(w ^ 1, v ^ 1) in keys
                        for v, w in zip(a.v.tolist(), a.w.tolist())])
        a = a.select(sym)
    return a


@dataclass
class Unitig:
    verts: List[int]     # vertex path (read*2+dir)
    arc_lens: List[int]  # len == len(verts)-1 (or == len(verts) if circular)
    circular: bool


def unitigs(arcs: ArcSet, drop_reads: Optional[np.ndarray] = None
            ) -> List[Unitig]:
    """Maximal unbranched paths (ma_ug_gen semantics)."""
    a = arcs.sort()
    start, count = a.out_index()
    indeg = np.bincount(a.w, minlength=a.n_vtx).astype(np.int64)
    NV = a.n_vtx
    used = np.zeros(NV, dtype=bool)
    if drop_reads is not None:
        used[drop_reads.repeat(2)] = True
    pred_count = indeg

    def single_succ(v):
        if count[v] != 1:
            return None
        return int(a.w[start[v]]), int(a.l[start[v]])

    out: List[Unitig] = []
    # linear unitigs: start where v is not mergeable-backwards
    for v in range(NV):
        if used[v] or (count[v] == 0 and pred_count[v] == 0):
            continue
        if not (pred_count[v] != 1
                or (pred_count[v] == 1 and _pred_branches(a, start, count, v))):
            continue
        path, lens = [v], []
        used[v] = used[v ^ 1] = True
        cur = v
        while True:
            nxt = single_succ(cur)
            if nxt is None:
                break
            w, l = nxt
            if pred_count[w] != 1 or used[w]:
                break
            path.append(w)
            lens.append(l)
            used[w] = used[w ^ 1] = True
            cur = w
        out.append(Unitig(verts=path, arc_lens=lens, circular=False))
    # circular unitigs: leftover cycles
    for v in range(NV):
        if used[v] or count[v] == 0:
            continue
        path, lens = [v], []
        used[v] = used[v ^ 1] = True
        cur = v
        while True:
            nxt = single_succ(cur)
            if nxt is None:
                break
            w, l = nxt
            if w == v:
                lens.append(l)
                out.append(Unitig(verts=path, arc_lens=lens, circular=True))
                break
            if used[w]:
                break
            path.append(w)
            lens.append(l)
            used[w] = used[w ^ 1] = True
            cur = w
    # dedup mirror unitigs (each linear unitig appears in both orientations
    # only if both endpoints were starts; the used[] marking prevents that)
    return out


def _pred_branches(a: ArcSet, start, count, v) -> bool:
    """True if v's single predecessor has out-branching (unitig must break)."""
    # predecessor of v = (successor of v^1)^1
    if count[v ^ 1] != 1:
        return True
    p = int(a.w[start[v ^ 1]]) ^ 1
    return count[p] != 1


def unitig_seqs(utgs: List[Unitig], reads: ReadSet,
                min_reads: int = 1) -> ReadSet:
    """Splice unitig sequences from oriented reads (ma_ug_seq semantics)."""
    seqs, names = [], []
    for i, u in enumerate(utgs):
        if len(u.verts) < min_reads:
            continue
        parts = []
        for j, v in enumerate(u.verts):
            rid, d = v >> 1, v & 1
            s = reads.get(rid)
            if d:
                s = revcomp_codes(s)
            if j < len(u.arc_lens):
                parts.append(s[:u.arc_lens[j]])
            else:
                parts.append(s)
        if u.circular and len(u.arc_lens) == len(u.verts):
            pass  # all parts are arc-length prefixes already
        seqs.append(np.concatenate(parts) if parts else
                    np.zeros(0, dtype=np.uint8))
        names.append(f"utg{i:06d}" + ("c" if u.circular else "l")
                     + f" reads={len(u.verts)}")
    return ReadSet.from_seqs(seqs, names=names)


# ---------------------------------------------------------------------------
# miniasm-exact cleaning passes (asg.c:83-306) + the main.c stage order.
# These mirror the reference's vertex-end classification byte for byte so
# the golden differential test (tests/test_miniasm_golden.py) can compare
# unitigs against the bundled miniasm binary on identical PAF input.

ET_MERGEABLE, ET_TIP, ET_MULTI_OUT, ET_MULTI_NEI = 0, 1, 2, 3


class _MutGraph:
    """Mutable adjacency view over an ArcSet (arc + read deletion flags).

    Adjacency preserves the (v, l)-sorted order — the same order miniasm's
    radix sort leaves arcs in (ul ascending == ol descending per vertex).
    Adjacency is CSR over the sorted arc array (start/count per vertex) —
    no per-arc Python list build, O(E) numpy setup."""

    def __init__(self, arcs: ArcSet):
        a = arcs.sort()
        if __debug__ and len(a.v):
            # _scan_pass's affected-vertex propagation (and del_arc_pair)
            # relies on twin symmetry: every arc (v, w) must have its twin
            # (w^1, v^1) present, else arcs INTO a deleted read would only
            # be discoverable via the missing twin and the heap scan would
            # silently diverge from the reference's linear rescan.
            fwd = np.lexsort((a.w, a.v))
            rev = np.lexsort((a.v ^ 1, a.w ^ 1))
            assert (np.array_equal(a.v[fwd], (a.w ^ 1)[rev])
                    and np.array_equal(a.w[fwd], (a.v ^ 1)[rev])), \
                "ArcSet is not twin-symmetric; graph cleaning requires it"
        self.arcs = a
        self.n_reads = a.n_reads
        self.alive = np.ones(len(a.v), dtype=bool)
        self.read_del = np.zeros(a.n_reads, dtype=bool)
        self.start, self.count = a.out_index()

    def adj_slice(self, v: int) -> range:
        s = int(self.start[v])
        return range(s, s + int(self.count[v]))

    def live_out(self, v: int) -> List[int]:
        if self.read_del[v >> 1]:
            return []
        a = self.arcs
        s = int(self.start[v])
        c = int(self.count[v])
        if c == 0:
            return []
        m = self.alive[s:s + c] & ~self.read_del[
            np.asarray(a.w[s:s + c]) >> 1]
        return [s + int(i) for i in np.nonzero(m)[0]]

    def del_read(self, r: int) -> None:
        self.read_del[r] = True

    def del_arc_pair(self, v: int, w: int) -> None:
        """Delete arcs v->w and the twin w^1->v^1 (asg_arc_del both ways)."""
        for i in self.adj_slice(v):
            if self.arcs.w[i] == w:
                self.alive[i] = False
        for i in self.adj_slice(w ^ 1):
            if self.arcs.w[i] == (v ^ 1):
                self.alive[i] = False

    def is_utg_end(self, v: int):
        """asg_is_utg_end (asg.c:204-221): classify the unitig end at v by
        v's predecessors (live arcs out of v^1). Returns (code, next)."""
        preds = self.live_out(v ^ 1)
        if len(preds) == 0:
            return ET_TIP, -1
        if len(preds) > 1:
            return ET_MULTI_OUT, -1
        nxt = int(self.arcs.w[preds[0]])
        w = nxt ^ 1
        if len(self.live_out(w)) != 1:
            return ET_MULTI_NEI, nxt
        return ET_MERGEABLE, nxt

    def extend(self, v: int, max_ext: int):
        """asg_extend (asg.c:223-236): walk forward from v while mergeable.
        Returns (final code, path of vertices)."""
        path = [v]
        while True:
            ret, nxt = self.is_utg_end(v ^ 1)
            if ret != ET_MERGEABLE:
                return ret, path
            path.append(nxt)
            v = nxt
            max_ext -= 1
            if max_ext <= 0:
                return ET_MERGEABLE, path

    def finish(self) -> Tuple[ArcSet, np.ndarray]:
        a = self.arcs
        keep = self.alive & ~self.read_del[a.v >> 1] & ~self.read_del[a.w >> 1]
        return a.select(keep), self.read_del


def _classify_initial(a: ArcSet, start: np.ndarray, count: np.ndarray
                      ) -> np.ndarray:
    """Vectorized asg_is_utg_end code for EVERY vertex of the initial
    (nothing-deleted) graph — one numpy pass instead of NV Python calls."""
    NV = a.n_vtx
    E = len(a.v)
    vv = np.arange(NV)
    mirror = vv ^ 1
    pc = count[mirror]
    first = start[mirror]
    safe_first = np.minimum(first, max(E - 1, 0))
    nxt = a.w[safe_first] if E else np.zeros(NV, dtype=np.int64)
    wn = (nxt.astype(np.int64) ^ 1)
    code = np.full(NV, ET_MERGEABLE, dtype=np.int8)
    code[pc == 0] = ET_TIP
    code[pc > 1] = ET_MULTI_OUT
    single = pc == 1
    code[single & (count[wn] != 1)] = ET_MULTI_NEI
    return code


def _scan_pass(g: _MutGraph, want: int, handler) -> int:
    """Ascending-index vertex scan over vertices classified ``want``,
    with exact mutation semantics of the reference's for-loop (asg.c):
    a vertex is evaluated once, in index order, against the CURRENT graph.

    Seeds come from the vectorized initial classification; handler-made
    deletions push the (few) affected higher-index vertices back into a
    min-heap so tips/junctions exposed mid-scan are still visited — the
    exact set the reference's linear scan would see (pops are
    non-decreasing because every push is > the current index, so each
    vertex is evaluated once, at its scan position, against the current
    graph). handler(v) returns None when it made no change, else an
    iterable of vertices whose classification its deletions may have
    changed (use :func:`_affected_of_read` / :func:`_affected_of_arcs`).
    """
    import heapq

    a = g.arcs
    code0 = _classify_initial(a, g.start, g.count)
    heap = list(np.nonzero(code0 == want)[0])
    heapq.heapify(heap)
    visited = np.zeros(a.n_vtx, dtype=bool)
    cnt = 0

    while heap:
        v = int(heapq.heappop(heap))
        if visited[v]:
            continue
        visited[v] = True
        if g.read_del[v >> 1]:
            continue
        if g.is_utg_end(v)[0] != want:
            continue
        affected = handler(v)
        if affected is None:
            continue
        cnt += 1
        for u in affected:
            if u > v and not visited[u]:
                heapq.heappush(heap, u)
    return cnt


def _affected_of_read(g: _MutGraph, r: int):
    """Vertices whose asg_is_utg_end classification may change after
    del_read(r): ends of r itself, endpoints of arcs incident to r's two
    vertices, and second-hop targets whose single-pred lookup reads a
    changed adjacency."""
    a = g.arcs
    out = set()
    for x in (2 * r, 2 * r + 1):
        out.add(x ^ 1)
        for i in g.adj_slice(x):
            w = int(a.w[i])
            out.add(w)          # target's own end
            out.add(w ^ 1)      # twin source w^1 lost an incoming arc
            for j in g.adj_slice(w ^ 1):
                out.add(int(a.w[j]))
    return out


def _affected_of_arcs(g: _MutGraph, v: int, w: int):
    """Vertices affected by del_arc_pair(v, w): live_out changed at
    sources v and w^1."""
    a = g.arcs
    out = {v ^ 1, w, w ^ 1, v}
    for x in (v, w ^ 1):
        for i in g.adj_slice(x):
            out.add(int(a.w[i]))
    return out


def cut_tips_asg(arcs: ArcSet, max_ext: int = 4
                 ) -> Tuple[ArcSet, np.ndarray]:
    """asg_cut_tip (asg.c:238-254): delete unitigs that start at a TIP end
    and do not extend into a mergeable chain longer than max_ext reads."""
    g = _MutGraph(arcs)

    def handler(v):
        ret, path = g.extend(v, max_ext)
        if ret == ET_MERGEABLE:
            return None
        affected = set()
        for p in path:
            g.del_read(p >> 1)
        for p in path:
            affected |= _affected_of_read(g, p >> 1)
        return affected

    cnt = _scan_pass(g, ET_TIP, handler)
    if cnt:
        log.info("[G::cut_tips] cut %d tips", cnt)
    return g.finish()


def cut_internal(arcs: ArcSet, max_ext: int = 1
                 ) -> Tuple[ArcSet, np.ndarray]:
    """asg_cut_internal (asg.c:256-272): delete short unitigs whose both
    ends sit against multi-neighbor junctions."""
    g = _MutGraph(arcs)

    def handler(v):
        ret, path = g.extend(v, max_ext)
        if ret != ET_MULTI_NEI:
            return None
        affected = set()
        for p in path:
            g.del_read(p >> 1)
        for p in path:
            affected |= _affected_of_read(g, p >> 1)
        return affected

    cnt = _scan_pass(g, ET_MULTI_NEI, handler)
    if cnt:
        log.info("[G::cut_internal] cut %d internal sequences", cnt)
    return g.finish()


def cut_biloop(arcs: ArcSet, max_ext: int = 4) -> ArcSet:
    """asg_cut_biloop (asg.c:274-306): at v->...->x' with w->v and w->x,
    delete the weaker of w's two arcs (only the w->x arc, when ov > ox)."""
    g = _MutGraph(arcs)

    def handler(v):
        ret, path = g.extend(v, max_ext)
        if ret != ET_MULTI_OUT:
            return None
        x = path[-1] ^ 1
        preds = g.live_out(v ^ 1)
        if not preds:
            return None
        w = int(g.arcs.w[preds[-1]]) ^ 1
        ov = ox = 0
        for i in g.live_out(w):
            if g.arcs.w[i] == x:
                ox = int(g.arcs.ol[i])
            if g.arcs.w[i] == v:
                ov = int(g.arcs.ol[i])
        if ov == 0 and ox == 0:
            return None
        if ov > ox:
            g.del_arc_pair(w, x)
            return _affected_of_arcs(g, w, x)
        return None

    cnt = _scan_pass(g, ET_MULTI_NEI, handler)
    if cnt:
        log.info("[G::cut_biloop] cut %d bi-loops", cnt)
    a, _ = g.finish()
    return a


def arc_del_short(arcs: ArcSet, drop_ratio: float) -> Tuple[ArcSet, int]:
    """asg_arc_del_short (asg.c:83-101): per vertex with >=2 out-arcs, drop
    arcs whose overlap is shorter than drop_ratio x the longest overlap;
    symmetry restored by dropping twins (asg_symm)."""
    if len(arcs.v) == 0:
        return arcs, 0
    a = arcs.sort()
    start, count = a.out_index()
    best_ol = np.zeros(a.n_vtx, dtype=np.int64)
    has = count > 0
    # arcs sorted by (v, l) ascending => first arc has the LONGEST overlap
    best_ol[has] = a.ol[start[has]]
    thres = (best_ol * drop_ratio + 0.499).astype(np.int64)
    mark = (count[a.v] >= 2) & (a.ol < thres[a.v])
    n = int(mark.sum())
    if n == 0:
        return a, 0
    # symmetric delete: also drop the twin arc (w^1 -> v^1) of marked arcs
    NV = a.n_vtx
    marked_twin_keys = np.unique((a.w[mark] ^ 1) * (2 * NV) + (a.v[mark] ^ 1))
    keys = a.v * (2 * NV) + a.w
    pos = np.searchsorted(marked_twin_keys, keys)
    pos = np.clip(pos, 0, max(len(marked_twin_keys) - 1, 0))
    twin_hit = marked_twin_keys[pos] == keys if len(marked_twin_keys) else \
        np.zeros(len(keys), dtype=bool)
    drop = mark | twin_hit
    log.info("[G::del_short] removed %d short overlaps (r=%.2f)",
             int(drop.sum()), drop_ratio)
    return a.select(~drop), n


def miniasm_clean(arcs: ArcSet, *, max_ext: int = 4, bub_dist: int = 50000,
                  n_rounds: int = 2, min_drop: float = 0.5,
                  max_drop: float = 0.7, final_drop: float = 0.8,
                  fuzz: int = 1000) -> Tuple[ArcSet, np.ndarray]:
    """The full miniasm graph-cleaning cascade in main.c:154-188 order:
    transitive reduction -> tips+bubbles -> n_rounds+1 short-overlap drop
    rounds (each followed by tips+bubbles when it removed arcs) ->
    internal-seq and bi-loop cuts + tips + bubbles -> final aggressive
    short-overlap drop. Returns (arcs, dropped-read mask)."""
    arcs = transitive_reduction(arcs, fuzz=fuzz)
    arcs, dropped = cut_tips_asg(arcs, max_ext)
    arcs = pop_bubbles(arcs, max_dist=bub_dist)
    n_rounds = max(n_rounds, 1)
    for i in range(n_rounds + 1):
        r = min_drop + (max_drop - min_drop) / n_rounds * i
        arcs, n = arc_del_short(arcs, r)
        if n:
            arcs, d = cut_tips_asg(arcs, max_ext)
            dropped |= d
            arcs = pop_bubbles(arcs, max_dist=bub_dist)
    arcs, d = cut_internal(arcs, 1)
    dropped |= d
    arcs = cut_biloop(arcs, max_ext)
    arcs, d = cut_tips_asg(arcs, max_ext)
    dropped |= d
    arcs = pop_bubbles(arcs, max_dist=bub_dist)
    arcs, n = arc_del_short(arcs, final_drop)
    if n:
        arcs, d = cut_tips_asg(arcs, max_ext)
        dropped |= d
        arcs = pop_bubbles(arcs, max_dist=bub_dist)
    return arcs, dropped
