"""Unit tests for the SR overlap-graph cleaning passes (sr_graph.py),
on hand-built graphs with known truth (GraphAlgos.cpp semantics)."""

import numpy as np

from hylight_tpu.graph import sr_graph
from hylight_tpu.overlap.table import OverlapTable


def mk_table(n, edges, lens=None):
    """edges: list of (u, v, off) — v starts at +off in u's plus frame;
    all reads length 100 unless lens[id] overrides. identity 1.0."""
    lens = lens or {}
    L = lambda i: lens.get(i, 100)
    qid, tid, qs, qe, ts, te, qlen, tlen = [], [], [], [], [], [], [], []
    for (u, v, off) in edges:
        lu, lv = L(u), L(v)
        span = min(lu - off, lv)
        qid.append(u); tid.append(v)
        qs.append(off); qe.append(off + span)
        ts.append(0); te.append(span)
        qlen.append(lu); tlen.append(lv)
    E = len(edges)
    span_arr = np.array(qe) - np.array(qs)
    return OverlapTable(
        qid=np.array(qid, np.int32), tid=np.array(tid, np.int32),
        strand=np.zeros(E, np.int8),
        qs=np.array(qs, np.int32), qe=np.array(qe, np.int32),
        ts=np.array(ts, np.int32), te=np.array(te, np.int32),
        qlen=np.array(qlen, np.int32), tlen=np.array(tlen, np.int32),
        matches=span_arr.astype(np.int32), columns=span_arr.astype(np.int32),
        identity=np.ones(E, np.float32), score=np.ones(E, np.float32),
        score2=np.ones(E, np.float32), score3=np.ones(E, np.float32))


def graph_of(n, edges, lens=None):
    table = mk_table(n, edges, lens)
    labels = np.zeros(n, np.int8)
    keep = np.ones(table.n, bool)
    return table, labels, keep, sr_graph.build_digraph(table, labels, keep, n)


def test_digraph_direction_and_exts():
    _, _, _, g = graph_of(2, [(0, 1, 30)])
    assert g.u[0] == 0 and g.v[0] == 1
    assert g.ovlen[0] == 70 and g.ext_u[0] == 30 and g.ext_v[0] == 30
    # reversed input edge (off < 0 in q's frame): q starts inside t
    table = mk_table(2, [(1, 0, 30)])
    g = sr_graph.build_digraph(table, np.zeros(2, np.int8),
                               np.ones(1, bool), 2)
    assert g.u[0] == 1 and g.v[0] == 0


def test_transitive_chain():
    # a->b, b->c, a->c : the long skip is transitive
    _, _, _, g = graph_of(3, [(0, 1, 30), (1, 2, 30), (0, 2, 60)])
    t = sr_graph.transitive_once(g.n, g.u, g.v)
    assert t.tolist() == [False, False, True]


def test_transitive_level2():
    # chain 0..4 with all skip edges; only 0->4 is double-transitive
    edges = [(i, i + 1, 20) for i in range(4)]
    skips = [(0, 2, 40), (1, 3, 40), (2, 4, 40), (0, 3, 60), (1, 4, 60),
             (0, 4, 80)]
    _, _, _, g = graph_of(5, edges + skips)
    t1 = sr_graph.transitive_mask(g.n, g.u, g.v, level=1)
    assert t1[:4].tolist() == [False] * 4 and t1[4:].all()
    t2 = sr_graph.transitive_mask(g.n, g.u, g.v, level=2)
    removed = [tuple(x) for x in np.stack([g.u[t2], g.v[t2]], 1).tolist()]
    assert removed == [(0, 4)]


def test_trans_branch_deletions():
    # transitive 0->2 (ovlen 40); out-edge 0->3 with smaller overlap dies
    _, _, _, g = graph_of(4, [(0, 1, 30), (1, 2, 30), (0, 2, 60),
                              (0, 3, 70)])
    trans = sr_graph.transitive_once(g.n, g.u, g.v)
    extra = sr_graph.trans_branch_deletions(g, trans)
    # 0->3 has ovlen 30 <= 40 -> deleted; 0->1 has ovlen 70 > 40 -> kept
    dels = {tuple(x) for x in np.stack([g.u[extra], g.v[extra]], 1).tolist()}
    assert (0, 3) in dels and (0, 1) not in dels


def test_branch_removal():
    # 0->1, then 1 branches out to 2 and 3: branch edges cut, 0->1 kept
    table, labels, keep, g = graph_of(4, [(0, 1, 30), (1, 2, 30),
                                          (1, 3, 30)])
    rm = sr_graph.branch_removal_mask(g)
    assert rm.tolist() == [False, True, True]


def test_branch_removal_keeps_simple_path():
    table, labels, keep, g = graph_of(3, [(0, 1, 30), (1, 2, 30)])
    rm = sr_graph.branch_removal_mask(g)
    assert not rm.any()


def test_tip_removal():
    # 0 -> 1 (dead end, short ext) and 0 -> 2 -> 3 (live): tip edge cut
    _, _, _, g = graph_of(4, [(0, 1, 10), (0, 2, 30), (2, 3, 30)])
    rm, tips = sr_graph.tip_removal(g, max_tip_len=50)
    assert rm.tolist() == [True, False, False]
    assert tips.tolist() == [False, True, False, False]
    # with a huge extension it is not a tip
    _, _, _, g2 = graph_of(4, [(0, 1, 10), (0, 2, 30), (2, 3, 30)])
    rm2, _ = sr_graph.tip_removal(g2, max_tip_len=5)
    assert not rm2.any()


def test_tip_all_tips_kept():
    # both out-neighbors are dead ends -> neither removed (alltips rule)
    _, _, _, g = graph_of(3, [(0, 1, 10), (0, 2, 20)])
    rm, tips = sr_graph.tip_removal(g, max_tip_len=50)
    assert not rm.any() and not tips.any()


def test_back_edge_cycle():
    # 3-cycle: exactly one back edge found and flagged
    _, _, _, g = graph_of(3, [(0, 1, 30), (1, 2, 30), (2, 0, 30)])
    back = sr_graph.back_edge_mask(g)
    assert back.sum() == 1
    # DAG: none
    _, _, _, g2 = graph_of(3, [(0, 1, 30), (0, 2, 60), (1, 2, 30)])
    assert not sr_graph.back_edge_mask(g2).any()


def test_inclusions():
    # read 1 (len 50) fully contained in read 0, mismatch-free
    table = mk_table(2, [(0, 1, 20)], lens={1: 50})
    keep = np.ones(1, bool)
    marked = sr_graph.inclusion_vertices(table, keep, 2)
    assert marked.tolist() == [False, True]
    keep2 = sr_graph.drop_inclusion_edges(table, keep, marked)
    assert not keep2.any()
    # partial overlap: no inclusion
    t2 = mk_table(2, [(0, 1, 60)])
    assert not sr_graph.inclusion_vertices(t2, np.ones(1, bool), 2).any()


def test_diploid_prune():
    # 0 has unique mismatch-free out-edge to 2; 1 also points at 2 but has
    # out-degree 2 -> 1->2 (and 1->3, in-unique rule) pruned
    _, _, _, g = graph_of(4, [(0, 2, 30), (1, 2, 40), (1, 3, 30)])
    mism = np.zeros(3)
    rm = sr_graph.diploid_prune_mask(g, mism)
    pairs = {tuple(x) for x in np.stack([g.u[rm], g.v[rm]], 1).tolist()}
    assert (1, 2) in pairs and (0, 2) not in pairs


def test_clean_graph_composite():
    # chain with a skip and a cycle-closing edge: skip (transitive) and
    # back edge both removed, chain kept
    edges = [(0, 1, 30), (1, 2, 30), (0, 2, 60), (2, 0, 30)]
    table = mk_table(3, edges)
    labels = np.zeros(3, np.int8)
    keep = np.ones(4, bool)
    keep2, tips = sr_graph.clean_graph(table, labels, keep,
                                       remove_trans=1,
                                       remove_branches=True,
                                       remove_backedges=True)
    kept = {(int(table.qid[i]), int(table.tid[i]))
            for i in np.nonzero(keep2)[0]}
    assert (0, 1) in kept and (1, 2) in kept
    assert (0, 2) not in kept and (2, 0) not in kept
