import numpy as np

from hylight_tpu.config import OverlapConfig
from hylight_tpu.io.readset import ReadSet, decode_seq, revcomp_codes
from hylight_tpu.graph.string_graph import (
    ArcSet, cut_tips, overlaps_to_arcs, pop_bubbles, transitive_reduction,
    unitig_seqs, unitigs)
from hylight_tpu.overlap.engine import find_overlaps

CFG = OverlapConfig(k=11, w=5, min_ovlp_len=150, min_identity=0.9,
                    min_anchors=4, min_chain_score=60, max_occ=64,
                    anchors_per_pair=256, gap_tile=32)


def _mk_arcs(edges, n_reads):
    """edges: list of (v, w, l, ol)."""
    v = np.array([e[0] for e in edges], dtype=np.int64)
    w = np.array([e[1] for e in edges], dtype=np.int64)
    l = np.array([e[2] for e in edges], dtype=np.int32)
    ol = np.array([e[3] for e in edges], dtype=np.int32)
    return ArcSet(v=v, w=w, l=l, ol=ol, n_reads=n_reads).sort()


def _sym(edges):
    """Add the rc twin of each arc (l' = ol-ish placeholder symmetric)."""
    out = list(edges)
    for v, w, l, ol in edges:
        out.append((w ^ 1, v ^ 1, l, ol))
    return out


def test_transitive_reduction_triangle():
    # chain 0+ ->100-> 2+ ->100-> 4+ with shortcut 0+ ->200-> 4+
    edges = _sym([(0, 2, 100, 400), (2, 4, 100, 400), (0, 4, 200, 300)])
    arcs = _mk_arcs(edges, 3)
    red = transitive_reduction(arcs, fuzz=10)
    pairs = set(zip(red.v.tolist(), red.w.tolist()))
    assert (0, 4) not in pairs and (5, 1) not in pairs
    assert (0, 2) in pairs and (2, 4) in pairs


def test_transitive_reduction_resymmetrizes():
    """asg.c:188-190: when per-direction tie-breaks reduce v->w but not its
    twin, del_trans's trailing asg_symm deletes the surviving lone arc —
    the output must be twin-symmetric (cut_tips_asg asserts it)."""
    # forward: 0+ ->4-> 1+ ->6-> 2+ with shortcut 0+ ->10-> 2+ (reduced:
    # 4+6 <= 10+fuzz0). twin side: 2- adjacency (1-,6),(0-,10); path cost
    # 6 + l(1- -> 0-)=7 -> 13 > 10: twin NOT reduced by the scan.
    edges = [(0, 2, 4, 100), (3, 1, 7, 100),
             (2, 4, 6, 100), (5, 3, 6, 100),
             (0, 4, 10, 100), (5, 1, 10, 100)]
    arcs = _mk_arcs(edges, 3)
    red = transitive_reduction(arcs, fuzz=0)
    pairs = set(zip(red.v.tolist(), red.w.tolist()))
    assert (0, 4) not in pairs           # reduced by the Myers scan
    assert (5, 1) not in pairs           # lone twin killed by asg_symm
    assert pairs == {(0, 2), (3, 1), (2, 4), (5, 3)}
    # twin symmetry invariant (what _MutGraph requires)
    assert all((w ^ 1, v ^ 1) in pairs for v, w in pairs)


def test_asg_symm_arcs_multi_and_asymm():
    """del_multi keeps the shortest duplicate per (v,w); del_asymm drops
    arcs whose twin is absent (asg.c:104-138)."""
    from hylight_tpu.graph.string_graph import asg_symm_arcs
    edges = [(0, 2, 5, 100), (0, 2, 9, 60),   # duplicate: keep l=5
             (3, 1, 5, 100),                  # twin of the kept dup
             (2, 4, 6, 100)]                  # twin (5,3) missing -> drop
    arcs = _mk_arcs(edges, 3)
    out = asg_symm_arcs(arcs)
    got = set(zip(out.v.tolist(), out.w.tolist(), out.l.tolist()))
    assert got == {(0, 2, 5), (3, 1, 5)}


def test_transitive_reduction_keeps_far_arcs():
    # shortcut longer than longest+fuzz must be kept
    edges = _sym([(0, 2, 100, 400), (2, 4, 100, 400), (0, 4, 300, 200)])
    arcs = _mk_arcs(edges, 3)
    red = transitive_reduction(arcs, fuzz=10)
    pairs = set(zip(red.v.tolist(), red.w.tolist()))
    # L = longest(0) + fuzz = 300 + 10; 100+100 <= 310 -> still reduced
    assert (0, 4) not in pairs


def test_cut_tips_removes_spur():
    # main chain 0->2->4->6, spur 8->4  (8 is a 1-read tip into the chain)
    edges = _sym([(0, 2, 100, 400), (2, 4, 100, 400), (4, 6, 100, 400),
                  (8, 4, 120, 380)])
    arcs = _mk_arcs(edges, 5)
    cut, dropped = cut_tips(arcs, max_ext=1)
    assert dropped[4 >> 1] == False  # noqa: E712
    assert dropped[8 >> 1]
    pairs = set(zip(cut.v.tolist(), cut.w.tolist()))
    assert (8, 4) not in pairs and (0, 2) in pairs


def test_pop_bubble():
    # 0 -> {2 | 4} -> 6 diamond; branch 2 has higher support
    edges = _sym([(0, 2, 100, 500), (0, 4, 100, 300),
                  (2, 6, 100, 500), (4, 6, 100, 300)])
    arcs = _mk_arcs(edges, 4)
    popped = pop_bubbles(arcs, max_dist=1000)
    pairs = set(zip(popped.v.tolist(), popped.w.tolist()))
    assert (0, 2) in pairs and (2, 6) in pairs
    assert (0, 4) not in pairs and (4, 6) not in pairs


def test_unitig_chain():
    edges = _sym([(0, 2, 100, 400), (2, 4, 100, 400), (4, 6, 100, 400)])
    arcs = _mk_arcs(edges, 4)
    utg = unitigs(arcs)
    assert len(utg) == 1
    u = utg[0]
    assert u.verts in ([0, 2, 4, 6], [7, 5, 3, 1])
    assert u.arc_lens == [100, 100, 100]


def test_end_to_end_layout(rng):
    """Tiling error-free reads -> overlaps -> graph -> one unitig == genome."""
    g = rng.integers(0, 4, size=4000).astype(np.uint8)
    reads = [g[i * 150:i * 150 + 600] for i in range(23)]
    # also a revcomp read in the middle to exercise orientation
    reads[10] = revcomp_codes(reads[10])
    rs = ReadSet.from_seqs(reads)
    t = find_overlaps(rs, cfg=CFG, query_block=8)
    arcs, contained = overlaps_to_arcs(t, rs.n, min_ovlp=150)
    arcs = transitive_reduction(arcs)
    arcs, dropped = cut_tips(arcs, max_ext=1)
    arcs = pop_bubbles(arcs)
    utg = unitigs(arcs, drop_reads=contained | dropped)
    contigs = unitig_seqs(utg, rs)
    assert contigs.n == 1, f"expected 1 unitig, got {contigs.n}"
    s = contigs.get(0)
    ref = decode_seq(g)
    got = decode_seq(s)
    rc = decode_seq(revcomp_codes(s))
    # the unitig must reconstruct the genome span covered by the reads
    assert got in ref or rc in ref or ref in got or ref in rc, \
        f"unitig len {len(got)} does not match genome"
    assert len(got) >= 3900


def test_transitive_reduction_native_matches_python_and_asg_semantics():
    """Native hl_transitive_reduction == the python fallback on random
    graphs, and both implement asg.c's in-play rule: an ELIMINATED middle
    does not propagate (v->c survives when only the eliminated b reaches
    it within bound)."""
    import numpy as np
    import hylight_tpu.graph.string_graph as SG

    rng = np.random.default_rng(0)
    for _ in range(10):
        n_reads = 40
        m = 160
        v = rng.integers(0, 2 * n_reads, m)
        w = rng.integers(0, 2 * n_reads, m)
        keep = v != w
        v, w = v[keep], w[keep]
        l = rng.integers(1, 500, len(v)).astype(np.int32)
        arcs = SG.ArcSet(v.astype(np.int64), w.astype(np.int64), l,
                         l.copy(), n_reads)
        got_native = SG.transitive_reduction(arcs, fuzz=10)
        lib_load = SG._native_lib
        try:
            SG._native_lib = lambda: None
            got_py = SG.transitive_reduction(arcs, fuzz=10)
        finally:
            SG._native_lib = lib_load
        key = lambda a: sorted(zip(a.v.tolist(), a.w.tolist(), a.l.tolist()))
        assert key(got_native) == key(got_py)

    # in-play rule: v->a (10), v->b (20), v->c (40); a->b (10) eliminates
    # b; b->c (20) must NOT eliminate c (b is no longer in-play), and a has
    # no arc to c. Twin arcs included (del_trans now ends with asg_symm, so
    # the graph must be twin-symmetric); twin lengths are chosen so the
    # mirror scans reduce symmetrically: l'(7,5)=45 makes the 7->5->1 path
    # exceed L(7)=40+10 and the twin of v->c survives like v->c does.
    v_ = np.array([0, 0, 0, 2, 4, 3, 5, 7, 5, 7], dtype=np.int64)
    w_ = np.array([2, 4, 6, 4, 6, 1, 1, 1, 3, 5], dtype=np.int64)
    l_ = np.array([10, 20, 40, 10, 20, 10, 20, 40, 10, 45], dtype=np.int32)
    arcs = SG.ArcSet(v_, w_, l_, l_.copy(), 4)
    red = SG.transitive_reduction(arcs, fuzz=10)
    kept = set(zip(red.v.tolist(), red.w.tolist()))
    assert (0, 4) not in kept          # v->b eliminated via a
    assert (5, 1) not in kept          # ... and its twin, by the mirror scan
    assert (0, 6) in kept              # v->c SURVIVES (in-play rule)
    assert (7, 1) in kept              # twin survives too (no symm kill)
