"""Multi-try heuristics (vertexLabellingHeuristic GraphAlgos.cpp:178-248,
cycleRemovalHeuristic :487-541): best-of-N shuffled orders must beat the
one-shot deterministic pass on conflict-heavy graphs."""

import numpy as np
import pytest

from hylight_tpu import native
from hylight_tpu.assembly.srcore import orient_reads
from hylight_tpu.overlap.table import OverlapTable


def _table(edges, n):
    """Minimal OverlapTable stand-in for orientation tests."""
    qid = np.array([e[0] for e in edges], dtype=np.int64)
    tid = np.array([e[1] for e in edges], dtype=np.int64)
    strand = np.array([e[2] for e in edges], dtype=np.int64)
    z = np.zeros(len(edges), dtype=np.int64)
    lens = np.full(len(edges), 100, dtype=np.int64)
    ones = np.ones(len(edges))
    return OverlapTable(qid=qid, tid=tid, strand=strand,
                        qs=z, qe=lens, ts=z, te=lens,
                        qlen=lens, tlen=lens,
                        matches=lens, columns=lens,
                        identity=ones, score=ones, score2=ones,
                        score3=ones)


def _conflict_edges(n=10):
    """Two parity-consistent cliques; cross edges: ONE strand-0 edge listed
    first (so a one-shot BFS in table order propagates equal labels) and
    six strand-1 edges. Optimal labelling flips clique B: 1 conflict; the
    equal-label choice leaves 6."""
    edges = [(0, 5, 0)]                       # the trap edge
    for a in range(5):
        for b in range(a + 1, 5):
            edges.append((a, b, 0))
            edges.append((a + 5, b + 5, 0))
    for i in range(6):
        edges.append((i % 5, 5 + (i * 2) % 5, 1))
    return edges


def test_multitry_labelling_beats_one_shot():
    if native.load() is None:
        pytest.skip("native library unavailable")
    edges = _conflict_edges()
    t = _table(edges, 10)
    admitted = np.ones(t.n, dtype=bool)
    # one deterministic python pass (fallback path): trap edge first
    labels1, keep1 = orient_reads(t, 10, admitted, tries=0)
    conf1 = int((admitted & ~keep1).sum())
    # best-of-100 native pass
    labels100, keep100 = orient_reads(t, 10, admitted, tries=100)
    conf100 = int((admitted & ~keep100).sum())
    assert conf100 == 1, conf100
    assert conf1 >= 2 * conf100, (conf1, conf100)


def test_multitry_labelling_perfect_graph_zero_conflicts():
    if native.load() is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(3)
    truth = rng.integers(0, 2, 30)
    edges = []
    for _ in range(120):
        a, b = rng.choice(30, 2, replace=False)
        edges.append((int(a), int(b), int(truth[a] ^ truth[b])))
    t = _table(edges, 30)
    admitted = np.ones(t.n, dtype=bool)
    labels, keep = orient_reads(t, 30, admitted, tries=100)
    assert keep.all()
    par = (labels[t.qid] ^ labels[t.tid]) == t.strand
    assert par.all()


def test_multitry_backedges_never_worse_and_sometimes_better():
    if native.load() is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(7)
    improved = 0
    for trial in range(12):
        n = 24
        m = 90
        eu = rng.integers(0, n, m).astype(np.int32)
        ev = (eu + 1 + rng.integers(0, n - 1, m).astype(np.int32)) % n
        keys = [rng.random(m) for _ in range(4)]
        b1 = native.find_backedges(eu, ev, *keys, n, max_tries=1)
        b20 = native.find_backedges(eu, ev, *keys, n, max_tries=20)
        assert b20.sum() <= b1.sum()
        if b20.sum() < b1.sum():
            improved += 1
    assert improved >= 1, "20 tries never improved over 1 on cyclic graphs"
