import numpy as np
import pytest

from hylight_tpu.graph.cluster import _union_find_py, union_find_capped
from hylight_tpu.graph.cliques import max_cliques


def test_union_find_native_matches_python(rng):
    n = 200
    e1 = rng.integers(0, n, size=1000)
    e2 = rng.integers(0, n, size=1000)
    h_native = union_find_capped(e1, e2, n, max_size=20)
    h_py = _union_find_py(e1.astype(np.int64), e2.astype(np.int64), n, 20)
    assert (h_native == h_py).all()


def test_union_find_cap_respected(rng):
    n = 100
    # chain edges would union everything without a cap
    e1 = np.arange(n - 1)
    e2 = np.arange(1, n)
    heads = union_find_capped(e1, e2, n, max_size=10)
    _, counts = np.unique(heads, return_counts=True)
    assert counts.max() <= 10
    assert counts.min() >= 1


def test_union_find_order_dependence():
    """Edge order changes which unions hit the cap first."""
    edges_a = [(0, 1), (2, 3), (1, 2)]
    edges_b = [(1, 2), (0, 1), (2, 3)]
    ha = union_find_capped(np.array([e[0] for e in edges_a]),
                           np.array([e[1] for e in edges_a]), 4, max_size=2)
    hb = union_find_capped(np.array([e[0] for e in edges_b]),
                           np.array([e[1] for e in edges_b]), 4, max_size=2)
    # order A: {0,1}, {2,3} filled to cap, edge (1,2) rejected
    assert ha[0] == ha[1] and ha[2] == ha[3] and ha[0] != ha[2]
    # order B: {1,2} first, then (0,1) and (2,3) rejected by cap
    assert hb[1] == hb[2] and hb[0] != hb[1] and hb[3] != hb[2]


def test_max_cliques_triangle_plus_edge():
    # triangle 0-1-2 plus pendant edge 2-3
    cl = max_cliques(4, np.array([0, 0, 1, 2]), np.array([1, 2, 2, 3]))
    assert sorted(cl) == [[0, 1, 2], [2, 3]]


def test_max_cliques_k4():
    u, v = [], []
    for i in range(4):
        for j in range(i + 1, 4):
            u.append(i)
            v.append(j)
    cl = max_cliques(4, np.array(u), np.array(v))
    assert cl == [[0, 1, 2, 3]]


def test_max_cliques_matches_python_fallback(rng):
    n = 30
    m = 120
    u = rng.integers(0, n, size=m)
    v = rng.integers(0, n, size=m)
    keep = u != v
    u, v = u[keep], v[keep]
    got = sorted(map(tuple, max_cliques(n, u, v)))
    # brute force via python fallback path
    import hylight_tpu.graph.cliques as cq
    uu = np.concatenate([u, v]).astype(np.int64)
    vv = np.concatenate([v, u]).astype(np.int64)
    keys = np.unique(uu * n + vv)
    uu, vv = keys // n, keys % n
    adj_start = np.searchsorted(uu, np.arange(n + 1)).astype(np.int64)
    want = sorted(map(tuple, cq._max_cliques_py(n, adj_start, vv)))
    assert got == want
