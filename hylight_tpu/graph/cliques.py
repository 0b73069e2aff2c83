"""Maximal clique enumeration (quick-cliques equivalent).

The reference shells out to the quick-cliques binary
(``qc --algorithm=degeneracy``, ``ViralQuasispecies.cpp:400``; Eppstein-
Löffler-Strash degeneracy-order Bron-Kerbosch). Here the same algorithm
runs in-process via native/graphcore.cpp, with a Python fallback.
"""

from __future__ import annotations

import ctypes
from typing import List

import numpy as np

from hylight_tpu import native


def max_cliques(n_vertices: int, edges_u: np.ndarray, edges_v: np.ndarray
                ) -> List[List[int]]:
    """All maximal cliques of the undirected graph (isolated vertices are
    NOT reported, matching quick-cliques on an edge-list input)."""
    if n_vertices == 0:
        return []
    u = np.asarray(edges_u, dtype=np.int64)
    v = np.asarray(edges_v, dtype=np.int64)
    # build symmetric sorted CSR
    uu = np.concatenate([u, v])
    vv = np.concatenate([v, u])
    keep = uu != vv
    uu, vv = uu[keep], vv[keep]
    keys = uu * n_vertices + vv
    keys = np.unique(keys)
    uu = keys // n_vertices
    vv = keys % n_vertices
    adj_start = np.searchsorted(uu, np.arange(n_vertices + 1)).astype(np.int64)
    adj = vv.astype(np.int64)

    lib = native.load()
    if lib is not None and hasattr(lib, "hl_max_cliques_degeneracy"):
        lib.hl_max_cliques_degeneracy.restype = ctypes.c_longlong
        lib.hl_max_cliques_degeneracy.argtypes = \
            [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_longlong,
             ctypes.c_void_p, ctypes.c_longlong]
        cap = max(1024, 4 * len(adj) + 2 * n_vertices)
        for _ in range(6):
            out = np.empty(cap, dtype=np.int64)
            n = lib.hl_max_cliques_degeneracy(
                adj_start.ctypes.data_as(ctypes.c_void_p),
                adj.ctypes.data_as(ctypes.c_void_p),
                n_vertices, out.ctypes.data_as(ctypes.c_void_p), cap)
            if n >= 0:
                cliques = []
                i = 0
                for _c in range(n):
                    ln = int(out[i])
                    cliques.append(sorted(int(x) for x in out[i + 1:i + 1 + ln]))
                    i += 1 + ln
                return cliques
            cap *= 4
    return _max_cliques_py(n_vertices, adj_start, adj)


def _max_cliques_py(n_vertices, adj_start, adj) -> List[List[int]]:
    """Bron-Kerbosch with pivoting, degeneracy outer order (fallback)."""
    nbrs = [set(adj[adj_start[v]:adj_start[v + 1]].tolist())
            for v in range(n_vertices)]
    # degeneracy order
    deg = [len(s) for s in nbrs]
    order, removed = [], [False] * n_vertices
    import heapq
    h = [(d, v) for v, d in enumerate(deg)]
    heapq.heapify(h)
    while h:
        d, v = heapq.heappop(h)
        if removed[v] or d != deg[v]:
            continue
        removed[v] = True
        order.append(v)
        for u in nbrs[v]:
            if not removed[u]:
                deg[u] -= 1
                heapq.heappush(h, (deg[u], u))
    pos = {v: i for i, v in enumerate(order)}

    out: List[List[int]] = []

    def bk(R, P, X):
        if not P and not X:
            out.append(sorted(R))
            return
        pivot = max(P | X, key=lambda u: len(P & nbrs[u]))
        for v in list(P - nbrs[pivot]):
            bk(R | {v}, P & nbrs[v], X & nbrs[v])
            P.remove(v)
            X.add(v)

    for v in order:
        later = {u for u in nbrs[v] if pos[u] > pos[v]}
        earlier = {u for u in nbrs[v] if pos[u] < pos[v]}
        bk({v}, later, earlier)
    return out
