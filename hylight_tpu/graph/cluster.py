"""Size-capped union-find read clustering (short-read binning).

Reference path: ``get_readnames.py`` + ``bin_pointer_limited_filechunks_
shortpath2.py`` (score-descending stream, path-length union rule, size cap)
+ ``getclusters.py`` (path compression, drop <20, invert) +
``get_fq_cluster.py`` (per-cluster read materialization). Here the stream is
the in-memory overlap table sorted by score; the serial pointer-chasing runs
in native C++ (hl_union_find_capped), with a pure-Python fallback of
identical semantics.
"""

from __future__ import annotations

import ctypes
from typing import Dict, List

import numpy as np

from hylight_tpu.overlap.table import OverlapTable
from hylight_tpu import native
from hylight_tpu.utils import get_logger

log = get_logger()


def union_find_capped(e1: np.ndarray, e2: np.ndarray, n_units: int,
                      max_size: int) -> np.ndarray:
    """Process edges IN ORDER; returns head unit per unit ([n_units])."""
    e1 = np.ascontiguousarray(e1, dtype=np.int64)
    e2 = np.ascontiguousarray(e2, dtype=np.int64)
    lib = native.load()
    if lib is not None and hasattr(lib, "hl_union_find_capped"):
        parent = np.empty(n_units, dtype=np.int64)
        size = np.empty(n_units, dtype=np.int64)
        lib.hl_union_find_capped.restype = None
        lib.hl_union_find_capped.argtypes = [ctypes.c_void_p] * 2 + \
            [ctypes.c_longlong] * 3 + [ctypes.c_void_p] * 2
        lib.hl_union_find_capped(
            e1.ctypes.data_as(ctypes.c_void_p),
            e2.ctypes.data_as(ctypes.c_void_p),
            len(e1), n_units, max_size,
            parent.ctypes.data_as(ctypes.c_void_p),
            size.ctypes.data_as(ctypes.c_void_p))
        return parent
    return _union_find_py(e1, e2, n_units, max_size)


def _union_find_py(e1, e2, n_units, max_size) -> np.ndarray:
    """Reference-exact Python fallback (no path compression, path-length
    union direction, capped)."""
    parent = np.arange(n_units, dtype=np.int64)
    size = np.ones(n_units, dtype=np.int64)

    def findhead(r):
        hops = 1
        while parent[r] != r:
            r = parent[r]
            hops += 1
        return r, hops

    for a, b in zip(e1, e2):
        h1, p1 = findhead(a)
        h2, p2 = findhead(b)
        if h1 == h2:
            continue
        tot = size[h1] + size[h2]
        if tot > max_size:
            continue
        if p2 < p1:
            parent[h2] = h1
            size[h1] = tot
        else:
            parent[h1] = h2
            size[h2] = tot
    heads = np.empty(n_units, dtype=np.int64)
    for i in range(n_units):
        heads[i], _ = findhead(i)
    return heads


def cluster_reads(table: OverlapTable, n_units: int, *,
                  max_size: int, min_size: int,
                  unit_of=None) -> List[np.ndarray]:
    """Overlap table -> list of unit-index arrays (clusters, size-filtered).

    unit_of: optional int array mapping read id -> unit id (e.g. PE mates
    share a unit, as the reference strips '/1'/'/2'); identity by default.
    """
    if table.n == 0:
        return []
    order = np.argsort(-table.score, kind="stable")
    q = table.qid[order].astype(np.int64)
    t = table.tid[order].astype(np.int64)
    if unit_of is not None:
        q = unit_of[q]
        t = unit_of[t]
    keep = q != t
    heads = union_find_capped(q[keep], t[keep], n_units, max_size)

    out: List[np.ndarray] = []
    order2 = np.argsort(heads, kind="stable")
    sorted_heads = heads[order2]
    bounds = np.nonzero(np.diff(sorted_heads))[0] + 1
    groups = np.split(order2, bounds)
    for g in groups:
        if len(g) >= min_size:
            out.append(np.sort(g))
    log.info("[C::cluster] %d units -> %d clusters (>=%d units)",
             n_units, len(out), min_size)
    return out
