"""Golden differential: cluster_reads vs the reference clustering scripts.

Drives the reference's pure-python pipeline as subprocesses:
  bin_pointer_limited_filechunks_shortpath2.py  (size-capped union-find over
      a PAF stream, path-length union rule; HyLight.py:218)
  getclusters.py  (path compression, drop clusters <20 units, invert;
      HyLight.py:219)
on synthetic score-ordered PAF files and asserts that
``hylight_tpu.graph.cluster.union_find_capped`` / ``cluster_reads`` produce
identical head assignments and identical final cluster sets — including cap
rejections and the <20 drop.

Format notes (bin_pointer...py:79-80,105-106): only PAF columns 0 and 5 are
used, names carry a 2-char ``/1``/``/2`` suffix stripped by ``[:-2]``; the
readnames file holds the suffix-free pair names, one per line, defining
1-based cluster ids.  The chunked pre-filter (getchunkfile, strict ``<``
cap at chunk-snapshot sizes) can only diverge from the processing-time
``<=`` rule when a pair of clusters sums to EXACTLY maxsize at a chunk
boundary — a knife-edge we deliberately do not reproduce (documented in
graph/cluster.py); the multi-chunk test avoids that boundary.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

import hylight_tpu.graph.cluster as cluster_mod
from hylight_tpu.graph.cluster import cluster_reads, union_find_capped, _union_find_py
from hylight_tpu.overlap.table import OverlapTable

BIN_POINTER = "/root/reference/script/bin_pointer_limited_filechunks_shortpath2.py"
GETCLUSTERS = "/root/reference/script/getclusters.py"

pytestmark = pytest.mark.skipif(
    not (os.path.exists(BIN_POINTER) and os.path.exists(GETCLUSTERS)),
    reason="reference scripts not available")


def run_reference(n_units, e1, e2, max_size, tmp_path, threads=2,
                  pad_to_bytes=0):
    """Run both reference scripts; returns (heads ndarray, grouped sets)."""
    names = [f"p{i:06d}" for i in range(n_units)]
    (tmp_path / "readnames.txt").write_text("".join(n + "\n" for n in names))
    rng = np.random.default_rng(0)
    lines = []
    for a, b in zip(e1, e2):
        qn = names[a] + ("/1" if rng.random() < 0.5 else "/2")
        tn = names[b] + ("/1" if rng.random() < 0.5 else "/2")
        # PAF-shaped: only cols 0 and 5 are consumed
        lines.append(f"{qn}\t250\t0\t250\t+\t{tn}\t250\t0\t250\t240\t250\t60")
    body = "".join(ln + "\n" for ln in lines)
    if pad_to_bytes and len(body) < pad_to_bytes:
        # lengthen lines with a trailing dummy column to force multi-chunk
        extra = pad_to_bytes // max(1, len(lines))
        pad = "x" * extra
        body = "".join(ln + "\t" + pad + "\n" for ln in lines)
    (tmp_path / "ovlp.paf").write_text(body)

    res = subprocess.run(
        [sys.executable, BIN_POINTER, "ovlp.paf", "readnames.txt",
         str(max_size), "golden", str(threads)],
        cwd=tmp_path, capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, res.stderr
    prefix = f"golden_max{max_size}_final"
    clusters = json.load(open(tmp_path / f"{prefix}_clusters.json"))

    # getclusters.py is ALWAYS run with 1 thread here: its dict split uses
    # dictsize = len//threads (getclusters.py:57-62), silently dropping the
    # last len % threads units from the grouped output — an unintentional
    # truncation bug we deliberately do not reproduce (see
    # test_reference_getclusters_thread_truncation_bug).
    res2 = subprocess.run(
        [sys.executable, GETCLUSTERS, prefix, "1"],
        cwd=tmp_path, capture_output=True, text=True, timeout=600)
    assert res2.returncode == 0, res2.stderr
    grouped = json.load(open(tmp_path / f"{prefix}_clusters_grouped.json"))

    # compress pointer chains to head unit index
    idx = {n: i for i, n in enumerate(names)}
    heads = np.empty(n_units, dtype=np.int64)
    for n in names:
        cur = n
        while not isinstance(clusters[cur], int):
            cur = clusters[cur]
        heads[idx[n]] = idx[cur]
    grouped_sets = {frozenset(idx[n] for n in v) for v in grouped.values()}
    return heads, grouped_sets


def ours(n_units, e1, e2, max_size, min_size=20):
    heads = union_find_capped(np.asarray(e1), np.asarray(e2), n_units, max_size)
    heads_py = _union_find_py(np.asarray(e1, dtype=np.int64),
                              np.asarray(e2, dtype=np.int64), n_units, max_size)
    np.testing.assert_array_equal(heads, heads_py)
    m = len(e1)
    z32 = np.zeros(m, dtype=np.int32)
    table = OverlapTable(
        qid=np.asarray(e1, dtype=np.int32), tid=np.asarray(e2, dtype=np.int32),
        strand=np.zeros(m, dtype=np.int8), qs=z32, qe=z32 + 250, ts=z32,
        te=z32 + 250, qlen=z32 + 250, tlen=z32 + 250, matches=z32 + 240,
        columns=z32 + 250, identity=np.full(m, 0.96, dtype=np.float32),
        score=np.arange(m, 0, -1, dtype=np.float32),
        score2=np.zeros(m, dtype=np.float32), score3=np.zeros(m, dtype=np.float32))
    cl = cluster_reads(table, n_units, max_size=max_size, min_size=min_size)
    return heads, {frozenset(int(x) for x in c) for c in cl}


def edge_stream(rng, n_units, n_edges):
    e1 = rng.integers(0, n_units, n_edges)
    e2 = rng.integers(0, n_units, n_edges)
    keep = e1 != e2  # same-unit (mate-pair) lines are no-ops on both sides
    return e1[keep], e2[keep]


@pytest.mark.parametrize("seed,n_units,n_edges,max_size", [
    (1, 80, 300, 10**9),     # uncapped
    (2, 80, 300, 25),        # cap binds hard
    (3, 200, 1500, 40),      # cap + many merges
    (4, 50, 60, 3),          # tiny cap: almost everything rejected
    (5, 400, 4000, 120),
])
def test_golden_heads_and_groups(seed, n_units, n_edges, max_size, tmp_path):
    rng = np.random.default_rng(seed)
    e1, e2 = edge_stream(rng, n_units, n_edges)
    ref_heads, ref_groups = run_reference(n_units, e1, e2, max_size, tmp_path)
    my_heads, my_groups = ours(n_units, e1, e2, max_size)
    np.testing.assert_array_equal(my_heads, ref_heads)
    assert my_groups == ref_groups


def test_golden_min20_drop_boundary(tmp_path):
    """Chains of exactly 19, 20, 21 units: only >=20 survive getclusters."""
    e1, e2 = [], []
    base = 0
    sizes = (19, 20, 21)
    for s in sizes:
        for i in range(s - 1):
            e1.append(base + i); e2.append(base + i + 1)
        base += s
    n_units = base + 5  # a few isolated units too
    ref_heads, ref_groups = run_reference(
        n_units, np.array(e1), np.array(e2), 10**9, tmp_path)
    my_heads, my_groups = ours(n_units, np.array(e1), np.array(e2), 10**9)
    np.testing.assert_array_equal(my_heads, ref_heads)
    assert my_groups == ref_groups
    assert sorted(len(g) for g in my_groups) == [20, 21]


def test_golden_cap_equality_accepted(tmp_path):
    """clustsize == maxsize is ACCEPTED (<=, bin_pointer...py:83)."""
    # two 5-chains, then an edge joining them with maxsize=10
    e1 = [0, 1, 2, 3, 5, 6, 7, 8, 0]
    e2 = [1, 2, 3, 4, 6, 7, 8, 9, 5]
    ref_heads, _ = run_reference(10, np.array(e1), np.array(e2), 10, tmp_path)
    my_heads, _ = ours(10, np.array(e1), np.array(e2), 10, min_size=1)
    np.testing.assert_array_equal(my_heads, ref_heads)
    assert len(set(my_heads.tolist())) == 1  # merged: 5+5 <= 10


def test_reference_getclusters_thread_truncation_bug(tmp_path):
    """Pin the reference divergence we deliberately do NOT reproduce:
    getclusters.py with threads=T drops the last len%T units from the
    grouped output (dictsize = len//threads, getclusters.py:57-62).
    Verified here with T=2 on a 41-unit survivor set (20+21 chains)."""
    e1, e2 = [], []
    base = 0
    for s in (19, 20, 21):
        for i in range(s - 1):
            e1.append(base + i); e2.append(base + i + 1)
        base += s
    n_units = base + 5
    names = [f"p{i:06d}" for i in range(n_units)]
    (tmp_path / "readnames.txt").write_text("".join(n + "\n" for n in names))
    (tmp_path / "ovlp.paf").write_text("".join(
        f"{names[a]}/1\t250\t0\t250\t+\t{names[b]}/2\t250\t0\t250\t240\t250\t60\n"
        for a, b in zip(e1, e2)))
    res = subprocess.run(
        [sys.executable, BIN_POINTER, "ovlp.paf", "readnames.txt",
         str(10**9), "golden", "1"],
        cwd=tmp_path, capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, res.stderr
    res2 = subprocess.run(
        [sys.executable, GETCLUSTERS, f"golden_max{10**9}_final", "2"],
        cwd=tmp_path, capture_output=True, text=True, timeout=600)
    assert res2.returncode == 0, res2.stderr
    grouped = json.load(open(tmp_path / f"golden_max{10**9}_final_clusters_grouped.json"))
    n_grouped = sum(len(v) for v in grouped.values())
    assert n_grouped == 40  # 41 surviving units, one lost to the split bug


@pytest.mark.slow
def test_golden_multichunk(tmp_path):
    """>2.6 MB stream forces multiple chunk sessions through the reference's
    pre-filter path; semantics must still match (cap far from the exact-
    equality knife edge)."""
    rng = np.random.default_rng(99)
    n_units, n_edges = 3000, 90000
    e1, e2 = edge_stream(rng, n_units, n_edges)
    ref_heads, ref_groups = run_reference(
        n_units, e1, e2, 333, tmp_path, pad_to_bytes=6_000_000)
    my_heads, my_groups = ours(n_units, e1, e2, 333)
    np.testing.assert_array_equal(my_heads, ref_heads)
    assert my_groups == ref_groups
