"""Golden differential: max_cliques vs the PREBUILT quick-cliques binary.

The reference shells out to ``qc --algorithm=degeneracy`` on a graph file
(ViralQuasispecies.cpp:400) written in the quick-cliques .edges format:
line 1 = vertex count, line 2 = number of directed edge lines, then one
``i,j`` line per direction (OverlapGraph.cpp:360-375).  SRBuilder parses
the stdout clique lines as whitespace-separated ints, skipping non-numeric
lines (SRBuilder.cpp:1056-1063), and drops size-1 cliques
(SRBuilder.cpp:1075-1084).

Here we drive the bundled binary at
/root/reference/tools/HaploConduct/quick-cliques/bin/qc on random graphs
and assert set-equality of the maximal-clique sets with
``hylight_tpu.graph.cliques.max_cliques`` (both the native C++ path and the
python fallback).  qc emits singleton cliques for isolated vertices (the
vertex count comes from the header); ``max_cliques`` deliberately omits
them (they can never pass minCliqueSize >= 2), so the comparison adds the
isolated-vertex singletons back on our side.
"""

import os
import shutil
import subprocess

import numpy as np
import pytest

from hylight_tpu.graph.cliques import max_cliques, _max_cliques_py

QC = "/root/reference/tools/HaploConduct/quick-cliques/bin/qc"

pytestmark = pytest.mark.skipif(
    not (os.path.exists(QC) and os.access(QC, os.X_OK)),
    reason="reference qc binary not available")


def run_qc(n_vertices, edges_u, edges_v, tmp_path):
    """Run the reference binary; return the set of maximal cliques."""
    # dedup undirected edges, drop self loops (OverlapGraph writes each
    # undirected edge as two directed lines and never writes self loops)
    pairs = set()
    for a, b in zip(edges_u, edges_v):
        a, b = int(a), int(b)
        if a != b:
            pairs.add((min(a, b), max(a, b)))
    lines = []
    for a, b in sorted(pairs):
        lines.append(f"{a},{b}")
        lines.append(f"{b},{a}")
    gpath = tmp_path / "graph.txt"
    gpath.write_text(
        f"{n_vertices}\n{len(lines)}\n" + "\n".join(lines) + ("\n" if lines else ""))
    res = subprocess.run(
        [QC, "--algorithm=degeneracy", f"--input-file={gpath}"],
        capture_output=True, text=True, timeout=120)
    assert res.returncode == 0, res.stderr
    cliques = set()
    for line in res.stdout.splitlines():
        toks = line.split()
        if not toks:
            continue
        try:
            clique = tuple(sorted(int(t) for t in toks))
        except ValueError:
            continue  # NOTE:/banner lines, exactly as SRBuilder skips them
        cliques.add(clique)
    return cliques


def ours_with_singletons(n_vertices, eu, ev, py=False):
    if py:
        # go through the same CSR build, then the python fallback
        import hylight_tpu.graph.cliques as cq
        lib_load = cq.native.load
        try:
            cq.native.load = lambda: None
            cl = max_cliques(n_vertices, eu, ev)
        finally:
            cq.native.load = lib_load
    else:
        cl = max_cliques(n_vertices, eu, ev)
    got = {tuple(c) for c in cl}
    touched = set(int(x) for x in eu) | set(int(x) for x in ev)
    # self-loop-only vertices count as isolated for qc too (loops dropped)
    looped_only = {int(a) for a, b in zip(eu, ev) if int(a) == int(b)}
    touched -= {v for v in looped_only
                if not any((int(a) == v) != (int(b) == v)
                           for a, b in zip(eu, ev))}
    for v in range(n_vertices):
        if v not in touched:
            got.add((v,))
    return got


def rand_graph(rng, n, p):
    m = rng.random((n, n)) < p
    iu = np.triu_indices(n, 1)
    mask = m[iu]
    return iu[0][mask], iu[1][mask]


@pytest.mark.parametrize("seed,n,p", [
    (s, n, p)
    for s in range(4)
    for (n, p) in [(6, 0.0), (8, 0.15), (12, 0.3), (16, 0.5),
                   (10, 0.85), (24, 0.12)]
])
def test_golden_random(seed, n, p, tmp_path):
    rng = np.random.default_rng(1000 * seed + n)
    eu, ev = rand_graph(rng, n, p)
    golden = run_qc(n, eu, ev, tmp_path)
    assert ours_with_singletons(n, eu, ev) == golden
    assert ours_with_singletons(n, eu, ev, py=True) == golden


def test_golden_disconnected_components(tmp_path):
    # two K4s, a path, an isolated vertex, plus a self loop on vertex 12
    eu, ev = [], []
    for comp in ([0, 1, 2, 3], [4, 5, 6, 7]):
        for i in range(4):
            for j in range(i + 1, 4):
                eu.append(comp[i]); ev.append(comp[j])
    eu += [8, 9, 10]; ev += [9, 10, 11]
    eu.append(12); ev.append(12)  # self loop: dropped by both sides
    n = 14  # vertex 13 isolated
    eu = np.array(eu); ev = np.array(ev)
    golden = run_qc(n, eu, ev, tmp_path)
    assert ours_with_singletons(n, eu, ev) == golden
    assert ours_with_singletons(n, eu, ev, py=True) == golden
    assert (13,) in golden and (12,) in golden


def test_golden_dense_k16(tmp_path):
    n = 16
    iu = np.triu_indices(n, 1)
    golden = run_qc(n, iu[0], iu[1], tmp_path)
    assert golden == {tuple(range(n))}
    assert ours_with_singletons(n, iu[0], iu[1]) == golden
