"""Golden differential test: our string-graph layout vs the bundled
prebuilt miniasm binary (/root/reference/tools/miniasm/miniasm, v0.3-r179)
on IDENTICAL PAF input (SURVEY.md §4's conformance plan).

Both sides get the same overlap table: miniasm via OverlapTable.to_paf +
reads.fa, ours via overlaps_to_arcs + miniasm_clean + unitigs. Flags match
the HyLight invocation ``miniasm -d 10000 -n 1 -e 1 -c 1`` with both
read-selection passes skipped (-1 -2: our pipeline applies coverage
selection separately as coverage_trim; the graph passes are what this test
pins down)."""

import os
import subprocess

import numpy as np
import pytest

from hylight_tpu.config import Config, OverlapConfig, LayoutConfig
from hylight_tpu.io.readset import ReadSet, decode_seq, revcomp_codes
from hylight_tpu.overlap.engine import find_overlaps
from hylight_tpu.graph.string_graph import (miniasm_clean, overlaps_to_arcs,
                                            unitig_seqs, unitigs)

MINIASM = "/root/reference/tools/miniasm/miniasm"

pytestmark = pytest.mark.skipif(
    not (os.path.isfile(MINIASM) and os.access(MINIASM, os.X_OK)),
    reason="bundled miniasm binary unavailable")


def _mk_reads(rng, glen=12000, rlen=2000, step=400):
    g = rng.integers(0, 4, size=glen).astype(np.uint8)
    reads = []
    for i, s in enumerate(range(0, glen - rlen + 1, step)):
        r = g[s:s + rlen].copy()
        if i % 3 == 1:
            r = revcomp_codes(r)
        reads.append(r)
    return ReadSet.from_seqs(reads, names=[f"r{i}"
                                           for i in range(len(reads))]), g


def _run_miniasm(tmp_path, reads: ReadSet, paf: str, flags):
    fa = tmp_path / "reads.fa"
    with open(fa, "w") as f:
        for i in range(reads.n):
            f.write(f">{reads.names[i]}\n{decode_seq(reads.get(i))}\n")
    paf_p = tmp_path / "ovlp.paf"
    paf_p.write_text(paf)
    out = subprocess.run(
        [MINIASM, *flags, "-f", str(fa), str(paf_p)],
        capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    seqs = []
    for line in out.stdout.splitlines():
        if line.startswith("S\t"):
            parts = line.split("\t")
            seqs.append(parts[2])
    return seqs


def _canon(s: str) -> str:
    rc = s.translate(str.maketrans("ACGT", "TGCA"))[::-1]
    return min(s, rc)


def _our_unitigs(reads, table, *, min_match, max_hang, int_frac,
                 max_ext, bub_dist, n_rounds):
    arcs, contained = overlaps_to_arcs(table, reads.n, min_ovlp=min_match,
                                       max_hang=max_hang, int_frac=int_frac)
    arcs, dropped = miniasm_clean(arcs, max_ext=max_ext, bub_dist=bub_dist,
                                  n_rounds=n_rounds)
    utg = unitigs(arcs, drop_reads=contained | dropped)
    out = unitig_seqs(utg, reads)
    return [decode_seq(out.get(i)) for i in range(out.n)]


def _overlaps(reads):
    cfg = OverlapConfig(k=13, w=5, min_ovlp_len=500, min_identity=0.95,
                        min_anchors=4, min_chain_score=100, max_occ=32,
                        anchors_per_pair=256, gap_tile=32)
    return find_overlaps(reads, cfg=cfg, query_block=32)


def test_unitigs_match_miniasm_binary(tmp_path):
    rng = np.random.default_rng(20)
    reads, genome = _mk_reads(rng)
    table = _overlaps(reads)
    assert table.n > 0
    paf = table.to_paf(names=reads.names, symmetric=False)

    ref_utgs = _run_miniasm(
        tmp_path, reads, paf,
        ["-1", "-2", "-d", "10000", "-n", "1", "-e", "1", "-c", "1",
         "-s", "500", "-m", "40", "-h", "1000", "-I", "0.8", "-g", "10"])
    ours = _our_unitigs(reads, table, min_match=40, max_hang=1000,
                        int_frac=0.8, max_ext=1, bub_dist=10000, n_rounds=1)
    assert len(ref_utgs) == len(ours), (len(ref_utgs), len(ours))
    assert sorted(map(_canon, ref_utgs)) == sorted(map(_canon, ours))


def _our_unitigs_full(reads, table, *, min_dp, min_span, min_match,
                      max_hang, int_frac, min_ovlp, max_ext, bub_dist,
                      n_rounds, fuzz):
    """Full pipeline including the 2-pass read selection (readsel.py) —
    the counterpart of running miniasm WITHOUT -1 -2."""
    from hylight_tpu.assembly import readsel
    hits, sub = readsel.select_reads(
        table, reads.n, min_dp=min_dp, min_span=min_span,
        min_match=min_match, max_hang=max_hang, int_frac=int_frac,
        min_ovlp=min_ovlp)
    arcs = readsel.sg_arcs_from_hits(hits, sub, max_hang=max_hang,
                                     int_frac=int_frac, min_ovlp=min_ovlp)
    arcs, dropped = miniasm_clean(arcs, max_ext=max_ext, bub_dist=bub_dist,
                                  n_rounds=n_rounds, fuzz=fuzz)
    utg = unitigs(arcs, drop_reads=sub.deleted | dropped)
    out = unitig_seqs(utg, readsel.trimmed_reads(reads, sub))
    return [decode_seq(out.get(i)) for i in range(out.n)]


def test_full_cascade_matches_miniasm(tmp_path):
    """2-pass read selection + graph: unitig sequences are identical to
    the binary run WITHOUT -1/-2 (read trimming, chimera filter and
    containment included)."""
    rng = np.random.default_rng(22)
    reads, genome = _mk_reads(rng)
    table = _overlaps(reads)
    paf = table.to_paf(names=reads.names, symmetric=False)
    ref_utgs = _run_miniasm(
        tmp_path, reads, paf,
        ["-d", "10000", "-n", "1", "-e", "1", "-c", "1",
         "-s", "500", "-m", "40", "-h", "1000", "-I", "0.8", "-g", "10"])
    ours = _our_unitigs_full(reads, table, min_dp=1, min_span=500,
                             min_match=40, max_hang=1000, int_frac=0.8,
                             min_ovlp=500, max_ext=1, bub_dist=10000,
                             n_rounds=1, fuzz=10)
    assert len(ref_utgs) == len(ours), (len(ref_utgs), len(ours))
    assert sorted(map(_canon, ref_utgs)) == sorted(map(_canon, ours))


def test_full_cascade_matches_miniasm_chimera(tmp_path):
    """A chimeric read plus a contained read exercise ma_hit_sub's
    plateau trimming, ma_hit_flt and ma_hit_contained against the binary
    (min_dp=2 so the junk arm actually dips below the threshold)."""
    rng = np.random.default_rng(23)
    glen, rlen, step = 14000, 2000, 250
    g = rng.integers(0, 4, size=glen).astype(np.uint8)
    reads = [g[s:s + rlen].copy()
             for s in range(0, glen - rlen + 1, step)]
    junk = rng.integers(0, 4, size=1200).astype(np.uint8)
    reads.append(np.concatenate([g[4000:5000], junk]))   # chimera
    reads.append(g[6100:7300].copy())                    # contained read
    rs = ReadSet.from_seqs(reads, names=[f"c{i}" for i in range(len(reads))])
    table = _overlaps(rs)
    paf = table.to_paf(names=rs.names, symmetric=False)
    ref_utgs = _run_miniasm(
        tmp_path, rs, paf,
        ["-d", "10000", "-n", "1", "-e", "1", "-c", "2",
         "-s", "500", "-m", "40", "-h", "1000", "-I", "0.8", "-g", "10"])
    ours = _our_unitigs_full(rs, table, min_dp=2, min_span=500,
                             min_match=40, max_hang=1000, int_frac=0.8,
                             min_ovlp=500, max_ext=1, bub_dist=10000,
                             n_rounds=1, fuzz=10)
    assert len(ref_utgs) == len(ours), (len(ref_utgs), len(ours))
    assert sorted(map(_canon, ref_utgs)) == sorted(map(_canon, ours))


def test_unitigs_match_miniasm_branchy(tmp_path):
    """Two-haplotype layout: a shared left arm forking into two strain
    arms — exercises tips/short-overlap drops and branch handling."""
    rng = np.random.default_rng(21)
    G = 9000
    shared = rng.integers(0, 4, size=G).astype(np.uint8)
    armB = shared.copy()
    armB[6000:] = rng.integers(0, 4, size=G - 6000)
    reads = []
    for src in (shared, armB):
        for s in range(0, G - 1500 + 1, 300):
            reads.append(src[s:s + 1500].copy())
    rs = ReadSet.from_seqs(reads, names=[f"x{i}" for i in range(len(reads))])
    table = _overlaps(rs)
    paf = table.to_paf(names=rs.names, symmetric=False)
    ref_utgs = _run_miniasm(
        tmp_path, rs, paf,
        ["-1", "-2", "-d", "10000", "-n", "1", "-e", "1", "-c", "1",
         "-s", "500", "-m", "40", "-h", "1000", "-I", "0.8", "-g", "10"])
    ours = _our_unitigs(rs, table, min_match=40, max_hang=1000,
                        int_frac=0.8, max_ext=1, bub_dist=10000, n_rounds=1)
    assert len(ref_utgs) == len(ours), (len(ref_utgs), len(ours))
    assert sorted(map(_canon, ref_utgs)) == sorted(map(_canon, ours))
