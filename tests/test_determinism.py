"""Determinism contract: identical inputs -> bit-identical outputs.

The reference achieves reproducibility via fixed-seed heuristics
(GraphAlgos.cpp:204,273) and deterministic tie-breaks
(EdgeCalculator.cpp:474-520); our contract is the same at every stage
(SURVEY.md §7.4)."""

import numpy as np

from hylight_tpu.config import Config, OverlapConfig, LayoutConfig, \
    SnpFilterConfig
from hylight_tpu.io.readset import ReadSet
from hylight_tpu.assembly.longread import assemble_long_reads
from hylight_tpu.overlap.engine import find_overlaps

CFG = Config().replace(
    overlap=OverlapConfig(k=13, w=5, min_ovlp_len=300, min_identity=0.9,
                          min_anchors=4, min_chain_score=100, max_occ=64,
                          anchors_per_pair=256, gap_tile=32),
    layout=LayoutConfig(min_match=100, bubble_dist=5000, min_span=500),
    snp=SnpFilterConfig(mc=3),
)


def _reads(rng):
    g = rng.integers(0, 4, size=5000).astype(np.uint8)
    return [g[s:s + 1000] for s in range(0, 4001, 250)]


def test_overlap_table_deterministic():
    rng1 = np.random.default_rng(42)
    rs = ReadSet.from_seqs(_reads(rng1))
    t1 = find_overlaps(rs, cfg=CFG.overlap, query_block=8)
    t2 = find_overlaps(rs, cfg=CFG.overlap, query_block=8)
    assert t1.n == t2.n
    for f in ("qid", "tid", "strand", "qs", "qe", "ts", "te", "matches"):
        assert (getattr(t1, f) == getattr(t2, f)).all(), f


def test_assembly_deterministic():
    rng1 = np.random.default_rng(43)
    reads = _reads(rng1)
    c1 = assemble_long_reads(ReadSet.from_seqs(reads), CFG, query_block=8)
    c2 = assemble_long_reads(ReadSet.from_seqs(reads), CFG, query_block=8)
    assert c1.n == c2.n
    assert (c1.seq == c2.seq).all()
    assert (c1.offsets == c2.offsets).all()
