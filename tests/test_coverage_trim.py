import numpy as np

from hylight_tpu.config import Config, OverlapConfig, LayoutConfig
from hylight_tpu.io.readset import ReadSet
from hylight_tpu.assembly.longread import coverage_trim
from hylight_tpu.overlap.engine import find_overlaps

CFG = OverlapConfig(k=11, w=5, min_ovlp_len=150, min_identity=0.9,
                    min_anchors=4, min_chain_score=60, max_occ=64,
                    anchors_per_pair=256, gap_tile=32)


def test_coverage_trim_drops_uncovered_chimera_arm(rng):
    """A chimeric read (two unrelated halves) keeps only the half covered
    by >= min_dp supporting reads."""
    g = rng.integers(0, 4, size=2000).astype(np.uint8)
    junk = rng.integers(0, 4, size=600).astype(np.uint8)
    chimera = np.concatenate([g[200:800], junk])
    reads = [g[i * 100:i * 100 + 500] for i in range(14)] + [chimera]
    rs = ReadSet.from_seqs(reads)
    t = find_overlaps(rs, cfg=CFG, query_block=8)
    trimmed = coverage_trim(t, rs, min_dp=3, min_span=200)
    # the chimera (last read) should be trimmed to roughly its genomic half
    names = trimmed.names
    assert str(len(reads) - 1) in names
    idx = names.index(str(len(reads) - 1))
    assert int(trimmed.lengths[idx]) <= 650
    # interior reads (away from genome ends, where coverage tapers) survive
    # near full length
    interior = [int(trimmed.lengths[trimmed.names.index(str(i))])
                for i in range(4, 10) if str(i) in trimmed.names]
    assert interior and all(l >= 400 for l in interior)


def test_coverage_trim_mindp1_keeps_covered(rng):
    g = rng.integers(0, 4, size=1500).astype(np.uint8)
    reads = [g[i * 150:i * 150 + 500] for i in range(7)]
    rs = ReadSet.from_seqs(reads)
    t = find_overlaps(rs, cfg=CFG, query_block=8)
    trimmed = coverage_trim(t, rs, min_dp=1, min_span=100)
    assert trimmed.n == rs.n
