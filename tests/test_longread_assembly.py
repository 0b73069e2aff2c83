import numpy as np
import pytest

from hylight_tpu.config import (Config, OverlapConfig, LayoutConfig,
                                SnpFilterConfig)
from hylight_tpu.io.readset import ReadSet, decode_seq, revcomp_codes
from hylight_tpu.assembly.longread import assemble_long_reads

CFG = Config().replace(
    overlap=OverlapConfig(k=13, w=5, min_ovlp_len=300, min_identity=0.9,
                          min_anchors=4, min_chain_score=100, max_occ=64,
                          anchors_per_pair=256, gap_tile=32),
    layout=LayoutConfig(min_match=100, bubble_dist=5000, min_span=500),
    snp=SnpFilterConfig(mc=3),  # test coverage is ~6x (real data: 4+)
)


def _tiling_reads(rng, genome, read_len, step, flip_every=0):
    reads = []
    for i, s in enumerate(range(0, len(genome) - read_len + 1, step)):
        r = genome[s:s + read_len]
        if flip_every and i % flip_every == flip_every - 1:
            r = revcomp_codes(r)
        reads.append(r)
    return reads


def _aligned_identity(contig, genome):
    """Crude containment check: exact match of contig or its rc in genome."""
    s = decode_seq(contig)
    g = decode_seq(genome)
    rc = decode_seq(revcomp_codes(contig))
    return (s in g) or (rc in g)


def test_single_genome_assembly(rng):
    g = rng.integers(0, 4, size=8000).astype(np.uint8)
    reads = _tiling_reads(rng, g, 1200, 300, flip_every=5)
    contigs = assemble_long_reads(ReadSet.from_seqs(reads), CFG,
                                  query_block=16)
    assert contigs.n >= 1
    total = int(contigs.lengths.sum())
    assert total >= 7000, f"assembled only {total} of 8000"
    # the largest contig must be an exact substring of the genome
    big = int(np.argmax(contigs.lengths))
    assert _aligned_identity(contigs.get(big), g)


def test_two_strains_separate(rng):
    """Two strains at 1% divergence must yield strain-resolved contigs."""
    gA = rng.integers(0, 4, size=6000).astype(np.uint8)
    gB = gA.copy()
    snp = np.arange(50, 5950, 97)    # ~1% divergence
    gB[snp] = (gB[snp] + 1 + rng.integers(0, 3, size=len(snp))) % 4
    reads = _tiling_reads(rng, gA, 1200, 200) + \
        _tiling_reads(rng, gB, 1200, 200)
    contigs = assemble_long_reads(ReadSet.from_seqs(reads), CFG,
                                  query_block=16)
    assert contigs.n >= 2
    # every long contig must match ONE strain exactly (no inter-strain mosaic)
    n_a = n_b = 0
    for i in range(contigs.n):
        if contigs.lengths[i] < 2000:
            continue
        in_a = _aligned_identity(contigs.get(i), gA)
        in_b = _aligned_identity(contigs.get(i), gB)
        assert in_a or in_b, f"contig {i} matches neither strain"
        n_a += in_a and not in_b
        n_b += in_b and not in_a
    assert n_a >= 1 and n_b >= 1, f"strains not separated: {n_a=} {n_b=}"


def test_pickup_recovers_disjoint_component(rng):
    """A second, unconnected genome region must be assembled via pick_up or
    the main round (it has no overlap with the first component's contigs)."""
    g1 = rng.integers(0, 4, size=5000).astype(np.uint8)
    g2 = rng.integers(0, 4, size=4000).astype(np.uint8)
    reads = _tiling_reads(rng, g1, 1200, 300) + \
        _tiling_reads(rng, g2, 1200, 300)
    contigs = assemble_long_reads(ReadSet.from_seqs(reads), CFG,
                                  query_block=16)
    got1 = any(_aligned_identity(contigs.get(i), g1) and
               contigs.lengths[i] > 4000 for i in range(contigs.n))
    got2 = any(_aligned_identity(contigs.get(i), g2) and
               contigs.lengths[i] > 3000 for i in range(contigs.n))
    assert got1 and got2


def test_sr_polish_round(rng):
    g = rng.integers(0, 4, size=6000).astype(np.uint8)
    # long reads with a few substitution errors each
    lr = []
    for s in range(0, 4801, 300):
        r = g[s:s + 1200].copy()
        pos = rng.integers(0, 1200, size=4)
        r[pos] = (r[pos] + 1) % 4
        lr.append(r)
    sr = [g[s:s + 250] for s in range(0, 5751, 50)]
    contigs = assemble_long_reads(ReadSet.from_seqs(lr), CFG,
                                  sr=ReadSet.from_seqs(sr), query_block=16)
    assert contigs.n >= 1
    big = int(np.argmax(contigs.lengths))
    # after SR polish the big contig should be error-free
    assert _aligned_identity(contigs.get(big), g), "SR polish left errors"
