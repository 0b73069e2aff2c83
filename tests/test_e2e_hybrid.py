"""End-to-end hybrid assembly exercising the FULL stage graph: long reads
cover only the left part of the genome, paired-end short reads cover the
right part in two strains — so leftover SR must cluster, the PE SR core
must assemble them per strain, and stage-b must produce master contigs.
(The reference's bundled example/ golden set is absent; this synthetic
set is the conformance stand-in, SURVEY.md §4.)"""

import numpy as np
import pytest

from hylight_tpu.config import (Config, ClusterConfig, CorrectConfig,
                                LayoutConfig, OverlapConfig, SRCoreConfig)
from hylight_tpu.io.readset import ReadSet, decode_seq, revcomp_codes
from hylight_tpu.assembly.pipeline import hybrid_assemble


def _pe_reads(genome, frag_len, read_len, step, prefix):
    seqs, names = [], []
    for fid, s in enumerate(range(0, len(genome) - frag_len + 1, step)):
        frag = genome[s:s + frag_len]
        seqs.append(frag[:read_len].copy())
        names.append(f"{prefix}{fid}/1")
        seqs.append(revcomp_codes(frag[-read_len:]).copy())
        names.append(f"{prefix}{fid}/2")
    return seqs, names


@pytest.fixture(scope="module")
def outputs():
    rng = np.random.default_rng(11)
    G = 20000
    genome = rng.integers(0, 4, size=G).astype(np.uint8)
    # strain B differs in the SR-only region by regular SNPs
    genomeB = genome.copy()
    snp = np.arange(12500, 19800, 150)
    genomeB[snp] = (genomeB[snp] + 1) % 4

    # long reads: cover [0, 12000) only (strain A side, shared sequence)
    lr = [genome[s:s + 2000].copy() for s in range(0, 10001, 500)]
    lr_rs = ReadSet.from_seqs(lr, names=[f"lr{i}" for i in range(len(lr))])

    # PE short reads: cover [11500, 20000) in both strains
    seqs, names = [], []
    for g, p in [(genome[11500:], "a"), (genomeB[11500:], "b")]:
        s_, n_ = _pe_reads(g, frag_len=450, read_len=150, step=60, prefix=p)
        seqs += s_
        names += n_
    sr_rs = ReadSet.from_seqs(seqs, names=names)

    cfg = Config().replace(
        overlap=OverlapConfig(k=13, w=5, min_ovlp_len=500, min_identity=0.9,
                              min_anchors=3, min_chain_score=60, max_occ=32,
                              anchors_per_pair=256, gap_tile=32),
        overlap_sr=OverlapConfig(k=13, w=5, min_ovlp_len=60,
                                 min_identity=0.9, min_anchors=2,
                                 min_chain_score=30, max_occ=64, max_gap=500,
                                 anchors_per_pair=64, gap_tile=16,
                                 max_overlaps_per_read=60),
        layout=LayoutConfig(max_tip_len=2000, min_match=40, min_span=500),
        cluster=ClusterConfig(max_cluster_size=15000, min_cluster_size=20),
        sr_core=SRCoreConfig(min_overlap_len=60, min_overlap_len_ec=60,
                             edge_threshold_ec=0.93, edge_threshold=0.999,
                             min_clique_size=2, hap_cov=8.0,
                             insert_size=450.0, average_read_len=150.0,
                             max_iterations=8),
        correct=CorrectConfig(skip=True),
    )
    out = hybrid_assemble(lr_rs, sr_rs, cfg, corrected=True)
    return out, genome, genomeB


def _best_identity(contig, refs):
    """Max identity of the contig (either orientation) against any ref, by
    exact 40-mer anchor + direct compare."""
    best = 0.0
    for c in (contig, revcomp_codes(contig)):
        cs = decode_seq(c)
        for ref in refs:
            gs = decode_seq(ref)
            pos = gs.find(cs[:40])
            if pos < 0:
                continue
            ref_w = gs[pos:pos + len(cs)]
            if len(ref_w) < len(cs) * 0.9:
                continue
            ident = sum(a == b for a, b in zip(ref_w, cs)) / len(cs)
            best = max(best, ident)
    return best


def test_long_contigs_cover_lr_region(outputs):
    out, genome, genomeB = outputs
    assert out.long_contigs.n >= 1
    big = int(np.argmax(out.long_contigs.lengths))
    assert int(out.long_contigs.lengths[big]) > 8000
    ident = _best_identity(out.long_contigs.get(big), [genome])
    assert ident > 0.995


def test_sr_clusters_assemble_right_region(outputs):
    out, genome, genomeB = outputs
    # stage-b short contigs must exist, extend well past the fragment
    # length (450), and match a strain near-perfectly. (Contiguity on
    # dense tilings is bounded by duplicate-superread branching — the
    # reference's merge-only iterations share the bound and lean on
    # stage-b + the long-read path for contiguity.)
    assert out.short_stageb.n >= 1, "SR cluster path produced no contigs"
    lens = out.short_stageb.lengths
    big = int(np.argmax(lens))
    assert int(lens[big]) > 1000, f"SR contigs too short: {sorted(lens)}"
    ident = _best_identity(out.short_stageb.get(big),
                           [genome[11000:], genomeB[11000:]])
    assert ident > 0.99


def test_both_strains_recovered(outputs):
    """HyLight's whole point is strain separation: the SR stage must emit at
    least one contig per strain, each matching ITS strain near-perfectly and
    matching the other strain strictly worse (the SNPs every 150 bp force
    ~0.993 cross-strain identity at best). Guards against collapsing the two
    strains into one consensus (reference behavior: BranchReduction.cpp:41,
    prpare_mutation2 filter_overlap_slr2.py:289)."""
    out, genome, genomeB = outputs
    refsA = [genome[11000:]]
    refsB = [genomeB[11000:]]
    got_a = got_b = False
    for i in range(out.short_stageb.n):
        c = out.short_stageb.get(i)
        if len(c) < 600:
            continue
        ia = _best_identity(c, refsA)
        ib = _best_identity(c, refsB)
        if ia > 0.998 and ia > ib:
            got_a = True
        if ib > 0.998 and ib > ia:
            got_b = True
    assert got_a, "no contig assembled for strain A"
    assert got_b, "no contig assembled for strain B (strains collapsed?)"


def test_final_contigs_cover_both_regions(outputs):
    out, genome, genomeB = outputs
    assert out.final_contigs.n >= 1
    total = int(out.final_contigs.lengths.sum())
    assert total > 10000
