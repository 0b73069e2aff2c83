"""End-to-end hybrid pipeline test on a small synthetic two-strain mix."""

import numpy as np

from hylight_tpu.config import (Config, OverlapConfig, LayoutConfig,
                                SnpFilterConfig, SRCoreConfig, StageBConfig,
                                ClusterConfig, CorrectConfig)
from hylight_tpu.io.readset import ReadSet, decode_seq, revcomp_codes
from hylight_tpu.assembly.pipeline import hybrid_assemble, write_outputs

CFG = Config().replace(
    overlap=OverlapConfig(k=13, w=5, min_ovlp_len=300, min_identity=0.9,
                          min_anchors=4, min_chain_score=100, max_occ=64,
                          anchors_per_pair=256, gap_tile=32),
    overlap_sr=OverlapConfig(k=13, w=5, min_ovlp_len=60, min_identity=0.9,
                             min_anchors=2, min_chain_score=30, max_occ=64,
                             max_gap=500, anchors_per_pair=64, gap_tile=16),
    layout=LayoutConfig(min_match=100, bubble_dist=5000, min_span=500),
    snp=SnpFilterConfig(mc=3, mc_short=3),
    sr_core=SRCoreConfig(min_overlap_len=60, min_overlap_len_ec=60,
                         edge_threshold_ec=0.93, edge_threshold=0.999,
                         min_clique_size=2, hap_cov=8.0,
                         average_read_len=120.0, max_iterations=8),
    stage_b=StageBConfig(min_overlap_len=150, min_contig_len=150),
    cluster=ClusterConfig(max_cluster_size=2000, min_cluster_size=6),
    correct=CorrectConfig(skip=False, sr_min_count=3, lr_rounds=1),
)


def test_hybrid_end_to_end(rng, tmp_path):
    glen = 4000
    gA = rng.integers(0, 4, size=glen).astype(np.uint8)
    # long reads cover [0, 3000) only; short reads cover everything ->
    # the tail [3000, 4000) must come from the short-read cluster path
    lr_reads = []
    for s in range(0, 1801, 150):
        r = gA[s:s + 1200].copy()
        pos = rng.integers(0, len(r), size=3)
        r[pos] = (r[pos] + 1) % 4            # a few errors, corrected later
        lr_reads.append(r)
    sr_reads, sr_names = [], []
    for i, s in enumerate(range(0, glen - 120, 15)):
        sr_reads.append(gA[s:s + 120])
        sr_names.append(f"p{i}/1")
    lr = ReadSet.from_seqs(lr_reads)
    sr = ReadSet.from_seqs(sr_reads, names=sr_names)

    out = hybrid_assemble(lr, sr, CFG, query_block=16)
    assert out.long_contigs.n >= 1
    assert out.final_contigs.n >= 1

    gstr = decode_seq(gA)

    def matches(c):
        s = decode_seq(c)
        return s in gstr or decode_seq(revcomp_codes(c)) in gstr

    # long contigs reconstruct the LR-covered region error-free
    big = int(np.argmax(out.long_contigs.lengths))
    assert int(out.long_contigs.lengths[big]) > 2500
    assert matches(out.long_contigs.get(big)), "long contig has errors"

    # total assembly must also cover the SR-only tail
    tail = gstr[3200:3800]
    covered = any(tail in decode_seq(out.final_contigs.get(i))
                  or tail in decode_seq(revcomp_codes(
                      out.final_contigs.get(i)))
                  for i in range(out.final_contigs.n))
    assert covered, "SR-only region not assembled"

    write_outputs(out, str(tmp_path / "out"))
    import os
    for f in ["final_contigs.fa", "long_con_polished.fa",
              "short_stageb.fa", "all_contigs.fa"]:
        assert os.path.exists(tmp_path / "out" / f)
