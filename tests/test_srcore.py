import numpy as np

from hylight_tpu.config import Config, OverlapConfig, SRCoreConfig
from hylight_tpu.io.readset import ReadSet, decode_seq, revcomp_codes
from hylight_tpu.assembly.evidence import EvidenceThresholds, evidence_table
from hylight_tpu.assembly import srcore

CFG = Config().replace(
    overlap_sr=OverlapConfig(k=13, w=5, min_ovlp_len=60, min_identity=0.9,
                             min_anchors=2, min_chain_score=30, max_occ=64,
                             max_gap=500, anchors_per_pair=64, gap_tile=16,
                             max_overlaps_per_read=60),
    sr_core=SRCoreConfig(min_overlap_len=60, min_overlap_len_ec=60,
                         edge_threshold_ec=0.93, edge_threshold=0.999,
                         min_clique_size=2, hap_cov=8.0,
                         average_read_len=150.0, max_iterations=10),
)


def _reads_from(genome, rlen, step, rng=None, err=0.0):
    out = []
    for s in range(0, len(genome) - rlen + 1, step):
        r = genome[s:s + rlen].copy()
        if err and rng is not None:
            pos = np.nonzero(rng.random(rlen) < err)[0]
            r[pos] = (r[pos] + 1) % 4
        out.append(r)
    return out


def test_evidence_table_monotone():
    tab = evidence_table(readlen=150, intseg=150, stddev=27, hcov=10)
    assert tab[1][0] >= tab[50][0] >= 0
    dists = sorted(tab)
    assert dists[0] == 1
    # min_ev is nondecreasing in exp_ev
    evs = sorted({v[0]: v[1] for v in tab.values()}.items())
    for (e1, m1), (e2, m2) in zip(evs, evs[1:]):
        assert m2 >= m1


def test_sr_assemble_single_strain(rng):
    g = rng.integers(0, 4, size=1200).astype(np.uint8)
    reads = _reads_from(g, 150, 20)        # ~7.5x coverage
    rs = ReadSet.from_seqs(reads)
    contigs = srcore.sr_assemble(rs, CFG, use_branch_reduction=False)
    assert contigs.n >= 1
    longest = max(int(l) for l in contigs.lengths)
    assert longest > 600, f"no elongation: longest={longest}"
    # longest contig must be an exact substring of the genome
    big = int(np.argmax(contigs.lengths))
    s = decode_seq(contigs.get(big))
    gstr = decode_seq(g)
    rc = decode_seq(revcomp_codes(contigs.get(big)))
    assert s in gstr or rc in gstr


def test_sr_assemble_corrects_errors():
    # own rng: the session fixture's state depends on which tests ran
    # before, and this assertion is sensitive to the error placement
    rng = np.random.default_rng(0)
    g = rng.integers(0, 4, size=800).astype(np.uint8)
    reads = _reads_from(g, 150, 10, rng=rng, err=0.005)  # 15x cov, 0.5% err
    rs = ReadSet.from_seqs(reads)
    contigs = srcore.sr_assemble(rs, CFG, use_branch_reduction=False)
    assert contigs.n >= 1
    big = int(np.argmax(contigs.lengths))
    s = decode_seq(contigs.get(big))
    gstr = decode_seq(g)
    rc = decode_seq(revcomp_codes(contigs.get(big)))
    assert len(s) > 400
    assert s in gstr or rc in gstr, "errors not corrected by consensus"


def test_sr_assemble_two_strains(rng):
    gA = rng.integers(0, 4, size=900).astype(np.uint8)
    gB = gA.copy()
    # SNP spacing < min_overlap_len so EVERY cross-strain overlap >= 60bp
    # contains a SNP column (tests score-based strain separation; sparser
    # SNPs additionally need the branch-reduction stage)
    snp = np.arange(40, 880, 45)
    gB[snp] = (gB[snp] + 1) % 4
    reads = _reads_from(gA, 150, 15) + _reads_from(gB, 150, 15)
    rs = ReadSet.from_seqs(reads)
    contigs = srcore.sr_assemble(rs, CFG, use_branch_reduction=False)
    sa = decode_seq(gA)
    sb = decode_seq(gB)
    hits_a = hits_b = 0
    for i in range(contigs.n):
        if int(contigs.lengths[i]) < 400:
            continue
        s = decode_seq(contigs.get(i))
        rc = decode_seq(revcomp_codes(contigs.get(i)))
        in_a = s in sa or rc in sa
        in_b = s in sb or rc in sb
        assert in_a or in_b, f"mosaic contig {i}"
        hits_a += in_a and not in_b
        hits_b += in_b and not in_a
    assert hits_a >= 1 and hits_b >= 1


def test_sr_assemble_fno_mode_two_strains(rng):
    """reoverlap=False (reference-exact sourcing: overlaps computed once,
    later iterations live off FNO1 projection + nonedge carry, polyte's
    overlaps.txt contract) still elongates and keeps strains separate."""
    gA = rng.integers(0, 4, size=900).astype(np.uint8)
    gB = gA.copy()
    snp = np.arange(40, 880, 45)
    gB[snp] = (gB[snp] + 1) % 4
    reads = _reads_from(gA, 150, 15) + _reads_from(gB, 150, 15)
    rs = ReadSet.from_seqs(reads)
    import dataclasses
    cfg = CFG.replace(sr_core=dataclasses.replace(CFG.sr_core,
                                                  reoverlap=False))
    contigs = srcore.sr_assemble(rs, cfg, use_branch_reduction=False)
    sa, sb = decode_seq(gA), decode_seq(gB)
    longest = 0
    for i in range(contigs.n):
        if int(contigs.lengths[i]) < 400:
            continue
        s = decode_seq(contigs.get(i))
        rc = decode_seq(revcomp_codes(contigs.get(i)))
        assert s in sa or rc in sa or s in sb or rc in sb, \
            f"mosaic contig {i}"
        longest = max(longest, int(contigs.lengths[i]))
    assert longest > 600, f"no elongation in FNO mode: longest={longest}"


def test_sr_assemble_iteration_stats(rng):
    """Per-iteration observability rows (ViralQuasispecies.cpp:471-489
    contract): every clique/merge iteration records vertices, overlaps,
    admitted/kept edges and superread counts; cli.py writes them to
    stats.txt as sr_iter lines."""
    g = rng.integers(0, 4, size=1200).astype(np.uint8)
    rs = ReadSet.from_seqs(_reads_from(g, 150, 20))
    rows = []
    srcore.sr_assemble(rs, CFG, use_branch_reduction=False, stats=rows)
    assert len(rows) >= 2
    kinds = {r["kind"] for r in rows}
    assert "clique" in kinds and "merge" in kinds
    for r in rows:
        assert r["vertices"] > 0 and r["superreads"] > 0
        assert r["edges_kept"] <= r["edges_admitted"] <= r["overlaps"]
    # iteration 1 is the EC clique pass over the raw reads
    assert rows[0]["kind"] == "clique" and rows[0]["vertices"] == rs.n


def test_graph_dumps_artifacts(rng, tmp_path):
    """Opt-in VQ debug dumps (OverlapGraph.cpp:388-465): digraph.txt with
    one u\\tv line per kept directed edge, graph.fastg with >id:adj; +
    sequence entries."""
    g = rng.integers(0, 4, size=900).astype(np.uint8)
    rs = ReadSet.from_seqs(_reads_from(g, 150, 25))
    import dataclasses
    cfg = CFG.replace(sr_core=dataclasses.replace(
        CFG.sr_core, graph_dumps=str(tmp_path)))
    srcore.sr_assemble(rs, cfg, use_branch_reduction=False)
    dg = (tmp_path / "digraph_it0.txt").read_text()
    assert dg and all(len(l.split("\t")) == 2 for l in dg.splitlines())
    fg = (tmp_path / "graph_it0.fastg").read_text().splitlines()
    assert fg[0] == "#FASTG:begin;" and fg[-1] == "#FASTG:end;"
    assert any(l.startswith(">") and l.endswith(";") for l in fg)
    seq_lines = [l for l in fg if l and not l.startswith(("#", ">"))]
    assert all(set(l) <= set("ACGTN") for l in seq_lines)
