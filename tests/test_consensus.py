import numpy as np

from hylight_tpu.config import OverlapConfig
from hylight_tpu.io.readset import ReadSet
from hylight_tpu.ops.consensus import polish_contigs

CFG = OverlapConfig(k=11, w=5, min_ovlp_len=150, min_identity=0.9,
                    min_anchors=4, min_chain_score=60, max_occ=64,
                    anchors_per_pair=256, gap_tile=32)


def test_polish_fixes_substitutions(rng):
    g = rng.integers(0, 4, size=3000).astype(np.uint8)
    draft = g.copy()
    err_pos = np.arange(100, 2900, 173)
    for p in err_pos:
        draft[p] = (draft[p] + 1) % 4
    reads = [g[s:s + 500] for s in range(0, 2501, 100)]
    polished = polish_contigs(ReadSet.from_seqs([draft], names=["c0"]),
                              ReadSet.from_seqs(reads), cfg=CFG, rounds=1)
    out = polished.get(0)
    assert len(out) == len(g)
    assert (out == g).all(), f"{(out != g).sum()} errors remain of {len(err_pos)}"


def test_polish_keeps_uncovered_regions(rng):
    g = rng.integers(0, 4, size=2000).astype(np.uint8)
    draft = g.copy()
    draft[1900] = (draft[1900] + 1) % 4   # error in uncovered tail
    reads = [g[s:s + 400] for s in range(0, 1201, 100)]  # cover [0,1600) only
    polished = polish_contigs(ReadSet.from_seqs([draft], names=["c0"]),
                              ReadSet.from_seqs(reads), cfg=CFG, rounds=1)
    out = polished.get(0)
    assert out[1900] == draft[1900]       # uncovered: draft preserved
    assert (out[:1500] == g[:1500]).all()


def test_polish_multiple_contigs(rng):
    g1 = rng.integers(0, 4, size=1500).astype(np.uint8)
    g2 = rng.integers(0, 4, size=1200).astype(np.uint8)
    d1, d2 = g1.copy(), g2.copy()
    d1[700] = (d1[700] + 1) % 4
    d2[400] = (d2[400] + 2) % 4
    reads = [g1[s:s + 400] for s in range(0, 1101, 100)] + \
            [g2[s:s + 400] for s in range(0, 801, 100)]
    polished = polish_contigs(ReadSet.from_seqs([d1, d2], names=["a", "b"]),
                              ReadSet.from_seqs(reads), cfg=CFG, rounds=1)
    assert (polished.get(0) == g1).all()
    assert (polished.get(1) == g2).all()
    assert polished.names == ["a", "b"]


def test_polish_fixes_draft_indels():
    """Indel-capable polish (racon capability, HyLight.py:152): a draft
    corrupted with insertions+deletions+subs is restored to >99.9%
    identity by reads carrying their own 2% indel errors (majority vote
    washes them out); converges over iterated rounds."""
    from hylight_tpu.io.readset import ReadSet, decode_seq
    from hylight_tpu.ops.consensus import polish_contigs
    from hylight_tpu.config import OverlapConfig

    rng = np.random.default_rng(42)   # own rng: data must not depend on
    #                                   test order (session rng fixture)
    G = 6000
    genome = rng.integers(0, 4, size=G).astype(np.uint8)

    def corrupt(seq, ins_p, del_p, sub_p):
        out = []
        for b in seq:
            r = rng.random()
            if r < del_p:
                continue
            if r < del_p + sub_p:
                out.append((b + 1 + rng.integers(0, 3)) % 4)
            else:
                out.append(b)
            if rng.random() < ins_p:
                out.append(rng.integers(0, 4))
        return np.array(out, dtype=np.uint8)

    # 25x coverage of 1.2 kb reads with 1% ins + 1% del errors
    reads = []
    for _ in range(125):
        s = int(rng.integers(0, G - 1200))
        reads.append(corrupt(genome[s:s + 1200], 0.01, 0.01, 0.003))
    rs = ReadSet.from_seqs(reads)
    # draft with 0.5% ins + 0.5% del + 0.5% sub
    draft = corrupt(genome, 0.005, 0.005, 0.005)
    drafts = ReadSet.from_seqs([draft], names=["d0"])

    cfg = OverlapConfig(k=13, w=5, min_ovlp_len=200, min_identity=0.8,
                        min_anchors=3, min_chain_score=50, max_occ=32,
                        anchors_per_pair=256, gap_tile=32)
    polished = polish_contigs(drafts, rs, cfg=cfg, rounds=8,
                              query_block=128, min_len=100)
    out = decode_seq(polished.get(0))
    ref = decode_seq(genome)
    # identity by simple LCS-free alignment: count via difflib ratio
    import difflib
    ratio = difflib.SequenceMatcher(a=ref, b=out, autojunk=False).ratio()
    assert ratio > 0.999, f"polished identity {ratio:.5f}"
    # and the draft itself was far worse
    ratio0 = difflib.SequenceMatcher(a=ref, b=decode_seq(draft),
                                     autojunk=False).ratio()
    assert ratio0 < 0.995


def test_polish_strain_aware_snp_gate(rng):
    """Strain-aware polish (HyLight.py:149,200 + filter_overlap_slr2.py:
    99-100): deep wrong-strain short reads must NOT homogenize a strain-A
    draft contig. Unfiltered voting corrupts the SNP columns toward
    strain B; the snp_mc gate preserves strain A exactly."""
    glen = 3000
    gA = rng.integers(0, 4, size=glen).astype(np.uint8)
    gB = gA.copy()
    snp_pos = np.arange(40, glen - 40, 60)         # ~50 SNP columns
    gB[snp_pos] = (gB[snp_pos] + 1) % 4

    draft = gA.copy()
    reads = []
    # 4x strain-A coverage...
    for s in range(0, glen - 250, 60):
        reads.append(gA[s:s + 250].copy())
    # ...outvoted by 12x strain-B coverage
    for s in range(0, glen - 250, 20):
        reads.append(gB[s:s + 250].copy())
    contigs = ReadSet.from_seqs([draft], names=["c0"])
    rset = ReadSet.from_seqs(reads)
    cfg = OverlapConfig(k=11, w=5, min_ovlp_len=70, min_identity=0.9,
                        min_anchors=2, min_chain_score=30, max_gap=500,
                        max_occ=64, anchors_per_pair=128, gap_tile=32)

    corrupted = polish_contigs(contigs, rset, cfg=cfg, rounds=1,
                               query_block=256, min_len=70)
    n_flipped = int((corrupted.get(0)[snp_pos] == gB[snp_pos]).sum())
    assert n_flipped > len(snp_pos) // 2, \
        f"unfiltered polish flipped only {n_flipped} columns (weak setup)"

    kept = polish_contigs(contigs, rset, cfg=cfg, rounds=1,
                          query_block=256, min_len=70,
                          snp_mc=3, snp_long=False)
    assert (kept.get(0) == gA).all(), \
        f"{(kept.get(0) != gA).sum()} columns corrupted despite snp gate"
