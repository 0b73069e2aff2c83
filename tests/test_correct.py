import numpy as np

from hylight_tpu.io.readset import ReadSet
from hylight_tpu.correct.kmer_correct import build_spectrum, correct_reads
from hylight_tpu.assembly.stageb import extend_contigs
from hylight_tpu.config import Config, OverlapConfig, StageBConfig


def test_spectrum_counts(rng):
    g = rng.integers(0, 4, size=500).astype(np.uint8)
    reads = [g[s:s + 100] for s in range(0, 401, 20)]
    rs = ReadSet.from_seqs(reads)
    solid, counts = build_spectrum(rs, k=15, min_count=3)
    assert len(solid) > 0
    assert (np.diff(solid.astype(np.int64)) > 0).all()  # sorted unique


def test_sr_correction_fixes_errors(rng):
    g = rng.integers(0, 4, size=1000).astype(np.uint8)
    clean = [g[s:s + 150] for s in range(0, 851, 10)]   # 15x coverage
    noisy = []
    err_total = 0
    for i, r in enumerate(clean):
        r = r.copy()
        if i % 3 == 0:                      # 1 error in 1/3 of reads
            p = int(rng.integers(20, 130))
            r[p] = (r[p] + 1) % 4
            err_total += 1
        noisy.append(r)
    rs = ReadSet.from_seqs(noisy)
    fixed = correct_reads(rs, k=15, min_count=3, rounds=1)
    remaining = sum((fixed.get(i) != clean[i]).sum()
                    for i in range(len(clean)))
    assert remaining <= err_total * 0.1, \
        f"{remaining} of {err_total} errors left"


def test_sr_correction_k25():
    rng = np.random.default_rng(104)
    """k > 16 path: two-lane uint64 codes + hashed membership (the
    reference's bfc uses k~25; config default sr_k=25 is honored now)."""
    g = rng.integers(0, 4, size=2000).astype(np.uint8)
    clean = [g[s:s + 150] for s in range(0, 1851, 10)]
    noisy = []
    err_total = 0
    for i, r in enumerate(clean):
        r = r.copy()
        if i % 3 == 0:
            p = int(rng.integers(30, 120))
            r[p] = (r[p] + 1) % 4
            err_total += 1
        noisy.append(r)
    rs = ReadSet.from_seqs(noisy)
    fixed = correct_reads(rs, k=25, min_count=3, rounds=1)
    remaining = sum((fixed.get(i) != clean[i]).sum()
                    for i in range(len(clean)))
    assert remaining <= err_total * 0.1, \
        f"{remaining} of {err_total} errors left"


def test_spectrum_k25_exact():
    rng = np.random.default_rng(105)
    """uint64 spectrum codes are exact: a read set with a known k-mer
    multiset yields exactly the expected solid count."""
    g = rng.integers(0, 4, size=400).astype(np.uint8)
    rs = ReadSet.from_seqs([g, g.copy(), g.copy()])
    solid, counts = build_spectrum(rs, k=25, min_count=3)
    # every canonical 25-mer of g occurs exactly 3x (unless duplicated in g)
    assert len(solid) > 300
    assert (counts >= 3).all()
    assert (np.diff(solid.astype(np.int64)) > 0).all()


def test_lr_correction_from_sr_spectrum(rng):
    g = rng.integers(0, 4, size=2000).astype(np.uint8)
    sr = ReadSet.from_seqs([g[s:s + 150] for s in range(0, 1851, 10)])
    lr_clean = g[100:1700]
    lr = lr_clean.copy()
    err_pos = np.arange(50, 1550, 90)
    for p in err_pos:
        lr[p] = (lr[p] + 1) % 4
    lrs = ReadSet.from_seqs([lr])
    fixed = correct_reads(lrs, spectrum_reads=sr, k=15, min_count=3, rounds=3)
    n_left = int((fixed.get(0) != lr_clean).sum())
    assert n_left <= 2, f"{n_left} of {len(err_pos)} errors left"


def test_stage_b_extends_contigs(rng):
    g = rng.integers(0, 4, size=3000).astype(np.uint8)
    # overlapping error-free contigs
    contigs = ReadSet.from_seqs(
        [g[0:1200], g[800:2100], g[1700:3000], g[2900:2980]],  # last: short
        names=["a", "b", "c", "tiny"])
    cfg = Config().replace(
        overlap_sr=OverlapConfig(k=13, w=5, min_ovlp_len=60, min_identity=0.95,
                                 min_anchors=2, min_chain_score=30, max_occ=64,
                                 max_gap=500, anchors_per_pair=128,
                                 gap_tile=16),
        stage_b=StageBConfig(min_overlap_len=300, min_contig_len=150))
    out = extend_contigs(contigs, cfg)
    assert out.n == 1, f"expected full merge, got {out.n}"
    assert int(out.lengths[0]) == 3000
    from hylight_tpu.io.readset import decode_seq, revcomp_codes
    s = decode_seq(out.get(0))
    assert s == decode_seq(g) or decode_seq(revcomp_codes(out.get(0))) == \
        decode_seq(g)


def _edit_distance_identity(a: np.ndarray, b: np.ndarray) -> float:
    """1 - editdist/max(len) via a simple banded DP (band 64)."""
    la, lb = len(a), len(b)
    band = 64
    INF = 1 << 20
    prev = {0: 0}
    for j in range(1, min(lb, band) + 1):
        prev[j] = j
    for i in range(1, la + 1):
        cur = {}
        lo = max(0, i - band)
        hi = min(lb, i + band)
        for j in range(lo, hi + 1):
            best = INF
            if j == 0:
                best = i
            else:
                c = 0 if a[i - 1] == b[j - 1] else 1
                best = min(best, prev.get(j - 1, INF) + c)
                best = min(best, cur.get(j - 1, INF) + 1)
            best = min(best, prev.get(j, INF) + 1)
            cur[j] = best
        prev = cur
    d = prev.get(lb, INF)
    return 1.0 - d / max(la, lb)


def test_lr_indel_correction():
    """fmlrc2 capability: raw long reads with ins+del+sub errors are
    repaired by the spectrum sweeps with indels=True (HyLight.py:106-110).
    """
    rng = np.random.default_rng(42)
    g = rng.integers(0, 4, size=4000).astype(np.uint8)
    sr = ReadSet.from_seqs([g[s:s + 150] for s in range(0, 3851, 5)])

    lr_clean = g[100:3900]
    # inject sub/del/ins errors at spaced positions
    lr = list(lr_clean)
    pos = np.arange(60, 3700, 120)
    rng.shuffle(pos)
    for i, p in enumerate(sorted(pos, reverse=True)):
        kind = i % 3
        if kind == 0:
            lr[p] = (lr[p] + 1) % 4
        elif kind == 1:
            del lr[p]
        else:
            lr.insert(p, int(rng.integers(0, 4)))
    lr = np.asarray(lr, np.uint8)
    id_before = _edit_distance_identity(lr, lr_clean)
    assert id_before < 0.995

    lrs = ReadSet.from_seqs([lr])
    fixed = correct_reads(lrs, spectrum_reads=sr, k=21, min_count=3,
                          rounds=4, indels=True)
    id_after = _edit_distance_identity(fixed.get(0), lr_clean)
    assert id_after > 0.999, (id_before, id_after)


def test_indel_correction_preserves_quals():
    rng = np.random.default_rng(43)
    g = rng.integers(0, 4, size=1500).astype(np.uint8)
    sr = ReadSet.from_seqs([g[s:s + 150] for s in range(0, 1351, 5)])
    lr = np.delete(g[100:1400].copy(), [200, 600])   # two deletions
    lr = np.insert(lr, 900, 2)                       # one insertion
    q = np.full(len(lr), 20, np.uint8)
    lrs = ReadSet.from_seqs([lr], quals=[q])
    fixed = correct_reads(lrs, spectrum_reads=sr, k=21, min_count=3,
                          rounds=3, indels=True)
    assert fixed.qual is not None
    assert len(fixed.get_qual(0)) == len(fixed.get(0))


def test_quality_aware_spectrum_counting(rng):
    """bfc -q behavior (HyLight.py:87): only k-mer occurrences whose bases
    all have phred >= qual_thresh count toward solidity. A disagreeing
    base supported at min_count by HIGH-quality reads survives correction
    (its k-mers are solid); the same base carried only with LOW quality is
    corrected away (its k-mers never accumulate support)."""
    from hylight_tpu.correct.kmer_correct import correct_reads

    k = 21
    g = rng.integers(0, 4, size=600).astype(np.uint8)
    vpos = 300
    gB = g.copy()
    gB[vpos] = (gB[vpos] + 1) % 4

    def reads_with_qual(variant_qual):
        seqs, quals = [], []
        # deep high-quality strain-A coverage
        for s in range(0, 451, 10):
            seqs.append(g[s:s + 150].copy())
            quals.append(np.full(150, 40, np.uint8))
        # exactly min_count=3 variant reads spanning vpos
        for s in (220, 240, 260):
            r = gB[s:s + 150].copy()
            q = np.full(150, 40, np.uint8)
            q[vpos - s] = variant_qual
            seqs.append(r)
            quals.append(q)
        return ReadSet.from_seqs(seqs, quals=quals)

    # high-quality variant: k-mers counted -> solid -> base survives
    rs_hi = reads_with_qual(40)
    out_hi = correct_reads(rs_hi, k=k, min_count=3, qual_thresh=20)
    n_a = rs_hi.n - 3
    for i in range(n_a, rs_hi.n):
        s = (220, 240, 260)[i - n_a]
        assert out_hi.get(i)[vpos - s] == gB[vpos], "high-q variant corrected"

    # low-quality variant: k-mers not counted -> weak -> corrected to A
    rs_lo = reads_with_qual(5)
    out_lo = correct_reads(rs_lo, k=k, min_count=3, qual_thresh=20)
    for i in range(n_a, rs_lo.n):
        s = (220, 240, 260)[i - n_a]
        assert out_lo.get(i)[vpos - s] == g[vpos], "low-q variant survived"
