"""Exact per-base phred Bayesian scoring vs a pure-python transcription of
EdgeCalculator.cpp:26-139 (the reference math) on hand-built pileups."""

import math

import numpy as np

from hylight_tpu.io.readset import ReadSet
from hylight_tpu.ops.phred_score import phred_edge_scores
from hylight_tpu.overlap.table import OverlapTable


def _ref_overlap_score(seq1, seq2, q1, q2, pos):
    """Direct transcription of EdgeCalculator::overlap_score/score."""
    L = min(len(seq1) - pos, len(seq2))
    total = 0.0
    total_len = 0
    mism = 0
    for i in range(L):
        a, b = seq1[pos + i], seq2[i]
        if a >= 4 or b >= 4:
            continue
        p1 = 10.0 ** (-int(q1[pos + i]) / 10.0)
        p2 = 10.0 ** (-int(q2[i]) / 10.0)
        if a == b:
            p = (1 - p1) * (1 - p2) + p1 * p2 / 3.0
        else:
            p = p1 * (1 - p2) / 3.0 + p2 * (1 - p1) / 3.0 + (2 / 9.0) * p1 * p2
            mism += 1
        total += math.log(p)
        total_len += 1
    if total_len == 0:
        return 0.0, 1.0
    return math.exp(total / total_len), mism / total_len


def _mk_table(qid, tid, strand, qs, ts, ovlen, lens):
    n = len(qid)
    qid = np.asarray(qid, np.int64)
    tid = np.asarray(tid, np.int64)
    qlen = lens[qid]
    tlen = lens[tid]
    qs = np.asarray(qs, np.int64)
    ts_adj = np.asarray(ts, np.int64)
    strand = np.asarray(strand, np.int64)
    ovlen = np.asarray(ovlen, np.int64)
    # table stores FORWARD-frame ts/te; convert from adjusted
    te_adj = ts_adj + ovlen
    ts_fwd = np.where(strand == 1, tlen - te_adj, ts_adj)
    te_fwd = np.where(strand == 1, tlen - ts_adj, te_adj)
    ones = np.ones(n)
    z = np.zeros(n, np.int64)
    return OverlapTable(qid=qid, tid=tid, strand=strand,
                        qs=qs, qe=qs + ovlen, ts=ts_fwd, te=te_fwd,
                        qlen=qlen, tlen=tlen, matches=ovlen, columns=ovlen,
                        identity=ones, score=ones, score2=ones, score3=ones)


def test_matches_reference_math_hand_pileup():
    rng = np.random.default_rng(101)
    """Mismatches, N bases, and mixed phreds: score parity to 1e-6
    (EdgeCalculator.cpp:26-139)."""
    g = rng.integers(0, 4, size=200).astype(np.uint8)
    r1 = g[:150].copy()
    r2 = g[60:200].copy()
    # mismatches + an N at known offsets of the overlap (r1[60+i] vs r2[i])
    r2[10] = (r2[10] + 1) % 4
    r2[40] = (r2[40] + 2) % 4
    r1[60 + 55] = 4                      # N in read 1
    q1 = rng.integers(10, 41, size=150).astype(np.uint8)
    q2 = rng.integers(10, 41, size=140).astype(np.uint8)
    rs = ReadSet.from_seqs([r1, r2], quals=[q1, q2], names=["a", "b"])

    table = _mk_table([0], [1], [0], [60], [0], [90],
                      rs.lengths.astype(np.int64))
    score, rate = phred_edge_scores(table, rs)
    exp_score, exp_rate = _ref_overlap_score(r1, r2, q1, q2, 60)
    np.testing.assert_allclose(score[0], exp_score, atol=1e-6)
    np.testing.assert_allclose(rate[0], exp_rate, atol=1e-9)


def test_matches_reference_math_revcomp():
    rng = np.random.default_rng(102)
    """'-' strand overlap: the op must walk revcomp(target) columns with the
    target's reversed quals."""
    from hylight_tpu.io.readset import revcomp_codes
    g = rng.integers(0, 4, size=180).astype(np.uint8)
    r1 = g[:150].copy()
    r2f = g[50:180].copy()
    r2f[20] = (r2f[20] + 1) % 4          # one mismatch
    r2 = revcomp_codes(r2f)
    q2f = rng.integers(5, 41, size=130).astype(np.uint8)
    q1 = rng.integers(5, 41, size=150).astype(np.uint8)
    rs = ReadSet.from_seqs([r1, r2], quals=[q1, q2f[::-1].copy()],
                           names=["a", "b"])
    table = _mk_table([0], [1], [1], [50], [0], [100],
                      rs.lengths.astype(np.int64))
    score, rate = phred_edge_scores(table, rs)
    exp_score, exp_rate = _ref_overlap_score(r1, r2f, q1, q2f, 50)
    np.testing.assert_allclose(score[0], exp_score, atol=1e-6)
    np.testing.assert_allclose(rate[0], exp_rate, atol=1e-9)


def test_perfect_high_qual_overlap_near_one():
    rng = np.random.default_rng(103)
    g = rng.integers(0, 4, size=120).astype(np.uint8)
    rs = ReadSet.from_seqs([g, g[30:].copy()],
                           quals=[np.full(120, 40, np.uint8),
                                  np.full(90, 40, np.uint8)],
                           names=["a", "b"])
    table = _mk_table([0], [1], [0], [30], [0], [90],
                      rs.lengths.astype(np.int64))
    score, rate = phred_edge_scores(table, rs)
    assert rate[0] == 0.0
    assert score[0] > 0.999
