"""Unit tests for the dense diagonal verifier (overlap/extend_dense.py).

Chains are built BY HAND (anchors, diagonals, strand) over synthetic base
matrices with planted mismatches, so every output — matches, verified
columns, unverified, indels, identity, and the exact mismatch-event
coordinates/bases — is checked against closed-form expectations.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from hylight_tpu.overlap.chain import Chains
from hylight_tpu.overlap.extend import extend_chains as extend_chains_dense

K = 15


def revcomp(codes):
    return (3 - codes[::-1]).astype(np.uint8)


def build_chain(rows, A=32, L=512):
    """rows: list of dicts with qid,tid,strand,qlen,tlen,anchors[(aq,at)]."""
    P = len(rows)
    f = lambda k, d: np.array([r[k] for r in rows], dtype=d)
    aq = np.zeros((P, A), np.int32)
    at = np.zeros((P, A), np.int32)
    am = np.zeros((P, A), bool)
    qs = np.zeros(P, np.int32); qe = np.zeros(P, np.int32)
    ts = np.zeros(P, np.int32); te = np.zeros(P, np.int32)
    na = np.zeros(P, np.int32)
    for i, r in enumerate(rows):
        anc = r["anchors"]
        na[i] = len(anc)
        for j, (q, t) in enumerate(anc):
            aq[i, j], at[i, j], am[i, j] = q, t, True
        if anc:
            qs[i], qe[i] = anc[0][0], anc[-1][0] + K
            ts[i], te[i] = anc[0][1], anc[-1][1] + K
    return Chains(
        qid=jnp.asarray(f("qid", np.int32)), tid=jnp.asarray(f("tid", np.int32)),
        strand=jnp.asarray(f("strand", np.int32)),
        qlen=jnp.asarray(f("qlen", np.int32)), tlen=jnp.asarray(f("tlen", np.int32)),
        qs=jnp.asarray(qs), qe=jnp.asarray(qe), ts=jnp.asarray(ts),
        te=jnp.asarray(te), n_anchors=jnp.asarray(na),
        score=jnp.asarray(np.zeros(P, np.int32)),
        valid=jnp.asarray(np.array([r.get("valid", True) for r in rows])),
        aq=jnp.asarray(aq), at=jnp.asarray(at), amask=jnp.asarray(am))


def events_of(ext, i):
    m = np.asarray(ext.mm_mask[i])
    return sorted(zip(np.asarray(ext.mm_q[i])[m].tolist(),
                      np.asarray(ext.mm_t[i])[m].tolist(),
                      np.asarray(ext.mm_qb[i])[m].tolist(),
                      np.asarray(ext.mm_tb[i])[m].tolist()))


def test_plus_single_segment_exact():
    rng = np.random.default_rng(0)
    L = 512
    base = rng.integers(0, 4, L).astype(np.uint8)
    q = base.copy()
    t = base.copy()
    # overlap q[40..280) == t[40..280) on diagonal 0, with planted SNPs
    snps = [77, 120, 121, 255]
    for c in snps:
        t[c] = (t[c] + 1) % 4
    seqs = jnp.asarray(np.stack([q, t]))
    anchors = [(c, c) for c in range(40, 280 - K, 20)]
    ch = build_chain([dict(qid=0, tid=1, strand=0, qlen=L, tlen=L,
                           anchors=anchors)])
    ext = extend_chains_dense(ch, seqs, k=K, max_mismatch=16)
    span = anchors[-1][0] + K - anchors[0][0]
    n_mm = sum(1 for c in snps if anchors[0][0] <= c < anchors[-1][0] + K)
    assert int(ext.columns[0]) == span
    assert int(ext.matches[0]) == span - n_mm
    assert int(ext.unverified[0]) == 0
    assert int(ext.indels[0]) == 0
    assert int(ext.mm_n[0]) == n_mm
    got = events_of(ext, 0)
    want = sorted((c, c, int((q[c])), int(t[c])) for c in snps
                  if anchors[0][0] <= c < anchors[-1][0] + K)
    assert got == want
    np.testing.assert_allclose(float(ext.identity[0]),
                               (span - n_mm) / span, rtol=1e-6)


def test_minus_strand_exact():
    rng = np.random.default_rng(1)
    L = 512
    q = rng.integers(0, 4, L).astype(np.uint8)
    # target read whose REVCOMP matches q on diag +8: rc(t)[j+8] == q[j]
    rc = np.full(L, 0, np.uint8)
    d = 8
    rc[d:d + 400] = q[0:400]
    snp_q = [33, 200]                      # in q coords
    for c in snp_q:
        rc[c + d] = (rc[c + d] + 2) % 4
    t = revcomp(rc)
    seqs = jnp.asarray(np.stack([q, t]))
    anchors = [(c, c + d) for c in range(20, 380 - K, 17)]
    ch = build_chain([dict(qid=0, tid=1, strand=1, qlen=L, tlen=L,
                           anchors=anchors)])
    ext = extend_chains_dense(ch, seqs, k=K, max_mismatch=16)
    span = anchors[-1][0] + K - anchors[0][0]
    n_mm = sum(1 for c in snp_q if anchors[0][0] <= c < anchors[-1][0] + K)
    assert int(ext.matches[0]) == span - n_mm
    assert int(ext.mm_n[0]) == n_mm
    got = events_of(ext, 0)
    # forward target coords: adjusted col (c+d) -> tlen-1-(c+d); target base
    # reported in the forward frame (complement of the adjusted base)
    want = sorted((c, L - 1 - (c + d), int(q[c]), int(3 - rc[c + d]))
                  for c in snp_q if anchors[0][0] <= c < anchors[-1][0] + K)
    assert got == want


def test_two_segments_indel_accounting():
    rng = np.random.default_rng(2)
    L = 1024
    g = rng.integers(0, 4, L + 64).astype(np.uint8)
    # t = q with a 3-base deletion at q-position 300 (diag shifts 0 -> +3:
    # t[j] == q[j] for j < 300, t[j+3-...]: q[j] == t[j-3] for j >= 303)
    q = g[:L].copy()
    t = np.concatenate([g[:300], g[303:L + 3]]).copy()
    seqs = jnp.asarray(np.stack([q, t]))
    # segment 1: diag 0, anchors 40..260; segment 2: diag -3 (at = aq-3)
    anc1 = [(c, c) for c in range(40, 280 - K, 20)]
    anc2 = [(c, c - 3) for c in range(320, 520 - K, 20)]
    ch = build_chain([dict(qid=0, tid=1, strand=0, qlen=L, tlen=L,
                           anchors=anc1 + anc2)])
    ext = extend_chains_dense(ch, seqs, k=K, max_mismatch=16)
    span1 = anc1[-1][0] + K - anc1[0][0]
    span2 = anc2[-1][0] + K - anc2[0][0]
    assert int(ext.indels[0]) == 3
    assert int(ext.columns[0]) == span1 + span2
    assert int(ext.matches[0]) == span1 + span2      # no mismatches planted
    # inter-segment gap: gq = 320-(260+15)=45, gt = 317-(257+15)=45
    assert int(ext.unverified[0]) == min(
        anc2[0][0] - (anc1[-1][0] + K), anc2[0][1] - (anc1[-1][1] + K))
    assert int(ext.mm_n[0]) == 0


def test_segment_overflow_budget():
    rng = np.random.default_rng(3)
    L = 2048
    q = rng.integers(0, 4, L).astype(np.uint8)
    t = q.copy()
    seqs = jnp.asarray(np.stack([q, t]))
    # 6 segments of diag 0,1,2,... (each 2 anchors), K budget = 4
    anchors = []
    for s in range(6):
        base = 100 + s * 200
        anchors += [(base, base + s), (base + 40, base + 40 + s)]
    ch = build_chain([dict(qid=0, tid=1, strand=0, qlen=L, tlen=L,
                           anchors=anchors)], A=32)
    ext = extend_chains_dense(ch, seqs, k=K, max_mismatch=16, segments=4)
    # 4 verified segments of 40+K columns each
    assert int(ext.columns[0]) == 4 * (40 + K)
    assert int(ext.indels[0]) == 5
    # overflow: remaining span beyond segment 4's end is unverified,
    # plus the 3 inter-segment gaps among the used segments
    qe = anchors[-1][0] + K
    seg4_hi = anchors[7][0] + K
    gaps = sum(min(anchors[2 * s][0] - (anchors[2 * s - 1][0] + K),
                   anchors[2 * s][1] - (anchors[2 * s - 1][1] + K))
               for s in range(1, 4))
    assert int(ext.unverified[0]) == gaps + (qe - seg4_hi)


def test_separate_target_bucket_and_toff():
    rng = np.random.default_rng(4)
    q = rng.integers(0, 4, 256).astype(np.uint8)
    tlong = np.concatenate([rng.integers(0, 4, 100).astype(np.uint8),
                            q[20:220], rng.integers(0, 4, 700).astype(np.uint8)])
    tlong[150] = (tlong[150] + 1) % 4      # SNP at q coord 70
    seqs_q = jnp.asarray(q[None, :])
    seqs_t = jnp.asarray(np.stack([tlong]))
    anchors = [(c, c + 80) for c in range(30, 200 - K, 15)]
    ch = build_chain([dict(qid=0, tid=7, strand=0, qlen=256, tlen=1000,
                           anchors=anchors)], L=1000)
    ext = extend_chains_dense(ch, seqs_q, k=K, max_mismatch=16,
                              seqs_t=seqs_t, toff=7)
    span = anchors[-1][0] + K - anchors[0][0]
    assert int(ext.mm_n[0]) == 1
    assert events_of(ext, 0) == [(70, 150, int(q[70]), int(tlong[150]))]
    assert int(ext.matches[0]) == span - 1


def test_event_word_budget_truncation():
    rng = np.random.default_rng(5)
    L = 4096
    q = rng.integers(0, 4, L).astype(np.uint8)
    t = q.copy()
    # one mismatch every 40 bases (each in its own 8-base word) across a
    # ~2900-col overlap -> ~72 event words, far beyond the E=16 budget
    snps = list(range(515, 3400, 40))
    for c in snps:
        t[c] = (t[c] + 1) % 4
    seqs = jnp.asarray(np.stack([q, t]))
    # anchors are exact k-mers: place each 17 bases after a snp (clearance
    # K=15 < 40 - 17 to the next snp)
    anchors = [(s + 17, s + 17) for s in snps if s + 17 + K < 3400]
    ch = build_chain([dict(qid=0, tid=1, strand=0, qlen=L, tlen=L,
                           anchors=anchors)], A=256, L=L)
    ext = extend_chains_dense(ch, seqs, k=K, max_mismatch=64,
                              event_words=16)
    qs_, qe_ = anchors[0][0], anchors[-1][0] + K
    n_all = sum(1 for s in snps if qs_ <= s < qe_)
    assert int(ext.mm_n[0]) == n_all          # counted exactly
    got = events_of(ext, 0)
    assert len(got) == 16                     # one event word each, E=16
    # emitted events are the earliest columns and carry exact coords
    want = sorted((s, s, int(q[s]), int(t[s]))
                  for s in snps if qs_ <= s < qe_)[:16]
    assert got == want


def test_gap_suffix_events():
    """A substitution in the inter-segment gap DOWNSTREAM of the indel is
    emitted as an event on the next segment's diagonal (single-indel
    suffix model; the gap itself stays unverified for identity)."""
    rng = np.random.default_rng(6)
    L = 1024
    g = rng.integers(0, 4, L + 8).astype(np.uint8)
    q = g[:L].copy()
    # t: 2-base deletion at q-pos 300 -> suffix diag -2 (t[j-2] == q[j])
    t = np.concatenate([g[:300], g[302:L + 2]]).copy()
    # substitution at q 330 (inside the gap, after the deletion)
    t[330 - 2] = (t[330 - 2] + 1) % 4
    seqs = jnp.asarray(np.stack([q, t]))
    # anchors end at 270 (k=15 -> segment 1 ends 285), resume at 360
    anc1 = [(c, c) for c in range(40, 271, 23)]
    anc2 = [(c, c - 2) for c in range(360, 560, 23)]
    ch = build_chain([dict(qid=0, tid=1, strand=0, qlen=L, tlen=L,
                           anchors=anc1 + anc2)])
    ext = extend_chains_dense(ch, seqs, k=K, max_mismatch=16)
    got = events_of(ext, 0)
    assert (330, 328, int(q[330]), int(t[328])) in got
    # the deletion's own wrong-diagonal noise is NOT emitted: every event
    # sits on the suffix diagonal past the first prefix-diag difference
    assert all(cq - ct == 2 for cq, ct, _, _ in got)


def test_invalid_rows_zeroed():
    q = np.zeros(128, np.uint8)
    seqs = jnp.asarray(np.stack([q, q]))
    ch = build_chain([dict(qid=0, tid=1, strand=0, qlen=128, tlen=128,
                           anchors=[(10, 10), (40, 40)], valid=False),
                      dict(qid=0, tid=1, strand=0, qlen=128, tlen=128,
                           anchors=[])])
    ext = extend_chains_dense(ch, seqs, k=K, max_mismatch=8)
    assert int(ext.matches[0]) == 0 and float(ext.identity[0]) == 0.0
    assert int(ext.matches[1]) == 0
    assert not bool(np.asarray(ext.mm_mask).any())
