"""Banded LCS-style indel-gap verification (overlap/extend.py)."""

import numpy as np
import jax.numpy as jnp

from hylight_tpu.overlap.extend import _banded_gap_matches


def _pad(codes, G, sent=4):
    out = np.full(G, sent, np.uint8)
    out[:len(codes)] = codes
    return out


def _lcs(a, b):
    m = np.zeros((len(a) + 1, len(b) + 1), np.int32)
    for i in range(1, len(a) + 1):
        for j in range(1, len(b) + 1):
            m[i, j] = max(m[i - 1, j], m[i, j - 1],
                          m[i - 1, j - 1] + (a[i - 1] == b[j - 1]))
    return int(m[len(a), len(b)])


def test_banded_matches_known():
    G = 16
    a = np.array([0, 1, 2, 3, 0, 1, 2, 3], np.uint8)   # ACGTACGT
    b = np.array([0, 1, 2, 0, 1, 2, 3], np.uint8)      # ACGACGT (del T)
    got = _banded_gap_matches(jnp.asarray(_pad(a, G)[None]),
                              jnp.asarray(_pad(b, G)[None]), 4)
    assert int(got[0]) == 7


def test_banded_matches_empty_and_exact():
    G = 8
    a = np.array([0, 1, 2, 3], np.uint8)
    got = _banded_gap_matches(jnp.asarray(_pad(a, G)[None]),
                              jnp.asarray(_pad(a, G)[None]), 4)
    assert int(got[0]) == 4
    z = np.zeros(0, np.uint8)
    got = _banded_gap_matches(jnp.asarray(_pad(z, G)[None]),
                              jnp.asarray(_pad(a, G)[None]), 4)
    assert int(got[0]) == 0


def test_banded_matches_fuzz_vs_lcs():
    rng = np.random.default_rng(7)
    G, band = 24, 6
    qs, ts, want = [], [], []
    for _ in range(64):
        la = int(rng.integers(0, G + 1))
        shift = int(rng.integers(-band, band + 1))
        lb = int(np.clip(la + shift, 0, G))
        a = rng.integers(0, 4, la).astype(np.uint8)
        # b: a with the shift applied plus some substitutions, so the
        # optimal path stays inside the band
        if lb <= la:
            b = a[:lb].copy()
        else:
            b = np.concatenate([a, rng.integers(0, 4, lb - la)]) \
                .astype(np.uint8)
        nsub = int(rng.integers(0, 3))
        if lb and nsub:
            pos = rng.integers(0, lb, nsub)
            b[pos] = (b[pos] + 1 + rng.integers(0, 3, nsub)) % 4
        qs.append(_pad(a, G))
        ts.append(_pad(b, G))
        want.append(_lcs(a, b))
    got = _banded_gap_matches(jnp.asarray(np.stack(qs)),
                              jnp.asarray(np.stack(ts)), band)
    got = np.asarray(got)
    # banded result is <= true LCS and == when the path fits the band
    assert (got <= np.array(want)).all()
    assert (got == np.array(want)).mean() > 0.9, \
        f"banded missed too many: {got} vs {want}"


def test_banded_respects_n_bases():
    G = 8
    a = np.array([0, 1, 4, 3], np.uint8)   # N in query gap
    b = np.array([0, 1, 4, 3], np.uint8)
    got = _banded_gap_matches(jnp.asarray(_pad(a, G)[None]),
                              jnp.asarray(_pad(b, G)[None]), 4)
    assert int(got[0]) == 3                 # N never matches


def test_engine_indel_identity():
    """End-to-end: a small indel between otherwise identical reads keeps
    identity ~1; substitutions packed into the indel gap lower it."""
    rng = np.random.default_rng(5)   # self-seeded: assertions are data-tuned
    from hylight_tpu.config import OverlapConfig
    from hylight_tpu.io.readset import ReadSet
    from hylight_tpu.overlap.engine import find_overlaps

    cfg = OverlapConfig(k=11, w=5, min_ovlp_len=150, min_identity=0.0,
                        min_anchors=4, min_chain_score=60, max_occ=16,
                        anchors_per_pair=128, gap_tile=32, max_indel_band=8)
    g = rng.integers(0, 4, size=1000).astype(np.uint8)
    del3 = np.concatenate([g[:500], g[503:]])            # 3-base deletion
    rs = ReadSet.from_seqs([g, del3])
    t = find_overlaps(rs, cfg=cfg)
    pairs = {(int(q), int(d)): i for i, (q, d) in enumerate(zip(t.qid, t.tid))}
    assert (0, 1) in pairs
    i = pairs[(0, 1)]
    assert t.identity[i] > 0.98
    assert t.columns[i] >= 990

    # same indel + a burst of substitutions right before it: the banded
    # verify must count those columns as mismatches
    noisy = del3.copy()
    noisy[488:497] = (noisy[488:497] + 1) % 4
    rs2 = ReadSet.from_seqs([g, noisy])
    t2 = find_overlaps(rs2, cfg=cfg)
    pairs2 = {(int(q), int(d)): i
              for i, (q, d) in enumerate(zip(t2.qid, t2.tid))}
    assert (0, 1) in pairs2
    j = pairs2[(0, 1)]
    assert t2.identity[j] < t.identity[i]
    assert t2.identity[j] < 0.995
