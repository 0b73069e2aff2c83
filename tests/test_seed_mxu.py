"""MXU seeding path (overlap/seed_mxu.py): unit + table-equivalence tests.

The mxu path replaces the global-sort self-join for corrected/low-error
read sets; these tests pin (a) the C-matrix counting math, (b) the bitonic
merge network, and (c) end-to-end OverlapTable equivalence against the
sort path on bench-like synthetic data (both strands exercised).
"""

import numpy as np
import pytest
from dataclasses import replace

import jax
import jax.numpy as jnp

from hylight_tpu.config import OverlapConfig
from hylight_tpu.io.readset import ReadSet
from hylight_tpu.overlap.engine import find_overlaps
from hylight_tpu.overlap.seed_mxu import bitonic_merge, shared_count_matrix
from hylight_tpu.ops.minimizers import minimizers


def _synth_reads(rng, n_reads, read_len, cov=8, err=0.005):
    glen = n_reads * read_len // cov
    g = rng.integers(0, 4, glen).astype(np.uint8)
    starts = rng.integers(0, glen - read_len, n_reads)
    reads = []
    for s in starts:
        r = g[s:s + read_len].copy()
        e = rng.random(read_len) < err
        r[e] = (r[e] + rng.integers(1, 4, e.sum())) % 4
        reads.append(r)
    for i in range(0, n_reads, 3):        # exercise '-' strand overlaps
        reads[i] = (3 - reads[i])[::-1].copy()
    return reads


def test_bitonic_merge_matches_numpy():
    rng = np.random.default_rng(0)
    P, L = 7, 64
    ka = np.sort(rng.integers(0, 1000, (P, L)).astype(np.uint32), axis=1)
    kb = np.sort(rng.integers(0, 1000, (P, L)).astype(np.uint32), axis=1)
    pa = rng.integers(0, 1 << 20, (P, L)).astype(np.int32)
    pb = rng.integers(0, 1 << 20, (P, L)).astype(np.int32)
    mk, mp = jax.jit(bitonic_merge)(jnp.asarray(ka), jnp.asarray(pa),
                                    jnp.asarray(kb), jnp.asarray(pb))
    mk = np.asarray(mk)
    ref = np.sort(np.concatenate([ka, kb], axis=1), axis=1)
    np.testing.assert_array_equal(mk, ref)
    # payload travels with its key: multiset of (key, payload) preserved
    got = set(zip(mk[0].tolist(), np.asarray(mp)[0].tolist()))
    want = set(zip(np.concatenate([ka[0], kb[0]]).tolist(),
                   np.concatenate([pa[0], pb[0]]).tolist()))
    assert got == want


def test_shared_count_matrix_counts():
    """C equals the brute-force masked bucket-histogram inner product."""
    rng = np.random.default_rng(1)
    reads = _synth_reads(rng, 24, 512, cov=6)
    rs = ReadSet.from_seqs(reads)
    seqs, lens = rs.to_padded(max_len=512)
    bb, max_occ = 12, 16
    ms = minimizers(jnp.asarray(seqs), jnp.asarray(lens), k=15, w=5, cap=256)
    C, mu = jax.jit(lambda m: shared_count_matrix(
        m, bucket_bits=bb, max_occ=max_occ))(ms)
    h = np.asarray(ms.hash)
    pos = np.asarray(ms.pos)
    cnt = np.asarray(ms.count)
    B, M = h.shape
    A = np.zeros((B, 1 << bb), np.int64)
    for i in range(B):
        v = (np.arange(M) < cnt[i]) & (pos[i] >= 0)
        np.add.at(A[i], (h[i][v] & np.uint32((1 << bb) - 1)).astype(np.int64), 1)
    colsum = A.sum(0)
    lam = colsum.sum() / (1 << bb)
    A[:, colsum > 2.0 * lam + max_occ] = 0
    np.testing.assert_allclose(np.asarray(C), A @ A.T, atol=0.5)
    nv = A.sum(1).astype(np.float64)
    np.testing.assert_allclose(np.asarray(mu),
                               np.outer(nv, nv) / (1 << bb), rtol=1e-5)


@pytest.mark.parametrize("seed", [3, 11])
def test_mxu_table_matches_sort_path(seed):
    rng = np.random.default_rng(seed)
    reads = _synth_reads(rng, 96, 2048, cov=8)
    rs = ReadSet.from_seqs(reads)
    cfg = OverlapConfig(k=15, w=10, min_ovlp_len=500, min_identity=0.9,
                        min_anchors=4, min_chain_score=100, max_occ=16,
                        anchors_per_pair=256)
    t_sort = find_overlaps(rs, cfg=cfg)
    t_mxu = find_overlaps(rs, cfg=replace(cfg, seed_mode="mxu"))

    def key(t):
        return set(zip(t.qid.tolist(), t.tid.tolist(), t.strand.tolist()))

    ps, pm = key(t_sort), key(t_mxu)
    assert t_sort.n > 100                      # the workload is non-trivial
    # pair sets agree to >= 99% (anchor subsampling differs at the margin)
    assert len(ps & pm) >= 0.99 * max(len(ps), len(pm))
    ds = {(q, t, s): (qs, qe) for q, t, s, qs, qe in
          zip(t_sort.qid, t_sort.tid, t_sort.strand, t_sort.qs, t_sort.qe)}
    dm = {(q, t, s): (qs, qe) for q, t, s, qs, qe in
          zip(t_mxu.qid, t_mxu.tid, t_mxu.strand, t_mxu.qs, t_mxu.qe)}
    for kk in ps & pm:
        assert abs(ds[kk][0] - dm[kk][0]) <= 128
        assert abs(ds[kk][1] - dm[kk][1]) <= 128
