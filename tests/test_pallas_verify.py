"""Pallas gap-verify kernel vs the XLA gather implementation (interpret
mode on the CPU mesh)."""

import numpy as np
import jax.numpy as jnp

from hylight_tpu.config import OverlapConfig
from hylight_tpu.io.readset import ReadSet
from hylight_tpu.ops.minimizers import minimizers
from hylight_tpu.ops.pallas_verify import (extend_chains_pallas, make_seqs2)
from hylight_tpu.overlap import seed as sm
from hylight_tpu.overlap.chain import refine_chains
from hylight_tpu.overlap.extend import extend_chains

CFG = OverlapConfig(k=11, w=5, min_ovlp_len=150, min_identity=0.9,
                    min_anchors=4, min_chain_score=60, max_occ=16,
                    anchors_per_pair=128, gap_tile=512)


def _chains(rng, n=8, glen=2400, snps=()):
    g = rng.integers(0, 4, size=glen).astype(np.uint8)
    g2 = g.copy()
    for p in snps:
        g2[p] = (g2[p] + 1) % 4
    step = (glen - 600) // (n - 1)
    reads = [(g if i % 2 == 0 else g2)[i * step:i * step + 600]
             for i in range(n)]
    # revcomp one read to exercise the rc row path
    from hylight_tpu.io.readset import revcomp_codes
    reads[3] = revcomp_codes(reads[3])
    rs = ReadSet.from_seqs(reads)
    seqs, lens = rs.to_padded(max_len=640)
    seqs = jnp.asarray(seqs)
    lens = jnp.asarray(lens)
    ms = minimizers(seqs, lens, k=CFG.k, w=CFG.w, cap=256)
    idx = sm.build_index(ms, 0, max_occ=CFG.max_occ)
    an = sm.collect_anchors(ms, 0, idx, max_hits=CFG.max_occ,
                            dedup_self=True)
    ch = refine_chains(
        sm.group_candidates(an, lens, bandwidth=64, min_anchors=4,
                            max_pairs=64, anchors_per_pair=128),
        k=CFG.k, min_score=60, max_gap=10000)
    return ch, seqs, lens


def test_pallas_matches_gather_impl(rng):
    ch, seqs, lens = _chains(rng, snps=(500, 900, 1300, 1700))
    ext_ref = extend_chains(ch, seqs, k=CFG.k, gap_tile=512, max_mismatch=64)
    seqs2 = make_seqs2(seqs, lens)
    ext_pl = extend_chains_pallas(ch, seqs2, k=CFG.k, max_mismatch=64,
                                  interpret=True)
    v = np.array(ch.valid)
    assert v.any()
    np.testing.assert_array_equal(np.array(ext_ref.matches)[v],
                                  np.array(ext_pl.matches)[v])
    np.testing.assert_array_equal(np.array(ext_ref.columns)[v],
                                  np.array(ext_pl.columns)[v])
    np.testing.assert_array_equal(np.array(ext_ref.indels)[v],
                                  np.array(ext_pl.indels)[v])
    np.testing.assert_allclose(np.array(ext_ref.identity)[v],
                               np.array(ext_pl.identity)[v], atol=1e-6)
    # mismatch events agree as sets of (qpos, tpos, qb, tb)
    for i in np.nonzero(v)[0]:
        ref_ev = set(zip(np.array(ext_ref.mm_q[i])[np.array(ext_ref.mm_mask[i])],
                         np.array(ext_ref.mm_t[i])[np.array(ext_ref.mm_mask[i])],
                         np.array(ext_ref.mm_qb[i])[np.array(ext_ref.mm_mask[i])],
                         np.array(ext_ref.mm_tb[i])[np.array(ext_ref.mm_mask[i])]))
        pl_ev = set(zip(np.array(ext_pl.mm_q[i])[np.array(ext_pl.mm_mask[i])],
                        np.array(ext_pl.mm_t[i])[np.array(ext_pl.mm_mask[i])],
                        np.array(ext_pl.mm_qb[i])[np.array(ext_pl.mm_mask[i])],
                        np.array(ext_pl.mm_tb[i])[np.array(ext_pl.mm_mask[i])]))
        assert ref_ev == pl_ev, f"pair {i}"
