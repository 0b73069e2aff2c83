"""FNO1 induced-overlap projection (FindNextOverlaps.cpp:25-330 capability).

Covers: base-level verification of projected pairs (verify_pairs), the
projection math for all four orientation cases (via an end-to-end merge
iteration on error-free reads: every projected pair must verify at 1.0
identity when it spans), and the stage-b FNO-only mode (reoverlap=False
still merges using projected overlaps alone).
"""

import numpy as np
import pytest

from hylight_tpu.assembly import fno, srcore
from hylight_tpu.config import Config
from hylight_tpu.io.readset import ReadSet, revcomp_codes


def _rand(n, rng):
    return rng.integers(0, 4, n).astype(np.uint8)


def test_verify_pairs_plus():
    rng = np.random.default_rng(0)
    q = _rand(300, rng)
    t = np.concatenate([q[200:], _rand(150, rng)])  # t starts at q pos 200
    rs = ReadSet.from_seqs([q, t])
    proj = fno.Projection([0], [1], [200], [0])
    tab = fno.verify_pairs(rs, proj, snp_cap=16)
    assert tab.n == 1
    assert tab.matches[0] == 100 and tab.columns[0] == 100
    assert tab.identity[0] == pytest.approx(1.0)
    assert (tab.qs[0], tab.qe[0]) == (200, 300)
    assert (tab.ts[0], tab.te[0]) == (0, 100)
    assert not tab.mm_mask[0].any()


def test_verify_pairs_minus_and_mismatch():
    rng = np.random.default_rng(1)
    q = _rand(300, rng)
    seg = q[200:].copy()
    seg[10] = (seg[10] + 1) % 4                     # one mismatch at q pos 210
    t = revcomp_codes(np.concatenate([seg, _rand(150, rng)]))
    rs = ReadSet.from_seqs([q, t])
    proj = fno.Projection([0], [1], [200], [1])
    tab = fno.verify_pairs(rs, proj, snp_cap=16)
    assert tab.n == 1
    assert tab.columns[0] == 100 and tab.matches[0] == 99
    assert tab.mm_mask[0].sum() == 1
    assert tab.mm_q[0, 0] == 210
    # forward-frame t coordinate of the event: rc(t) position 10 -> t pos
    # len(t)-1-10
    assert tab.mm_t[0, 0] == len(t) - 1 - 10
    # forward-frame bases: query base as-is, target complemented back
    assert tab.mm_qb[0, 0] == q[210]
    assert tab.mm_tb[0, 0] == (3 - seg[10])


def _tiling_reads(genome, n, rlen, rng, flip_some=True):
    starts = np.linspace(0, len(genome) - rlen, n).astype(int)
    reads = []
    for i, s in enumerate(starts):
        r = genome[s:s + rlen].copy()
        if flip_some and i % 3 == 1:
            r = revcomp_codes(r)
        reads.append(r)
    return reads, starts


def test_projection_verifies_exact_after_merge():
    rng = np.random.default_rng(2)
    genome = _rand(2000, rng)
    reads, _ = _tiling_reads(genome, 24, 400, rng)
    ws = srcore.WorkingSet.from_reads(
        ReadSet.from_seqs(reads),
        ctx=srcore.SRContext.from_reads(ReadSet.from_seqs(reads)))
    cfg = Config()
    nws, n_merged = srcore.merge_iteration(
        ws, cfg, min_overlap_len=100, edge_threshold=0.0, merge_eps=1e-6)
    assert n_merged > 0
    assert nws.proj is not None and nws.proj.n > 0
    tab = fno.verify_pairs(nws.reads, nws.proj, snp_cap=16)
    # error-free reads + exact projection: every spanning projected pair
    # verifies mismatch-free (the coordinate math must be exact in all
    # four alignment cases; a off-by-one would show as mismatches)
    assert tab.n > 0
    assert (tab.identity >= 1.0 - 1e-9).all()


def test_fno_only_merges_without_engine():
    rng = np.random.default_rng(3)
    genome = _rand(3000, rng)
    reads, _ = _tiling_reads(genome, 30, 400, rng, flip_some=False)
    ws = srcore.WorkingSet.from_reads(
        ReadSet.from_seqs(reads),
        ctx=srcore.SRContext.from_reads(ReadSet.from_seqs(reads)))
    cfg = Config()
    ws1, m1 = srcore.merge_iteration(
        ws, cfg, min_overlap_len=100, edge_threshold=0.0, merge_eps=1e-6)
    assert m1 > 0 and ws1.proj is not None
    # second iteration without any engine re-overlap: projected overlaps
    # (+ carry) must keep the merge cascade going (pipeline_per_stage
    # semantics: --FNO=1, no minimap2 re-run)
    ws2, m2 = srcore.merge_iteration(
        ws1, cfg, min_overlap_len=100, edge_threshold=0.0, merge_eps=1e-6,
        reoverlap=False)
    assert m2 > 0
    assert ws2.reads.lengths.max() > ws1.reads.lengths.max()
