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


def test_fno3_shared_subread_projection(rng):
    """FNO3 (FindNextOverlaps3.cpp:20-173): two superreads sharing an
    original subread induce an overlap candidate whose shift is deduced
    purely from the stored subread indices — '+' and '-' placements both.
    Every emitted candidate must verify at 1.0 identity on error-free
    superreads built from one genome."""
    g = _rand(600, rng)
    # superreads = overlapping genome windows; originals = 80bp reads at
    # known offsets inside them (ori 0), one placed revcomp (ori 1)
    s0 = g[0:300]
    s1 = g[200:520]
    s2 = revcomp_codes(g[250:560])          # a revcomp superread
    new = ReadSet.from_seqs([s0, s1, s2])
    o_len = np.full(10, 80, dtype=np.int64)
    # orig 7 lives at g[220:300]: s0 offset 220 ori 0, s1 offset 20 ori 0,
    # s2 (revcomp of g[250:560]) contains revcomp(orig7)? g[220:300] not
    # inside [250,560) fully -> use orig 8 at g[260:340]: s1 off 60 ori 0,
    # s2: revcomp frame position = 560-340=220 ori 1
    subreads = [
        [(7, 220, 0)],                      # s0
        [(7, 20, 0), (8, 60, 0)],           # s1
        [(8, 220, 1)],                      # s2
    ]
    proj = fno.project_shared_subreads(
        subreads, new.lengths.astype(np.int64), o_len)
    assert proj.n >= 2
    t = fno.verify_pairs(new, proj, snp_cap=16)
    assert t.n >= 2
    pairs = set(zip(t.qid.tolist(), t.tid.tolist(), t.strand.tolist()))
    assert (0, 1, 0) in pairs               # s0/s1 share orig 7, same ori
    assert (1, 2, 1) in pairs               # s1/s2 share orig 8, mixed ori
    assert (t.identity == 1.0).all(), t.identity
    # the deduced extents match the true genomic overlaps
    d = {(q, s): (qs, qe) for q, s, qs, qe in
         zip(t.qid, t.tid, t.qs, t.qe)}
    qs01, qe01 = d[(0, 1)]
    assert qs01 == 200 and qe01 == 300      # s0 x s1 overlap = g[200:300)
    qs12, qe12 = d[(1, 2)]
    assert qs12 == 50 and qe12 == 320       # s1 x s2 overlap = g[250:520)


def test_fno3_assembles_like_fno1(rng):
    """sr_assemble with fno3=True still reconstructs the region (the
    candidate source changes, the assembly result must not regress)."""
    import dataclasses
    g = _rand(1500, rng)
    reads = [g[s:s + 150].copy() for s in range(0, 1351, 25)]
    rs = ReadSet.from_seqs(reads)
    cfg = Config()
    cfg = cfg.replace(sr_core=dataclasses.replace(
        cfg.sr_core, min_overlap_len=60, min_overlap_len_ec=60,
        edge_threshold=0.999, max_iterations=6, average_read_len=150.0),
        overlap_sr=dataclasses.replace(
            cfg.overlap_sr, k=13, min_anchors=2, min_chain_score=30))
    out1 = srcore.sr_assemble(rs, cfg)
    cfg3 = cfg.replace(sr_core=dataclasses.replace(cfg.sr_core, fno3=True))
    out3 = srcore.sr_assemble(rs, cfg3)
    assert out3.n >= 1
    assert int(out3.lengths.max()) >= int(0.9 * out1.lengths.max())
