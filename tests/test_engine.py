import numpy as np

from hylight_tpu.config import OverlapConfig
from hylight_tpu.io.readset import ReadSet, revcomp_codes
from hylight_tpu.overlap.engine import find_overlaps

CFG = OverlapConfig(k=11, w=5, min_ovlp_len=150, min_identity=0.9,
                    min_anchors=4, min_chain_score=60, max_occ=16,
                    anchors_per_pair=128, gap_tile=32)


def _pairs(t):
    return {(int(q), int(d)): i for i, (q, d) in enumerate(zip(t.qid, t.tid))}


def test_perfect_dovetail(rng):
    g = rng.integers(0, 4, size=1000).astype(np.uint8)
    rs = ReadSet.from_seqs([g[:600], g[400:1000]])
    t = find_overlaps(rs, cfg=CFG)
    p = _pairs(t)
    assert (0, 1) in p
    i = p[(0, 1)]
    assert t.identity[i] > 0.99
    assert t.strand[i] == 0
    # overlap is g[400:600]: on read0 ~[400,600), on read1 ~[0,200)
    assert abs(int(t.qs[i]) - 400) < 30 and abs(int(t.qe[i]) - 600) < 30
    assert int(t.ts[i]) < 30 and abs(int(t.te[i]) - 200) < 30


def test_revcomp_dovetail_coords(rng):
    g = rng.integers(0, 4, size=1000).astype(np.uint8)
    r0 = g[:600]
    r1 = revcomp_codes(g[400:1000])  # overlap at END of r1 in fwd frame
    rs = ReadSet.from_seqs([r0, r1])
    t = find_overlaps(rs, cfg=CFG)
    p = _pairs(t)
    assert (0, 1) in p
    i = p[(0, 1)]
    assert t.strand[i] == 1
    # forward-frame target coords: overlap g[400:600] == rc tail [400, 600)
    assert abs(int(t.ts[i]) - 400) < 30 and abs(int(t.te[i]) - 600) < 30


def test_snp_mismatch_events(rng):
    g = rng.integers(0, 4, size=1200).astype(np.uint8)
    g2 = g.copy()
    snp_pos = [500, 700, 900]
    for p_ in snp_pos:
        g2[p_] = (g2[p_] + 1) % 4
    rs = ReadSet.from_seqs([g, g2])
    t = find_overlaps(rs, cfg=CFG)
    p = _pairs(t)
    assert (0, 1) in p
    i = p[(0, 1)]
    got_q = sorted(int(x) for x in t.mm_q[i][t.mm_mask[i]])
    assert got_q == snp_pos
    got_t = sorted(int(x) for x in t.mm_t[i][t.mm_mask[i]])
    assert got_t == snp_pos
    # bases recorded correctly
    for j in range(3):
        q, tt = int(t.mm_q[i][j]), int(t.mm_t[i][j])
        assert int(t.mm_qb[i][j]) == g[q]
        assert int(t.mm_tb[i][j]) == g2[tt]
    assert t.identity[i] > 0.98


def test_internal_match_rejected(rng):
    # two reads sharing a 300bp repeat in their middles but otherwise
    # unrelated -> internal match, must be filtered (Algorithm 5)
    rep = rng.integers(0, 4, size=300).astype(np.uint8)
    r0 = np.concatenate([rng.integers(0, 4, 400).astype(np.uint8), rep,
                         rng.integers(0, 4, 400).astype(np.uint8)])
    r1 = np.concatenate([rng.integers(0, 4, 400).astype(np.uint8), rep,
                         rng.integers(0, 4, 400).astype(np.uint8)])
    t = find_overlaps(ReadSet.from_seqs([r0, r1]), cfg=CFG)
    assert (0, 1) not in _pairs(t)


def test_low_identity_rejected(rng):
    g = rng.integers(0, 4, size=800).astype(np.uint8)
    noisy = g[300:].copy()
    sub = rng.random(len(noisy)) < 0.15   # 15% substitutions
    noisy[sub] = (noisy[sub] + 1) % 4
    rs = ReadSet.from_seqs([g[:600], noisy])
    t = find_overlaps(rs, cfg=CFG)
    for i in range(t.n):
        assert t.identity[i] < 0.9 or (int(t.qid[i]), int(t.tid[i])) != (0, 1)


def test_min_length_rejected(rng):
    g = rng.integers(0, 4, size=700).astype(np.uint8)
    rs = ReadSet.from_seqs([g[:400], g[300:700]])  # 100bp overlap < 150
    t = find_overlaps(rs, cfg=CFG)
    assert (0, 1) not in _pairs(t)


def test_many_reads_coverage(rng):
    """20 tiling reads: each should overlap its neighbours."""
    g = rng.integers(0, 4, size=3000).astype(np.uint8)
    reads = [g[i * 130:i * 130 + 500] for i in range(20)]
    t = find_overlaps(ReadSet.from_seqs(reads), cfg=CFG, query_block=8)
    p = _pairs(t)
    for i in range(19):
        assert (i, i + 1) in p, f"missing neighbour overlap {i},{i+1}"
    # non-overlapping far pairs must be absent
    assert (0, 19) not in p


def test_streamed_matches_plain(rng):
    """find_overlaps_streamed over small chunks == one-shot find_overlaps."""
    from hylight_tpu.overlap.engine import find_overlaps_streamed

    g = rng.integers(0, 4, size=3000).astype(np.uint8)
    reads = [g[i * 120:i * 120 + 500] for i in range(20)]
    rs = ReadSet.from_seqs(reads)
    t_plain = find_overlaps(rs, cfg=CFG)
    t_str = find_overlaps_streamed(rs, cfg=CFG, chunk=7)

    def pairset(t):
        return {(int(q), int(d)) for q, d in zip(t.qid, t.tid)}

    assert pairset(t_str) == pairset(t_plain)
    # identities agree per pair
    pl = {(int(q), int(d)): float(i)
          for q, d, i in zip(t_plain.qid, t_plain.tid, t_plain.identity)}
    for q, d, i in zip(t_str.qid, t_str.tid, t_str.identity):
        assert abs(pl[(int(q), int(d))] - float(i)) < 1e-5


def test_ultralong_reads_packed_path(rng):
    """Reads longer than 32 kb ride the packed self-join with widened
    bands and qshift = bit_length(len) (round-4 W4: previously they fell
    to the slow legacy gather path) — the 100 kb ONT-read story
    (reference handles these via minimap2's heap chaining,
    ``filter_overlap_slr2.py:51``)."""
    from hylight_tpu.overlap.engine import _self_join_ok, _ava_bandwidth
    assert _self_join_ok(3, 65536, 12000, "mxu")     # sort join takes over
    assert _ava_bandwidth(65536) == 256
    g = rng.integers(0, 4, size=60_000).astype(np.uint8)
    reads = [g[:40_000], g[20_000:60_000], g[5_000:45_000]]
    # 1% substitution noise on one read
    r = reads[1].copy()
    e = rng.random(r.shape[0]) < 0.01
    r[e] = (r[e] + rng.integers(1, 4, int(e.sum())).astype(np.uint8)) % 4
    reads[1] = r
    cfg = OverlapConfig(k=15, w=10, min_ovlp_len=5000, min_identity=0.9,
                        min_anchors=8, min_chain_score=500, max_occ=16,
                        anchors_per_pair=256, gap_tile=32)
    t = find_overlaps(ReadSet.from_seqs(reads), cfg=cfg)
    p = _pairs(t)
    assert (0, 1) in p and (0, 2) in p and (1, 2) in p
    i = p[(0, 1)]
    assert int(t.qe[i]) - int(t.qs[i]) > 15_000
    assert t.identity[i] > 0.95


def test_pair_overflow_retries_not_truncates(rng):
    """mxu whole-set path: when candidate pairs exceed the cap, the engine
    retries at a bucketed cap sized from the exact count instead of
    silently dropping all high-qid reads' candidates (advisor r4)."""
    from hylight_tpu.config import OverlapConfig
    from hylight_tpu.io.readset import ReadSet
    from hylight_tpu.overlap.engine import EngineStats, find_overlaps

    g = rng.integers(0, 4, size=3000).astype(np.uint8)
    # 40 reads from one locus: every pair overlaps (780 candidate pairs)
    reads = [g[s:s + 2000].copy() for s in
             rng.integers(0, 1000, size=40)]
    rs = ReadSet.from_seqs(reads)
    cfg = OverlapConfig(k=13, w=5, min_ovlp_len=500, min_identity=0.9,
                        min_anchors=4, min_chain_score=60, max_occ=64,
                        anchors_per_pair=128, seed_mode="mxu")
    stats = EngineStats()
    t = find_overlaps(rs, cfg=cfg, pairs_per_block=256, stats=stats)
    assert stats.pair_overflows >= 1
    # every read keeps overlaps — including the high ids the truncation
    # would have dropped (cap_per_read caps at 60, far above need here)
    touched = set(t.qid.tolist()) | set(t.tid.tolist())
    assert touched == set(range(40))


def test_high_error_identity_calibrated(rng):
    """Raw high-error (low_q-style) reads: the identity ESTIMATE must track
    the true pairwise error rate even when most inter-anchor gaps exceed
    the small tile (round-3 advisor finding: shrinking the large-tile link
    budget made identity mostly extrapolated on the w=5 sort path; the
    budgets are now config-driven and cli.py widens them for --low_q)."""
    glen = 20000
    g = rng.integers(0, 4, size=glen).astype(np.uint8)
    reads = []
    for s in range(0, glen - 4000, 1000):
        r = g[s:s + 4000].copy()
        e = rng.random(4000) < 0.04          # 4% subs per read
        r[e] = (r[e] + rng.integers(1, 4, e.sum())) % 4
        reads.append(r)
    rs = ReadSet.from_seqs(reads)
    cfg = OverlapConfig(k=13, w=5, min_ovlp_len=1000, min_identity=0.8,
                        min_anchors=4, min_chain_score=50, max_occ=16,
                        anchors_per_pair=256, gap_tile=64,
                        verify_segments=16, verify_event_words=96)
    t = find_overlaps(rs, cfg=cfg)
    assert t.n >= 10
    # true pairwise identity ~ (1-0.04)^2 + small back-mutation ~ 0.923
    ids = np.asarray(t.identity)
    assert abs(float(np.median(ids)) - 0.923) < 0.025, float(np.median(ids))
