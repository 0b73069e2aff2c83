"""Tests for the miniasm-exact 2-pass read selection (assembly/readsel.py):
coverage-plateau trimming (ma_hit_sub), hit rebasing (ma_hit_cut), chimera
filtering (ma_hit_flt) and containment removal (ma_hit_contained)."""

import numpy as np

from hylight_tpu.config import OverlapConfig
from hylight_tpu.io.readset import ReadSet
from hylight_tpu.assembly import readsel
from hylight_tpu.overlap.engine import find_overlaps

CFG = OverlapConfig(k=11, w=5, min_ovlp_len=150, min_identity=0.9,
                    min_anchors=4, min_chain_score=60, max_occ=64,
                    anchors_per_pair=256, gap_tile=32)


def _select(t, n, **kw):
    args = dict(min_dp=1, min_span=150, min_match=40, max_hang=1000,
                int_frac=0.8, min_ovlp=150)
    args.update(kw)
    return readsel.select_reads(t, n, **args)


def test_chimera_arm_trimmed(rng):
    """A chimeric read (genomic half + junk half) is trimmed to the
    covered half by the coverage-plateau pass at min_dp=3."""
    g = rng.integers(0, 4, size=2000).astype(np.uint8)
    junk = rng.integers(0, 4, size=600).astype(np.uint8)
    chimera = np.concatenate([g[200:800], junk])
    reads = [g[i * 50:i * 50 + 500] for i in range(28)] + [chimera]
    rs = ReadSet.from_seqs(reads)
    t = find_overlaps(rs, cfg=CFG, query_block=8)
    hits, sub = _select(t, rs.n, min_dp=3, min_span=200, min_ovlp=200)
    cid = len(reads) - 1
    assert not sub.deleted[cid]
    assert sub.e[cid] - sub.s[cid] <= 650
    assert sub.s[cid] >= 0 and sub.e[cid] <= 650
    # interior reads (away from genome ends) survive near full length
    interior = [int(sub.e[i] - sub.s[i]) for i in range(8, 20)
                if not sub.deleted[i]]
    assert interior and all(l >= 400 for l in interior)
    # the junk half carries no hits: every surviving hit coordinate of the
    # chimera stays inside the selected (rebased) region
    m = hits.qid == cid
    if m.any():
        assert int(hits.qe[m].max()) <= int(sub.e[cid] - sub.s[cid])


def test_mindp1_keeps_covered_spans(rng):
    g = rng.integers(0, 4, size=1500).astype(np.uint8)
    reads = [g[i * 150:i * 150 + 500] for i in range(7)]
    rs = ReadSet.from_seqs(reads)
    t = find_overlaps(rs, cfg=CFG, query_block=8)
    hits, sub = _select(t, rs.n, min_dp=1, min_span=100, min_ovlp=100)
    # interior reads are (near-)fully covered by their neighbours; end
    # reads get trimmed to the covered span and may then be deleted as
    # contained in their neighbour — exactly miniasm's behavior
    for i in range(1, 6):
        assert not sub.deleted[i]
        assert sub.e[i] - sub.s[i] >= 490, (i, sub.s[i], sub.e[i])
    trimmed = readsel.trimmed_reads(rs, sub)
    assert trimmed.n == rs.n
    assert int(trimmed.lengths[3]) >= 490


def test_hit_sub_longest_plateau_earliest_tie():
    """ma_hit_sub picks the longest >=min_dp region; the strict '>' compare
    keeps the EARLIEST region on ties (hit.c:141)."""
    # read 0 has two depth-1 plateaus [0,100) and [200,300): equal length
    h = readsel.Hits(
        qid=np.array([0, 0], dtype=np.int64),
        tid=np.array([1, 2], dtype=np.int64),
        qs=np.array([0, 200], dtype=np.int64),
        qe=np.array([100, 300], dtype=np.int64),
        ts=np.zeros(2, np.int64), te=np.full(2, 100, np.int64),
        rev=np.zeros(2, np.int64),
        ml=np.full(2, 100, np.int64), bl=np.full(2, 100, np.int64),
    )
    sub = readsel.hit_sub(h, 3, min_dp=1)
    assert sub.s[0] == 0 and sub.e[0] == 100
    # reads 1, 2 appear only as targets here (no query-side hits): like the
    # reference's calloc'd ma_sub_t they stay s=e=0, del=0
    assert not sub.deleted[1] and sub.e[1] == 0


def test_hit_cut_rebases_forward_and_reverse():
    """ma_hit_cut coordinate rebasing (hit.c:163-193) on hand-built hits."""
    # read 0 trimmed to [100, 900); read 1 untrimmed [0, 1000)
    sub = readsel.SubRegions(
        s=np.array([100, 0], dtype=np.int64),
        e=np.array([900, 1000], dtype=np.int64),
        deleted=np.zeros(2, dtype=bool))
    h = readsel.Hits(
        qid=np.array([0, 0], dtype=np.int64),
        tid=np.array([1, 1], dtype=np.int64),
        qs=np.array([50, 50], dtype=np.int64),
        qe=np.array([600, 600], dtype=np.int64),
        ts=np.array([400, 400], dtype=np.int64),
        te=np.array([950, 950], dtype=np.int64),
        rev=np.array([0, 1], dtype=np.int64),
        ml=np.full(2, 500, np.int64), bl=np.full(2, 560, np.int64),
    )
    out = readsel.hit_cut(h, sub, min_span=100)
    assert out.n == 2
    # forward: query loses [50,100) -> target start advances by the same 50
    assert out.qs[0] == 0 and out.qe[0] == 500
    assert out.ts[0] == 450 and out.te[0] == 950
    # reverse: clipping the query START trims the target END instead
    assert out.qs[1] == 0 and out.qe[1] == 500
    assert out.ts[1] == 400 and out.te[1] == 900


def test_contained_read_deleted(rng):
    g = rng.integers(0, 4, size=1400).astype(np.uint8)
    # four dovetailing reads + one read contained in read 1
    reads = [g[0:600], g[200:800], g[400:1000], g[600:1200], g[250:550]]
    rs = ReadSet.from_seqs(reads)
    t = find_overlaps(rs, cfg=CFG, query_block=8)
    hits, sub = _select(t, rs.n, min_dp=1, min_span=100, min_ovlp=100)
    assert sub.deleted[4]                       # contained read deleted
    assert not sub.deleted[1] and not sub.deleted[2]   # interior reads live
