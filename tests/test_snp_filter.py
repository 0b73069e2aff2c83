import numpy as np

from hylight_tpu.config import OverlapConfig
from hylight_tpu.io.readset import ReadSet
from hylight_tpu.overlap.engine import find_overlaps
from hylight_tpu.overlap.snp import snp_filter

CFG = OverlapConfig(k=11, w=5, min_ovlp_len=150, min_identity=0.9,
                    min_anchors=4, min_chain_score=60, max_occ=64,
                    anchors_per_pair=256, gap_tile=32)


def _two_strain_reads(rng, glen=2000, nsnp=12, read_len=600, step=100):
    gA = rng.integers(0, 4, size=glen).astype(np.uint8)
    gB = gA.copy()
    snp_pos = np.linspace(100, glen - 100, nsnp).astype(int)
    for p in snp_pos:
        gB[p] = (gB[p] + 1) % 4
    reads, strain = [], []
    for s in range(0, glen - read_len + 1, step):
        reads.append(gA[s:s + read_len]); strain.append(0)
        reads.append(gB[s:s + read_len]); strain.append(1)
    return reads, np.array(strain)


def test_cross_strain_overlaps_killed(rng):
    reads, strain = _two_strain_reads(rng)
    t = find_overlaps(ReadSet.from_seqs(reads), cfg=CFG, query_block=16)
    assert t.n > 0
    keep = snp_filter(t, mc=3, max_frac=0.0025, long_reads=True)
    cross = strain[t.qid] != strain[t.tid]
    # all same-strain overlaps survive
    assert keep[~cross].all()
    # cross-strain overlaps overwhelmingly killed (every 600bp window
    # contains >= 2 SNPs at this density)
    assert cross.any()
    assert (~keep[cross]).mean() > 0.9, f"only {(~keep[cross]).mean():.2f} killed"


def test_short_read_mode_any_snp_kills(rng):
    reads, strain = _two_strain_reads(rng)
    t = find_overlaps(ReadSet.from_seqs(reads), cfg=CFG, query_block=16)
    keep = snp_filter(t, mc=3, max_frac=0.0025, long_reads=False)
    cross = strain[t.qid] != strain[t.tid]
    assert keep[~cross].all()
    assert (~keep[cross]).mean() >= (  # short mode at least as strict
        lambda k2: (~k2[cross]).mean())(
        snp_filter(t, mc=3, max_frac=0.0025, long_reads=True))


def test_random_errors_not_killed(rng):
    """Isolated random sequencing errors lack mc-fold support -> no kills."""
    g = rng.integers(0, 4, size=2000).astype(np.uint8)
    reads = []
    for s in range(0, 1401, 100):
        r = g[s:s + 600].copy()
        p = int(rng.integers(50, 550))
        r[p] = (r[p] + 1) % 4       # one private error per read
        reads.append(r)
    t = find_overlaps(ReadSet.from_seqs(reads), cfg=CFG, query_block=16)
    assert t.n > 0
    keep = snp_filter(t, mc=3, max_frac=0.0025, long_reads=True)
    assert keep.all()


def test_snp_events_inside_indel_gaps():
    """W8 fix: a substitution downstream of an indel in the SAME
    inter-anchor gap must emit a mismatch event (single-indel suffix
    alignment in extend_chains) so the cross-strain pileup can see it."""
    import numpy as np
    import jax.numpy as jnp
    from hylight_tpu.config import OverlapConfig
    from hylight_tpu.io.readset import ReadSet
    from hylight_tpu.overlap.engine import find_overlaps

    rng = np.random.default_rng(77)
    g = rng.integers(0, 4, size=1200).astype(np.uint8)
    r1 = g.copy()
    # r2: delete base 600 and substitute at 610 — both inside one gap
    # (the deletion breaks anchors across [585, 625])
    r2 = np.concatenate([g[:600], g[601:]]).copy()
    r2[609] = (r2[609] + 1) % 4
    rs = ReadSet.from_seqs([r1, r2])
    cfg = OverlapConfig(k=13, w=5, min_ovlp_len=300, min_identity=0.9,
                        min_anchors=3, min_chain_score=60, max_occ=16,
                        anchors_per_pair=256, gap_tile=32)
    t = find_overlaps(rs, cfg=cfg, query_block=2)
    assert t.n == 1
    ev_q = t.mm_q[0][t.mm_mask[0]]
    # the substitution sits at r1 coordinate 610 (r2 609 + 1 deleted base)
    assert 610 in set(ev_q.tolist()), sorted(ev_q.tolist())


def test_snp_event_cap_saturation_is_conservative():
    """When an overlap has more mismatch events than the emitted slots
    (mm_n > mm_mask.sum(), e.g. raw --low_q reads saturating the event
    word budget), the pileup uses only the EMITTED events: the filter can
    under-kill but never over-kill, and never reads fill slots."""
    import numpy as np
    from hylight_tpu.overlap.snp import snp_filter
    from hylight_tpu.overlap.table import OverlapTable

    m, S = 6, 8
    mm_q = np.full((m, S), -1, np.int32)
    mm_t = np.full((m, S), -1, np.int32)
    mm_mask = np.zeros((m, S), bool)
    # 6 overlaps of read pairs (0,i+1) over the same window; each SEES the
    # same 4 SNP columns on read 0 but only 2 slots are emitted (budget),
    # while mm_n reports the true 40 (heavy saturation)
    for i in range(m):
        mm_q[i, :2] = [100, 140]
        mm_t[i, :2] = [100, 140]
        mm_mask[i, :2] = True
    z = np.zeros(m, np.int32)
    table = OverlapTable(
        qid=np.zeros(m, np.int32),
        tid=np.arange(1, m + 1, dtype=np.int32),
        strand=np.zeros(m, np.int8), qs=z, qe=z + 250, ts=z, te=z + 250,
        qlen=z + 250, tlen=z + 250, matches=z + 200, columns=z + 250,
        identity=np.full(m, 0.8, np.float32),
        score=z.astype(np.float32), score2=z.astype(np.float32),
        score3=z.astype(np.float32),
        mm_q=mm_q, mm_t=mm_t,
        mm_qb=np.zeros((m, S), np.int8), mm_tb=np.zeros((m, S), np.int8),
        mm_mask=mm_mask)
    keep = snp_filter(table, mc=3, max_frac=0.0025, long_reads=True)
    # support at cols 100/140 on read 0 = 6 (>=mc) but contradiction = 0
    # (all 6 overlaps agree) -> no confirmed SNP -> nothing killed
    assert keep.all()
    # make half the overlaps agree with read 0 (no events) -> support 3,
    # contradiction 3 -> confirmed; only the 3 event-carrying rows killed
    mm_mask2 = mm_mask.copy()
    mm_mask2[3:] = False
    import dataclasses
    t2 = dataclasses.replace(table, mm_mask=mm_mask2)
    keep2 = snp_filter(t2, mc=3, max_frac=0.0025, long_reads=True)
    assert not keep2[:3].any() and keep2[3:].all()
