"""Paired-end SR core: PE admission, mate-follow consensus, gap bridging."""

import numpy as np

from hylight_tpu.config import Config, OverlapConfig, SRCoreConfig
from hylight_tpu.io.readset import ReadSet, decode_seq, revcomp_codes
from hylight_tpu.overlap.table import OverlapTable
from hylight_tpu.assembly import srcore

CFG = Config().replace(
    overlap_sr=OverlapConfig(k=13, w=5, min_ovlp_len=60, min_identity=0.9,
                             min_anchors=2, min_chain_score=30, max_occ=64,
                             max_gap=500, anchors_per_pair=64, gap_tile=16,
                             max_overlaps_per_read=60),
    sr_core=SRCoreConfig(min_overlap_len=60, min_overlap_len_ec=60,
                         edge_threshold_ec=0.93, edge_threshold=0.999,
                         min_clique_size=2, hap_cov=8.0,
                         average_read_len=150.0, max_iterations=10),
)


def _pe_reads(genome, frag_len, read_len, step):
    seqs, names = [], []
    fid = 0
    for s in range(0, len(genome) - frag_len + 1, step):
        frag = genome[s:s + frag_len]
        seqs.append(frag[:read_len].copy())
        names.append(f"f{fid}/1")
        seqs.append(revcomp_codes(frag[-read_len:]).copy())
        names.append(f"f{fid}/2")
        fid += 1
    return ReadSet.from_seqs(seqs, names=names)


def test_mate_from_names():
    rs = ReadSet.from_seqs([np.zeros(5, np.uint8)] * 5,
                           names=["a/1", "a/2", "b/1", "c", "b/2"])
    mate = srcore.mate_from_names(rs)
    assert mate.tolist() == [1, 0, 4, -1, 2]


def test_pe_edge_filter_requires_two_ends():
    # fragments A=(0,1) B=(2,3); rows all length 100
    def tbl(edges):
        E = len(edges)
        qid = np.array([e[0] for e in edges], np.int32)
        tid = np.array([e[1] for e in edges], np.int32)
        span = np.array([e[2] for e in edges], np.int32)
        z = np.zeros(E, np.int32)
        return OverlapTable(
            qid=qid, tid=tid, strand=np.zeros(E, np.int8),
            qs=z, qe=span, ts=z, te=span,
            qlen=np.full(E, 100, np.int32), tlen=np.full(E, 100, np.int32),
            matches=span, columns=span,
            identity=np.ones(E, np.float32), score=np.ones(E, np.float32),
            score2=np.ones(E, np.float32), score3=np.ones(E, np.float32))

    mate = np.array([1, 0, 3, 2], np.int64)
    # only one end-overlap between A and B: rejected
    t1 = tbl([(0, 2, 80)])
    k1 = srcore.pe_edge_filter(t1, np.ones(1, bool), mate, 60)
    assert not k1.any()
    # both ends overlap with >= L/2: both edges kept
    t2 = tbl([(0, 2, 40), (1, 3, 35)])
    k2 = srcore.pe_edge_filter(t2, np.ones(2, bool), mate, 60)
    assert k2.all()
    # second end-overlap below L/2: rejected
    t3 = tbl([(0, 2, 80), (1, 3, 20)])
    k3 = srcore.pe_edge_filter(t3, np.ones(2, bool), mate, 60)
    assert not k3.any()
    # same-fragment rows never form edges
    t4 = tbl([(0, 1, 80)])
    k4 = srcore.pe_edge_filter(t4, np.ones(1, bool), mate, 60)
    assert not k4.any()
    # single-single edges keep their original admission
    t5 = tbl([(0, 2, 80)])
    k5 = srcore.pe_edge_filter(t5, np.ones(1, bool),
                               np.full(4, -1, np.int64), 60)
    assert k5.all()


def test_pe_assembly_bridges_insert(rng):
    g = rng.integers(0, 4, size=1500).astype(np.uint8)
    rs = _pe_reads(g, frag_len=400, read_len=150, step=50)
    contigs = srcore.sr_assemble(rs, CFG, use_branch_reduction=False)
    assert contigs.n >= 1
    big = int(np.argmax(contigs.lengths))
    s = decode_seq(contigs.get(big))
    gstr = decode_seq(g)
    rc = decode_seq(revcomp_codes(contigs.get(big)))
    assert len(s) > 700, f"PE assembly failed to extend: {len(s)}"
    assert s in gstr or rc in gstr


def test_diploid_double_branch_keeps_both(rng):
    """Diploid rule: a 2-way branch where both alternatives have comparable
    unique read support keeps BOTH edges (haplotype preservation)."""
    from hylight_tpu.assembly.evidence import EvidenceThresholds
    from hylight_tpu.overlap.table import OverlapTable

    # hub contig 0 at [0, 200); branches 1 and 2 at [100, 300) differing
    # at a SNP; original reads support both branches equally
    g = rng.integers(0, 4, size=300).astype(np.uint8)
    hub = g[:200].copy()
    brA = g[100:300].copy()
    brB = brA.copy()
    brB[50] = (brB[50] + 1) % 4    # SNP at hub-frame position 150
    rs = ReadSet.from_seqs([hub, brA, brB])
    # each branch carries itself as evidence (subread = whole contig)
    ws = srcore.WorkingSet.from_reads(rs, ctx=srcore.SRContext.from_reads(rs))

    E = 2
    span = np.array([100, 100], np.int32)
    table = OverlapTable(
        qid=np.array([0, 0], np.int32), tid=np.array([1, 2], np.int32),
        strand=np.zeros(E, np.int8),
        qs=np.full(E, 100, np.int32), qe=np.full(E, 200, np.int32),
        ts=np.zeros(E, np.int32), te=span,
        qlen=np.full(E, 200, np.int32), tlen=np.full(E, 200, np.int32),
        matches=span, columns=span,
        identity=np.ones(E, np.float32), score=np.ones(E, np.float32),
        score2=np.ones(E, np.float32), score3=np.ones(E, np.float32))
    labels = np.zeros(3, np.int8)
    keep = np.ones(E, bool)
    thr = EvidenceThresholds({d: (2, 1) for d in range(1, 500)})

    kept_dip = srcore.branch_reduction(table, ws, labels, keep.copy(), thr,
                                       diploid=True)
    assert kept_dip.all(), "diploid mode must keep both supported branches"
