"""Golden differential: PE admission vs the reference's find_paired_overlap.

Loads /root/reference/script/sfo2overlaps.py as a module (injecting
``xrange = range`` — the file is py2-era; everything else runs clean under
python3) and drives ``find_paired_overlap`` (sfo2overlaps.py:222-311) on
randomly generated candidate end-overlap sets, comparing per-row
participation decisions with ``srcore.pe_edge_filter(fr_pairs=True)``.

Geometry is generated first (dovetail/containment overlap coordinates per
candidate), then BOTH representations are derived from it: the 10-column
sorted-SFO line consumed by the reference (ids/ori/OHA/OHB/OLA/OLB) and the
OverlapTable row + mate array consumed by ours.  A reference row
"participates" iff some other candidate of the same (idA, idB) bucket forms
a non-empty find_paired_overlap with it (match_candidates tries all pairs,
sfo2overlaps.py:203-219).
"""

import importlib.util
import os

import numpy as np
import pytest

from hylight_tpu.assembly.srcore import pe_edge_filter
from hylight_tpu.overlap.table import OverlapTable

SFO = "/root/reference/script/sfo2overlaps.py"

pytestmark = pytest.mark.skipif(not os.path.exists(SFO),
                                reason="reference script not available")


def load_sfo_module():
    spec = importlib.util.spec_from_file_location("ref_sfo2overlaps", SFO)
    mod = importlib.util.module_from_spec(spec)
    mod.xrange = range  # py2 relic at sfo2overlaps.py:212
    spec.loader.exec_module(mod)
    return mod


REF = load_sfo_module()

NUM_PAIRS_SPACE = 1000  # sfo /2-end id offset used when building sfo ids


class Cand:
    """One candidate end-overlap between fragments A (id 0/1) and B (2/3),
    generated as geometry; renders to both representations."""

    def __init__(self, rng, a_paired, b_paired):
        self.ea = int(rng.integers(0, 2)) if a_paired else 0
        self.eb = int(rng.integers(0, 2)) if b_paired else 0
        self.strand = int(rng.integers(0, 2))
        L = int(rng.integers(30, 80))            # overlap length (no indels)
        # overhangs: left pair (as_, bs_adj) with min 0; right similarly
        left = int(rng.integers(0, 40))
        right = int(rng.integers(0, 40))
        a_first = bool(rng.integers(0, 2))
        a_last = bool(rng.integers(0, 2))
        self.as_ = left if a_first else 0
        self.bs_adj = 0 if a_first else left
        a_after = right if a_last else 0
        b_after = 0 if a_last else right
        self.L = L
        self.qlen_a = self.as_ + L + a_after
        self.tlen_b = self.bs_adj + L + b_after
        self.oha = self.as_ - self.bs_adj
        self.ohb = b_after - a_after

    def sfo_line(self, a_paired, b_paired):
        # [idA, idB, sfo_idA, sfo_idB, ori, OHA, OHB, OLA, OLB, K]
        id_a, id_b = 0, 1
        sfo_a = id_a + (NUM_PAIRS_SPACE if (a_paired and self.ea) else 0)
        sfo_b = id_b + (NUM_PAIRS_SPACE if (b_paired and self.eb) else 0)
        ori = "I" if self.strand else "N"
        return [str(id_a), str(id_b), str(sfo_a), str(sfo_b), ori,
                str(self.oha), str(self.ohb), str(self.L), str(self.L), "0"]

    def table_row(self, rng, a_paired, b_paired):
        """(qid, tid, strand, qs, qe, ts, te, qlen, tlen); rows 0/1 = A ends,
        2/3 = B ends (mate-linked when paired); random q/t role."""
        row_a = self.ea if a_paired else 0
        row_b = 2 + (self.eb if b_paired else 0)
        a_on_q = bool(rng.integers(0, 2))
        s = self.strand
        as_, ae = self.as_, self.as_ + self.L
        # B's adjusted-frame span -> forward frame
        bs_f = (self.tlen_b - (self.bs_adj + self.L)) if s else self.bs_adj
        be_f = bs_f + self.L
        if a_on_q:
            return (row_a, row_b, s, as_, ae, bs_f, be_f,
                    self.qlen_a, self.tlen_b)
        # A as target: same alignment with roles swapped; strand unchanged.
        # q coords must be the B-read forward span; t coords the A span.
        return (row_b, row_a, s, bs_f, be_f, as_, ae,
                self.tlen_b, self.qlen_a)


def build_table(rows):
    m = len(rows)
    arr = np.array(rows, dtype=np.int64)
    z = np.zeros(m, dtype=np.int32)
    return OverlapTable(
        qid=arr[:, 0].astype(np.int32), tid=arr[:, 1].astype(np.int32),
        strand=arr[:, 2].astype(np.int8),
        qs=arr[:, 3].astype(np.int32), qe=arr[:, 4].astype(np.int32),
        ts=arr[:, 5].astype(np.int32), te=arr[:, 6].astype(np.int32),
        qlen=arr[:, 7].astype(np.int32), tlen=arr[:, 8].astype(np.int32),
        matches=(arr[:, 4] - arr[:, 3]).astype(np.int32),
        columns=(arr[:, 4] - arr[:, 3]).astype(np.int32),
        identity=np.ones(m, dtype=np.float32),
        score=np.ones(m, dtype=np.float32), score2=z.astype(np.float32),
        score3=z.astype(np.float32))


def reference_participation(cands, a_paired, b_paired):
    lines = [c.sfo_line(a_paired, b_paired) for c in cands]
    part = [False] * len(cands)
    for i in range(len(cands)):
        for j in range(len(cands)):
            if i == j:
                continue
            ov = REF.find_paired_overlap(lines[i], lines[j],
                                         a_paired, b_paired)
            if len(ov) > 0:
                part[i] = True
    return part


@pytest.mark.parametrize("a_paired,b_paired", [
    (True, True), (True, False), (False, True)])
@pytest.mark.parametrize("seed", range(40))
def test_golden_random_buckets(seed, a_paired, b_paired):
    rng = np.random.default_rng(seed * 10 + a_paired * 2 + b_paired)
    n_cands = int(rng.integers(2, 6))
    cands = [Cand(rng, a_paired, b_paired) for _ in range(n_cands)]
    # occasionally force equal positions (strict-order boundary)
    if n_cands >= 2 and rng.random() < 0.3:
        cands[1].as_, cands[1].bs_adj = cands[0].as_, cands[0].bs_adj
        cands[1].oha = cands[0].oha

    ref = reference_participation(cands, a_paired, b_paired)

    mate = np.array([1, 0, 3, 2], dtype=np.int64)
    if not a_paired:
        mate[0] = mate[1] = -1
    if not b_paired:
        mate[2] = mate[3] = -1
    table = build_table([c.table_row(rng, a_paired, b_paired) for c in cands])
    keep = np.ones(table.n, dtype=bool)
    mine = pe_edge_filter(table, keep, mate, min_overlap_len=2,
                          fr_pairs=True)
    assert list(mine) == ref, (
        f"seed={seed} A_paired={a_paired} B_paired={b_paired}\n"
        + "\n".join(str(c.sfo_line(a_paired, b_paired)) for c in cands))


def test_golden_exhaustive_paired_paired_two_cands():
    """All (ea, eb, strand)^2 combinations of two paired-paired candidates:
    the admitted set must be exactly the reference's."""
    rng = np.random.default_rng(0)
    for ea1 in range(2):
        for eb1 in range(2):
            for s1 in range(2):
                for ea2 in range(2):
                    for eb2 in range(2):
                        for s2 in range(2):
                            c1, c2 = Cand(rng, True, True), Cand(rng, True, True)
                            c1.ea, c1.eb, c1.strand = ea1, eb1, s1
                            c2.ea, c2.eb, c2.strand = ea2, eb2, s2
                            ref = reference_participation([c1, c2], True, True)
                            mate = np.array([1, 0, 3, 2], dtype=np.int64)
                            table = build_table([
                                c.table_row(rng, True, True)
                                for c in (c1, c2)])
                            mine = pe_edge_filter(
                                table, np.ones(2, bool), mate,
                                min_overlap_len=2, fr_pairs=True)
                            assert list(mine) == ref, (ea1, eb1, s1,
                                                       ea2, eb2, s2)


def test_golden_three_cands_third_wheel():
    """A qualifying complementary pair plus a third candidate that pairs
    with neither: the reference admits only the two; ours must too."""
    rng = np.random.default_rng(5)
    c1, c2, c3 = (Cand(rng, True, True) for _ in range(3))
    c1.ea, c1.eb, c1.strand = 0, 0, 0     # N, ends (1,1)... A/1-B/1
    c2.ea, c2.eb, c2.strand = 1, 1, 0     # N, A/2-B/2 -> complements c1
    c3.ea, c3.eb, c3.strand = 0, 1, 1     # I, A/1-B/2 -> pairs with nothing
    ref = reference_participation([c1, c2, c3], True, True)
    assert ref == [True, True, False]
    mate = np.array([1, 0, 3, 2], dtype=np.int64)
    table = build_table([c.table_row(rng, True, True) for c in (c1, c2, c3)])
    mine = pe_edge_filter(table, np.ones(3, bool), mate,
                          min_overlap_len=2, fr_pairs=True)
    assert list(mine) == ref
