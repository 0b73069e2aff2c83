"""Golden differential: snp_filter vs the reference's CIGAR-pileup SNP kill.

Imports /root/reference/script/filter_overlap_slr2.py and drives its
``prpare_mutation2`` (:289-367) + ``mutation_re`` (:370-405) on synthetic
14-col --eqx PAF text, then applies the main-loop kill rule
(mutation[pair]/matchcount > threshold for long reads, any-mutation kill
for short reads, :90-100).  The same alignments are rendered as an
OverlapTable with per-column mismatch events and fed to
``hylight_tpu.overlap.snp.snp_filter``; kill masks must be identical at
mc in {2,3,4} including the 0.0025 threshold boundary.

Both representations are derived from one generated truth: a pool of
"reads" with explicit pairwise alignments (diagonal or with planted
indels) and explicit mismatch-run columns in the alignment frame.
"""

import importlib.util
import os

import numpy as np
import pytest

from hylight_tpu.overlap.snp import snp_filter
from hylight_tpu.overlap.table import OverlapTable

REF_PATH = "/root/reference/script/filter_overlap_slr2.py"

pytestmark = pytest.mark.skipif(not os.path.exists(REF_PATH),
                                reason="reference script not available")


def load_ref():
    spec = importlib.util.spec_from_file_location("ref_slr2", REF_PATH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


REF = load_ref()


class Aln:
    """One pairwise alignment: target walks forward through ops; ops are
    (kind, length) with kind in '=XID'."""

    def __init__(self, q, t, strand, qs, ts, ops, qlen, tlen):
        self.q, self.t, self.strand = q, t, strand
        self.qs, self.ts, self.ops = qs, ts, ops
        self.qlen, self.tlen = qlen, tlen
        qa = sum(l for k, l in ops if k in "=XI")   # query bases consumed
        ta = sum(l for k, l in ops if k in "=XD")
        self.ta = ta
        self.te = ts + ta
        if strand == 0:
            self.qe = qs + qa
        else:
            # qs was generated in the REVERSE query frame; forward span:
            self.q_rs = qs                    # reverse-frame start
            self.qe = qlen - qs               # forward end
            self.qs = qlen - (qs + qa)        # forward start
        self.matches = sum(l for k, l in ops if k == "=")
        self.mlen = max(qa, ta)

    def cigar(self):
        return "cg:Z:" + "".join(f"{l}{k}" for k, l in self.ops)

    def paf_line(self):
        ori = "-" if self.strand else "+"
        return "\t".join(map(str, [
            f"r{self.q}", self.qlen, self.qs, self.qe, ori,
            f"r{self.t}", self.tlen, self.ts, self.te,
            self.matches, self.mlen, 60, self.cigar()]))

    def mm_events(self):
        """Per-column (q_fwd, t_fwd) mismatch coords in alignment order."""
        oq = 0  # query consumed (alignment frame)
        ot = 0
        out = []
        for k, l in self.ops:
            if k == "X":
                for i in range(l):
                    if self.strand == 0:
                        out.append((self.qs + oq + i, self.ts + ot + i))
                    else:
                        rq = self.q_rs + oq + i
                        out.append((self.qlen - 1 - rq, self.ts + ot + i))
            if k in "=XI":
                oq += l
            if k in "=XD":
                ot += l
        if self.strand == 1:
            out.reverse()  # extend emits slots in q-ASCENDING order
        return out


def make_table(alns, snp_cap=64):
    m = len(alns)
    S = snp_cap
    mm_q = np.full((m, S), -1, dtype=np.int32)
    mm_t = np.full((m, S), -1, dtype=np.int32)
    mm_mask = np.zeros((m, S), dtype=bool)
    for i, a in enumerate(alns):
        ev = a.mm_events()[:S]
        for j, (cq, ct) in enumerate(ev):
            mm_q[i, j], mm_t[i, j] = cq, ct
            mm_mask[i, j] = True
    arr = lambda f, d: np.array([getattr(a, f) for a in alns], dtype=d)
    z = np.zeros(m, dtype=np.float32)
    return OverlapTable(
        qid=arr("q", np.int32), tid=arr("t", np.int32),
        strand=arr("strand", np.int8),
        qs=arr("qs", np.int32), qe=arr("qe", np.int32),
        ts=arr("ts", np.int32), te=arr("te", np.int32),
        qlen=arr("qlen", np.int32), tlen=arr("tlen", np.int32),
        matches=arr("matches", np.int32), columns=arr("mlen", np.int32),
        identity=z + 1, score=z, score2=z, score3=z,
        mm_q=mm_q, mm_t=mm_t,
        mm_qb=np.zeros((m, S), np.int8), mm_tb=np.zeros((m, S), np.int8),
        mm_mask=mm_mask)


def reference_kill(alns, mc, threshold, long_reads=True):
    lines = [a.paf_line() + "\n" for a in alns]
    snp, map_po, start_po = REF.prpare_mutation2(iter(lines))
    start_po_sorted = {k: sorted(v, key=lambda x: (x[0], x[1]))
                       for k, v in start_po.items()}
    mutation = REF.mutation_re(snp, start_po_sorted, map_po, mc=mc)
    killed = []
    for a in alns:
        fkey = ":".join(sorted([f"r{a.q}", f"r{a.t}"]))
        if fkey in mutation:
            if not long_reads:
                killed.append(True)
                continue
            killed.append(mutation[fkey] / a.matches > threshold)
        else:
            killed.append(False)
    return killed


def gen_alignments(rng, n_reads=12, n_alns=40, err=0.02, indels=False,
                   runs=False, L=900):
    """Random pairwise alignments over abstract reads (deduped pairs —
    prpare_mutation2 dedups by pair key and our tables are pre-deduped)."""
    lens = rng.integers(L, L + 200, n_reads)
    alns = []
    seen = set()
    # shared column hotspots so support can reach mc
    hot = {r: sorted(rng.integers(10, lens[r] - 10, 4)) for r in range(n_reads)}
    while len(alns) < n_alns:
        q, t = rng.integers(0, n_reads, 2)
        if q == t or (min(q, t), max(q, t)) in seen:
            continue
        seen.add((min(q, t), max(q, t)))
        strand = int(rng.integers(0, 2))
        ta = int(rng.integers(300, 600))
        ts = int(rng.integers(0, lens[t] - ta))
        qs = int(rng.integers(0, lens[q] - ta - 60))
        # mismatch offsets in the alignment frame: mostly at the target's
        # hotspot columns (so pileups accumulate), some random
        offs = set()
        for h in hot[t]:
            if ts < h < ts + ta and rng.random() < 0.8:
                offs.add(h - ts)
        n_rand = rng.poisson(err * ta)
        offs.update(int(x) for x in rng.integers(1, ta - 1, n_rand))
        offs = sorted(o for o in offs if 0 < o < ta - 1)
        # canonical --eqx CIGARs use MAXIMAL X runs (minimap2 never emits
        # 1X1X for adjacent mismatches) — expand some offsets to length-2
        # runs, then merge adjacency
        mm = np.zeros(ta, dtype=bool)
        for o in offs:
            run = 2 if (runs and rng.random() < 0.3 and o + 2 < ta - 1) else 1
            mm[o:o + run] = True
        ops = []
        pos = 0
        for o in range(ta):
            if mm[o] and (o == 0 or not mm[o - 1]):
                if o > pos:
                    ops.append(("=", o - pos))
                run = 1
                while o + run < ta and mm[o + run]:
                    run += 1
                ops.append(("X", run))
                pos = o + run
        if pos < ta:
            ops.append(("=", ta - pos))
        if indels and rng.random() < 0.5 and len(ops) >= 3:
            # splice an indel between ops (coordinates shear afterwards)
            k = "I" if rng.random() < 0.5 else "D"
            ops.insert(int(rng.integers(1, len(ops))), (k, int(rng.integers(1, 4))))
        alns.append(Aln(int(q), int(t), strand, qs, ts, ops,
                        int(lens[q]), int(lens[t])))
    return alns


@pytest.mark.parametrize("mc", [2, 3, 4])
@pytest.mark.parametrize("seed,indels,runs", [
    (0, False, False), (1, False, True), (2, True, False), (3, True, True),
    (4, False, False), (5, True, True),
])
def test_golden_kill_decisions(seed, mc, indels, runs):
    rng = np.random.default_rng(seed)
    alns = gen_alignments(rng, indels=indels, runs=runs)
    table = make_table(alns)
    for long_reads in (True, False):
        ref = reference_kill(alns, mc, 0.0025, long_reads=long_reads)
        keep = snp_filter(table, mc=mc, max_frac=0.0025,
                          long_reads=long_reads)
        assert list(~keep) == ref, (seed, mc, long_reads)


def test_golden_threshold_boundary():
    """Pair whose mutation/matchcount lands exactly at 0.0025: the
    reference kills only on strictly-greater; ours must agree."""
    rng = np.random.default_rng(7)
    # build a tight pileup: 6 reads all overlapping the same target window
    alns = gen_alignments(rng, n_reads=6, n_alns=14, err=0.0, L=1200)
    table = make_table(alns)
    for thr in (0.0025, 0.00001, 0.5):
        ref = reference_kill(alns, 2, thr)
        keep = snp_filter(table, mc=2, max_frac=thr, long_reads=True)
        assert list(~keep) == ref, thr
