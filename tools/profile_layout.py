"""Metagenome-scale string-graph layout profile (VERDICT r4 item 7).

Generates a synthetic metagenome READ LAYOUT (species x 2 strains with
divergent islands -> bubbles, strand-mixed reads, junk spur reads) and the
corresponding OverlapTable directly from the known coordinates (cross-
strain overlaps touching an island are omitted, emulating the SNP filter),
then runs the full post-overlap layout pipeline at several read counts:

  readsel.select_reads -> sg_arcs_from_hits -> miniasm_clean (per-pass
  timings via wrappers) -> unitigs -> unitig_seqs

and reports wall-clock per pass so superlinear host passes stand out.

Usage: python tools/profile_layout.py [n_reads ...]   (default 12500 25000 50000)
"""
import sys, time
from collections import defaultdict

sys.path.insert(0, "/root/repo")
import numpy as np

from hylight_tpu.assembly import readsel
from hylight_tpu.graph import string_graph as SG
from hylight_tpu.io.readset import ReadSet, revcomp_codes
from hylight_tpu.overlap.table import OverlapTable

READ_LEN = 8000
MIN_OVL = 2000
SPECIES_LEN = 2_000_000     # per strain
ISLAND_EVERY = 40_000
ISLAND_LEN = 3_000
COV = 8


def gen(n_reads, rng):
    n_strains = max(2, round(n_reads * READ_LEN / COV / SPECIES_LEN / 2) * 2)
    per_strain = n_reads // n_strains
    strains = []
    for sp in range(n_strains // 2):
        a = rng.integers(0, 4, SPECIES_LEN).astype(np.uint8)
        b = a.copy()
        for i0 in range(ISLAND_EVERY, SPECIES_LEN - ISLAND_LEN, ISLAND_EVERY):
            isl = np.arange(i0, i0 + ISLAND_LEN, 30)
            b[isl] = (b[isl] + 1) % 4
        strains.append(a)
        strains.append(b)

    seqs, starts, sid, flipped = [], [], [], []
    for s in range(n_strains):
        st = np.sort(rng.integers(0, SPECIES_LEN - READ_LEN, per_strain))
        for x in st:
            r = strains[s][x:x + READ_LEN]
            f = rng.random() < 0.4
            seqs.append(revcomp_codes(r).copy() if f else r.copy())
            starts.append(int(x)); sid.append(s); flipped.append(f)
    # junk spur reads: no overlaps, must be dropped cleanly
    for _ in range(max(50, n_reads // 100)):
        seqs.append(rng.integers(0, 4, READ_LEN).astype(np.uint8))
        starts.append(-1); sid.append(-1); flipped.append(False)
    rs = ReadSet.from_seqs(seqs)
    starts = np.array(starts); sid = np.array(sid)
    flipped = np.array(flipped)

    # overlaps from coordinates: same-species neighbours with span>=MIN_OVL;
    # cross-strain rows only when the span avoids every island
    rows_q, rows_t, rows_s = [], [], []
    rows = defaultdict(list)
    order = np.lexsort((starts, sid))
    order = order[sid[order] >= 0]
    qs_l, qe_l, ts_l, te_l, qid_l, tid_l, str_l = ([] for _ in range(7))
    by_species = defaultdict(list)
    for i in order:
        by_species[sid[i] // 2].append(i)
    for sp, idxs in by_species.items():
        idxs = sorted(idxs, key=lambda i: starts[i])
        st = np.array([starts[i] for i in idxs])
        for a_i in range(len(idxs)):
            for b_i in range(a_i + 1, len(idxs)):
                if st[b_i] - st[a_i] > READ_LEN - MIN_OVL:
                    break
                i, j = idxs[a_i], idxs[b_i]
                lo, hi = st[b_i], st[a_i] + READ_LEN
                if sid[i] != sid[j]:
                    k0 = (lo // ISLAND_EVERY) * ISLAND_EVERY
                    bad = False
                    for isl in range(k0, hi + 1, ISLAND_EVERY):
                        if isl + ISLAND_LEN > lo and isl < hi and isl > 0:
                            bad = True
                            break
                    if bad:
                        continue
                q_span = (lo - st[a_i], hi - st[a_i])
                t_span = (0, hi - lo)
                if flipped[i]:
                    q_span = (READ_LEN - q_span[1], READ_LEN - q_span[0])
                if flipped[j]:
                    t_span = (READ_LEN - t_span[1], READ_LEN - t_span[0])
                qid_l.append(i); tid_l.append(j)
                qs_l.append(q_span[0]); qe_l.append(q_span[1])
                ts_l.append(t_span[0]); te_l.append(t_span[1])
                str_l.append(int(flipped[i]) ^ int(flipped[j]))
    m = len(qid_l)
    ov = np.array(qe_l) - np.array(qs_l)
    table = OverlapTable(
        qid=np.array(qid_l, np.int32), tid=np.array(tid_l, np.int32),
        strand=np.array(str_l, np.int8),
        qs=np.array(qs_l, np.int32), qe=np.array(qe_l, np.int32),
        ts=np.array(ts_l, np.int32), te=np.array(te_l, np.int32),
        qlen=np.full(m, READ_LEN, np.int32), tlen=np.full(m, READ_LEN, np.int32),
        matches=(ov * 0.99).astype(np.int32), columns=ov.astype(np.int32),
        identity=np.full(m, 0.99, np.float32),
        score=ov.astype(np.float32),
        score2=np.full(m, 0.99, np.float32),
        score3=np.full(m, 0.99, np.float32))
    return rs, table, strains


TIMES = {}


def wrap(mod, name):
    orig = getattr(mod, name)

    def timed(*a, **kw):
        t0 = time.perf_counter()
        r = orig(*a, **kw)
        TIMES[name] = TIMES.get(name, 0.0) + time.perf_counter() - t0
        return r
    setattr(mod, name, timed)
    return orig


def main():
    sizes = [int(x) for x in sys.argv[1:]] or [12500, 25000, 50000]
    for n in sizes:
        rng = np.random.default_rng(1)
        t0 = time.perf_counter()
        rs, table, strains = gen(n, rng)
        t_gen = time.perf_counter() - t0
        TIMES.clear()
        origs = [(SG, nm, wrap(SG, nm)) for nm in
                 ("transitive_reduction", "cut_tips_asg", "pop_bubbles",
                  "arc_del_short", "cut_internal", "cut_biloop")]
        t0 = time.perf_counter()
        hits, sub = readsel.select_reads(
            table, rs.n, min_dp=1, min_span=2000, min_match=100,
            max_hang=1000, int_frac=0.8, min_ovlp=2000, min_iden=0.05)
        t_sel = time.perf_counter() - t0
        t0 = time.perf_counter()
        arcs = readsel.sg_arcs_from_hits(hits, sub, max_hang=1000,
                                         int_frac=0.8, min_ovlp=2000)
        t_arcs = time.perf_counter() - t0
        t0 = time.perf_counter()
        arcs, dropped = SG.miniasm_clean(arcs, max_ext=1, bub_dist=50000,
                                         n_rounds=1)
        t_clean = time.perf_counter() - t0
        t0 = time.perf_counter()
        utg = SG.unitigs(arcs, drop_reads=sub.deleted | dropped)
        trimmed = readsel.trimmed_reads(rs, sub)
        out = SG.unitig_seqs(utg, trimmed)
        t_utg = time.perf_counter() - t0
        for mod, nm, orig in origs:
            setattr(mod, nm, orig)
        lens = sorted(out.lengths.tolist(), reverse=True)
        cum = np.cumsum(lens) if lens else [0]
        n50 = lens[int(np.searchsorted(cum, cum[-1] / 2))] if lens else 0
        print(f"n_reads={rs.n} overlaps={table.n} gen={t_gen:.1f}s "
              f"select={t_sel:.2f}s arcs={t_arcs:.2f}s clean={t_clean:.2f}s "
              f"unitigs={t_utg:.2f}s -> {out.n} contigs, "
              f"{int(sum(lens)/1e6)} Mb, N50 {n50}", flush=True)
        print("  clean passes: " + " ".join(
            f"{k}={v:.2f}s" for k, v in sorted(TIMES.items())), flush=True)


if __name__ == "__main__":
    main()
