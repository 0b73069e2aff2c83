"""SNP-aware cross-strain overlap rejection.

Reimplements the strain-separation core of the reference's overlap filter
(``filter_overlap_slr2.py``: ``prpare_mutation2()`` ``:289-367``,
``mutation_re()`` ``:370-405``, kill rule ``:90-100``):

- every mismatch RUN of every overlap votes "variant support" for BOTH
  sides' (read, position) columns at the run's last-in-alignment column
  (the reference parses --eqx CIGARs, where an n-base X operation is one
  event keyed by its cumulative end position, :340-360; here the extend
  stage emitted per-column events — maximal runs of alignment-adjacent
  columns are collapsed to their final column to match);
- a column is a REAL SNP iff >= mc overlaps support the variant AND
  >= mc overlaps span the column agreeing with the read (contradiction =
  strict-interior coverage minus support; the reference's interior test
  ``p[0] < pos < p[1]`` on end-of-run keys = columns [start, end-2] in
  0-based coordinates, :382-392);
- long-read mode: an overlap is killed when its real-SNP events per matched
  base exceed ``max_snp_frac`` (0.0025); short-read mode kills on ANY
  real-SNP event (reference ``:97-100``).

Runs on the host at a stage boundary: event counts are tiny next to the
alignment work, and the computation is two sorts + difference arrays.
Note: mismatch events beyond the static per-overlap cap S are truncated by
the extend stage, which can only *under*-kill (conservative).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from hylight_tpu.overlap.table import OverlapTable


def snp_filter(table: OverlapTable, *, mc: int, max_frac: float,
               long_reads: bool = True) -> np.ndarray:
    """Returns a keep-mask over the table's overlaps."""
    O = table.n
    if O == 0:
        return np.zeros(0, dtype=bool)
    assert table.mm_q is not None, "table lacks mismatch columns"

    # Collapse maximal runs of adjacent mismatch columns to the run's
    # CIGAR-walk end column (the reference counts an n-base X op once, at
    # its cumulative end position).  Event slots are in q-ascending order
    # (extend's emission frame); a run steps q by +1 and forward-frame t by
    # +1 on '+' rows / -1 on '-' rows.  The CIGAR walks target-forward, so
    # its run END is the last slot on '+' rows but the FIRST slot on '-'
    # rows (where q-ascending is the reverse of the walk).
    mask = np.asarray(table.mm_mask).copy()
    minus = (np.asarray(table.strand) == 1)[:, None]
    tstep = np.where(minus, -1, 1)
    cont = (mask[:, 1:] & mask[:, :-1]
            & (table.mm_q[:, 1:] == table.mm_q[:, :-1] + 1)
            & (table.mm_t[:, 1:] == table.mm_t[:, :-1] + tstep))
    mask[:, :-1] &= ~(cont & ~minus)
    mask[:, 1:] &= ~(cont & minus)
    oidx = np.broadcast_to(np.arange(O, dtype=np.int64)[:, None], mask.shape)

    # events: (overlap, read, pos) for both sides of each mismatch column
    ev_o = np.concatenate([oidx[mask], oidx[mask]])
    ev_read = np.concatenate([
        np.broadcast_to(table.qid[:, None], mask.shape)[mask],
        np.broadcast_to(table.tid[:, None], mask.shape)[mask],
    ]).astype(np.int64)
    ev_pos = np.concatenate([table.mm_q[mask], table.mm_t[mask]]) \
        .astype(np.int64)

    if ev_o.size == 0:
        return np.ones(O, dtype=bool)

    M = int(max(table.qlen.max(), table.tlen.max())) + 2
    ev_key = ev_read * M + ev_pos

    cols, inv, support = np.unique(ev_key, return_inverse=True,
                                   return_counts=True)

    # strict-interior coverage of each column by overlap extents (both sides)
    iv_read = np.concatenate([table.qid, table.tid]).astype(np.int64)
    iv_s = np.concatenate([table.qs, table.ts]).astype(np.int64)
    iv_e = np.concatenate([table.qe, table.te]).astype(np.int64)
    lo = np.searchsorted(cols, iv_read * M + iv_s, side="left")
    hi = np.searchsorted(cols, iv_read * M + iv_e - 2, side="right")
    diff = np.zeros(len(cols) + 1, dtype=np.int64)
    np.add.at(diff, lo, 1)
    np.add.at(diff, hi, -1)
    coverage = np.cumsum(diff[:-1])

    real = (support >= mc) & ((coverage - support) >= mc)

    weight = np.zeros(O, dtype=np.int64)
    np.add.at(weight, ev_o, real[inv].astype(np.int64))

    if long_reads:
        frac = weight / np.maximum(table.matches, 1)
        return frac <= max_frac
    return weight == 0


def snp_filter_mapped(table: OverlapTable, *, n_query_ids: int, mc: int,
                      max_frac: float, long_reads: bool = True
                      ) -> np.ndarray:
    """snp_filter for SET-VS-SET tables (read -> contig mappings).

    qid and tid index DIFFERENT id spaces there; shifting target ids past
    the query space keeps the two pileups from colliding. This is the
    filter the reference applies to every read->contig PAF before racon
    and before pick_up (``HyLight.py:149`` ov_long_ref.paf with mc=2,
    ``:200`` shortr1.paf with mc=3 killing cross-strain pairs outright).
    """
    if table.n == 0:
        return np.zeros(0, dtype=bool)
    shifted = dataclasses.replace(
        table, tid=table.tid.astype(np.int64) + int(n_query_ids))
    return snp_filter(shifted, mc=mc, max_frac=max_frac,
                      long_reads=long_reads)
