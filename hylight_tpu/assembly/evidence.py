"""Statistical read-evidence thresholds for branch reduction.

Faithful reimplementation of ``script/min_ev_table.py`` (reference :31-153):
for each variant distance d, the expected read evidence is

  exp_ev(d) = hcov * max(0, L - d)/L                      (single-end)
            + hcov * sum_x P(insert spans [x, x+d])/L     (paired-end,
              normal CDF over the internal-segment distribution)

and the minimum evidence threshold min_ev(exp_ev) is the smallest m such
that the binomial tail P(X >= m | n=exp_ev, p=seq_err) <= accuracy.
Consumed by the short-read core's branch reduction (BranchReduction.cpp).
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import Dict, List, Tuple

import numpy as np
from scipy.stats import norm


def evidence_table(*, readlen: float, intseg: float, stddev: float,
                   hcov: float, seq_err: float = 0.01,
                   accuracy: float = 1e-3) -> Dict[int, Tuple[int, int]]:
    """dist -> (exp_ev, min_ev). intseg = insert_size - 2*readlen."""
    fragsize = intseg + 2 * readlen
    assert fragsize > 0
    dist = 1
    exp_ev_list: List[int] = []
    nd = norm(intseg, stddev)

    xs = np.arange(0, int(math.floor(readlen)))
    while True:
        ev = hcov * max(0.0, readlen - dist) / readlen
        p1 = nd.cdf(dist - 2 * readlen + xs + 1)
        p2 = nd.cdf(dist - readlen + xs)
        ev += hcov * float(np.sum(p2 - p1)) / readlen
        ev = int(math.floor(ev))
        exp_ev_list.append(ev)
        if ev == 0:
            break
        dist += 1
        if dist > fragsize + 2 * stddev:
            break

    ev_to_threshold: Dict[int, int] = {}
    min_ev = 1
    for ev in sorted(set(exp_ev_list)):
        min_ev = _find_min_ev(ev, min_ev, seq_err, accuracy)
        ev_to_threshold[ev] = min_ev

    return {i + 1: (ev, ev_to_threshold[ev])
            for i, ev in enumerate(exp_ev_list)}


def _find_min_ev(c: int, m1: int, seq_err: float, accuracy: float) -> int:
    def tail(m_start: int) -> float:
        return sum(math.comb(c, m) * seq_err ** m * (1 - seq_err) ** (c - m)
                   for m in range(m_start, c))

    p = tail(m1)
    while p > accuracy:
        m1 += 1
        p = tail(m1)
    return m1


class EvidenceThresholds:
    """Lookup helper: min required unique evidence at a given distance."""

    def __init__(self, table: Dict[int, Tuple[int, int]]):
        self.table = table
        self.max_dist = max(table) if table else 0

    @staticmethod
    def from_config(sr_cfg) -> "EvidenceThresholds":
        intseg = sr_cfg.insert_size - 2 * sr_cfg.average_read_len
        return EvidenceThresholds(evidence_table(
            readlen=sr_cfg.average_read_len, intseg=intseg,
            stddev=sr_cfg.stddev, hcov=sr_cfg.hap_cov,
            seq_err=sr_cfg.seq_err, accuracy=sr_cfg.accuracy))

    def min_ev(self, dist: int) -> int:
        """Beyond the table, no evidence is expected -> threshold 0 keeps
        the edge undeletable-by-absence (reference keeps such edges)."""
        if dist in self.table:
            return self.table[dist][1]
        return 0
