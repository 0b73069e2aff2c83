"""Per-base phred Bayesian overlap scoring (EdgeCalculator.cpp:26-139).

The reference scores every overlap by walking its (ungapped — SAVAGE
overlaps carry no gaps) aligned columns: per column, with base error
probabilities p1/p2 from both reads' phreds,

  match      p = (1-p1)(1-p2) + p1*p2/3
  mismatch   p = p1(1-p2)/3 + p2(1-p1)/3 + (2/9) p1 p2
  N column   skipped entirely (score() returns 1, EdgeCalculator.cpp:35-39)

overlap score = exp(mean log p) over the non-N columns; mismatch_rate =
mismatches / non-N columns (``overlap_score()``, :67-139). A per-column
probability floor (program_settings.mismatch, default 0 on the active
path) zeroes the whole overlap.

This op reproduces that math exactly as one vectorized device program over
padded sequence/qual matrices, replacing round-1's per-read mean-error
approximation (VERDICT.md missing #3).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("Lcap",))
def _score_block(qrow, trow, qs, ts_adj, ovlen, strand, tlen,
                 seqs, quals, min_prob, *, Lcap: int):
    """Exact ungapped column walk for one block of overlaps.

    qs/ts_adj: overlap starts (query forward frame / target strand-adjusted
    frame); ovlen: aligned columns; seqs/quals: [N, L] padded matrices.
    Returns (score [P], mismatch_rate [P]).
    """
    j = jnp.arange(Lcap, dtype=jnp.int32)[None, :]
    L = seqs.shape[1]
    qpos = qs[:, None] + j
    tpos_adj = ts_adj[:, None] + j
    t_fwd = jnp.where(strand[:, None] == 1,
                      tlen[:, None] - 1 - tpos_adj, tpos_adj)
    qidx = jnp.clip(qpos, 0, L - 1)
    tidx = jnp.clip(t_fwd, 0, L - 1)
    qb = seqs[qrow[:, None], qidx]
    tb_raw = seqs[trow[:, None], tidx]
    tb = jnp.where((strand[:, None] == 1) & (tb_raw < 4), 3 - tb_raw, tb_raw)
    q1 = quals[qrow[:, None], qidx].astype(jnp.float32)
    q2 = quals[trow[:, None], tidx].astype(jnp.float32)

    incol = (j < ovlen[:, None]) & (qpos < L) & (t_fwd >= 0) & (t_fwd < L)
    non_n = incol & (qb < 4) & (tb < 4)
    p1 = jnp.power(10.0, -q1 / 10.0)
    p2 = jnp.power(10.0, -q2 / 10.0)
    p_match = (1.0 - p1) * (1.0 - p2) + p1 * p2 / 3.0
    p_mis = p1 * (1.0 - p2) / 3.0 + p2 * (1.0 - p1) / 3.0 + (2.0 / 9.0) \
        * p1 * p2
    is_mis = non_n & (qb != tb)
    p = jnp.where(is_mis, p_mis, p_match)
    logp = jnp.log(jnp.maximum(p, 1e-30))
    total = jnp.sum(jnp.where(non_n, logp, 0.0), axis=1)
    cols = jnp.sum(non_n, axis=1)
    mism = jnp.sum(is_mis, axis=1)
    floored = jnp.any(non_n & (p < min_prob), axis=1)
    score = jnp.where((cols > 0) & ~floored,
                      jnp.exp(total / jnp.maximum(cols, 1)), 0.0)
    rate = jnp.where(cols > 0, mism / jnp.maximum(cols, 1), 1.0)
    return score, rate


def phred_edge_scores(table, reads, *, default_phred: int = 30,
                      min_prob: float = 0.0, block: int = 8192
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """Score every overlap of ``table`` with the exact per-base math.

    reads: ReadSet whose rows are the table's qid/tid space. Reads without
    quals use ``default_phred`` everywhere (polyte feeds fake-phred 'I'
    contig fastqs the same way, HyLight.py:284-307).
    Returns (score [O], mismatch_rate [O]).
    """
    from hylight_tpu.overlap.engine import bucket_len

    if table.n == 0:
        return np.zeros(0), np.ones(0)
    L = bucket_len(int(reads.lengths.max(initial=1)))
    seqs_np, lens_np = reads.to_padded(max_len=L)
    if reads.qual is not None:
        quals_np = np.full((reads.n, L), default_phred, dtype=np.uint8)
        for i in range(reads.n):
            q = reads.get_qual(i)
            if q is not None:
                quals_np[i, :len(q)] = q
    else:
        quals_np = np.full((reads.n, L), default_phred, dtype=np.uint8)
    seqs = jnp.asarray(seqs_np)
    quals = jnp.asarray(quals_np)

    ts_adj = table.ts_adj().astype(np.int32)
    ovlen = np.minimum(table.qe - table.qs,
                       table.te - table.ts).astype(np.int32)
    Lcap = bucket_len(max(int(ovlen.max(initial=1)), 1))

    out_s = np.zeros(table.n)
    out_r = np.ones(table.n)
    for lo in range(0, table.n, block):
        hi = min(lo + block, table.n)
        pad = block - (hi - lo)

        def _arr(x, fill=0):
            a = np.asarray(x[lo:hi], dtype=np.int32)
            return jnp.asarray(np.pad(a, (0, pad), constant_values=fill))

        s, r = _score_block(_arr(table.qid), _arr(table.tid),
                            _arr(table.qs), _arr(ts_adj), _arr(ovlen),
                            _arr(table.strand), _arr(table.tlen),
                            seqs, quals, jnp.float32(min_prob), Lcap=Lcap)
        out_s[lo:hi] = np.asarray(s)[:hi - lo]
        out_r[lo:hi] = np.asarray(r)[:hi - lo]
    return out_s, out_r
