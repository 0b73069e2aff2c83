"""Anchor-skeleton extension: base-level verification of chained overlaps.

The reference obtains per-base overlap info by having minimap2 produce full
``--eqx`` CIGARs which are then re-parsed in Python (SNP scan
``filter_overlap_slr2.py:289-367``, identity/score rescoring ``:142-152``).
Here the chain's exact k-mer anchors already pin the alignment skeleton, so
base-level work reduces to verifying the short inter-anchor gaps:

- equal-size gaps (dq == dt): pure substitution columns — direct vectorized
  base compare gives matches AND the mismatch coordinates the SNP filter
  needs (no CIGAR text ever exists, per SURVEY.md §7.4);
- unequal gaps: contain indels; their min(gq, gt) columns are counted as
  unverified and |gq - gt| bases as indels (a banded Pallas DP upgrade can
  verify these too; for identity-gating purposes the extrapolated estimate
  below is already well-calibrated for corrected reads);
- anchor k-mers: exact matches by construction (chain score bases).

Identity estimate: verified-match rate extrapolated over unverified columns,
discounted by indel bases:
  id = (m_v + u * m_v / c_v) / (c_v + u + g)
where m_v/c_v = verified matches/columns, u = unverified columns, g = indels.

Mismatch (candidate SNP) events are emitted as [P, S] coordinate pairs in
FORWARD coordinates of both reads — directly consumable by the pileup-based
cross-strain filter (snp.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from hylight_tpu.overlap.chain import Chains

INT_MAX = np.int32(0x7FFFFFFF)


class Extensions(NamedTuple):
    matches: jax.Array      # int32 [P] verified matching columns (incl anchors)
    columns: jax.Array      # int32 [P] verified columns
    unverified: jax.Array   # int32 [P] aligned columns not base-checked
    indels: jax.Array       # int32 [P] |dq-dt| summed over links
    identity: jax.Array     # float32 [P] extrapolated identity estimate
    mm_q: jax.Array         # int32 [P, S] mismatch column qpos (fwd coords)
    mm_t: jax.Array         # int32 [P, S] mismatch column tpos (fwd coords)
    mm_qb: jax.Array        # int8 [P, S] query base at the column
    mm_tb: jax.Array        # int8 [P, S] target base at the column
    mm_n: jax.Array         # int32 [P] mismatch count (may exceed S; capped)
    mm_mask: jax.Array      # bool [P, S]


def _gather_q(seqs, qid, pos, in_bounds):
    idx = jnp.clip(pos, 0, seqs.shape[1] - 1)
    return jnp.where(in_bounds, seqs[qid, idx], 4)


def _gather_t(seqs, tid, pos, strand, tlen, in_bounds):
    """Base of target read at strand-adjusted position (4 outside/N)."""
    fwd = jnp.where(strand[..., None] == 1, tlen[..., None] - 1 - pos, pos)
    idx = jnp.clip(fwd, 0, seqs.shape[1] - 1)
    b = seqs[tid, idx]
    b = jnp.where((strand[..., None] == 1) & (b < 4), 3 - b, b)
    return jnp.where(in_bounds & (fwd >= 0) & (fwd < seqs.shape[1]), b, 4)


@functools.partial(jax.jit, static_argnames=("k", "gap_tile", "max_mismatch"))
def extend_chains(ch: Chains, seqs: jax.Array, *, k: int, gap_tile: int,
                  max_mismatch: int) -> Extensions:
    """Verify inter-anchor gaps of every chained pair.

    Args:
      ch: refined chains (anchors compacted to row prefixes).
      seqs: uint8 [N_reads, L] global padded forward base matrix; both qid
        and tid index into it.
      k: anchor k-mer length.
      gap_tile: max columns verified per gap (G).
      max_mismatch: static cap S on emitted mismatch events per pair.
    """
    P, A = ch.aq.shape
    G, S = gap_tile, max_mismatch

    dq = ch.aq[:, 1:] - ch.aq[:, :-1]             # [P, A-1]
    dt = ch.at[:, 1:] - ch.at[:, :-1]
    link = ch.amask[:, 1:]
    equal = link & (dq == dt) & (dq > k)
    gap = jnp.where(equal, dq - k, 0)             # equal-gap length
    uneq = link & (dq != dt)
    unverified = jnp.sum(jnp.where(uneq, jnp.minimum(dq, dt) - jnp.minimum(
        jnp.minimum(dq, dt), k), 0), axis=1) \
        + jnp.sum(jnp.maximum(gap - G, 0), axis=1)
    indels = jnp.sum(jnp.where(uneq, jnp.abs(dq - dt), 0), axis=1)

    # gather the gap columns: [P, A-1, G]
    j = jnp.arange(G, dtype=jnp.int32)[None, None, :]
    q0 = (ch.aq[:, :-1] + k)[..., None] + j
    t0 = (ch.at[:, :-1] + k)[..., None] + j
    incol = (j < jnp.minimum(gap, G)[..., None]) & equal[..., None]
    qb = _gather_q(seqs, ch.qid[:, None, None], q0, incol)
    tb = _gather_t(seqs, ch.tid[:, None, None], t0, ch.strand[:, None],
                   ch.tlen[:, None], incol)

    both_acgt = (qb < 4) & (tb < 4) & incol
    eq = both_acgt & (qb == tb)
    mm = both_acgt & (qb != tb)

    ver_cols = ch.score + jnp.sum(both_acgt, axis=(1, 2)).astype(jnp.int32)
    matches = ch.score + jnp.sum(eq, axis=(1, 2)).astype(jnp.int32)
    # N columns inside equal gaps are neither matched nor mismatched:
    # fold them into unverified
    n_cols = jnp.sum(incol & ~both_acgt, axis=(1, 2)).astype(jnp.int32)
    unverified = unverified + n_cols

    m = matches.astype(jnp.float32)
    c = jnp.maximum(ver_cols, 1).astype(jnp.float32)
    u = unverified.astype(jnp.float32)
    g = indels.astype(jnp.float32)
    identity = (m + u * (m / c)) / (c + u + g)
    identity = jnp.where(ch.valid, identity, 0.0)

    # compact mismatch events to [P, S]; emit forward coordinates
    mmf = mm.reshape(P, -1)
    qpos_f = q0.reshape(P, -1)
    tpos_adj = t0.reshape(P, -1)
    tpos_fwd = jnp.where(ch.strand[:, None] == 1,
                         ch.tlen[:, None] - 1 - tpos_adj, tpos_adj)
    qb_f = qb.reshape(P, -1)
    tb_f = tb.reshape(P, -1)
    # base pair in forward target frame: complement if '-' strand
    tb_fwd = jnp.where((ch.strand[:, None] == 1) & (tb_f < 4), 3 - tb_f, tb_f)

    # compact the first S mismatch events per row via top_k (row-wise
    # scatters serialize badly on TPU)
    M = mmf.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (P, M), 1)
    key = jnp.where(mmf, -col, jnp.int32(-(1 << 30)))
    topv, topi = jax.lax.top_k(key, S)          # earliest columns first
    sel_ok = topv > jnp.int32(-(1 << 30))
    prow = jax.lax.broadcasted_iota(jnp.int32, (P, S), 0)

    def compact(x, fill, dtype):
        return jnp.where(sel_ok, x[prow, topi].astype(dtype),
                         jnp.asarray(fill, dtype))

    mm_q = compact(qpos_f, -1, jnp.int32)
    mm_t = compact(tpos_fwd, -1, jnp.int32)
    mm_qb = compact(qb_f, 4, jnp.int8)
    mm_tb = compact(tb_fwd, 4, jnp.int8)
    mm_n = jnp.sum(mmf, axis=1).astype(jnp.int32)
    mm_mask = jax.lax.broadcasted_iota(jnp.int32, (P, S), 1) < \
        jnp.minimum(mm_n, S)[:, None]

    return Extensions(matches=matches, columns=ver_cols,
                      unverified=unverified, indels=indels,
                      identity=identity, mm_q=mm_q, mm_t=mm_t,
                      mm_qb=mm_qb, mm_tb=mm_tb, mm_n=mm_n, mm_mask=mm_mask)
