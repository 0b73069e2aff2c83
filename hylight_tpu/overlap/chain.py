"""Colinear chain refinement on dense per-pair anchor windows.

Given the [P, A] anchor matrices from seed.group_candidates (anchors of one
diagonal-band window, sorted by qpos), this stage:

1. filters to a monotone colinear subsequence (tpos must be a running max —
   anchors off the chain, e.g. from hash collisions or tandem repeats inside
   the band window, are dropped);
2. compacts kept anchors to the row prefix;
3. computes the exact chain score sum(min(dq, dt, k)) — the count of query
   bases covered by chained k-mers, the same quantity minimap2's chain DP
   maximizes (and what the reference's ``-m 100`` threshold filters on,
   ``filter_overlap_slr2.py:51``);
4. derives the overlap extent (qs,qe,ts,te in the pair's shared frame).

This replaces minimap2's O(n*h) sequential chaining DP: the diagonal-band
vote already isolated a single colinear cluster, so refinement is pure
elementwise/cumulative work — no scan, no sequential dependency.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from hylight_tpu.overlap.seed import Candidates

INT_MAX = np.int32(0x7FFFFFFF)


class Chains(NamedTuple):
    """Refined colinear chains (one per surviving candidate pair)."""

    qid: jax.Array      # int32 [P]
    tid: jax.Array      # int32 [P]
    strand: jax.Array   # int32 [P]
    qlen: jax.Array     # int32 [P]
    tlen: jax.Array     # int32 [P]
    qs: jax.Array       # int32 [P] overlap extent on query
    qe: jax.Array       # int32 [P] (exclusive, includes k of last anchor)
    ts: jax.Array       # int32 [P] extent on (strand-adjusted) target
    te: jax.Array       # int32 [P]
    n_anchors: jax.Array  # int32 [P] kept anchors
    score: jax.Array    # int32 [P] chained query bases (chain score)
    valid: jax.Array    # bool  [P]
    aq: jax.Array       # int32 [P, A] kept anchor qpos, compacted to prefix
    at: jax.Array       # int32 [P, A]
    amask: jax.Array    # bool  [P, A]


@functools.partial(jax.jit, static_argnames=("k", "min_score", "max_gap"))
def refine_chains(c: Candidates, *, k: int, min_score: int,
                  max_gap: int) -> Chains:
    P, A = c.aq.shape
    aq, at, amask = c.aq, c.at, c.amask

    # keep anchors whose tpos is a strict running max (first of ties wins)
    big_neg = jnp.int32(-(1 << 30))
    t_for_max = jnp.where(amask, at, big_neg)
    cm = jax.lax.cummax(t_for_max, axis=1)
    prev_cm = jnp.concatenate(
        [jnp.full((P, 1), big_neg, jnp.int32), cm[:, :-1]], axis=1)
    kept = amask & (t_for_max > prev_cm)

    # also drop duplicate qpos (two target hits for one query k-mer can't
    # both be on the chain): keep first occurrence of each qpos
    prev_q = jnp.concatenate(
        [jnp.full((P, 1), -1, jnp.int32), aq[:, :-1]], axis=1)
    kept = kept & (aq != prev_q)

    # compact kept anchors to the row prefix via ONE keyed row sort
    # (row-wise scatters serialize badly on TPU; a [P, A] 3-operand sort
    # is the fast primitive — see CLAUDE.md micro facts)
    colA = jax.lax.broadcasted_iota(jnp.int32, (P, A), 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (P, A), 0)
    sortkey = jnp.where(kept, colA, A + colA)   # kept first, original order
    _, caq, cat = jax.lax.sort((sortkey, aq, at), num_keys=1, dimension=1,
                               is_stable=False)
    n = jnp.sum(kept, axis=1).astype(jnp.int32)
    cmask = colA < n[:, None]
    caq = jnp.where(cmask, caq, INT_MAX)
    cat = jnp.where(cmask, cat, INT_MAX)

    # chain score: k for the first anchor + min(dq, dt, k) per link;
    # links longer than max_gap contribute 0 (broken chain segment)
    dq = caq[:, 1:] - caq[:, :-1]
    dt = cat[:, 1:] - cat[:, :-1]
    link_ok = cmask[:, 1:] & (dq <= max_gap) & (dt <= max_gap)
    link = jnp.where(link_ok, jnp.minimum(jnp.minimum(dq, dt), k), 0)
    score = jnp.where(n > 0, k + jnp.sum(link, axis=1), 0)

    qs = jnp.where(n > 0, caq[:, 0], 0)
    ts = jnp.where(n > 0, cat[:, 0], 0)
    last = jnp.maximum(n - 1, 0)
    qe = jnp.where(n > 0, caq[rows[:, 0], last] + k, 0)
    te = jnp.where(n > 0, cat[rows[:, 0], last] + k, 0)

    valid = c.valid & (score >= min_score) & (n >= 2)
    return Chains(qid=c.qid, tid=c.tid, strand=c.strand, qlen=c.qlen,
                  tlen=c.tlen, qs=qs, qe=qe, ts=ts, te=te, n_anchors=n,
                  score=score, valid=valid, aq=caq, at=cat, amask=cmask)
