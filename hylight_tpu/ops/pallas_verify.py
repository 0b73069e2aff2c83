"""Pallas TPU kernel: per-pair overlap verification by diagonal compare.

Replaces the gather-heavy inner loop of the extend stage: instead of
gathering [P, A-1, G] scattered gap columns from HBM, each pair's two read
rows are row-gathered once (XLA, [P, L]) and the kernel verifies ALL
equal-gap columns with at most D_MAX vectorized diagonal-shift compares —
HBM traffic drops from ~P*A*G random bytes to 2 rows per pair, and the
compare runs on the VPU over full lanes.

Preparation (XLA, cheap): from the chain's anchors, every equal-size
inter-anchor gap lies on ONE diagonal d = at_i - aq_i; per pair we collect
the <= D_MAX distinct diagonals and a per-column slot map S[P, L] (which
diagonal applies at query column x, or -1). Gaps beyond the D_MAX budget are
counted as unverified (same contract as gap_tile overflow).

Kernel (grid = pair tiles):
  for each pair row i and slot j < D_MAX: compare the query block against
      pltpu.roll(target_block, d_ij) (whole-tile dynamic lane rotate —
      wrapped lanes are never selected, the slot map only marks columns
      with in-bounds partners), accumulate matches/columns where
      S == j on row i, mark mismatch columns in a bitmap.

Outputs: matches[P], columns[P], mismatch bitmap [P, L] (compacted to event
lists by the caller with top_k).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

D_MAX = 8
TILE = 8     # pairs per grid step (TPU blocks need a sublane dim >= 8)


def _verify_kernel(diagsf_ref, qseq_ref, tseq_ref, slots_ref,
                   match_ref, cols_ref, mm_ref):
    L = slots_ref.shape[1]
    p = pl.program_id(0)

    # full-tile ops only: Mosaic rejects 1-row slices/stores of 32-bit
    # tiles (sublane tiling 8) and dynamic rotates of non-32-bit data, so
    # the whole (TILE, L) block is cast once, rotated whole per (pair,
    # diagonal), and rows are selected by mask
    q32 = qseq_ref[:, :].astype(jnp.int32)
    t32 = tseq_ref[:, :].astype(jnp.int32)
    slots = slots_ref[:, :].astype(jnp.int32)  # i8 vector cmp unsupported
    rows = jax.lax.broadcasted_iota(jnp.int32, (TILE, L), 0)
    rows128 = jax.lax.broadcasted_iota(jnp.int32, (TILE, 128), 0)
    mm_acc = jnp.zeros((TILE, L), jnp.int32)
    m_mat = jnp.zeros((TILE, 128), jnp.int32)
    c_mat = jnp.zeros((TILE, 128), jnp.int32)
    for i in range(TILE):
        row_i = rows == i
        for j in range(D_MAX):
            d = diagsf_ref[(p * TILE + i) * D_MAX + j]
            # circular shift by the diagonal (tpu dynamic rotate; wrapped
            # lanes are never selected — the slot map only marks columns
            # with in-bounds partners)
            tsh = pltpu.roll(t32, d, axis=1)
            both = (q32 < 4) & (tsh < 4)
            eq = both & (q32 == tsh)
            use = (slots == j) & row_i & both
            m_mat = m_mat + jnp.where(
                rows128 == i, jnp.sum((use & eq).astype(jnp.int32)), 0)
            c_mat = c_mat + jnp.where(
                rows128 == i, jnp.sum(use.astype(jnp.int32)), 0)
            mm_acc = jnp.where(use & ~eq, 1, mm_acc)
    match_ref[:, :] = m_mat
    cols_ref[:, :] = c_mat
    mm_ref[:, :] = mm_acc.astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_gap_verify(qrow: jax.Array, trow: jax.Array, diags: jax.Array,
                      slots: jax.Array, seqs2: jax.Array,
                      interpret: bool = False
                      ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Run the verification kernel.

    qrow/trow: int32 [P] row indices into seqs2 ([2N, L]: forward rows then
      position-aligned revcomp rows). P must be a multiple of TILE.
    diags: int32 [P, D_MAX] shift per slot (clipped to [-L+1, L-1]).
    slots: int8 [P, L] per-column diagonal slot (-1 = unverified).
    Returns (matches [P], columns [P], mismatch bitmap [P, L] int8).
    """
    P = qrow.shape[0]
    L = seqs2.shape[1]
    assert P % TILE == 0, f"max_pairs must be a multiple of {TILE}"

    # per-pair row gather in XLA (fast [P, L] HBM row gather) — Mosaic
    # forbids dynamic single-row DMA slices of tiled int8 memrefs, so the
    # kernel receives already-gathered, normally-blocked rows
    qseq = jnp.take(seqs2, qrow, axis=0)
    tseq = jnp.take(seqs2, trow, axis=0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,          # diags (flat)
        grid=(P // TILE,),
        in_specs=[
            pl.BlockSpec((TILE, L), lambda p, df: (p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, L), lambda p, df: (p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, L), lambda p, df: (p, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE, 128), lambda p, df: (p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 128), lambda p, df: (p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, L), lambda p, df: (p, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    matches, cols, mm = pl.pallas_call(
        _verify_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((P, 128), jnp.int32),
            jax.ShapeDtypeStruct((P, 128), jnp.int32),
            jax.ShapeDtypeStruct((P, L), jnp.int8),
        ],
        interpret=interpret,
    )(diags.reshape(-1), qseq, tseq, slots)
    return matches[:, 0], cols[:, 0], mm


def build_slot_maps(ch, k: int, L: int):
    """XLA prep: per-pair diagonal table + per-column slot map from anchors.

    Returns (diags [P, D_MAX] int32, slots [P, L] int8, unverified [P] int32
    — columns of equal gaps that exceeded the D_MAX diagonal budget).
    """
    P, A = ch.aq.shape
    dq = ch.aq[:, 1:] - ch.aq[:, :-1]
    dt = ch.at[:, 1:] - ch.at[:, :-1]
    link = ch.amask[:, 1:]
    equal = link & (dq == dt) & (dq > k)
    gap = jnp.where(equal, dq - k, 0)
    diag_link = jnp.where(equal, ch.at[:, :-1] - ch.aq[:, :-1],
                          jnp.int32(1 << 30))

    # distinct diagonals per pair (row-sorted, first D_MAX kept)
    sd = jnp.sort(diag_link, axis=1)
    first = jnp.concatenate(
        [jnp.ones((P, 1), jnp.bool_), sd[:, 1:] != sd[:, :-1]], axis=1)
    is_new = first & (sd < (1 << 30))
    rank = jnp.cumsum(is_new.astype(jnp.int32), axis=1) - 1
    rows = jax.lax.broadcasted_iota(jnp.int32, sd.shape, 0)
    slot_w = jnp.where(is_new & (rank < D_MAX), rank, D_MAX)
    diags = jnp.full((P, D_MAX + 1), 0, jnp.int32).at[rows, slot_w].set(
        sd, mode="drop")[:, :D_MAX]

    # slot per link: index of its diagonal in diags (or -1)
    hit = diag_link[:, :, None] == diags[:, None, :]      # [P, A-1, D_MAX]
    any_hit = jnp.any(hit, axis=2) & equal
    link_slot = jnp.where(any_hit, jnp.argmax(hit, axis=2), -1) \
        .astype(jnp.int32)
    unverified = jnp.sum(jnp.where(equal & ~any_hit, gap, 0), axis=1)

    # per-column slot map: for column x, the link is the last anchor with
    # aq + k <= x (per-row searchsorted via take_along_axis on sorted aq)
    aq_k = jnp.where(ch.amask, ch.aq + k, jnp.int32(1 << 30))
    x = jnp.arange(L, dtype=jnp.int32)[None, :]
    # per-row searchsorted: which link's gap (if any) contains column x
    li = jax.vmap(lambda a, q: jnp.searchsorted(a, q, side="right",
                                                method="sort"))(
        aq_k, jnp.broadcast_to(x, (P, L))) - 1
    li_c = jnp.clip(li, 0, A - 2)
    in_gap = (li >= 0) & (li < A - 1)
    gstart = jnp.take_along_axis(ch.aq, li_c, axis=1) + k
    glen = jnp.take_along_axis(
        jnp.concatenate([gap, jnp.zeros((P, 1), gap.dtype)], axis=1),
        li_c, axis=1)
    cslot = jnp.take_along_axis(
        jnp.concatenate([link_slot, -jnp.ones((P, 1), jnp.int32)], axis=1),
        li_c, axis=1)
    ok = in_gap & (x >= gstart) & (x < gstart + glen)
    slots = jnp.where(ok, cslot, -1).astype(jnp.int8)

    # kernel shift: tshift[x] = t[x - d_kernel]; we need t[x + diag] =>
    # d_kernel = -diag, clipped for the 3L window
    d_kernel = jnp.clip(-diags, -(L - 1), L - 1)
    return d_kernel, slots, unverified


@functools.partial(jax.jit, static_argnames=("k",))
def make_seqs2(seqs: jax.Array, lens: jax.Array, *, k: int = 0) -> jax.Array:
    """[N, L] forward rows -> [2N, L]: forward rows then position-aligned
    revcomp rows (rc row column j == revcomp(read)[j])."""
    N, L = seqs.shape
    j = jnp.arange(L, dtype=jnp.int32)[None, :]
    idx = jnp.clip(lens[:, None] - 1 - j, 0, L - 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (N, L), 0)
    b = seqs[rows, idx]
    rc = jnp.where((j < lens[:, None]) & (b < 4), 3 - b, 4).astype(seqs.dtype)
    return jnp.concatenate([seqs, rc], axis=0)


@functools.partial(jax.jit, static_argnames=("k", "max_mismatch",
                                             "interpret"))
def extend_chains_pallas(ch, seqs2: jax.Array, *, k: int, max_mismatch: int,
                         interpret: bool = False):
    """Pallas-backed drop-in for extend.extend_chains (higher fidelity: all
    equal-gap columns are verified, no gap_tile cap)."""
    from hylight_tpu.overlap.extend import Extensions

    P, A = ch.aq.shape
    N2, L = seqs2.shape
    N = N2 // 2
    S = max_mismatch

    diags_k, slots, _ = build_slot_maps(ch, k, L)
    qrow = jnp.clip(jnp.where(ch.valid, ch.qid, 0), 0, N - 1)
    trow = jnp.clip(jnp.where(ch.valid, ch.tid, 0), 0, N - 1) \
        + ch.strand.astype(jnp.int32) * N

    m_gap, c_gap, mm = pallas_gap_verify(qrow, trow, diags_k, slots, seqs2,
                                         interpret=interpret)

    dq = ch.aq[:, 1:] - ch.aq[:, :-1]
    dt = ch.at[:, 1:] - ch.at[:, :-1]
    link = ch.amask[:, 1:]
    equal = link & (dq == dt) & (dq > k)
    gap_total = jnp.sum(jnp.where(equal, dq - k, 0), axis=1)
    uneq = link & (dq != dt)
    unverified = jnp.sum(jnp.where(
        uneq, jnp.minimum(dq, dt) - jnp.minimum(jnp.minimum(dq, dt), k), 0),
        axis=1) + (gap_total - c_gap)
    indels = jnp.sum(jnp.where(uneq, jnp.abs(dq - dt), 0), axis=1)

    matches = ch.score + jnp.where(ch.valid, m_gap, 0)
    ver_cols = ch.score + jnp.where(ch.valid, c_gap, 0)

    m = matches.astype(jnp.float32)
    c = jnp.maximum(ver_cols, 1).astype(jnp.float32)
    u = unverified.astype(jnp.float32)
    g = indels.astype(jnp.float32)
    identity = (m + u * (m / c)) / (c + u + g)
    identity = jnp.where(ch.valid, identity, 0.0)

    # mismatch events from the bitmap
    xcol = jax.lax.broadcasted_iota(jnp.int32, (P, L), 1)
    key = jnp.where((mm > 0) & ch.valid[:, None], -xcol,
                    jnp.int32(-(1 << 30)))
    topv, topi = jax.lax.top_k(key, S)
    ok = topv > jnp.int32(-(1 << 30))
    prow = jax.lax.broadcasted_iota(jnp.int32, (P, S), 0)
    qpos = jnp.where(ok, topi, -1)
    slot_at = slots[prow, jnp.maximum(topi, 0)].astype(jnp.int32)
    diag = -diags_k[prow, jnp.clip(slot_at, 0, D_MAX - 1)]
    tpos_adj = topi + diag
    qb = seqs2[qrow[:, None], jnp.maximum(topi, 0)]
    tb_adj = seqs2[trow[:, None], jnp.clip(tpos_adj, 0, L - 1)]
    strand = ch.strand[:, None]
    tlen = ch.tlen[:, None]
    tpos_fwd = jnp.where(strand == 1, tlen - 1 - tpos_adj, tpos_adj)
    tb_fwd = jnp.where((strand == 1) & (tb_adj < 4), 3 - tb_adj, tb_adj)
    mm_n = jnp.sum((mm > 0).astype(jnp.int32), axis=1)

    return Extensions(
        matches=matches, columns=ver_cols, unverified=unverified,
        indels=indels, identity=identity,
        mm_q=qpos,
        mm_t=jnp.where(ok, tpos_fwd, -1),
        mm_qb=jnp.where(ok, qb, 4).astype(jnp.int8),
        mm_tb=jnp.where(ok, tb_fwd, 4).astype(jnp.int8),
        mm_n=jnp.where(ch.valid, mm_n, 0),
        mm_mask=ok & ch.valid[:, None],
    )
