"""Pallas TPU kernel: per-pair overlap verification by diagonal compare.

Replaces the gather-heavy inner loop of the extend stage: instead of
gathering [P, A-1, G] scattered gap columns from HBM, each grid step DMAs
the pair's two read rows into VMEM once and verifies ALL equal-gap columns
with at most D_MAX vectorized diagonal-shift compares — HBM traffic drops
from ~P*A*G random bytes to 2 rows per pair, and the compare runs on the
VPU over full lanes.

Preparation (XLA, cheap): from the chain's anchors, every equal-size
inter-anchor gap lies on ONE diagonal d = at_i - aq_i; per pair we collect
the <= D_MAX distinct diagonals and a per-column slot map S[P, L] (which
diagonal applies at query column x, or -1). Gaps beyond the D_MAX budget are
counted as unverified (same contract as gap_tile overflow).

Kernel (grid = pairs):
  qbuf   <- seqs[qrow[p]]           (BlockSpec row via scalar prefetch)
  tbuf3  <- target row replicated x3 (circular shifts never select wrapped
            lanes: the slot map only marks columns with in-bounds partners)
  for j < D_MAX:  compare qbuf vs tbuf3[L - d_j + x], accumulate
      matches/columns where S == j, mark mismatch columns in a bitmap.

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


def _verify_kernel(qrow_ref, trow_ref, diagsf_ref, slots_ref, seqs_ref,
                   match_ref, cols_ref, mm_ref, qbuf, tbuf, t3buf, sems):
    L = slots_ref.shape[1]
    p = pl.program_id(0)

    # DMA the TILE pairs' rows from HBM into VMEM (all started up front)
    for i in range(TILE):
        qr = qrow_ref[p * TILE + i]
        tr = trow_ref[p * TILE + i]
        pltpu.make_async_copy(seqs_ref.at[pl.ds(qr, 1), :],
                              qbuf.at[pl.ds(i, 1), :], sems.at[i]).start()
        pltpu.make_async_copy(seqs_ref.at[pl.ds(tr, 1), :],
                              tbuf.at[pl.ds(i, 1), :],
                              sems.at[TILE + i]).start()
    for i in range(TILE):
        qr = qrow_ref[p * TILE + i]
        tr = trow_ref[p * TILE + i]
        pltpu.make_async_copy(seqs_ref.at[pl.ds(qr, 1), :],
                              qbuf.at[pl.ds(i, 1), :], sems.at[i]).wait()
        pltpu.make_async_copy(seqs_ref.at[pl.ds(tr, 1), :],
                              tbuf.at[pl.ds(i, 1), :],
                              sems.at[TILE + i]).wait()

    # triple each target row in scratch so diagonal shifts are dynamic
    # ref-slices (value-level dynamic_slice has no TPU lowering)
    for i in range(TILE):
        t = tbuf[i:i + 1, :]
        t3buf[i:i + 1, 0:L] = t
        t3buf[i:i + 1, L:2 * L] = t
        t3buf[i:i + 1, 2 * L:3 * L] = t

    for i in range(TILE):
        q = qbuf[i:i + 1, :]
        slots = slots_ref[i:i + 1, :]
        mm_acc = jnp.zeros((1, L), jnp.int8)
        m_acc = jnp.int32(0)
        c_acc = jnp.int32(0)
        for j in range(D_MAX):
            d = diagsf_ref[(p * TILE + i) * D_MAX + j]
            sel = slots == j
            tsh = t3buf[i:i + 1, pl.ds(L - d, L)]
            both = (q < 4) & (tsh < 4)
            eq = both & (q == tsh)
            use = sel & both
            m_acc = m_acc + jnp.sum((use & eq).astype(jnp.int32))
            c_acc = c_acc + jnp.sum(use.astype(jnp.int32))
            mm_acc = jnp.where(use & ~eq, jnp.int8(1), mm_acc)
        # vector stores only in VMEM: broadcast the scalar over the row
        match_ref[i:i + 1, :] = jnp.full((1, 128), m_acc, jnp.int32)
        cols_ref[i:i + 1, :] = jnp.full((1, 128), c_acc, jnp.int32)
        mm_ref[i:i + 1, :] = mm_acc


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

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,          # qrow, trow, diags (flat)
        grid=(P // TILE,),
        in_specs=[
            pl.BlockSpec((TILE, L), lambda p, qr, tr, df: (p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),         # seqs2 stays in HBM
        ],
        out_specs=[
            pl.BlockSpec((TILE, 128), lambda p, qr, tr, df: (p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 128), lambda p, qr, tr, df: (p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, L), lambda p, qr, tr, df: (p, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((TILE, L), jnp.uint8),
            pltpu.VMEM((TILE, L), jnp.uint8),
            pltpu.VMEM((TILE, 3 * L), jnp.uint8),
            pltpu.SemaphoreType.DMA((2 * TILE,)),
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
    )(qrow, trow, diags.reshape(-1), slots, seqs2)
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
