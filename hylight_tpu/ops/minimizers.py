"""Vectorized minimizer extraction (the seeding stage of the overlap engine).

Replaces minimap2's sketch step (invoked by the reference at
``filter_overlap_slr2.py:51,55``) with a fully data-parallel formulation:

1. rolling 2-bit k-mer codes for both strands (k <= 16 -> uint32), built by a
   k-step unrolled shift-accumulate over the padded [B, L] base matrix — no
   per-position Python loops, XLA fuses the whole thing;
2. canonical hashing: murmur3-style 32-bit finalizer of both strand codes,
   canonical hash = min, strand = argmin (palindromic k-mers, where both
   hashes collide, are dropped — same ambiguity rule as minimap2's sketch);
3. winnowing by two ``lax.reduce_window`` passes: ``wmin[j] = min(h[j:j+w])``
   then ``sel[i] = (max_{j in [i-w+1, i]} wmin[j]) == h[i]`` — exactly "i is
   the minimum of some window containing i", i.e. classic winnowing with
   ties-keep-all. Windows are clipped at read boundaries, so terminal k-mers
   are always selected (end-minimizers improve dovetail-overlap seeding).
4. scatter-compaction into fixed [B, cap] arrays (static shapes for jit).

Everything here is jit-friendly: static k/w/cap, no data-dependent shapes.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# NOTE: reduce_window init values must be *static* numpy scalars (a traced
# jnp scalar fails the monoid-reducer check under jit in jax 0.9).
UINT_MAX = np.uint32(0xFFFFFFFF)


class MinimizerSet(NamedTuple):
    """Per-read capped minimizer lists (invalid slots: hash=UINT_MAX, pos=-1)."""

    hash: jax.Array    # uint32 [B, cap]
    pos: jax.Array     # int32  [B, cap] k-mer start position (forward strand)
    strand: jax.Array  # int8   [B, cap] 0 = canonical is forward, 1 = reverse
    count: jax.Array   # int32  [B] number of valid entries (<= cap)


def mix32(x: jax.Array) -> jax.Array:
    """murmur3 fmix32 — invertible 32-bit mixer (uint32 modular arithmetic)."""
    x = x.astype(jnp.uint32)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return x


def _window_reduce(x: jax.Array, w: int, op, init, pad_left: int, pad_right: int):
    return jax.lax.reduce_window(
        x, init, op,
        window_dimensions=(1, w),
        window_strides=(1, 1),
        padding=((0, 0), (pad_left, pad_right)),
    )


@functools.partial(jax.jit, static_argnames=("k", "w", "cap", "via_sort"))
def minimizers(seqs: jax.Array, lens: jax.Array, *, k: int, w: int,
               cap: int, via_sort: bool = True) -> MinimizerSet:
    """Extract canonical (k,w)-minimizers from a padded read batch.

    Args:
      seqs: uint8 [B, L] base codes (0..3, 4 = N / padding).
      lens: int32 [B] true read lengths.
      k: k-mer size, 2 <= k <= 16.
      w: window size (number of consecutive k-mers per window), >= 1.
      cap: static per-read output budget; expected density is
        ~2/(w+1) * len, overflow beyond cap is dropped (count saturates).
    """
    assert 2 <= k <= 16, "k-mer must fit a uint32 (k <= 16)"
    B, L = seqs.shape
    Lk = L - k + 1
    assert Lk >= 1

    acc_f = jnp.zeros((B, Lk), jnp.uint32)
    acc_r = jnp.zeros((B, Lk), jnp.uint32)
    has_n = jnp.zeros((B, Lk), jnp.bool_)
    for j in range(k):
        base = jax.lax.slice(seqs, (0, j), (B, j + Lk)).astype(jnp.uint32)
        is_n = base >= 4
        b = jnp.where(is_n, 0, base)
        acc_f = (acc_f << 2) | b
        acc_r = acc_r | ((jnp.uint32(3) - b) << jnp.uint32(2 * j))
        has_n = has_n | is_n

    pos = jax.lax.broadcasted_iota(jnp.int32, (B, Lk), 1)
    valid = (~has_n) & (pos + k <= lens[:, None])

    hf = mix32(acc_f)
    hr = mix32(acc_r)
    strand = (hr < hf).astype(jnp.int8)
    h = jnp.minimum(hf, hr)
    valid = valid & (hf != hr)  # drop strand-ambiguous (palindromic) k-mers
    h = jnp.where(valid, h, UINT_MAX)

    # Winnowing: i is selected iff h[i] equals the min of some length-w
    # window containing i, where windows are clipped at BOTH read boundaries
    # (so the rule is mirror-symmetric and terminal k-mers are always
    # selected -> revcomp-invariant seeding). Implemented as two
    # reduce_windows over a left-padded hash array:
    #   hpad = [inf]*(w-1) ++ h
    #   wmin[j'] = min(hpad[j' : j'+w])         (right-clipped)
    #   sel[i]   = max(wmin[i : i+w]) == h[i]   (h index i == hpad i+w-1)
    hpad = jnp.pad(h, ((0, 0), (w - 1, 0)), constant_values=UINT_MAX)
    wmin = _window_reduce(hpad, w, jax.lax.min, UINT_MAX, 0, w - 1)
    sel_max = _window_reduce(wmin, w, jax.lax.max, np.uint32(0), 0, w - 1)
    selected = valid & (h == sel_max[:, :Lk])

    count = jnp.minimum(jnp.sum(selected, axis=1), cap).astype(jnp.int32)
    if via_sort:
        # row-sort compaction: selected entries are already in pos order,
        # so one stable 2-operand sort by key = pos<<1|strand (unselected
        # -> INT_MAX) compacts each row — replaces three [B, Lk] scatters,
        # which are slow on TPU (see CLAUDE.md)
        key = jnp.where(selected,
                        (pos << 1) | strand.astype(jnp.int32),
                        jnp.int32(0x7FFFFFFF))
        key, h_s = jax.lax.sort((key, h), num_keys=1, is_stable=True,
                                dimension=1)
        if cap > Lk:
            key = jnp.pad(key, ((0, 0), (0, cap - Lk)),
                          constant_values=np.int32(0x7FFFFFFF))
            h_s = jnp.pad(h_s, ((0, 0), (0, cap - Lk)),
                          constant_values=UINT_MAX)
        key = key[:, :cap]
        h_s = h_s[:, :cap]
        ok = key != jnp.int32(0x7FFFFFFF)
        return MinimizerSet(
            hash=jnp.where(ok, h_s, UINT_MAX),
            pos=jnp.where(ok, key >> 1, -1),
            strand=jnp.where(ok, key & 1, 0).astype(jnp.int8),
            count=count)

    # scatter-compaction to [B, cap]
    slot = jnp.cumsum(selected.astype(jnp.int32), axis=1) - 1
    slot = jnp.where(selected & (slot < cap), slot, cap)
    rows = jax.lax.broadcasted_iota(jnp.int32, (B, Lk), 0)
    out_h = jnp.full((B, cap + 1), UINT_MAX, jnp.uint32).at[rows, slot].set(
        h, mode="drop")[:, :cap]
    out_p = jnp.full((B, cap + 1), -1, jnp.int32).at[rows, slot].set(
        pos, mode="drop")[:, :cap]
    out_s = jnp.zeros((B, cap + 1), jnp.int8).at[rows, slot].set(
        strand, mode="drop")[:, :cap]
    return MinimizerSet(hash=out_h, pos=out_p, strand=out_s, count=count)


def reference_minimizers(seq, k: int, w: int):
    """O(L*w) host reference for tests: returns set of (pos, strand, hash).

    Same semantics as :func:`minimizers` (canonical hash, ties keep all,
    boundary-clipped windows).
    """
    import numpy as np

    L = len(seq)
    Lk = L - k + 1
    if Lk <= 0:
        return set()
    hashes = np.full(Lk, 0xFFFFFFFF, dtype=np.uint64)
    strands = np.zeros(Lk, dtype=np.int8)
    valid = np.zeros(Lk, dtype=bool)

    def fmix(x):
        x &= 0xFFFFFFFF
        x ^= x >> 16
        x = (x * 0x85EBCA6B) & 0xFFFFFFFF
        x ^= x >> 13
        x = (x * 0xC2B2AE35) & 0xFFFFFFFF
        x ^= x >> 16
        return x

    for i in range(Lk):
        window = seq[i:i + k]
        if (window >= 4).any():
            continue
        cf = 0
        cr = 0
        for j, b in enumerate(window):
            cf = cf * 4 + int(b)
            cr |= (3 - int(b)) << (2 * j)
        hf, hr = fmix(cf), fmix(cr)
        if hf == hr:
            continue
        valid[i] = True
        hashes[i] = min(hf, hr)
        strands[i] = 1 if hr < hf else 0

    out = set()
    for j in range(-(w - 1), Lk):  # windows clipped at both boundaries
        lo, hi = max(j, 0), min(j + w, Lk)
        m = hashes[lo:hi].min()
        if m == 0xFFFFFFFF:
            continue
        for i in range(lo, hi):
            if valid[i] and hashes[i] == m:
                out.add((i, int(strands[i]), int(hashes[i])))
    return out
