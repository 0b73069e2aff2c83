"""K-mer-spectrum read correction (bfc / fmlrc2 capability).

The reference shells out to ``bfc -s 3g`` for short reads (``HyLight.py:87``)
and ``ropebwt2 + fmlrc2-convert + fmlrc2 x3`` for long reads
(``HyLight.py:106-110``). TPU-native replacement:

- spectrum: exact canonical k-mer (k <= 16 -> uint32 code, NOT hashed)
  counting over the short-read set via one device sort + run-length pass;
- correction: for every read position whose covering k-mers include a weak
  one, try the 3 substitutions; a substitution is applied when it turns all
  covering k-mers solid while the original base leaves a weak one (the
  greedy single-substitution rule, applied per sweep; fmlrc-style multiple
  rounds re-apply the sweep with the fixed bases).

Substitution-only: indel repair is left to the downstream consensus/polish
stages (documented deviation from fmlrc2; SR polishing of LR contigs covers
the same role in this pipeline).
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hylight_tpu.io.readset import ReadSet
from hylight_tpu.overlap.engine import bucket_len
from hylight_tpu.utils import get_logger

log = get_logger()


def _kmer_codes(seqs: jax.Array, lens: jax.Array, k: int):
    """Canonical k-mer codes per position: uint32 [B, L-k+1] + valid mask."""
    B, L = seqs.shape
    Lk = L - k + 1
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
    canon = jnp.minimum(acc_f, acc_r)
    return canon, valid


@functools.partial(jax.jit, static_argnames=("k",))
def _collect_codes(seqs, lens, *, k):
    canon, valid = _kmer_codes(seqs, lens, k)
    return jnp.where(valid, canon, jnp.uint32(0xFFFFFFFF)).reshape(-1)


def build_spectrum(reads: ReadSet, *, k: int, min_count: int,
                   block: int = 4096) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (sorted unique solid k-mer codes, their counts)."""
    L = bucket_len(int(reads.lengths.max(initial=1)))
    all_codes = []
    for lo in range(0, reads.n, block):
        sub = reads.subset(np.arange(lo, min(lo + block, reads.n)))
        seqs, lens = sub.to_padded(max_len=L)
        codes = np.asarray(_collect_codes(jnp.asarray(seqs),
                                          jnp.asarray(lens), k=k))
        all_codes.append(codes[codes != 0xFFFFFFFF])
    if not all_codes:
        return np.zeros(0, np.uint32), np.zeros(0, np.int64)
    codes = np.concatenate(all_codes)
    uniq, counts = np.unique(codes, return_counts=True)
    solid = counts >= min_count
    log.info("[K::spectrum] %d kmers, %d solid (>=%d)", len(uniq),
             int(solid.sum()), min_count)
    return uniq[solid].astype(np.uint32), counts[solid]


@functools.partial(jax.jit, static_argnames=("k",))
def _correct_block(seqs, lens, solid_sorted, *, k):
    """One correction sweep. Returns corrected seqs (uint8 [B, L])."""
    B, L = seqs.shape
    Lk = L - k + 1

    def solidity(sq):
        canon, valid = _kmer_codes(sq, lens, k)
        idx = jnp.searchsorted(solid_sorted, canon, method="sort")
        idx = jnp.clip(idx, 0, solid_sorted.shape[0] - 1)
        hit = (solid_sorted[idx] == canon) & (solid_sorted.shape[0] > 0)
        # invalid (N / out of read) positions count as solid (no signal)
        return jnp.where(valid, hit, True)

    base_solid = solidity(seqs)  # [B, Lk]

    # per-position: number of weak covering k-mers, via windowed sum
    weak = (~base_solid).astype(jnp.int32)
    # covering k-mers of position p: starts in [p-k+1, p]
    wpad = jnp.pad(weak, ((0, 0), (k - 1, k - 1)))
    kernel = jnp.ones((1, k), jnp.int32)
    cover_weak = jax.lax.reduce_window(
        wpad, np.int32(0), jax.lax.add, (1, k), (1, 1), "valid")[:, :L]

    # trial substitutions: for each base b, recompute solidity
    best_gain = jnp.zeros((B, L), jnp.int32)
    best_base = seqs
    for b in range(4):
        trial_gain = jnp.zeros((B, L), jnp.int32)
        # changing position p affects k-mers starting in [p-k+1, p]; rather
        # than per-position recompute, substitute base b EVERYWHERE and ask:
        # would k-mers be solid if their window contained b at offset j?
        # Exact per-position trial: recompute solidity for seqs with column
        # p replaced — O(L) recomputes is too much; instead use the shifted
        # trick: build seqs_b[p] = b at p only via k passes below.
        # For each offset j in [0, k): kmer starting at s covering p=s+j
        # with substituted base: code differs from original in one digit.
        _, valid = _kmer_codes(seqs, lens, k)
        # fwd/rc codes (need both, not canonical)
        acc_f = jnp.zeros((B, Lk), jnp.uint32)
        acc_r = jnp.zeros((B, Lk), jnp.uint32)
        for j in range(k):
            bb = jax.lax.slice(seqs, (0, j), (B, j + Lk)).astype(jnp.uint32)
            bb = jnp.where(bb >= 4, 0, bb)
            acc_f = (acc_f << 2) | bb
            acc_r = acc_r | ((jnp.uint32(3) - bb) << jnp.uint32(2 * j))
        gain_b = jnp.zeros((B, L), jnp.int32)
        for j in range(k):
            shift_f = jnp.uint32(2 * (k - 1 - j))
            shift_r = jnp.uint32(2 * j)
            f2 = (acc_f & ~(jnp.uint32(3) << shift_f)) | (jnp.uint32(b) << shift_f)
            r2 = (acc_r & ~(jnp.uint32(3) << shift_r)) | \
                ((jnp.uint32(3 - b)) << shift_r)
            canon2 = jnp.minimum(f2, r2)
            idx = jnp.clip(jnp.searchsorted(solid_sorted, canon2,
                                            method="sort"), 0,
                           solid_sorted.shape[0] - 1)
            hit = (solid_sorted[idx] == canon2)
            hit = jnp.where(valid, hit, True)
            # k-mer start s covers position p = s + j; pad non-covered True
            gain_b = gain_b + jnp.pad(
                hit, ((0, 0), (j, L - Lk - j)),
                constant_values=True).astype(jnp.int32)
        better = gain_b > best_gain
        best_gain = jnp.where(better, gain_b, best_gain)
        best_base = jnp.where(better, jnp.uint8(b), best_base)

    # apply: only where the original base leaves >=1 weak covering k-mer,
    # the trial fixes ALL covering k-mers (gain == k; non-covering offsets
    # were padded True above), and the position is a real base
    in_read = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1) < lens[:, None]
    apply = (cover_weak > 0) & (best_gain == k) & in_read & \
        (best_base != seqs)
    out = jnp.where(apply, best_base, seqs)
    n_fixed = jnp.sum(apply.astype(jnp.int32))
    return out, n_fixed


def correct_reads(reads: ReadSet, spectrum_reads: Optional[ReadSet] = None,
                  *, k: int = 15, min_count: int = 3, rounds: int = 1,
                  block: int = 2048) -> ReadSet:
    """Correct ``reads`` against the k-mer spectrum of ``spectrum_reads``
    (default: the reads themselves — the bfc mode; pass the short reads to
    correct long reads — the fmlrc mode with ``rounds=3``)."""
    assert k <= 16
    src = spectrum_reads if spectrum_reads is not None else reads
    solid, _ = build_spectrum(src, k=k, min_count=min_count)
    if len(solid) == 0:
        return reads
    solid_d = jnp.asarray(solid)
    L = bucket_len(int(reads.lengths.max(initial=1)))

    out_seqs = []
    total_fixed = 0
    for lo in range(0, reads.n, block):
        idx = np.arange(lo, min(lo + block, reads.n))
        sub = reads.subset(idx)
        seqs, lens = sub.to_padded(max_len=L)
        seqs_d = jnp.asarray(seqs)
        lens_d = jnp.asarray(lens)
        for _ in range(rounds):
            seqs_d, n_fixed = _correct_block(seqs_d, lens_d, solid_d, k=k)
            total_fixed += int(n_fixed)
        arr = np.asarray(seqs_d)
        for i, ln in enumerate(np.asarray(lens_d)):
            out_seqs.append(arr[i, :int(ln)])
    log.info("[K::correct] fixed %d bases over %d reads", total_fixed,
             reads.n)
    quals = [reads.get_qual(i) for i in range(reads.n)] \
        if reads.qual is not None else None
    return ReadSet.from_seqs(out_seqs, quals=quals, names=list(reads.names))
