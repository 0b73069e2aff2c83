"""Single-jit all-vs-all overlap block: the engine's inner program as one
compiled function (used by the compile-check entry point, the sharded
multi-chip step, and the benchmarks).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from hylight_tpu.config import OverlapConfig
from hylight_tpu.ops.minimizers import minimizers
from hylight_tpu.overlap import seed as seed_mod
from hylight_tpu.overlap.chain import refine_chains
from hylight_tpu.overlap.extend import extend_chains, extend_kwargs
from hylight_tpu.overlap.filters import admission_filter


def make_block_fn(cfg: OverlapConfig, *, mcap: int, max_pairs: int,
                  snp_cap: int = 64,
                  n_reads: int = 0, max_len: int = 0):
    """Build a jittable fn(seqs, lens) -> (Chains, Extensions, ScoredOverlaps)
    computing all-vs-all overlaps inside one padded read block.

    When ``n_reads``/``max_len`` are given and fit the packed-key budget,
    the block uses the roll-based self-join (seed.self_join_candidates) —
    no [N, F] gathers, 3-operand sort — otherwise the legacy
    collect_anchors + group_candidates path.
    """
    use_self_join = (
        0 < max_len < (1 << 15)
        and 0 < n_reads
        and 2 * n_reads * ((3 * max_len) // 64 + 2) < (1 << 31))
    # n_reads bound matches engine.py's fast_ava condition: a larger block
    # would allocate [B, B] f32 C/mu matrices plus a B^2 cumsum in
    # _first_k_true — fall back to the sort join instead
    use_mxu = (cfg.seed_mode == "mxu" and 0 < max_len < (1 << 15)
               and 0 < n_reads <= 4096)

    @jax.jit
    def block_fn(seqs: jax.Array, lens: jax.Array):
        ms = minimizers(seqs, lens, k=cfg.k, w=cfg.w, cap=mcap)
        if use_mxu:
            from hylight_tpu.overlap.seed_mxu import mxu_candidates
            cand = mxu_candidates(
                ms, lens.astype(jnp.int32), bandwidth=64,
                min_anchors=cfg.min_anchors, max_pairs=max_pairs,
                anchors_per_pair=cfg.anchors_per_pair,
                max_occ=cfg.max_occ, k=cfg.k, n_reads=n_reads,
                max_len=max_len, bucket_bits=cfg.mxu_bucket_bits,
                margin=cfg.mxu_margin, join_frac=cfg.mxu_join_frac)
            ch = refine_chains(cand, k=cfg.k, min_score=cfg.min_chain_score,
                               max_gap=cfg.max_gap)
            ext = extend_chains(ch, seqs, max_mismatch=snp_cap,
                                **extend_kwargs(cfg))
            sc = admission_filter(ch, ext, min_len=cfg.min_ovlp_len,
                                  min_identity=cfg.min_identity,
                                  max_overhang=cfg.max_overhang,
                                  overhang_ratio=cfg.overhang_ratio)
            return ch, ext, sc
        index = seed_mod.build_index(ms, 0, max_occ=cfg.max_occ)
        if use_self_join:
            cand = seed_mod.self_join_candidates(
                index, lens.astype(jnp.int32), bandwidth=64,
                min_anchors=cfg.min_anchors, max_pairs=max_pairs,
                anchors_per_pair=cfg.anchors_per_pair,
                max_occ=cfg.max_occ, k=cfg.k,
                n_reads=n_reads, max_len=max_len)
        else:
            anchors = seed_mod.collect_anchors(ms, 0, index,
                                               max_hits=cfg.max_occ,
                                               dedup_self=True)
            cand = seed_mod.group_candidates(
                anchors, lens.astype(jnp.int32), bandwidth=64,
                min_anchors=cfg.min_anchors,
                max_pairs=max_pairs, anchors_per_pair=cfg.anchors_per_pair,
                row_size=mcap * cfg.max_occ, k=cfg.k)
        ch = refine_chains(cand, k=cfg.k, min_score=cfg.min_chain_score,
                           max_gap=cfg.max_gap)
        ext = extend_chains(ch, seqs, max_mismatch=snp_cap,
                            **extend_kwargs(cfg))
        sc = admission_filter(ch, ext, min_len=cfg.min_ovlp_len,
                              min_identity=cfg.min_identity,
                              max_overhang=cfg.max_overhang,
                              overhang_ratio=cfg.overhang_ratio)
        return ch, ext, sc

    return block_fn
