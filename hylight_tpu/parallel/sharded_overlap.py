"""Multi-chip sharded overlap detection (data-parallel over reads).

Replaces the reference's nsplit file-sharding ("each chunk x full read set as
independent processes", ``utils.py:44-48``) with a shard_map over a device
mesh: each device owns a row-shard of the padded read matrix, sketches its
shard, all_gathers the (compact) minimizer index over ICI so every device can
join its local queries against the full target set, then chains/extends/
filters its local candidate pairs. The per-chunk ``sort -k12`` merge-reduce
of the reference becomes a host concat of per-shard tables; global stats
travel by psum.

Two shard_map strategies:

- ``make_sharded_overlap_fn`` (v1): every device all_gathers the full
  minimizer table + read matrix over ICI and joins its local queries
  against the global index. Simple, but peak memory is O(N*L) per device.
- ``make_ring_overlap_fn`` (v2, the SURVEY.md §2.5 exchange refinement):
  each device keeps only its shard; the (reads, lengths, minimizers) block
  rotates around the ring via ``ppermute``, and at step s each device
  joins its local queries against the visiting shard's index and extends
  pairs against a 2-shard concat. Each unordered pair forms on exactly
  ONE device (the qid < tid dedup rule), peak memory is O(N/nd * L), and
  each hop's transfer overlaps with the step's chaining/extension compute
  — the ring-attention communication pattern applied to overlap detection.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from hylight_tpu.config import OverlapConfig
from hylight_tpu.ops.minimizers import MinimizerSet, minimizers
from hylight_tpu.overlap import seed as seed_mod
from hylight_tpu.overlap.chain import refine_chains
from hylight_tpu.overlap.extend import extend_chains
from hylight_tpu.overlap.filters import admission_filter
from hylight_tpu.parallel.mesh import SHARD_AXIS


def make_sharded_overlap_fn(mesh, cfg: OverlapConfig, *, mcap: int,
                            max_pairs: int, snp_cap: int = 64,
                            axis: str = SHARD_AXIS):
    """Jitted fn(seqs [N,L] row-sharded, lens [N]) -> per-shard results.

    N must be divisible by the mesh size. Outputs keep the row sharding on
    their leading (pair-slot) dimension; `n_valid` is a psum'd global count.
    """
    nd = mesh.shape[axis]

    def step(seqs_l, lens_l):
        me = jax.lax.axis_index(axis)
        n_loc = seqs_l.shape[0]
        qbase = (me * n_loc).astype(jnp.int32)

        ms_l = minimizers(seqs_l, lens_l, k=cfg.k, w=cfg.w, cap=mcap)

        # exchange: full minimizer table + full read matrix over ICI
        gather = functools.partial(jax.lax.all_gather, axis_name=axis,
                                   axis=0, tiled=True)
        ms_g = MinimizerSet(hash=gather(ms_l.hash), pos=gather(ms_l.pos),
                            strand=gather(ms_l.strand),
                            count=gather(ms_l.count))
        lens_g = gather(lens_l)
        seqs_g = gather(seqs_l)

        index = seed_mod.build_index(ms_g, 0, max_occ=cfg.max_occ)
        anchors = seed_mod.collect_anchors(ms_l, qbase, index,
                                           max_hits=cfg.max_occ,
                                           dedup_self=True)
        cand = seed_mod.group_candidates(
            anchors, lens_g.astype(jnp.int32), bandwidth=64,
            min_anchors=cfg.min_anchors,
            max_pairs=max_pairs, anchors_per_pair=cfg.anchors_per_pair,
            row_size=mcap * cfg.max_occ, k=cfg.k)
        ch = refine_chains(cand, k=cfg.k, min_score=cfg.min_chain_score,
                           max_gap=cfg.max_gap)
        ext = extend_chains(ch, seqs_g, k=cfg.k, gap_tile=cfg.gap_tile,
                            max_mismatch=snp_cap,
                            max_indel_band=cfg.max_indel_band)
        sc = admission_filter(ch, ext, min_len=cfg.min_ovlp_len,
                              min_identity=cfg.min_identity,
                              max_overhang=cfg.max_overhang,
                              overhang_ratio=cfg.overhang_ratio)
        n_valid = jax.lax.psum(jnp.sum(sc.valid.astype(jnp.int32)), axis)
        out = dict(qid=ch.qid, tid=ch.tid, strand=ch.strand,
                   qlen=ch.qlen, tlen=ch.tlen, qs=ch.qs, qe=ch.qe,
                   ts=ch.ts, te=ch.te, matches=ext.matches,
                   columns=ext.columns + ext.unverified + ext.indels,
                   identity=ext.identity, score=sc.score, score2=sc.score2,
                   score3=sc.score3, valid=sc.valid,
                   mm_q=ext.mm_q, mm_t=ext.mm_t, mm_qb=ext.mm_qb,
                   mm_tb=ext.mm_tb, mm_mask=ext.mm_mask)
        return out, n_valid

    in_specs = (P(axis, None), P(axis))
    out_specs = ({k: P(axis) for k in
                  ["qid", "tid", "strand", "qlen", "tlen", "qs", "qe", "ts",
                   "te", "matches", "columns", "identity", "score", "score2",
                   "score3", "valid", "mm_q", "mm_t", "mm_qb", "mm_tb",
                   "mm_mask"]}, P())
    fn = shard_map(step, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   check_vma=False)
    return jax.jit(fn)


def make_ring_overlap_fn(mesh, cfg: OverlapConfig, *, mcap: int,
                         max_pairs: int, snp_cap: int = 64,
                         axis: str = SHARD_AXIS):
    """Ring-pipelined all-vs-all overlap (v2 exchange, SURVEY.md §2.5).

    fn(seqs [N, L] row-sharded, lens [N] row-sharded) -> (out dict, n_valid)
    where every per-pair output has leading dim nd*max_pairs per shard
    (one max_pairs block per ring step). Each unordered read pair is
    produced on exactly one device: collect_anchors' qid < tid dedup keeps
    the pair only on the owner of the smaller id, at the step where the
    larger id's shard is visiting.
    """
    nd = mesh.shape[axis]

    def step(seqs_l, lens_l):
        me = jax.lax.axis_index(axis)
        n_loc = seqs_l.shape[0]
        qbase = (me * n_loc).astype(jnp.int32)

        ms_l = minimizers(seqs_l, lens_l, k=cfg.k, w=cfg.w, cap=mcap)
        # global lengths are tiny (N int32) — gather once for the
        # candidate grouping; the read MATRIX never gathers
        lens_g = jax.lax.all_gather(lens_l, axis_name=axis, axis=0,
                                    tiled=True).astype(jnp.int32)

        perm = [(i, (i - 1) % nd) for i in range(nd)]

        def ring_step(carry, s):
            seqs_v, lens_v, h_v, p_v, st_v, c_v = carry
            vbase = (((me + s) % nd) * n_loc).astype(jnp.int32)
            ms_v = MinimizerSet(hash=h_v, pos=p_v, strand=st_v, count=c_v)
            index = seed_mod.build_index(ms_v, vbase,
                                         max_occ=cfg.max_occ)
            anchors = seed_mod.collect_anchors(ms_l, qbase, index,
                                               max_hits=cfg.max_occ,
                                               dedup_self=True)
            cand = seed_mod.group_candidates(
                anchors, lens_g, bandwidth=64,
                min_anchors=cfg.min_anchors,
                max_pairs=max_pairs, anchors_per_pair=cfg.anchors_per_pair,
                row_size=mcap * cfg.max_occ, k=cfg.k)
            ch = refine_chains(cand, k=cfg.k,
                               min_score=cfg.min_chain_score,
                               max_gap=cfg.max_gap)
            # extension sees only local + visiting rows: remap global read
            # ids into the 2-shard concat
            seqs_cat = jnp.concatenate([seqs_l, seqs_v], axis=0)
            qrow = jnp.clip(ch.qid - qbase, 0, n_loc - 1)
            trow = jnp.clip(ch.tid - vbase, 0, n_loc - 1) + n_loc
            ext = extend_chains(ch._replace(qid=qrow, tid=trow), seqs_cat,
                                k=cfg.k, gap_tile=cfg.gap_tile,
                                max_mismatch=snp_cap,
                                max_indel_band=cfg.max_indel_band)
            sc = admission_filter(ch, ext, min_len=cfg.min_ovlp_len,
                                  min_identity=cfg.min_identity,
                                  max_overhang=cfg.max_overhang,
                                  overhang_ratio=cfg.overhang_ratio)
            out_s = dict(qid=ch.qid, tid=ch.tid, strand=ch.strand,
                         qlen=ch.qlen, tlen=ch.tlen, qs=ch.qs, qe=ch.qe,
                         ts=ch.ts, te=ch.te, matches=ext.matches,
                         columns=ext.columns + ext.unverified + ext.indels,
                         identity=ext.identity, score=sc.score,
                         score2=sc.score2, score3=sc.score3, valid=sc.valid,
                         mm_q=ext.mm_q, mm_t=ext.mm_t, mm_qb=ext.mm_qb,
                         mm_tb=ext.mm_tb, mm_mask=ext.mm_mask)
            nxt = tuple(
                jax.lax.ppermute(x, axis_name=axis, perm=perm)
                for x in carry)
            return nxt, out_s

        carry0 = (seqs_l, lens_l, ms_l.hash, ms_l.pos, ms_l.strand,
                  ms_l.count)
        _, outs = jax.lax.scan(ring_step, carry0,
                               jnp.arange(nd, dtype=jnp.int32))
        # [nd, P, ...] -> [nd*P, ...]
        out = {k: v.reshape((-1,) + v.shape[2:]) for k, v in outs.items()}
        n_valid = jax.lax.psum(jnp.sum(out["valid"].astype(jnp.int32)),
                               axis)
        return out, n_valid

    in_specs = (P(axis, None), P(axis))
    out_specs = ({k: P(axis) for k in
                  ["qid", "tid", "strand", "qlen", "tlen", "qs", "qe", "ts",
                   "te", "matches", "columns", "identity", "score", "score2",
                   "score3", "valid", "mm_q", "mm_t", "mm_qb", "mm_tb",
                   "mm_mask"]}, P())
    fn = shard_map(step, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   check_vma=False)
    return jax.jit(fn)
