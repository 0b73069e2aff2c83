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
from hylight_tpu.overlap.extend import extend_chains, extend_kwargs
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
        ext = extend_chains(ch, seqs_g, max_mismatch=snp_cap,
                            **extend_kwargs(cfg))
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
                         axis: str = SHARD_AXIS, exchange: bool = True):
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
                                max_mismatch=snp_cap,
                                **extend_kwargs(cfg))
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
            # exchange=False builds the timing baseline: identical per-step
            # compute against the LOCAL shard, no ICI traffic (results are
            # meaningless; see measure_ring_efficiency)
            nxt = tuple(
                jax.lax.ppermute(x, axis_name=axis, perm=perm)
                for x in carry) if exchange else carry
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


def make_bucket_overlap_fn(mesh, cfg: OverlapConfig, *, mcap: int,
                           max_pairs: int, n_reads: int, max_len: int,
                           snp_cap: int = 64, axis: str = SHARD_AXIS,
                           bucket_factor: float = 2.0,
                           anchor_factor: float = 2.0):
    """Minimizer-bucket all_to_all exchange (v3, the SURVEY.md §2.5 "bucket
    by minimizer, route candidate pairs" mapping — the reference's
    split_reads2 sharding rethought as routed collectives):

      1. every device sketches its read shard and routes each minimizer
         entry to the owner of its HASH bucket (hash % nd) via all_to_all;
      2. each device sorts its hash range by (hash, read) — every hash run
         is complete and read-major here — and forms ALL anchor pairs of
         its range with the roll self-join (seed.roll_join_packed);
      3. anchors route home to the owner of their smaller read id via a
         second all_to_all, where band voting + chaining + extension run
         (seed.group_packed_candidates); the read matrix all_gathers once
         for base-level verification.

    Static capacity: each routing step ships [nd, cap] slots per device;
    entries over capacity are dropped and counted (psum'd overflow in the
    returned stats dict) — capacity_factor sizes the slack, mirroring
    ParallelConfig.bucket_capacity_factor.
    """
    import numpy as np
    from hylight_tpu.overlap.seed import (INT_MAX, group_packed_candidates,
                                          roll_join_packed)

    nd = mesh.shape[axis]
    qshift = 15

    def step(seqs_l, lens_l):
        me = jax.lax.axis_index(axis)
        n_loc = seqs_l.shape[0]
        qbase = (me * n_loc).astype(jnp.int32)
        ms_l = minimizers(seqs_l, lens_l, k=cfg.k, w=cfg.w, cap=mcap)

        # ---- 1. flatten local entries + route by hash bucket ----------
        B, M = ms_l.hash.shape
        rows = jax.lax.broadcasted_iota(jnp.int32, (B, M), 0)
        slot = jax.lax.broadcasted_iota(jnp.int32, (B, M), 1)
        v0 = (slot < ms_l.count[:, None]) & (ms_l.pos >= 0)
        h = jnp.where(v0, ms_l.hash, jnp.uint32(0xFFFFFFFF)).reshape(-1)
        tid2s = ((rows + qbase) * 2 + ms_l.strand.astype(jnp.int32)) \
            .reshape(-1)
        tpos = ms_l.pos.reshape(-1)
        n_ent = h.shape[0]
        bucket = jnp.where(h == jnp.uint32(0xFFFFFFFF), jnp.uint32(nd),
                           h % jnp.uint32(nd)).astype(jnp.int32)
        cap = -(-int(n_ent * bucket_factor) // nd)
        cap = -(-cap // 8) * 8
        # sort by bucket; per-bucket fixed slots
        bucket, h, tid2s, tpos = jax.lax.sort(
            (bucket, h, tid2s, tpos), num_keys=1, is_stable=True)
        starts = jnp.searchsorted(bucket, jnp.arange(nd, dtype=jnp.int32),
                                  method="sort")
        counts = jnp.searchsorted(bucket, jnp.arange(nd, dtype=jnp.int32),
                                  side="right", method="sort") - starts
        sl = jnp.arange(cap, dtype=jnp.int32)[None, :]
        gi = jnp.minimum(starts[:, None] + sl, n_ent - 1)
        ok = sl < counts[:, None]
        ovf_b = jnp.sum(jnp.maximum(counts - cap, 0))
        h_s = jnp.where(ok, h[gi], jnp.uint32(0xFFFFFFFF))
        t2_s = jnp.where(ok, tid2s[gi], -1)
        tp_s = jnp.where(ok, tpos[gi], 0)

        a2a = functools.partial(jax.lax.all_to_all, axis_name=axis,
                                split_axis=0, concat_axis=0, tiled=True)
        h_r = a2a(h_s.reshape(-1))
        t2_r = a2a(t2_s.reshape(-1))
        tp_r = a2a(tp_s.reshape(-1))

        # ---- 2. sort my hash range read-major; roll self-join ---------
        h_r, t2_r, tp_r = jax.lax.sort(
            (h_r, t2_r, tp_r), num_keys=2, is_stable=True)
        # repeat mask (> max_occ) over complete runs
        n_r = h_r.shape[0]
        iota = jnp.arange(n_r, dtype=jnp.int32)
        first = jnp.concatenate([jnp.ones(1, jnp.bool_),
                                 h_r[1:] != h_r[:-1]])
        run_lo = jax.lax.cummax(jnp.where(first, iota, 0))
        last = jnp.concatenate([h_r[1:] != h_r[:-1],
                                jnp.ones(1, jnp.bool_)])
        run_hi = jax.lax.cummin(jnp.where(last, iota, n_r - 1),
                                reverse=True)
        occ_ok = (run_hi - run_lo + 1) <= cfg.max_occ
        t2_r = jnp.where(occ_ok & (h_r != jnp.uint32(0xFFFFFFFF)),
                         t2_r, -1)
        key1, key2, tposf = roll_join_packed(
            h_r, t2_r, tp_r, max_occ=cfg.max_occ, bandwidth=64,
            max_len=max_len, n_reads=n_reads, qshift=qshift)

        # ---- 3. route anchors home by smaller read id ------------------
        n_anc = key1.shape[0]
        owner = jnp.where(key1 == INT_MAX, nd,
                          (key1 // (2 * n_reads)) // n_loc).astype(jnp.int32)
        acap = -(-int(n_anc * anchor_factor) // nd)
        acap = -(-acap // 8) * 8
        owner, key1, key2, tposf = jax.lax.sort(
            (owner, key1, key2, tposf), num_keys=1, is_stable=True)
        astarts = jnp.searchsorted(owner, jnp.arange(nd, dtype=jnp.int32),
                                   method="sort")
        acounts = jnp.searchsorted(owner, jnp.arange(nd, dtype=jnp.int32),
                                   side="right", method="sort") - astarts
        asl = jnp.arange(acap, dtype=jnp.int32)[None, :]
        agi = jnp.minimum(astarts[:, None] + asl, n_anc - 1)
        aok = asl < acounts[:, None]
        ovf_a = jnp.sum(jnp.maximum(acounts - acap, 0))
        k1_r = a2a(jnp.where(aok, key1[agi], INT_MAX).reshape(-1))
        k2_r = a2a(jnp.where(aok, key2[agi], INT_MAX).reshape(-1))
        tf_r = a2a(jnp.where(aok, tposf[agi], 0).reshape(-1))

        lens_g = jax.lax.all_gather(lens_l, axis_name=axis, axis=0,
                                    tiled=True).astype(jnp.int32)
        cand = group_packed_candidates(
            k1_r, k2_r, tf_r, lens_g, min_anchors=cfg.min_anchors,
            max_pairs=max_pairs, anchors_per_pair=cfg.anchors_per_pair,
            n_reads=n_reads, k=cfg.k, qshift=qshift)
        ch = refine_chains(cand, k=cfg.k, min_score=cfg.min_chain_score,
                           max_gap=cfg.max_gap)
        seqs_g = jax.lax.all_gather(seqs_l, axis_name=axis, axis=0,
                                    tiled=True)
        ext = extend_chains(ch, seqs_g, max_mismatch=snp_cap,
                            **extend_kwargs(cfg))
        sc = admission_filter(ch, ext, min_len=cfg.min_ovlp_len,
                              min_identity=cfg.min_identity,
                              max_overhang=cfg.max_overhang,
                              overhang_ratio=cfg.overhang_ratio)
        n_valid = jax.lax.psum(jnp.sum(sc.valid.astype(jnp.int32)), axis)
        overflow = jax.lax.psum(ovf_b + ovf_a, axis)
        out = dict(qid=ch.qid, tid=ch.tid, strand=ch.strand,
                   qlen=ch.qlen, tlen=ch.tlen, qs=ch.qs, qe=ch.qe,
                   ts=ch.ts, te=ch.te, matches=ext.matches,
                   columns=ext.columns + ext.unverified + ext.indels,
                   identity=ext.identity, score=sc.score, score2=sc.score2,
                   score3=sc.score3, valid=sc.valid,
                   mm_q=ext.mm_q, mm_t=ext.mm_t, mm_qb=ext.mm_qb,
                   mm_tb=ext.mm_tb, mm_mask=ext.mm_mask)
        return out, n_valid, overflow

    in_specs = (P(axis, None), P(axis))
    out_specs = ({k: P(axis) for k in
                  ["qid", "tid", "strand", "qlen", "tlen", "qs", "qe", "ts",
                   "te", "matches", "columns", "identity", "score", "score2",
                   "score3", "valid", "mm_q", "mm_t", "mm_qb", "mm_tb",
                   "mm_mask"]}, P(), P())
    fn = shard_map(step, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   check_vma=False)
    return jax.jit(fn)


def measure_ring_efficiency(mesh, cfg: OverlapConfig, *, n_reads: int,
                            read_len: int, iters: int = 3, seed: int = 7,
                            snp_cap: int = 16, axis: str = SHARD_AXIS):
    """Scaling instrumentation for the ring exchange (SURVEY §2.5's
    ">=80% efficiency at 2 hosts" target).

    Times the FULL ring program against a compute-only variant (identical
    per-step compute joined against the local shard, ``exchange=False`` —
    no ppermute traffic) on synthetic coverage-realistic reads, and
    returns ``{"full_s", "compute_s", "exchange_s", "efficiency"}`` where
    efficiency = compute/full is the fraction of wall-clock spent on
    overlap compute rather than moving shards. Works on any mesh (virtual
    CPU devices for CI, real ICI/DCN meshes in production); the dryrun
    entry records it so a 2-host estimate exists the day hardware does.
    """
    import time as _time
    import numpy as np
    from hylight_tpu.parallel.mesh import shard_rows

    nd = mesh.shape[axis]
    N = -(-n_reads // nd) * nd
    rng = np.random.default_rng(seed)
    glen = max(N * read_len // 12, read_len + 1)
    g = rng.integers(0, 4, size=glen).astype(np.uint8)
    starts = rng.integers(0, glen - read_len, size=N)
    seqs = np.stack([g[s:s + read_len] for s in starts]).astype(np.uint8)
    lens = np.full(N, read_len, dtype=np.int32)

    mcap = -(-(int(2 * read_len / (cfg.w + 1)) + 64) // 64) * 64
    P = -(-(N // nd) * 16 // 256) * 256
    seqs_d = jax.device_put(jnp.asarray(seqs), shard_rows(mesh))
    lens_d = jax.device_put(jnp.asarray(lens), shard_rows(mesh))

    out = {}
    for name, exch in (("full", True), ("compute", False)):
        fn = make_ring_overlap_fn(mesh, cfg, mcap=mcap, max_pairs=P,
                                  snp_cap=snp_cap, exchange=exch)
        _, nv = fn(seqs_d, lens_d)
        int(np.asarray(nv))                       # sync warmup/compile
        t0 = _time.perf_counter()
        vals = []
        for _ in range(iters):
            _, nv = fn(seqs_d, lens_d)
            vals.append(nv)
        for v in vals:
            int(np.asarray(v))                    # one sync at the end
        out[name + "_s"] = (_time.perf_counter() - t0) / iters
    out["exchange_s"] = max(0.0, out["full_s"] - out["compute_s"])
    out["efficiency"] = out["compute_s"] / max(out["full_s"], 1e-9)
    return out
