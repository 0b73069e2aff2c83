"""The overlap engine: ReadSet(s) -> OverlapTable.

This is the TPU-native replacement for the reference's entire sharded overlap
path — ``utils.split_reads2()`` (file split + xargs -P, ``utils.py:41-71``)
driving ``minimap2 | filter_trans_ovlp_inline_v4 | filter_overlap_slr2``.
The file shards become query blocks of a padded read matrix; each block runs
one jitted seed->chain->extend->filter program; the per-chunk ``sort -k12``
merge becomes a host concat (order-free: downstream sorts as needed).

Single-chip version; the multi-chip variant shards the blocks over a device
mesh (hylight_tpu.parallel.sharded_overlap).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from hylight_tpu.config import OverlapConfig
from hylight_tpu.io.readset import ReadSet
from hylight_tpu.ops.minimizers import minimizers
from hylight_tpu.overlap import seed as seed_mod
from hylight_tpu.overlap.chain import refine_chains
from hylight_tpu.overlap.extend import extend_chains, extend_kwargs
from hylight_tpu.overlap.filters import admission_filter, cap_per_read
from hylight_tpu.overlap.table import OverlapTable
from hylight_tpu.utils import get_logger

log = get_logger()


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _ava_bandwidth(max_len: int) -> int:
    """Diagonal-band width for whole-set joins: 64 for normal blocks, 256
    for ultralong (>32 kb) reads so the (band << qshift) packing stays in
    int32 up to 256 kb (seed.self_join_candidates)."""
    return 64 if max_len < (1 << 15) else 256


def _self_join_ok(n_rows: int, max_len: int, mcap: int,
                  seed_mode: str) -> bool:
    """Whether an ava set runs as ONE whole-set self-join block.

    The mxu path allocates [B, B] count matrices (plus a B^2 cumsum in
    pair selection), so it is capped at 4096 rows; the sort self-join's
    cost is the packed-key sort volume, so SHORT reads can take far more
    rows per block (a 15k-read SR cluster — the reference's --size cap,
    HyLight.py:43-44 — is one ~3M-minimizer join, much faster than ~60
    legacy gather blocks) and ULTRALONG reads (up to 256 kb) ride the
    3-operand packing with a wider band instead of the legacy gather join.
    """
    if n_rows <= 0 or max_len >= (1 << 18):
        return False
    bw = _ava_bandwidth(max_len)
    nbands = (3 * max_len) // bw + 2
    qshift = max(15, int(max_len - 1).bit_length())
    if 2 * n_rows * nbands >= (1 << 31) or (nbands << qshift) >= (1 << 31):
        return False
    if seed_mode == "mxu" and max_len < (1 << 15):
        return n_rows <= 4096
    # sort join (incl. mxu configs on ultralong blocks, where the matmul
    # path's (qpos << 15 | tpos) packing cannot represent positions)
    return n_rows <= 4096 or n_rows * mcap <= (8 << 20)


def bucket_len(x: int, minimum: int = 256) -> int:
    """Round a padded length up to a power of two so iterated pipelines
    (whose reads grow every round) reuse a handful of compiled shapes
    instead of recompiling per round."""
    L = minimum
    while L < x:
        L *= 2
    return L


def bucket_rows(n: int, minimum: int = 32) -> int:
    """Round a read COUNT up to the {1, 1.5} x 2^k series.

    The SR core re-overlaps a shrinking working set every iteration; exact
    row counts would recompile every jitted program per iteration (seconds
    on CPU, minutes through the axon tunnel). Geometric buckets cap the
    padding waste at 33% and the compile count at ~2 per octave."""
    b = minimum
    while True:
        if n <= b:
            return b
        if n <= b + b // 2:
            return b + b // 2
        b *= 2


@dataclass
class EngineStats:
    blocks: int = 0
    candidate_pairs: int = 0
    pair_overflows: int = 0
    overlaps: int = 0
    extra: Dict = field(default_factory=dict)


def find_overlaps(reads: ReadSet, targets: Optional[ReadSet] = None, *,
                  cfg: OverlapConfig, query_block: int = 64,
                  pairs_per_block: Optional[int] = None,
                  snp_cap: int = 128,
                  cap_overlaps: bool = True,
                  mesh=None,
                  stats: Optional[EngineStats] = None) -> OverlapTable:
    """All-vs-all (targets=None) or set-vs-set overlap detection.

    Returned table ids: query ids index ``reads``; target ids index
    ``targets`` when given, else ``reads``.

    mesh: a jax.sharding.Mesh with the 'shard' axis dispatches the
    all-vs-all case to the multi-chip ring exchange
    (parallel/sharded_overlap.make_ring_overlap_fn) — the reference's
    nsplit file-sharding as a shard_map over ICI; per-shard tables merge
    on host (the ``sort -k12`` reduce equivalent).
    """
    ava = targets is None
    if mesh is not None and ava:
        return _find_overlaps_mesh(reads, cfg=cfg, mesh=mesh,
                                   pairs_per_block=pairs_per_block,
                                   snp_cap=snp_cap,
                                   cap_overlaps=cap_overlaps, stats=stats)
    tset = reads if ava else targets
    nq, nt = reads.n, tset.n
    if nq == 0 or nt == 0:
        return _empty_table(snp_cap)

    # queries and targets get SEPARATE padded matrices with independent
    # length buckets — a 150 bp short-read query set against 100 kb contig
    # targets must not inflate to the contig bucket (ava: one matrix)
    if ava:
        Lq = bucket_len(max(1, int(reads.lengths.max())))
        seqs, lens = reads.to_padded(max_len=Lq)
        # row-count bucketing (see bucket_rows): pad rows have length 0 ->
        # no minimizers -> no anchors; the self-join/index shapes stay
        # stable across the SR core's shrinking iterations
        N_pad = bucket_rows(nq)
        if N_pad > nq:
            seqs = np.pad(seqs, ((0, N_pad - nq), (0, 0)))
            lens = np.pad(lens, (0, N_pad - nq))
        seqs_d = jnp.asarray(seqs)
        lens_d = jnp.asarray(lens)
        seqs_t_d, tlens_d = seqs_d, lens_d
        Lt = Lq
        t_off = 0
    else:
        Lq = bucket_len(max(1, int(reads.lengths.max(initial=1))))
        Lt = bucket_len(max(1, int(tset.lengths.max(initial=1))))
        qs_, qlens = reads.to_padded(max_len=Lq)
        ts_, tlens = tset.to_padded(max_len=Lt)
        nt_pad = bucket_rows(nt)
        if nt_pad > nt:
            ts_ = np.pad(ts_, ((0, nt_pad - nt), (0, 0)))
            tlens = np.pad(tlens, (0, nt_pad - nt))
        seqs_d = jnp.asarray(qs_)
        lens_d = jnp.asarray(np.concatenate([qlens, tlens]))
        seqs_t_d = jnp.asarray(ts_)
        tlens_d = jnp.asarray(tlens)
        t_off = nq

    # minimizer cap from winnowing density 2/(w+1) (+ slack for end rule)
    mcap = _round_up(int(2 * Lq / (cfg.w + 1)) + 64, 64)
    ms_all = minimizers(seqs_d, lens_d[:nq] if not ava else lens_d,
                        k=cfg.k, w=cfg.w, cap=mcap)

    # target index over rows [t_off, t_off+nt) — skipped by the mxu fast
    # path (its pair finding + per-pair join never touch a global index)
    NA_pre = lens_d.shape[0] if ava else nq
    fast_ava = ava and _self_join_ok(NA_pre, Lq, mcap, cfg.seed_mode)
    index = None
    if not (fast_ava and cfg.seed_mode == "mxu" and Lq < (1 << 15)):
        if ava:
            tm = ms_all
        else:
            mcap_t = _round_up(int(2 * Lt / (cfg.w + 1)) + 64, 64)
            tm = minimizers(seqs_t_d, tlens_d, k=cfg.k, w=cfg.w, cap=mcap_t)
        index = seed_mod.build_index(tm, t_off, max_occ=cfg.max_occ)

    B = min(query_block, nq)
    P = pairs_per_block or _round_up(B * 32, 256)
    A = cfg.anchors_per_pair
    stats = stats if stats is not None else EngineStats()

    # whole-set fast path: small ava sets run ONE roll self-join block
    # (no [N, F] gathers, packed-key sort) instead of query-block joins —
    # this is the SR core's per-iteration overlap call, where the legacy
    # per-block gather join dominated cluster assembly time
    NA = lens_d.shape[0] if ava else nq      # padded ava row count
    if ava and _self_join_ok(NA, Lq, mcap, cfg.seed_mode):
        P_all = pairs_per_block or _round_up(NA * 24, 256)
        for _attempt in range(2):
            if cfg.seed_mode == "mxu" and Lq < (1 << 15):
                from hylight_tpu.overlap.seed_mxu import mxu_candidates
                cand = mxu_candidates(
                    ms_all, lens_d.astype(jnp.int32), bandwidth=64,
                    min_anchors=cfg.min_anchors, max_pairs=P_all,
                    anchors_per_pair=A, max_occ=cfg.max_occ, k=cfg.k,
                    n_reads=NA, max_len=Lq,
                    bucket_bits=cfg.mxu_bucket_bits, margin=cfg.mxu_margin,
                    join_frac=cfg.mxu_join_frac)
            else:
                # right-size the join fan-out to the longest surviving hash
                # run (bucketed to powers of two so compiles are reused):
                # deep max_occ settings otherwise pay for empty roll layers
                D = int(_max_run_len(index.hash, index.tid2s))
                join_occ = 2
                while join_occ < min(max(D, 2), cfg.max_occ):
                    join_occ *= 2
                join_occ = min(join_occ, cfg.max_occ)
                cand = seed_mod.self_join_candidates(
                    index, lens_d.astype(jnp.int32),
                    bandwidth=_ava_bandwidth(Lq),
                    min_anchors=cfg.min_anchors, max_pairs=P_all,
                    anchors_per_pair=A, max_occ=cfg.max_occ, k=cfg.k,
                    n_reads=NA, max_len=Lq, join_occ=join_occ)
            nw = int(cand.n_winners)
            if nw <= P_all:
                break
            # overflow would truncate pairs in flat row-major order (the
            # mxu path would drop ALL candidates of high-qid reads):
            # retry once at a bucketed cap sized from the exact count
            stats.pair_overflows += 1
            P_new = _round_up(nw, 4096)
            log.warning("self-join block: %d candidate pairs > cap %d; "
                        "retrying at cap %d", nw, P_all, P_new)
            P_all = P_new
        ch = refine_chains(cand, k=cfg.k, min_score=cfg.min_chain_score,
                           max_gap=cfg.max_gap)
        ext = extend_chains(ch, seqs_d, max_mismatch=snp_cap,
                            **extend_kwargs(cfg))
        sc = admission_filter(
            ch, ext, min_len=cfg.min_ovlp_len,
            min_identity=cfg.min_identity,
            max_overhang=cfg.max_overhang,
            overhang_ratio=cfg.overhang_ratio)
        table = _materialize(ch, ext, sc, 0)
        stats.blocks += 1
        stats.candidate_pairs += nw
        table = _dedup_best_per_pair(table)
        if cap_overlaps and table.n > 0:
            keep = cap_per_read(table.qid, table.tid, table.score,
                                cfg.max_overlaps_per_read)
            table = table.select(keep)
        stats.overlaps = table.n
        return table

    parts = []
    winner_counts = []
    n_blocks = math.ceil(nq / B)
    for bi in range(n_blocks):
        lo = bi * B
        hi_q = min(lo + B, nq)  # never slice into the target rows
        qm = type(ms_all)(hash=ms_all.hash[lo:hi_q],
                          pos=ms_all.pos[lo:hi_q],
                          strand=ms_all.strand[lo:hi_q],
                          count=ms_all.count[lo:hi_q])
        # final partial block: minimizer arrays are sliced short; pad rows
        nrow = qm.hash.shape[0]
        if nrow < B:
            pad = B - nrow
            qm = type(ms_all)(
                hash=jnp.pad(qm.hash, ((0, pad), (0, 0)),
                             constant_values=np.uint32(0xFFFFFFFF)),
                pos=jnp.pad(qm.pos, ((0, pad), (0, 0)), constant_values=-1),
                strand=jnp.pad(qm.strand, ((0, pad), (0, 0))),
                count=jnp.pad(qm.count, (0, pad)),
            )
        anchors = seed_mod.collect_anchors(
            qm, lo, index, max_hits=cfg.max_occ, dedup_self=ava)
        cand = seed_mod.group_candidates(
            anchors, lens_d, bandwidth=64, min_anchors=cfg.min_anchors,
            max_pairs=P, anchors_per_pair=A,
            row_size=mcap * cfg.max_occ, k=cfg.k)
        ch = refine_chains(cand, k=cfg.k, min_score=cfg.min_chain_score,
                           max_gap=cfg.max_gap)
        ext = extend_chains(ch, seqs_d, max_mismatch=snp_cap,
                            seqs_t=None if ava else seqs_t_d,
                            toff=t_off, **extend_kwargs(cfg))
        sc = admission_filter(
            ch, ext, min_len=cfg.min_ovlp_len, min_identity=cfg.min_identity,
            max_overhang=cfg.max_overhang, overhang_ratio=cfg.overhang_ratio)

        stats.blocks += 1
        winner_counts.append(cand.n_winners)

        parts.append(_materialize(ch, ext, sc, t_off))

    for bi, nw_d in enumerate(winner_counts):
        nw = int(nw_d)
        stats.candidate_pairs += nw
        if nw > P:
            stats.pair_overflows += 1
            log.warning("overlap block %d: %d candidate pairs > cap %d "
                        "(some dropped; raise pairs_per_block)", bi, nw, P)
    table = OverlapTable.concat(parts)
    table = _dedup_best_per_pair(table)
    if cap_overlaps and table.n > 0:
        keep = cap_per_read(table.qid, table.tid, table.score,
                            cfg.max_overlaps_per_read)
        table = table.select(keep)
    stats.overlaps = table.n
    return table


def _dedup_best_per_pair(table: OverlapTable) -> OverlapTable:
    """Keep the best-scoring overlap per (qid, tid) pair — the reference's
    fkey dedup (``filter_overlap_slr2.py:133``). Needed because long
    overlaps can emit one candidate window per diagonal-band cluster."""
    if table.n == 0:
        return table
    key = table.qid.astype(np.int64) * (int(table.tid.max()) + 1) + table.tid
    order = np.lexsort((-table.score, key))
    skey = key[order]
    first = np.concatenate([[True], skey[1:] != skey[:-1]])
    return table.select(order[first])


import functools as _functools
import jax as _jax


@_functools.partial(_jax.jit)
def _max_run_len(h, tid2s):
    """Longest surviving (non-repeat-masked) hash run of an index."""
    n = h.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    first = jnp.concatenate([jnp.ones(1, jnp.bool_), h[1:] != h[:-1]])
    run_lo = _jax.lax.cummax(jnp.where(first, iota, 0))
    last = jnp.concatenate([h[1:] != h[:-1], jnp.ones(1, jnp.bool_)])
    run_hi = _jax.lax.cummin(jnp.where(last, iota, n - 1), reverse=True)
    rl = run_hi - run_lo + 1
    return jnp.max(jnp.where(tid2s >= 0, rl, 0))


_MESH_FN_CACHE: Dict = {}


def _find_overlaps_mesh(reads: ReadSet, *, cfg: OverlapConfig, mesh,
                        pairs_per_block: Optional[int], snp_cap: int,
                        cap_overlaps: bool,
                        stats: Optional[EngineStats]) -> OverlapTable:
    """All-vs-all overlaps over a device mesh (ring exchange)."""
    import jax
    from hylight_tpu.parallel.mesh import SHARD_AXIS, shard_rows
    from hylight_tpu.parallel.sharded_overlap import make_ring_overlap_fn

    nd = mesh.shape[SHARD_AXIS]
    nq = reads.n
    if nq < 2:
        return _empty_table(snp_cap)
    L = bucket_len(max(1, int(reads.lengths.max())))
    N = _round_up(nq, nd)
    seqs, lens = reads.to_padded(max_len=L)
    if N > nq:                       # pad rows: no minimizers, no pairs
        seqs = np.pad(seqs, ((0, N - nq), (0, 0)))
        lens = np.pad(lens, (0, N - nq))
    mcap = _round_up(int(2 * L / (cfg.w + 1)) + 64, 64)
    n_loc = N // nd
    P = pairs_per_block or _round_up(n_loc * 16, 256)

    key = (id(mesh), cfg, mcap, P, snp_cap)
    fn = _MESH_FN_CACHE.get(key)
    if fn is None:
        fn = make_ring_overlap_fn(mesh, cfg, mcap=mcap, max_pairs=P,
                                  snp_cap=snp_cap)
        _MESH_FN_CACHE[key] = fn
    seqs_d = jax.device_put(jnp.asarray(seqs), shard_rows(mesh))
    lens_d = jax.device_put(jnp.asarray(lens), shard_rows(mesh))
    out, n_valid = fn(seqs_d, lens_d)

    valid = np.asarray(out["valid"])
    idx = np.nonzero(valid)[0]
    strand = np.asarray(out["strand"])[idx].astype(np.int8)
    tlen = np.asarray(out["tlen"])[idx]
    ts_a = np.asarray(out["ts"])[idx]
    te_a = np.asarray(out["te"])[idx]
    table = OverlapTable(
        qid=np.asarray(out["qid"])[idx],
        tid=np.asarray(out["tid"])[idx],
        strand=strand,
        qs=np.asarray(out["qs"])[idx], qe=np.asarray(out["qe"])[idx],
        ts=np.where(strand == 1, tlen - te_a, ts_a),
        te=np.where(strand == 1, tlen - ts_a, te_a),
        qlen=np.asarray(out["qlen"])[idx], tlen=tlen,
        matches=np.asarray(out["matches"])[idx],
        columns=np.asarray(out["columns"])[idx],
        identity=np.asarray(out["identity"])[idx],
        score=np.asarray(out["score"])[idx],
        score2=np.asarray(out["score2"])[idx],
        score3=np.asarray(out["score3"])[idx],
        mm_q=np.asarray(out["mm_q"])[idx],
        mm_t=np.asarray(out["mm_t"])[idx],
        mm_qb=np.asarray(out["mm_qb"])[idx],
        mm_tb=np.asarray(out["mm_tb"])[idx],
        mm_mask=np.asarray(out["mm_mask"])[idx],
    )
    table = _dedup_best_per_pair(table)
    if cap_overlaps and table.n > 0:
        keep = cap_per_read(table.qid, table.tid, table.score,
                            cfg.max_overlaps_per_read)
        table = table.select(keep)
    if stats is not None:
        stats.blocks += nd
        stats.overlaps = table.n
    return table


@_functools.partial(_jax.jit)
def _pack_outputs(ch, ext, sc):
    """Stack a block's outputs into 4 dtype-grouped device buffers.

    Under the axon tunnel every np.asarray is a full device roundtrip
    (~28 ms) and transfers the WHOLE buffer; packing turns ~20 fetches
    per block into 4 (CLAUDE.md environment gotchas)."""
    ints = jnp.stack([ch.qid, ch.tid, ch.strand.astype(jnp.int32),
                      ch.qs, ch.qe, ch.ts, ch.te, ch.qlen, ch.tlen,
                      ext.matches,
                      ext.columns + ext.unverified + ext.indels,
                      sc.valid.astype(jnp.int32)])
    flts = jnp.stack([ext.identity, sc.score, sc.score2, sc.score3])
    mmi = jnp.stack([ext.mm_q, ext.mm_t])
    mmb = jnp.stack([ext.mm_qb, ext.mm_tb,
                     ext.mm_mask.astype(jnp.int8)])
    return ints, flts, mmi, mmb


def _materialize(ch, ext, sc, t_off: int) -> OverlapTable:
    """Compact one block's valid overlaps to a host OverlapTable."""
    ints_d, flts_d, mmi_d, mmb_d = _pack_outputs(ch, ext, sc)
    ints = np.asarray(ints_d)
    flts = np.asarray(flts_d)
    mmi = np.asarray(mmi_d)
    mmb = np.asarray(mmb_d)
    (qid, tid, strand32, qs, qe, ts, te, qlen, tlen_r, matches, cols,
     valid) = ints
    idx = np.nonzero(valid != 0)[0]

    strand = strand32[idx].astype(np.int8)
    tlen = tlen_r[idx]
    ts_a = ts[idx]
    te_a = te[idx]
    ts_fwd = np.where(strand == 1, tlen - te_a, ts_a)
    te_fwd = np.where(strand == 1, tlen - ts_a, te_a)

    return OverlapTable(
        qid=qid[idx],
        tid=tid[idx] - t_off,
        strand=strand,
        qs=qs[idx], qe=qe[idx],
        ts=ts_fwd, te=te_fwd,
        qlen=qlen[idx], tlen=tlen,
        matches=matches[idx],
        columns=cols[idx],
        identity=flts[0][idx],
        score=flts[1][idx],
        score2=flts[2][idx],
        score3=flts[3][idx],
        mm_q=mmi[0][idx], mm_t=mmi[1][idx],
        mm_qb=mmb[0][idx].astype(np.int8), mm_tb=mmb[1][idx].astype(np.int8),
        mm_mask=mmb[2][idx] != 0,
    )


def _empty_table(snp_cap: int) -> OverlapTable:
    z = lambda dt: np.zeros(0, dtype=dt)  # noqa: E731
    z2 = lambda dt: np.zeros((0, snp_cap), dtype=dt)  # noqa: E731
    return OverlapTable(
        qid=z(np.int32), tid=z(np.int32), strand=z(np.int8),
        qs=z(np.int32), qe=z(np.int32), ts=z(np.int32), te=z(np.int32),
        qlen=z(np.int32), tlen=z(np.int32), matches=z(np.int32),
        columns=z(np.int32), identity=z(np.float32), score=z(np.float32),
        score2=z(np.float32), score3=z(np.float32),
        mm_q=z2(np.int32), mm_t=z2(np.int32), mm_qb=z2(np.int8),
        mm_tb=z2(np.int8), mm_mask=z2(bool),
    )


def find_overlaps_streamed(reads: ReadSet, *, cfg: OverlapConfig,
                           chunk: int = 8192, query_block: int = 64,
                           pairs_per_block: Optional[int] = None,
                           snp_cap: int = 128,
                           cap_overlaps: bool = True,
                           mesh=None,
                           stats: Optional[EngineStats] = None
                           ) -> OverlapTable:
    """All-vs-all overlaps for read sets too large for one padded matrix.

    The reference handles >5-10 GB long-read inputs by raising --nsplit so
    each file chunk fits (README.md:120-122). Here the read set is split
    into chunks of ``chunk`` reads; chunk pairs (i, i) run the ava path
    and (i, j<i ordering) the set-vs-set path, so at most two chunk
    matrices are device-resident at a time. Every unordered read pair is
    produced by exactly one chunk pair; best-per-pair dedup happens inside
    each call, the per-read overlap cap is applied globally at the end.
    """
    n = reads.n
    if n <= chunk:
        return find_overlaps(reads, cfg=cfg, query_block=query_block,
                             pairs_per_block=pairs_per_block,
                             snp_cap=snp_cap, cap_overlaps=cap_overlaps,
                             mesh=mesh, stats=stats)
    n_chunks = math.ceil(n / chunk)
    parts = []
    for ci in range(n_chunks):
        lo_i = ci * chunk
        hi_i = min(lo_i + chunk, n)
        sub_i = reads.subset(np.arange(lo_i, hi_i))
        t = find_overlaps(sub_i, cfg=cfg, query_block=query_block,
                          pairs_per_block=pairs_per_block, snp_cap=snp_cap,
                          cap_overlaps=False, stats=stats)
        t.qid += lo_i
        t.tid += lo_i
        parts.append(t)
        for cj in range(ci + 1, n_chunks):
            lo_j = cj * chunk
            hi_j = min(lo_j + chunk, n)
            sub_j = reads.subset(np.arange(lo_j, hi_j))
            t = find_overlaps(sub_i, targets=sub_j, cfg=cfg,
                              query_block=query_block,
                              pairs_per_block=pairs_per_block,
                              snp_cap=snp_cap, cap_overlaps=False,
                              stats=stats)
            t.qid += lo_i
            t.tid += lo_j
            parts.append(t)
    table = OverlapTable.concat(parts)
    if cap_overlaps and table.n > 0:
        keep = cap_per_read(table.qid, table.tid, table.score,
                            cfg.max_overlaps_per_read)
        table = table.select(keep)
    return table
