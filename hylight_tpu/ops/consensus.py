"""Pileup consensus / contig polishing (the racon-equivalent stage).

The reference polishes by shelling out to ``racon --no-trimming -u``
(``HyLight.py:152,182,203``: two long-read rounds then one short-read round)
with minimap2 re-mapping before each call. Here one device program does the
mapping (seed->chain, reusing the overlap engine ops) and the voting:

- every read-vs-contig chain projects its EQUAL-size inter-anchor gap
  columns onto the contig: an explicit (position, read-base) vote — these
  are the columns where a read may disagree with the draft;
- anchor k-mer columns and unverified regions agree with the draft by
  construction/assumption: they are counted implicitly as
  coverage - explicit_votes (coverage from chain extents);
- per column the winning base is argmax(2*votes + 1[draft]) — draft wins
  ties — and zero-coverage columns keep the draft base (racon's
  ``--no-trimming -u`` behavior of emitting unpolished windows);
- INDEL repair (the racon capability the round-1 kernel lacked): every
  UNEQUAL inter-anchor gap (dq != dt) pins a draft indel between two exact
  anchors. The divergence point p* (first read-vs-draft mismatch in the
  gap) localizes it: dq > dt means the draft is missing read bases —
  an insertion vote (position, base) before the divergence column; dq < dt
  means the draft carries extra bases — a deletion vote on the divergence
  column. One base per gap per round; multi-base indels converge over
  the iterated rounds (each round realigns against the updated draft).
  A >1/3-of-coverage threshold (not 1/2) admits an indel because '+' and
  '-' strand reads scan a multi-base divergence from opposite ends and can
  split their votes across the two run edges (homopolymer runs agree).

Votes accumulate on device into flat [total_contig_len] buffers via
scatter-add, so host traffic per round is O(total contig length), not
O(votes); the final variable-length splice is one vectorized host pass.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from hylight_tpu.config import OverlapConfig
from hylight_tpu.io.readset import ReadSet
from hylight_tpu.ops.minimizers import minimizers
from hylight_tpu.overlap import seed as seed_mod
from hylight_tpu.overlap.chain import Chains, refine_chains
from hylight_tpu.utils import get_logger

log = get_logger()


@functools.partial(jax.jit, static_argnames=("k", "gap_tile"),
                   donate_argnums=(3, 4, 5, 6))
def _vote_kernel(ch: Chains, seqs: jax.Array, tseqs: jax.Array,
                 votes: jax.Array, cov_diff: jax.Array,
                 ins_votes: jax.Array, del_votes: jax.Array,
                 t_offsets: jax.Array, t_off_row, valid: jax.Array,
                 *, k: int, gap_tile: int):
    """Accumulate explicit votes + coverage diffs for one chain block.

    votes: int32 [T * 4] flat (contig column, base) counts   (donated)
    cov_diff: int32 [T + 1] interval-diff coverage buffer     (donated)
    ins_votes: int32 [(T+1) * 4] insertion (before-column, base) (donated)
    del_votes: int32 [T + 1] deletion votes per column        (donated)
    t_offsets: int32 [n_rows] contig start offset per global row id
      (rows that are reads, not contigs, hold -1)
    tseqs: uint8 [nt, Lt] contig base matrix (row tid - t_off_row)
    """
    P, A = ch.aq.shape
    G = gap_tile
    T4 = votes.shape[0]
    Lt = tseqs.shape[1]

    dq = ch.aq[:, 1:] - ch.aq[:, :-1]
    dt = ch.at[:, 1:] - ch.at[:, :-1]
    link = ch.amask[:, 1:] & valid[:, None]
    equal = link & (dq == dt) & (dq > k)
    gap = jnp.where(equal, dq - k, 0)

    j = jnp.arange(G, dtype=jnp.int32)[None, None, :]
    q0 = (ch.aq[:, :-1] + k)[..., None] + j
    t0 = (ch.at[:, :-1] + k)[..., None] + j
    incol = (j < jnp.minimum(gap, G)[..., None]) & equal[..., None]

    qidx = jnp.clip(q0, 0, seqs.shape[1] - 1)
    qb = jnp.where(incol, seqs[ch.qid[:, None, None], qidx], 4)
    # contig-forward position and read base expressed in that frame
    strand = ch.strand[:, None, None]
    tlen = ch.tlen[:, None, None]
    t_fwd = jnp.where(strand == 1, tlen - 1 - t0, t0)
    b_fwd = jnp.where((strand == 1) & (qb < 4), 3 - qb, qb)

    off = t_offsets[ch.tid][:, None, None]
    key = (off + t_fwd) * 4 + b_fwd
    ok = incol & (qb < 4) & (off >= 0)
    key = jnp.where(ok, key, T4)  # OOB -> dropped
    votes = votes.at[key.reshape(-1)].add(1, mode="drop")

    # ----- indel votes from UNEQUAL gaps -------------------------------
    gq = dq - k
    gt = dt - k
    handle = link & (dq != dt) & (gq >= 0) & (gt >= 0) & \
        (gq <= G) & (gt <= G)
    inq = (j < gq[..., None]) & handle[..., None]
    intt = (j < gt[..., None]) & handle[..., None]
    qg = jnp.where(inq, seqs[ch.qid[:, None, None], qidx], 4)
    # draft bases at the gap's adjusted-frame columns
    tg_fwd_idx = jnp.clip(t_fwd, 0, Lt - 1)
    tid_row = jnp.clip(ch.tid - t_off_row, 0, tseqs.shape[0] - 1)
    tg_raw = tseqs[tid_row[:, None, None], tg_fwd_idx]
    tg_adj = jnp.where((strand == 1) & (tg_raw < 4), 3 - tg_raw, tg_raw)
    tg = jnp.where(intt & (t_fwd >= 0) & (t_fwd < tlen), tg_adj, 4)
    both = (qg < 4) & (tg < 4)
    scan = j < jnp.minimum(gq, gt)[..., None]
    diffm = (qg != tg) & both & scan
    has_diff = jnp.any(diffm, axis=-1)
    p_star = jnp.where(has_diff, jnp.argmax(diffm, axis=-1),
                       jnp.minimum(gq, gt)).astype(jnp.int32)
    delta = gq - gt
    t0_link = ch.at[:, :-1] + k                     # adjusted gap start
    col_adj = t0_link + p_star
    strand2 = ch.strand[:, None]
    tlen2 = ch.tlen[:, None]
    off2 = t_offsets[ch.tid][:, None]

    # insertion: read base missing from the draft, before fwd column slot
    b0 = jnp.take_along_axis(qg, jnp.clip(p_star, 0, G - 1)[..., None],
                             axis=-1)[..., 0]
    b0f = jnp.where((strand2 == 1) & (b0 < 4), 3 - b0, b0)
    slot = jnp.where(strand2 == 1, tlen2 - col_adj, col_adj)
    ins_ok = handle & (delta > 0) & (p_star < G) & (b0f < 4) & \
        (slot > 0) & (slot < tlen2) & (off2 >= 0)
    ikey = jnp.where(ins_ok, (off2 + slot) * 4 + b0f,
                     ins_votes.shape[0])
    ins_votes = ins_votes.at[ikey.reshape(-1)].add(1, mode="drop")

    # deletion: the draft's extra column at the divergence point
    dcol = jnp.where(strand2 == 1, tlen2 - 1 - col_adj, col_adj)
    del_ok = handle & (delta < 0) & (p_star < G) & \
        (dcol >= 0) & (dcol < tlen2) & (off2 >= 0)
    dkey = jnp.where(del_ok, off2 + dcol, del_votes.shape[0])
    del_votes = del_votes.at[dkey.reshape(-1)].add(1, mode="drop")

    # suffix substitution votes: past the indel, read column j aligns draft
    # column j - delta (single-indel model); voting these columns lets subs
    # inside unequal gaps converge too (equal gaps never see them)
    suff = handle[..., None] & \
        (j >= (p_star + jnp.maximum(delta, 0))[..., None]) & \
        (j < gq[..., None]) & (qg < 4)
    c_adj = (t0_link - delta)[..., None] + j
    c_rel = c_adj - t0_link[..., None]
    suff = suff & (c_rel >= 0) & (c_rel < gt[..., None])
    c_fwd = jnp.where(strand == 1, tlen - 1 - c_adj, c_adj)
    bq_fwd = jnp.where((strand == 1) & (qg < 4), 3 - qg, qg)
    skey = jnp.where(suff & (c_fwd >= 0) & (c_fwd < tlen) & (off >= 0),
                     (off + c_fwd) * 4 + bq_fwd, T4)
    votes = votes.at[skey.reshape(-1)].add(1, mode="drop")

    # ----- end-extension votes (racon polishes FULL windows; without
    # these, a draft error within ~k of a contig end sits beyond every
    # chain's terminal anchor and is never voted on). Extend from the
    # first/last anchor toward the read/contig boundaries under the
    # no-indel tail model, up to G columns per side; majority voting
    # absorbs the occasional misaligned tail. -------------------------
    rowsP = jnp.arange(P, dtype=jnp.int32)
    n_last = jnp.clip(ch.n_anchors - 1, 0, A - 1)
    aq0, at0 = ch.aq[:, 0], ch.at[:, 0]
    aqL, atL = ch.aq[rowsP, n_last], ch.at[rowsP, n_last]
    has = valid & (ch.n_anchors > 0)
    jj = jnp.arange(1, G + 1, dtype=jnp.int32)[None, :]
    strand2e = ch.strand[:, None]
    tlen2e = ch.tlen[:, None]
    off2e = t_offsets[ch.tid][:, None]

    def _ext_votes(votes, qpos, tpos, okm):
        b = jnp.where(okm, seqs[ch.qid[:, None],
                               jnp.clip(qpos, 0, seqs.shape[1] - 1)], 4)
        t_fwd = jnp.where(strand2e == 1, tlen2e - 1 - tpos, tpos)
        b_fwd = jnp.where((strand2e == 1) & (b < 4), 3 - b, b)
        keye = jnp.where(okm & (b < 4) & (off2e >= 0),
                         (off2e + t_fwd) * 4 + b_fwd, T4)
        return votes.at[keye.reshape(-1)].add(1, mode="drop")

    okL2 = has[:, None] & (aq0[:, None] - jj >= 0) & (at0[:, None] - jj >= 0)
    votes = _ext_votes(votes, aq0[:, None] - jj, at0[:, None] - jj, okL2)
    qR = (aqL + k - 1)[:, None] + jj
    tR = (atL + k - 1)[:, None] + jj
    okR2 = has[:, None] & (qR < ch.qlen[:, None]) & (tR < tlen2e)
    votes = _ext_votes(votes, qR, tR, okR2)
    extL = jnp.sum(okL2, axis=1).astype(jnp.int32)
    extR = jnp.sum(okR2, axis=1).astype(jnp.int32)

    # coverage from chain extents (forward frame), widened by the
    # end-extension spans so extension votes fall inside coverage
    ts_f = jnp.where(ch.strand == 1, ch.tlen - ch.te, ch.ts) \
        - jnp.where(ch.strand == 1, extR, extL)
    te_f = jnp.where(ch.strand == 1, ch.tlen - ch.ts, ch.te) \
        + jnp.where(ch.strand == 1, extL, extR)
    o1 = t_offsets[ch.tid]
    okc = valid & (o1 >= 0)
    s_key = jnp.where(okc, o1 + ts_f, cov_diff.shape[0])
    e_key = jnp.where(okc, o1 + te_f, cov_diff.shape[0])
    cov_diff = cov_diff.at[s_key].add(1, mode="drop")
    cov_diff = cov_diff.at[e_key].add(-1, mode="drop")
    return votes, cov_diff, ins_votes, del_votes


@jax.jit
def _consensus(votes4: jax.Array, cov_diff: jax.Array, draft: jax.Array):
    """votes4 [T,4], cov_diff [T+1], draft uint8 [T] -> new codes uint8 [T]."""
    cov = jnp.cumsum(cov_diff[:-1])
    tot = jnp.sum(votes4, axis=1)
    implicit = jnp.maximum(cov - tot, 0)
    d = jnp.minimum(draft.astype(jnp.int32), 3)
    is_acgt = draft < 4
    score = votes4 * 2 + jax.nn.one_hot(d, 4, dtype=jnp.int32) \
        * (implicit[:, None] * 2 + 1)
    new = jnp.argmax(score, axis=1).astype(jnp.uint8)
    keep_draft = (cov == 0) | (~is_acgt & (tot == 0))
    return jnp.where(keep_draft, draft, new)


def _apply_indels(codes: np.ndarray, cov: np.ndarray, ins4: np.ndarray,
                  del_v: np.ndarray, min_depth: int) -> np.ndarray:
    """Vectorized splice of the per-column sub consensus with the admitted
    insertion/deletion votes (one contig's slice of the flat buffers).

    An indel is admitted when its votes exceed 1/3 of the local coverage
    (see module docstring for why not 1/2) and coverage >= min_depth."""
    T = len(codes)
    if T == 0:
        return codes
    covc = np.maximum(cov, 0)
    dele = (3 * del_v > covc) & (del_v >= 1) & (covc >= min_depth)
    ins_tot = ins4.sum(axis=1)
    cov_at = np.maximum(covc, np.roll(covc, 1))
    ins = (3 * ins_tot > cov_at) & (ins_tot >= 1) & (cov_at >= min_depth)
    ins[0] = False                       # no insert before the first column
    if not dele.any() and not ins.any():
        return codes
    ins_base = ins4.argmax(axis=1).astype(np.uint8)
    keep = ~dele
    rep = keep.astype(np.int64) + ins.astype(np.int64)
    out = np.empty(int(rep.sum()), dtype=np.uint8)
    pos = np.cumsum(rep) - rep
    out[pos[ins]] = ins_base[ins]
    out[(pos + ins.astype(np.int64))[keep]] = codes[keep]
    return out


def polish_contigs(contigs: ReadSet, reads: ReadSet, *, cfg: OverlapConfig,
                   rounds: int = 1, query_block: int = 64,
                   min_identity: float = 0.75, min_len: int = 100,
                   pairs_per_block: Optional[int] = None,
                   min_depth: int = 1, fix_indels: bool = True,
                   snp_mc: Optional[int] = None, snp_long: bool = True,
                   snp_max_frac: float = 0.0025) -> ReadSet:
    """Polish draft contigs with reads (racon-equivalent, round-iterated).

    Indel repair converges one base per gap per round — callers polishing
    indel-rich drafts should iterate (the pipeline's LR x2 + SR rounds
    mirror ``HyLight.py:149-203``).

    snp_mc: when set, each round first maps reads->contigs through the
    full overlap engine, runs the cross-strain SNP filter on the mapping
    (``snp_filter_mapped``; mc=2 for LR rounds per HyLight.py:149, mc=3
    with snp_long=False for the SR round per :200) and BLOCKS the killed
    (read, contig) pairs from voting — wrong-strain reads never polish a
    contig (the strain separation the reference gets by feeding racon the
    filtered PAF).  The gate is an ALLOW-list: only (read, contig)
    mappings that exist in the filtered mapping pass AND survive the SNP
    filter may vote — a wrong-strain read whose mapping never passes that
    pass's admission cannot slip into the vote loop through the weaker
    maplen-only chain test (advisor r4)."""
    for _ in range(max(rounds, 0)):
        contigs = _polish_round(contigs, reads, cfg=cfg,
                                query_block=query_block,
                                min_identity=min_identity, min_len=min_len,
                                pairs_per_block=pairs_per_block,
                                min_depth=min_depth, fix_indels=fix_indels,
                                snp_mc=snp_mc, snp_long=snp_long,
                                snp_max_frac=snp_max_frac)
    return contigs


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _polish_round(contigs: ReadSet, reads: ReadSet, *, cfg: OverlapConfig,
                  query_block: int, min_identity: float, min_len: int,
                  pairs_per_block: Optional[int], min_depth: int = 1,
                  fix_indels: bool = True, snp_mc: Optional[int] = None,
                  snp_long: bool = True,
                  snp_max_frac: float = 0.0025) -> ReadSet:
    if contigs.n == 0 or reads.n == 0:
        return contigs
    from hylight_tpu.overlap.engine import bucket_len

    # strain-aware gate: map reads->contigs with mismatch events, run the
    # cross-strain SNP filter, and keep the ALLOW-list of surviving
    # (read, contig) pairs — only those may vote in the block loop below
    allowed_keys: Optional[np.ndarray] = None
    n_contigs_key = contigs.n
    if snp_mc is not None:
        from dataclasses import replace as _dc_replace
        from hylight_tpu.overlap.engine import find_overlaps
        from hylight_tpu.overlap.snp import snp_filter_mapped
        oc_map = _dc_replace(cfg, min_ovlp_len=min_len,
                             min_identity=min_identity)
        t_map = find_overlaps(reads, contigs, cfg=oc_map,
                              query_block=query_block, cap_overlaps=False)
        keep = np.zeros(0, dtype=bool)
        if t_map.n:
            keep = snp_filter_mapped(t_map, n_query_ids=reads.n, mc=snp_mc,
                                     max_frac=snp_max_frac,
                                     long_reads=snp_long)
        allowed_keys = np.unique(
            t_map.qid[keep].astype(np.int64) * n_contigs_key
            + t_map.tid[keep])
        if t_map.n and not keep.all():
            log.info("[C::polish] snp filter kills %d/%d read->contig "
                     "mappings (mc=%d)", int((~keep).sum()), t_map.n,
                     snp_mc)
    nq, nt = reads.n, contigs.n
    # reads and contigs get SEPARATE padded matrices (150 bp polishing
    # reads must not inflate to the contig length bucket); the vote kernel
    # only ever gathers QUERY rows, contigs enter via the flat vote space
    Lq = bucket_len(int(reads.lengths.max(initial=1)))
    Lt = bucket_len(int(contigs.lengths.max(initial=1)))
    qs_, qlens = reads.to_padded(max_len=Lq)
    ts_, tlens = contigs.to_padded(max_len=Lt)
    seqs = jnp.asarray(qs_)
    lens = jnp.asarray(np.concatenate([qlens, tlens]))
    t_off_row = nq

    # contig offsets in the flat vote space
    clens = contigs.lengths.astype(np.int64)
    offsets = np.concatenate([[0], np.cumsum(clens)])
    T = int(offsets[-1])
    t_offsets = np.full(nq + nt, -1, dtype=np.int32)
    t_offsets[nq:] = offsets[:-1]
    t_offsets_d = jnp.asarray(t_offsets)

    mcap = _round_up(int(2 * Lq / (cfg.w + 1)) + 64, 64)
    ms_all = minimizers(seqs, jnp.asarray(qlens), k=cfg.k, w=cfg.w, cap=mcap)
    mcap_t = _round_up(int(2 * Lt / (cfg.w + 1)) + 64, 64)
    tm = minimizers(jnp.asarray(ts_), jnp.asarray(tlens), k=cfg.k, w=cfg.w,
                    cap=mcap_t)
    index = seed_mod.build_index(tm, t_off_row, max_occ=cfg.max_occ)

    votes = jnp.zeros(T * 4, dtype=jnp.int32)
    cov_diff = jnp.zeros(T + 1, dtype=jnp.int32)
    ins_votes = jnp.zeros((T + 1) * 4, dtype=jnp.int32)
    del_votes = jnp.zeros(T + 1, dtype=jnp.int32)
    tseqs_d = jnp.asarray(ts_)

    B = min(query_block, nq)
    P = pairs_per_block or _round_up(B * 8, 256)
    for bi in range(math.ceil(nq / B)):
        lo = bi * B
        hi_q = min(lo + B, nq)  # never slice into the target rows
        nrow = hi_q - lo
        qm = type(ms_all)(hash=ms_all.hash[lo:hi_q],
                          pos=ms_all.pos[lo:hi_q],
                          strand=ms_all.strand[lo:hi_q],
                          count=ms_all.count[lo:hi_q])
        if nrow < B:
            pad = B - nrow
            qm = type(ms_all)(
                hash=jnp.pad(qm.hash, ((0, pad), (0, 0)),
                             constant_values=np.uint32(0xFFFFFFFF)),
                pos=jnp.pad(qm.pos, ((0, pad), (0, 0)), constant_values=-1),
                strand=jnp.pad(qm.strand, ((0, pad), (0, 0))),
                count=jnp.pad(qm.count, (0, pad)))
        anchors = seed_mod.collect_anchors(qm, lo, index,
                                           max_hits=cfg.max_occ,
                                           dedup_self=False)
        cand = seed_mod.group_candidates(anchors, lens, bandwidth=64,
                                         min_anchors=cfg.min_anchors,
                                         max_pairs=P,
                                         anchors_per_pair=cfg.anchors_per_pair,
                                         row_size=mcap * cfg.max_occ,
                                         k=cfg.k)
        ch = refine_chains(cand, k=cfg.k, min_score=cfg.min_chain_score,
                           max_gap=cfg.max_gap)
        maplen = jnp.maximum(ch.qe - ch.qs, ch.te - ch.ts)
        valid = ch.valid & (maplen >= min_len)
        if allowed_keys is not None:
            # allow-list gate: small [P] host fetch per block
            key = (np.asarray(ch.qid).astype(np.int64) * n_contigs_key
                   + (np.asarray(ch.tid) - t_off_row))
            ok = np.zeros(len(key), dtype=bool)
            pos = np.searchsorted(allowed_keys, key)
            inr = pos < len(allowed_keys)
            ok[inr] = allowed_keys[pos[inr]] == key[inr]
            valid = valid & jnp.asarray(ok)
        votes, cov_diff, ins_votes, del_votes = _vote_kernel(
            ch, seqs, tseqs_d, votes, cov_diff, ins_votes, del_votes,
            t_offsets_d, t_off_row, valid, k=cfg.k, gap_tile=cfg.gap_tile)

    draft = jnp.asarray(np.concatenate([contigs.get(i) for i in range(nt)])
                        if nt else np.zeros(0, np.uint8))
    new_codes = np.asarray(_consensus(votes.reshape(T, 4), cov_diff, draft))
    cov = np.cumsum(np.asarray(cov_diff)[:-1])
    ins4 = np.asarray(ins_votes).reshape(T + 1, 4)[:T]
    del_v = np.asarray(del_votes)[:T]

    seqs_out = []
    for i in range(nt):
        lo, hi = offsets[i], offsets[i + 1]
        c = new_codes[lo:hi]
        if fix_indels:
            c = _apply_indels(c, cov[lo:hi], ins4[lo:hi], del_v[lo:hi],
                              min_depth)
        seqs_out.append(c)
    return ReadSet.from_seqs(seqs_out, names=list(contigs.names))
