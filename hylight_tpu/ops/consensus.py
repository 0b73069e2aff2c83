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
  ``--no-trimming -u`` behavior of emitting unpolished windows).

Substitution-only: draft indel errors are not corrected by this kernel (the
drafts come from corrected reads; an indel-capable banded-DP polish is the
planned upgrade, SURVEY.md §7.2).

Votes accumulate on device into a flat [total_contig_len] buffer via
scatter-add, so host traffic per round is O(total contig length), not
O(votes).
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
                   donate_argnums=(2, 3))
def _vote_kernel(ch: Chains, seqs: jax.Array, votes: jax.Array,
                 cov_diff: jax.Array, t_offsets: jax.Array, valid: jax.Array,
                 *, k: int, gap_tile: int):
    """Accumulate explicit votes + coverage diffs for one chain block.

    votes: int32 [T * 4] flat (contig column, base) counts  (donated)
    cov_diff: int32 [T + 1] interval-diff coverage buffer    (donated)
    t_offsets: int32 [n_rows] contig start offset per global row id
      (rows that are reads, not contigs, hold -1)
    """
    P, A = ch.aq.shape
    G = gap_tile
    T4 = votes.shape[0]

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

    # coverage from chain extents (forward frame)
    ts_f = jnp.where(ch.strand == 1, ch.tlen - ch.te, ch.ts)
    te_f = jnp.where(ch.strand == 1, ch.tlen - ch.ts, ch.te)
    o1 = t_offsets[ch.tid]
    okc = valid & (o1 >= 0)
    s_key = jnp.where(okc, o1 + ts_f, cov_diff.shape[0])
    e_key = jnp.where(okc, o1 + te_f, cov_diff.shape[0])
    cov_diff = cov_diff.at[s_key].add(1, mode="drop")
    cov_diff = cov_diff.at[e_key].add(-1, mode="drop")
    return votes, cov_diff


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


def polish_contigs(contigs: ReadSet, reads: ReadSet, *, cfg: OverlapConfig,
                   rounds: int = 1, query_block: int = 64,
                   min_identity: float = 0.75, min_len: int = 100,
                   pairs_per_block: Optional[int] = None) -> ReadSet:
    """Polish draft contigs with reads (racon-equivalent, round-iterated)."""
    for _ in range(max(rounds, 0)):
        contigs = _polish_round(contigs, reads, cfg=cfg,
                                query_block=query_block,
                                min_identity=min_identity, min_len=min_len,
                                pairs_per_block=pairs_per_block)
    return contigs


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _polish_round(contigs: ReadSet, reads: ReadSet, *, cfg: OverlapConfig,
                  query_block: int, min_identity: float, min_len: int,
                  pairs_per_block: Optional[int]) -> ReadSet:
    if contigs.n == 0 or reads.n == 0:
        return contigs
    from hylight_tpu.overlap.engine import bucket_len
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

    votes = jnp.zeros(T * 4 , dtype=jnp.int32)
    cov_diff = jnp.zeros(T + 1, dtype=jnp.int32)

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
        votes, cov_diff = _vote_kernel(ch, seqs, votes, cov_diff,
                                       t_offsets_d, valid, k=cfg.k,
                                       gap_tile=cfg.gap_tile)

    draft = jnp.asarray(np.concatenate([contigs.get(i) for i in range(nt)])
                        if nt else np.zeros(0, np.uint8))
    new_codes = np.asarray(_consensus(votes.reshape(T, 4), cov_diff, draft))

    seqs_out = [new_codes[offsets[i]:offsets[i + 1]] for i in range(nt)]
    return ReadSet.from_seqs(seqs_out, names=list(contigs.names))
