"""K-mer-spectrum read correction (bfc / fmlrc2 capability).

The reference shells out to ``bfc -s 3g`` for short reads (``HyLight.py:87``)
and ``ropebwt2 + fmlrc2-convert + fmlrc2 x3`` for long reads
(``HyLight.py:106-110``). TPU-native replacement:

- spectrum: exact canonical k-mer counting (k <= 32; codes are held as two
  uint32 lanes on device — JAX x64 stays off — and combined to exact uint64
  on host) over the short-read set via one device pass + host unique;
- membership on device: the solid set is stored as a sorted uint32 hash
  table (h1 sorted, h2 companion); a query is present iff one of the F
  slots at searchsorted(h1) matches both 32-bit hashes. False positives are
  ~|S|/2^64 — far below bfc's own Bloom-filter rate;
- correction: for every read position whose covering k-mers include a weak
  one, try the 3 substitutions; a substitution is applied when it turns all
  covering k-mers solid while the original base leaves a weak one (the
  greedy single-substitution rule, applied per sweep; fmlrc-style multiple
  rounds re-apply the sweep with the fixed bases).

Indel repair (fmlrc2 capability, ``HyLight.py:106-110``): with
``indels=True`` each sweep additionally scores a single-base deletion and
the four single-base insertions at every position, by digit surgery on the
two-lane codes (a deletion k-mer spanning removed base p blends the high
digits of code(s) with the low digits of code(s+1); an insertion splices a
new digit into code(s) shifted one digit down) — no re-encoding pass. An
edit is applied when every novel k-mer it creates is solid while the
original base leaves a weak covering k-mer; edits are applied host-side
with a >k spacing rule per sweep (edits never interact within one sweep),
and multiple ``rounds`` converge the rest — the same
anchor-and-bridge-by-spectrum behavior as fmlrc's short-k pass. Short-read
(bfc) mode keeps the substitution-only model, matching bfc itself.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hylight_tpu.io.readset import ReadSet
from hylight_tpu.overlap.engine import bucket_len
from hylight_tpu.utils import get_logger

log = get_logger()

_LOOKUP_F = 4  # consecutive h1 slots probed per membership query


def _mix32(x, c1, c2):
    """32-bit avalanche mix (murmur3 finalizer family); works for both
    jnp uint32 arrays and np uint32 arrays."""
    x = x ^ (x >> 16)
    x = x * c1
    x = x ^ (x >> 13)
    x = x * c2
    x = x ^ (x >> 16)
    return x


def _hash_pair(hi, lo, xp=jnp):
    """Two independent 32-bit hashes of a (hi, lo) uint32 code pair."""
    u32 = xp.uint32
    h1 = _mix32(lo ^ _mix32(hi, u32(0x85EBCA6B), u32(0xC2B2AE35)),
                u32(0xCC9E2D51), u32(0x1B873593))
    h2 = _mix32(hi ^ _mix32(lo, u32(0x27D4EB2F), u32(0x165667B1)),
                u32(0x9E3779B9), u32(0x85EBCA77))
    return h1, h2


def _kmer_lanes(seqs: jax.Array, lens: jax.Array, k: int):
    """Forward/RC k-mer codes per position as uint32 lane pairs.

    Returns (f_hi, f_lo, r_hi, r_lo, valid): digit d of the 2k-bit code
    lives in lo bits [2d, 2d+2) for d < 16, else in hi bits [2(d-16), ...).
    Forward digit d = k-1-j holds base j; RC digit d = j holds 3-base[j].
    """
    B, L = seqs.shape
    Lk = L - k + 1
    f_hi = jnp.zeros((B, Lk), jnp.uint32)
    f_lo = jnp.zeros((B, Lk), jnp.uint32)
    r_hi = jnp.zeros((B, Lk), jnp.uint32)
    r_lo = jnp.zeros((B, Lk), jnp.uint32)
    has_n = jnp.zeros((B, Lk), jnp.bool_)
    for j in range(k):
        base = jax.lax.slice(seqs, (0, j), (B, j + Lk)).astype(jnp.uint32)
        is_n = base >= 4
        b = jnp.where(is_n, 0, base)
        df = k - 1 - j
        if df < 16:
            f_lo = f_lo | (b << jnp.uint32(2 * df))
        else:
            f_hi = f_hi | (b << jnp.uint32(2 * (df - 16)))
        rb = jnp.uint32(3) - b
        if j < 16:
            r_lo = r_lo | (rb << jnp.uint32(2 * j))
        else:
            r_hi = r_hi | (rb << jnp.uint32(2 * (j - 16)))
        has_n = has_n | is_n
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, Lk), 1)
    valid = (~has_n) & (pos + k <= lens[:, None])
    return f_hi, f_lo, r_hi, r_lo, valid


def _canon(f_hi, f_lo, r_hi, r_lo):
    fwd_lt = (f_hi < r_hi) | ((f_hi == r_hi) & (f_lo <= r_lo))
    hi = jnp.where(fwd_lt, f_hi, r_hi)
    lo = jnp.where(fwd_lt, f_lo, r_lo)
    return hi, lo


@functools.partial(jax.jit, static_argnames=("k",))
def _collect_lanes(seqs, lens, *, k, quals=None, qthresh=None):
    f_hi, f_lo, r_hi, r_lo, valid = _kmer_lanes(seqs, lens, k)
    hi, lo = _canon(f_hi, f_lo, r_hi, r_lo)
    if quals is not None:
        # quality-aware counting (bfc -q behavior, HyLight.py:87): an
        # occurrence counts toward solidity only when EVERY base of the
        # k-mer has phred >= qthresh — sequencing-error k-mers carry at
        # least one low-quality base and never accumulate support
        q = quals.astype(jnp.int32)
        qmin = -jax.lax.reduce_window(
            -q, jnp.int32(-(1 << 30)), jax.lax.max, (1, k), (1, 1),
            "valid")
        valid = valid & (qmin >= qthresh)
    sentinel = jnp.uint32(0xFFFFFFFF)
    return (jnp.where(valid, hi, sentinel).reshape(-1),
            jnp.where(valid, lo, sentinel).reshape(-1))


def build_spectrum(reads: ReadSet, *, k: int, min_count: int,
                   block: int = 4096, qual_thresh: int = 0
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (sorted unique solid k-mer codes as uint64, their counts).

    qual_thresh > 0 with phred-carrying reads enables bfc's quality-aware
    counting: only occurrences whose k bases all have phred >= qual_thresh
    count toward the >= min_count solidity rule."""
    assert k <= 32, "k-mer codes are 2k <= 64 bits"
    L = bucket_len(int(reads.lengths.max(initial=1)))
    use_qual = qual_thresh > 0 and reads.qual is not None
    all_codes = []
    for lo_i in range(0, reads.n, block):
        sub = reads.subset(np.arange(lo_i, min(lo_i + block, reads.n)))
        seqs, lens = sub.to_padded(max_len=L)
        if use_qual:
            quals = np.zeros(seqs.shape, np.uint8)
            for i in range(sub.n):
                qv = sub.get_qual(i)
                quals[i, :len(qv)] = qv
            hi, lo = _collect_lanes(jnp.asarray(seqs), jnp.asarray(lens),
                                    k=k, quals=jnp.asarray(quals),
                                    qthresh=jnp.int32(qual_thresh))
        else:
            hi, lo = _collect_lanes(jnp.asarray(seqs), jnp.asarray(lens),
                                    k=k)
        hi = np.asarray(hi).astype(np.uint64)
        lo = np.asarray(lo).astype(np.uint64)
        u64 = (hi << np.uint64(32)) | lo
        all_codes.append(u64[u64 != np.uint64(0xFFFFFFFFFFFFFFFF)])
    if not all_codes:
        return np.zeros(0, np.uint64), np.zeros(0, np.int64)
    codes = np.concatenate(all_codes)
    uniq, counts = np.unique(codes, return_counts=True)
    solid = counts >= min_count
    log.info("[K::spectrum] %d kmers, %d solid (>=%d%s)", len(uniq),
             int(solid.sum()), min_count,
             f", q>={qual_thresh}" if use_qual else "")
    return uniq[solid], counts[solid]


def spectrum_tables(solid_u64: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Hash the solid set into device lookup tables (h1 sorted asc, h2)."""
    hi = (solid_u64 >> np.uint64(32)).astype(np.uint32)
    lo = solid_u64.astype(np.uint32)
    h1, h2 = _hash_pair(hi, lo, xp=np)
    order = np.argsort(h1, kind="stable")
    return np.ascontiguousarray(h1[order]), np.ascontiguousarray(h2[order])


def _member(h1s, h2s, q_hi, q_lo):
    """Membership of (hi, lo) code pairs in the hashed solid set."""
    q1, q2 = _hash_pair(q_hi, q_lo)
    shape = q1.shape
    q1f = q1.reshape(-1)
    q2f = q2.reshape(-1)
    pos = jnp.searchsorted(h1s, q1f, side="left", method="sort")
    hit = jnp.zeros(q1f.shape, jnp.bool_)
    n = h1s.shape[0]
    for f in range(_LOOKUP_F):
        idx = jnp.minimum(pos + f, n - 1)
        hit = hit | ((h1s[idx] == q1f) & (h2s[idx] == q2f))
    return hit.reshape(shape)


def _roll_accum(hit, jv, L):
    """Contribution of per-start hits to positions p = s + j, with
    non-covered columns counting True (the edge rule): pad the [B, Lk]
    hits to [B, L] with True on the right, then roll right by the traced
    offset — the wrapped-in prefix is the True padding."""
    B, Lk = hit.shape
    hitL = jnp.pad(hit, ((0, 0), (0, L - Lk)), constant_values=True)
    return jnp.roll(hitL, jv, axis=1).astype(jnp.int32)


def _sub_steps(k: int):
    """Per-offset scan constants for the substitution sweep."""
    js = np.arange(k)
    df = k - 1 - js
    return dict(
        f_in_hi=jnp.asarray(df >= 16),
        f_sh=jnp.asarray(np.where(df < 16, 2 * df,
                                  2 * (df - 16)).astype(np.uint32)),
        r_in_hi=jnp.asarray(js >= 16),
        r_sh=jnp.asarray(np.where(js < 16, 2 * js,
                                  2 * (js - 16)).astype(np.uint32)),
        j=jnp.asarray(js.astype(np.int32)))


@functools.partial(jax.jit, static_argnames=("k",))
def _correct_block(seqs, lens, h1s, h2s, *, k):
    """One correction sweep. Returns corrected seqs (uint8 [B, L]).

    The per-(base, offset) trial loop runs as a ``lax.scan`` over
    precomputed digit-mask constants (round-4 stabilization: the fully
    unrolled 4*k-way program was the largest HLO in the repo and the
    compile the long-run segfaults landed on; the scan body is ~k times
    smaller and compiles ~10x faster)."""
    B, L = seqs.shape
    Lk = L - k + 1

    f_hi, f_lo, r_hi, r_lo, valid = _kmer_lanes(seqs, lens, k)
    c_hi, c_lo = _canon(f_hi, f_lo, r_hi, r_lo)
    base_solid = jnp.where(valid, _member(h1s, h2s, c_hi, c_lo), True)

    # per-position: number of weak covering k-mers, via windowed sum
    weak = (~base_solid).astype(jnp.int32)
    # covering k-mers of position p: starts in [p-k+1, p]
    wpad = jnp.pad(weak, ((0, 0), (k - 1, k - 1)))
    cover_weak = jax.lax.reduce_window(
        wpad, np.int32(0), jax.lax.add, (1, k), (1, 1), "valid")[:, :L]

    # trial substitutions: for each base b and in-kmer offset j, the trial
    # code differs from the original in one forward digit and one RC digit;
    # set both lanes accordingly, re-canonicalize, and test membership.
    steps = _sub_steps(k)
    best_gain = jnp.zeros((B, L), jnp.int32)
    best_base = seqs
    for b in range(4):
        def body(gain, xs, b=b):
            m_f = jnp.uint32(3) << xs["f_sh"]
            d_f = jnp.uint32(b) << xs["f_sh"]
            tf_lo = jnp.where(xs["f_in_hi"], f_lo, (f_lo & ~m_f) | d_f)
            tf_hi = jnp.where(xs["f_in_hi"], (f_hi & ~m_f) | d_f, f_hi)
            m_r = jnp.uint32(3) << xs["r_sh"]
            d_r = jnp.uint32(3 - b) << xs["r_sh"]
            tr_lo = jnp.where(xs["r_in_hi"], r_lo, (r_lo & ~m_r) | d_r)
            tr_hi = jnp.where(xs["r_in_hi"], (r_hi & ~m_r) | d_r, r_hi)
            t_hi, t_lo = _canon(tf_hi, tf_lo, tr_hi, tr_lo)
            hit = jnp.where(valid, _member(h1s, h2s, t_hi, t_lo), True)
            return gain + _roll_accum(hit, xs["j"], L), None

        gain_b, _ = jax.lax.scan(body, jnp.zeros((B, L), jnp.int32), steps)
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


def _digit_mask(t: int, k: int) -> Tuple[np.uint32, np.uint32]:
    """(lo, hi) lane masks selecting digits d < t of a 2k-bit code."""
    full = (1 << (2 * k)) - 1
    m = ((1 << (2 * t)) - 1) & full
    return np.uint32(m & 0xFFFFFFFF), np.uint32(m >> 32)


def _shift_down(hi, lo):
    """Code >> one digit (drop digit 0, digit d+1 -> d)."""
    return hi >> jnp.uint32(2), (lo >> jnp.uint32(2)) | (hi << jnp.uint32(30))


def _shift_up(hi, lo):
    """Code << one digit (digit d -> d+1, top digit dropped by masks)."""
    return (hi << jnp.uint32(2)) | (lo >> jnp.uint32(30)), lo << jnp.uint32(2)


@functools.partial(jax.jit, static_argnames=("k",))
def _indel_scores_block(seqs, lens, h1s, h2s, *, k):
    """Score single-base deletion / insertion repairs at every position.

    Returns (del_ok, ins_ok, ins_base): bool [B, L] apply masks and the
    uint8 [B, L] insertion base. del_ok[p]: removing base p makes all k-1
    novel k-mers (blends of the flanks) solid while p currently has a weak
    covering k-mer. ins_ok[p]: inserting ins_base[p] BEFORE position p
    makes all k novel k-mers solid, ditto. Out-of-range trial k-mers count
    as solid (same edge rule as the substitution sweep).
    """
    B, L = seqs.shape
    Lk = L - k + 1

    f_hi, f_lo, r_hi, r_lo, valid = _kmer_lanes(seqs, lens, k)
    c_hi, c_lo = _canon(f_hi, f_lo, r_hi, r_lo)
    base_solid = jnp.where(valid, _member(h1s, h2s, c_hi, c_lo), True)
    weak = (~base_solid).astype(jnp.int32)
    wpad = jnp.pad(weak, ((0, 0), (k - 1, k - 1)))
    cover_weak = jax.lax.reduce_window(
        wpad, np.int32(0), jax.lax.add, (1, k), (1, 1), "valid")[:, :L]
    in_read = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1) < lens[:, None]

    def nxt(x, fill):
        """code arrays shifted to start s+1 (same [B, Lk] shape)."""
        return jnp.concatenate(
            [x[:, 1:], jnp.full((B, 1), fill, x.dtype)], axis=1)

    f_hi1, f_lo1 = nxt(f_hi, jnp.uint32(0)), nxt(f_lo, jnp.uint32(0))
    r_hi1, r_lo1 = nxt(r_hi, jnp.uint32(0)), nxt(r_lo, jnp.uint32(0))
    valid1 = nxt(valid, False)

    # --- deletion of base p: novel k-mer at start s = p - m, m in 1..k-1
    # blends digits d >= k-m of code(s) with digits d < k-m of code(s+1)
    # (forward), and RC digits j < m of rc(s) with j >= m of rc(s+1).
    # Runs as a lax.scan over precomputed per-m digit masks (see
    # _correct_block: the unrolled variant was the segfaulting compile).
    ms = np.arange(1, k)
    dmask = np.array([_digit_mask(k - m, k) for m in ms])      # [k-1, 2]
    rmask = np.array([_digit_mask(m, k) for m in ms])
    del_steps = dict(
        lo_m=jnp.asarray(dmask[:, 0]), hi_m=jnp.asarray(dmask[:, 1]),
        rlo_m=jnp.asarray(rmask[:, 0]), rhi_m=jnp.asarray(rmask[:, 1]),
        m=jnp.asarray(ms.astype(np.int32)))

    def del_body(gain, xs):
        t_flo = (f_lo & ~xs["lo_m"]) | (f_lo1 & xs["lo_m"])
        t_fhi = (f_hi & ~xs["hi_m"]) | (f_hi1 & xs["hi_m"])
        t_rlo = (r_lo & xs["rlo_m"]) | (r_lo1 & ~xs["rlo_m"])
        t_rhi = (r_hi & xs["rhi_m"]) | (r_hi1 & ~xs["rhi_m"])
        t_hi, t_lo = _canon(t_fhi, t_flo, t_rhi, t_rlo)
        ok = valid & valid1
        hit = jnp.where(ok, _member(h1s, h2s, t_hi, t_lo), True)
        # start s contributes to deleted position p = s + m
        return gain + _roll_accum(hit, xs["m"], L), None

    del_gain, _ = jax.lax.scan(del_body, jnp.zeros((B, L), jnp.int32),
                               del_steps)
    del_ok = (del_gain == k - 1) & (cover_weak > 0) & in_read

    # --- insertion of base b before p: novel k-mer at start s = p - m,
    # m in 0..k-1: digits d > k-1-m from code(s), digit k-1-m = b,
    # digits d < k-1-m from code(s) >> one digit.
    sf_hi, sf_lo = _shift_down(f_hi, f_lo)
    sr_hi, sr_lo = _shift_up(r_hi, r_lo)
    mi = np.arange(k)
    ti = k - 1 - mi
    imask = np.array([_digit_mask(t, k) for t in ti])           # digits < t
    imask1 = np.array([_digit_mask(t + 1, k) for t in ti])
    irm = np.array([_digit_mask(m, k) for m in mi])
    irm1 = np.array([_digit_mask(m + 1, k) for m in mi])
    fulllo, fullhi = _digit_mask(k, k)
    ins_steps = dict(
        lo_m=jnp.asarray(imask[:, 0]), hi_m=jnp.asarray(imask[:, 1]),
        keep_lo=jnp.asarray((~imask1[:, 0]).astype(np.uint32)),
        keep_hi=jnp.asarray((~imask1[:, 1]).astype(np.uint32)),
        f_in_lo=jnp.asarray(ti < 16),
        f_sh=jnp.asarray(np.where(ti < 16, 2 * ti,
                                  2 * (ti - 16)).astype(np.uint32)),
        rlo_m=jnp.asarray(irm[:, 0]), rhi_m=jnp.asarray(irm[:, 1]),
        nrlo_m1=jnp.asarray((fulllo & ~irm1[:, 0]).astype(np.uint32)),
        nrhi_m1=jnp.asarray((fullhi & ~irm1[:, 1]).astype(np.uint32)),
        r_in_lo=jnp.asarray(mi < 16),
        r_sh=jnp.asarray(np.where(mi < 16, 2 * mi,
                                  2 * (mi - 16)).astype(np.uint32)),
        m=jnp.asarray(mi.astype(np.int32)))

    best_ins_gain = jnp.zeros((B, L), jnp.int32)
    best_ins_base = jnp.zeros((B, L), jnp.uint8)
    for b in range(4):
        def ins_body(gain, xs, b=b):
            d_val = jnp.uint32(b) << xs["f_sh"]
            d_lo = jnp.where(xs["f_in_lo"], d_val, jnp.uint32(0))
            d_hi = jnp.where(xs["f_in_lo"], jnp.uint32(0), d_val)
            t_flo = (f_lo & xs["keep_lo"]) | d_lo | (sf_lo & xs["lo_m"])
            t_fhi = (f_hi & xs["keep_hi"]) | d_hi | (sf_hi & xs["hi_m"])
            # rc: digits j < m from rc(s); digit m = 3-b; j > m from
            # rc(s) << one digit
            rd_val = jnp.uint32(3 - b) << xs["r_sh"]
            rd_lo = jnp.where(xs["r_in_lo"], rd_val, jnp.uint32(0))
            rd_hi = jnp.where(xs["r_in_lo"], jnp.uint32(0), rd_val)
            t_rlo = (r_lo & xs["rlo_m"]) | rd_lo | (sr_lo & xs["nrlo_m1"])
            t_rhi = (r_hi & xs["rhi_m"]) | rd_hi | (sr_hi & xs["nrhi_m1"])
            t_hi, t_lo = _canon(t_fhi, t_flo, t_rhi, t_rlo)
            hit = jnp.where(valid, _member(h1s, h2s, t_hi, t_lo), True)
            return gain + _roll_accum(hit, xs["m"], L), None

        gain_b, _ = jax.lax.scan(ins_body, jnp.zeros((B, L), jnp.int32),
                                 ins_steps)
        better = gain_b > best_ins_gain
        best_ins_gain = jnp.where(better, gain_b, best_ins_gain)
        best_ins_base = jnp.where(better, jnp.uint8(b), best_ins_base)
    ins_ok = (best_ins_gain == k) & (cover_weak > 0) & in_read

    return del_ok, ins_ok, best_ins_base


def correct_reads(reads: ReadSet, spectrum_reads: Optional[ReadSet] = None,
                  *, k: int = 25, min_count: int = 3, rounds: int = 1,
                  block: int = 2048, indels: bool = False,
                  qual_thresh: int = 0) -> ReadSet:
    """Correct ``reads`` against the k-mer spectrum of ``spectrum_reads``
    (default: the reads themselves — the bfc mode; pass the short reads to
    correct long reads — the fmlrc mode with ``rounds=3`` and
    ``indels=True``). With indels, each round runs the substitution sweep
    on device, then scores single-base del/ins repairs on the result and
    applies non-interacting ones host-side (read lengths may change).
    qual_thresh: see build_spectrum — quality-aware solidity counting."""
    assert k <= 32
    src = spectrum_reads if spectrum_reads is not None else reads
    solid, _ = build_spectrum(src, k=k, min_count=min_count,
                              qual_thresh=qual_thresh)
    if len(solid) == 0:
        return reads
    h1s_np, h2s_np = spectrum_tables(solid)
    h1s = jnp.asarray(h1s_np)
    h2s = jnp.asarray(h2s_np)
    L = bucket_len(int(reads.lengths.max(initial=1)))

    out_seqs = []
    out_quals = [] if reads.qual is not None else None
    total_fixed = 0
    total_indels = 0
    for lo in range(0, reads.n, block):
        idx = np.arange(lo, min(lo + block, reads.n))
        sub = reads.subset(idx)
        cur = [sub.get(i) for i in range(sub.n)]
        curq = [sub.get_qual(i) for i in range(sub.n)] \
            if reads.qual is not None else None
        for _ in range(rounds):
            seqs, lens = _pad_list(cur, L)
            seqs_d = jnp.asarray(seqs)
            lens_d = jnp.asarray(lens)
            seqs_d, n_fixed = _correct_block(seqs_d, lens_d, h1s, h2s, k=k)
            total_fixed += int(n_fixed)
            arr = np.asarray(seqs_d)
            cur = [arr[i, :len(cur[i])] for i in range(len(cur))]
            if not indels:
                continue
            d_ok, i_ok, i_b = _indel_scores_block(seqs_d, lens_d, h1s, h2s,
                                                  k=k)
            d_ok = np.asarray(d_ok)
            i_ok = np.asarray(i_ok)
            i_b = np.asarray(i_b)
            for i in range(len(cur)):
                s2, q2, ne = _apply_indel_edits_q(
                    cur[i], curq[i] if curq is not None else None,
                    d_ok[i], i_ok[i], i_b[i], k)
                total_indels += ne
                cur[i] = s2
                if curq is not None:
                    curq[i] = q2
        out_seqs.extend(cur)
        if out_quals is not None:
            out_quals.extend(curq)
    log.info("[K::correct] fixed %d bases (+%d indel edits) over %d reads",
             total_fixed, total_indels, reads.n)
    return ReadSet.from_seqs(out_seqs, quals=out_quals,
                             names=list(reads.names))


def _pad_list(seq_list, L):
    n = len(seq_list)
    seqs = np.full((n, L), 4, np.uint8)
    lens = np.zeros(n, np.int32)
    for i, s in enumerate(seq_list):
        m = min(len(s), L)
        seqs[i, :m] = s[:m]
        lens[i] = m
    return seqs, lens


def _apply_indel_edits_q(seq, qual, del_ok, ins_ok, ins_base, k):
    """Apply non-interacting del/ins edits (>k spacing) to one read and,
    when present, its phred array (inserted bases take the left neighbour's
    qual). Returns (seq, qual, n_edits)."""
    L = len(seq)
    pos = np.nonzero(del_ok[:L] | ins_ok[:L])[0]
    if len(pos) == 0:
        return seq, qual, 0
    pieces, qpieces = [], []
    prev = 0
    last_edit = -(k + 1)
    n_edits = 0
    for p in pos:
        p = int(p)
        if p - last_edit <= k:
            continue
        last_edit = p
        n_edits += 1
        if del_ok[p]:
            pieces.append(seq[prev:p])
            if qual is not None:
                qpieces.append(qual[prev:p])
            prev = p + 1
        else:
            pieces.append(seq[prev:p])
            pieces.append(np.asarray([ins_base[p]], dtype=seq.dtype))
            if qual is not None:
                qpieces.append(qual[prev:p])
                qv = qual[p - 1] if p > 0 else (qual[p] if L else 15)
                qpieces.append(np.asarray([qv], dtype=qual.dtype))
            prev = p
    pieces.append(seq[prev:])
    if qual is not None:
        qpieces.append(qual[prev:])
        return (np.concatenate(pieces), np.concatenate(qpieces), n_edits)
    return np.concatenate(pieces), None, n_edits
