"""Device-side overlap admission filters.

Reimplements the reference's PAF filter cascade
(``filter_overlap_slr2.py:90-152`` + ``filter_trans_ovlp_inline_v4.py``):

- minimum overlap length (``len_over``, ``:105``)
- minimum identity (``:146``)
- internal-match rejection by the minimap-paper Algorithm 5 overhang test
  (``:116-131``): overhang = min(qs', ts') + min(qlen-qe', tlen-te') in the
  strand-adjusted frame; drop if > min(max_overhang, ratio * maplen)
- the three appended scores (``:142-152``)
- per-read overlap cap (60, ``filter_trans_ovlp_inline_v4.py:74-83``) —
  applied on score-descending order (the reference caps in stream order;
  score order is deterministic and strictly better)

All operate on fixed-shape [P] arrays with validity masks.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from hylight_tpu.overlap.chain import Chains
from hylight_tpu.overlap.extend import Extensions

INT_MAX = np.int32(0x7FFFFFFF)


class ScoredOverlaps(NamedTuple):
    """Chains + extensions after admission filtering (still [P] masked)."""

    valid: jax.Array     # bool [P]
    contained: jax.Array  # int8 [P] 0=dovetail, 1=query contained, 2=target
    score: jax.Array     # float32 [P]
    score2: jax.Array    # float32 [P]
    score3: jax.Array    # float32 [P]


@functools.partial(jax.jit, static_argnames=())
def admission_filter(ch: Chains, ext: Extensions, *,
                     min_len, min_identity, max_overhang,
                     overhang_ratio) -> ScoredOverlaps:
    qs, qe, ts, te = ch.qs, ch.qe, ch.ts, ch.te
    qlen, tlen = ch.qlen, ch.tlen

    maplen = jnp.maximum(qe - qs, te - ts)
    overhang = jnp.minimum(qs, ts) + jnp.minimum(qlen - qe, tlen - te)
    oh_limit = jnp.minimum(jnp.int32(max_overhang),
                           (overhang_ratio * maplen).astype(jnp.int32))
    internal = overhang > oh_limit

    q_contained = (qs >= ts) & (qlen - qe <= tlen - te)
    t_contained = (qs <= ts) & (qlen - qe >= tlen - te)
    contained = jnp.where(q_contained, 1, jnp.where(t_contained, 2, 0)) \
        .astype(jnp.int8)

    m = ext.matches.astype(jnp.float32)
    # extrapolated matches over the full alignment (identity * columns)
    cols = (ext.columns + ext.unverified + ext.indels).astype(jnp.float32)
    est_m = ext.identity * cols
    minlen = jnp.minimum(qlen, tlen).astype(jnp.float32)
    score = 0.4 * est_m / jnp.maximum(maplen.astype(jnp.float32), 1.0) \
        + 0.6 * est_m / jnp.maximum(minlen, 1.0)
    score2 = ext.identity
    score3 = est_m / jnp.maximum(minlen, 1.0)

    valid = (ch.valid
             & (maplen >= min_len)
             & (ext.identity >= min_identity)
             & ~internal)
    del m
    return ScoredOverlaps(valid=valid, contained=contained, score=score,
                          score2=score2, score3=score3)


def cap_per_read(qid: np.ndarray, tid: np.ndarray, score: np.ndarray,
                 cap: int) -> np.ndarray:
    """Per-read overlap cap on the host-compacted table (keep best `cap`
    overlaps touching any read, score-descending; the streaming greedy of
    ``filter_trans_ovlp_inline_v4.py:74-83``). Returns a keep mask.

    Runs in native C++ (graphcore.hl_cap_per_read) — the python loop was a
    per-overlap host hot spot at cluster scale (VERDICT W3)."""
    order = np.argsort(-score, kind="stable")
    n_reads = int(max(qid.max(initial=0), tid.max(initial=0))) + 1
    from hylight_tpu import native
    lib = native.load()
    if lib is not None and hasattr(lib, "hl_cap_per_read"):
        import ctypes
        lib.hl_cap_per_read.restype = None
        lib.hl_cap_per_read.argtypes = [ctypes.c_void_p] * 3 + \
            [ctypes.c_longlong] * 3 + [ctypes.c_void_p]
        order64 = np.ascontiguousarray(order, dtype=np.int64)
        q32 = np.ascontiguousarray(qid, dtype=np.int32)
        t32 = np.ascontiguousarray(tid, dtype=np.int32)
        keep8 = np.zeros(len(qid), dtype=np.uint8)
        lib.hl_cap_per_read(
            order64.ctypes.data_as(ctypes.c_void_p),
            q32.ctypes.data_as(ctypes.c_void_p),
            t32.ctypes.data_as(ctypes.c_void_p),
            len(qid), n_reads, cap,
            keep8.ctypes.data_as(ctypes.c_void_p))
        return keep8.astype(bool)
    counts: dict = {}
    keep = np.zeros(len(qid), dtype=bool)
    for i in order:
        a, b = int(qid[i]), int(tid[i])
        ca, cb = counts.get(a, 0), counts.get(b, 0)
        if ca >= cap or cb >= cap:
            continue
        counts[a] = ca + 1
        counts[b] = cb + 1
        keep[i] = True
    return keep
