"""OverlapTable — the in-memory PAF equivalent.

The reference's stages communicate through 14-column PAF text files with three
appended scores (``filter_overlap_slr2.py:142-152``). Here the same
information is a struct-of-arrays that never leaves device memory between
stages; host materialization and PAF text are for debugging/checkpointing.

Target coordinates follow the PAF convention: ts/te are in the FORWARD frame
of the target read even for '-' strand overlaps; helpers expose the
strand-adjusted frame used by hang classification (miniasm ``ma_hit2arc``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import numpy as np


@dataclass
class OverlapTable:
    """Host-side overlap table (numpy struct-of-arrays, compacted)."""

    qid: np.ndarray       # int32 [O]
    tid: np.ndarray       # int32 [O]
    strand: np.ndarray    # int8  [O] 0='+', 1='-'
    qs: np.ndarray        # int32 [O]
    qe: np.ndarray        # int32 [O]
    ts: np.ndarray        # int32 [O] forward target frame
    te: np.ndarray        # int32 [O]
    qlen: np.ndarray      # int32 [O]
    tlen: np.ndarray      # int32 [O]
    matches: np.ndarray   # int32 [O] verified matching columns
    columns: np.ndarray   # int32 [O] alignment columns (verified+unverified+indel)
    identity: np.ndarray  # float32 [O]
    score: np.ndarray     # float32 [O]  0.4*m/mlen + 0.6*m/minlen (ref :142-152)
    score2: np.ndarray    # float32 [O]  1 - mismatch fraction
    score3: np.ndarray    # float32 [O]  m/minlen
    # candidate-SNP mismatch columns (forward coords both sides), ragged cap S
    mm_q: Optional[np.ndarray] = None   # int32 [O, S]
    mm_t: Optional[np.ndarray] = None   # int32 [O, S]
    mm_qb: Optional[np.ndarray] = None  # int8  [O, S]
    mm_tb: Optional[np.ndarray] = None  # int8  [O, S]
    mm_mask: Optional[np.ndarray] = None  # bool [O, S]

    @property
    def n(self) -> int:
        return len(self.qid)

    def __len__(self) -> int:
        return self.n

    # -- strand-adjusted target frame (for hang classification) ----------
    def ts_adj(self) -> np.ndarray:
        return np.where(self.strand == 1, self.tlen - self.te, self.ts)

    def te_adj(self) -> np.ndarray:
        return np.where(self.strand == 1, self.tlen - self.ts, self.te)

    def select(self, mask: np.ndarray) -> "OverlapTable":
        kw = {}
        for f in self.__dataclass_fields__:
            v = getattr(self, f)
            kw[f] = v[mask] if v is not None else None
        return OverlapTable(**kw)

    @staticmethod
    def concat(tables: List["OverlapTable"]) -> "OverlapTable":
        assert tables
        kw = {}
        for f in tables[0].__dataclass_fields__:
            vs = [getattr(t, f) for t in tables]
            kw[f] = np.concatenate(vs) if vs[0] is not None else None
        return OverlapTable(**kw)

    def sort_by(self, keys: np.ndarray) -> "OverlapTable":
        order = np.argsort(keys, kind="stable")
        return self.select(order)

    def to_paf(self, names: Optional[List[str]] = None,
               symmetric: bool = False) -> str:
        """14-col PAF + 3 score columns, for debugging/golden comparison.

        symmetric=True also emits the swapped (target-as-query) duplicate
        of every row — the shape minimap2 ava produces and what miniasm's
        containment handling expects (ma_sg_gen deletes only the QCONT
        side of each hit, asm.c:34)."""
        lines = []
        nm = (lambda i: names[i]) if names else (lambda i: str(i))
        rows = [(self.qid, self.qlen, self.qs, self.qe,
                 self.tid, self.tlen, self.ts, self.te)]
        if symmetric:
            rows.append((self.tid, self.tlen, self.ts, self.te,
                         self.qid, self.qlen, self.qs, self.qe))
        for qid, qlen, qs, qe, tid, tlen, ts, te in rows:
            for i in range(self.n):
                lines.append("\t".join(map(str, [
                    nm(qid[i]), qlen[i], qs[i], qe[i],
                    "-" if self.strand[i] else "+",
                    nm(tid[i]), tlen[i], ts[i], te[i],
                    self.matches[i], self.columns[i], 255,
                    f"{self.score[i]:.4f}", f"{self.score2[i]:.4f}",
                    f"{self.score3[i]:.4f}",
                ])))
        return "\n".join(lines) + ("\n" if lines else "")
