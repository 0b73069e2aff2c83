"""ReadSet: the in-memory array representation of a set of reads.

The reference moves data between stages exclusively through FASTQ/FASTA/PAF
files (SURVEY.md §1). Here the unit of exchange is a ReadSet: a ragged store
of base codes + optional phred qualities backed by flat numpy arrays, with
helpers to materialize fixed-shape padded blocks for the TPU kernels.

Base encoding: A=0 C=1 G=2 T=3, N(or anything else)=4. The complement of a
code b<4 is 3-b, so reverse complement is a flip+reverse — no lookup tables on
device. This replaces ``utils.filter_non_atcg()`` (``utils.py:81``: uppercase,
non-ACGTN->N, strip after first space) which is folded into parsing.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Iterable, List, Optional, Sequence

import numpy as np

# code <-> ascii tables (host side only)
_CODE_OF = np.full(256, 4, dtype=np.uint8)
for _i, _c in enumerate(b"ACGT"):
    _CODE_OF[_c] = _i
    _CODE_OF[_c + 32] = _i  # lowercase
_CHAR_OF = np.frombuffer(b"ACGTN", dtype=np.uint8)

N_CODE = 4


def encode_seq(s: str | bytes) -> np.ndarray:
    """ASCII sequence -> uint8 codes (non-ACGT -> 4)."""
    b = np.frombuffer(s.encode() if isinstance(s, str) else s, dtype=np.uint8)
    return _CODE_OF[b]


def decode_seq(codes: np.ndarray) -> str:
    return _CHAR_OF[np.asarray(codes, dtype=np.uint8)].tobytes().decode()


def revcomp_codes(codes: np.ndarray) -> np.ndarray:
    """Reverse complement in code space; N (4) maps to N."""
    c = codes[::-1]
    return np.where(c < 4, 3 - c, c).astype(np.uint8)


@dataclass
class ReadSet:
    """Ragged read store.

    seq:     uint8 [total_bases] base codes, reads concatenated
    offsets: int64 [n+1] read i occupies seq[offsets[i]:offsets[i+1]]
    qual:    optional uint8 [total_bases] phred scores (no +33 offset)
    names:   original read names (host bookkeeping only; device code uses ids)
    """

    seq: np.ndarray
    offsets: np.ndarray
    qual: Optional[np.ndarray] = None
    names: List[str] = field(default_factory=list)

    # -- construction ------------------------------------------------------
    @staticmethod
    def from_seqs(seqs: Sequence[str | bytes | np.ndarray],
                  quals: Optional[Sequence[np.ndarray]] = None,
                  names: Optional[Sequence[str]] = None) -> "ReadSet":
        enc = [s if isinstance(s, np.ndarray) else encode_seq(s) for s in seqs]
        lens = np.array([len(e) for e in enc], dtype=np.int64)
        offsets = np.zeros(len(enc) + 1, dtype=np.int64)
        np.cumsum(lens, out=offsets[1:])
        seq = np.concatenate([e.astype(np.uint8) for e in enc]) if enc else \
            np.zeros(0, dtype=np.uint8)
        qual = None
        if quals is not None:
            qual = np.concatenate([np.asarray(q, dtype=np.uint8) for q in quals]) \
                if quals else np.zeros(0, dtype=np.uint8)
            assert qual.shape == seq.shape
        nm = list(names) if names is not None else [str(i) for i in range(len(enc))]
        return ReadSet(seq=seq, offsets=offsets, qual=qual, names=nm)

    # -- basic accessors ---------------------------------------------------
    @property
    def n(self) -> int:
        return len(self.offsets) - 1

    @property
    def lengths(self) -> np.ndarray:
        return (self.offsets[1:] - self.offsets[:-1]).astype(np.int32)

    @property
    def total_bases(self) -> int:
        return int(self.offsets[-1])

    def get(self, i: int) -> np.ndarray:
        return self.seq[self.offsets[i]:self.offsets[i + 1]]

    def get_qual(self, i: int) -> Optional[np.ndarray]:
        if self.qual is None:
            return None
        return self.qual[self.offsets[i]:self.offsets[i + 1]]

    def get_str(self, i: int) -> str:
        return decode_seq(self.get(i))

    def __len__(self) -> int:
        return self.n

    def __iter__(self) -> Iterable[np.ndarray]:
        for i in range(self.n):
            yield self.get(i)

    # -- transforms --------------------------------------------------------
    def subset(self, idx: np.ndarray | Sequence[int]) -> "ReadSet":
        idx = np.asarray(idx, dtype=np.int64)
        seqs = [self.get(int(i)) for i in idx]
        quals = [self.get_qual(int(i)) for i in idx] if self.qual is not None else None
        names = [self.names[int(i)] for i in idx] if self.names else None
        return ReadSet.from_seqs(seqs, quals=quals, names=names)

    def concat(self, other: "ReadSet") -> "ReadSet":
        seq = np.concatenate([self.seq, other.seq])
        offsets = np.concatenate([self.offsets, other.offsets[1:] + self.offsets[-1]])
        qual = None
        if self.qual is not None and other.qual is not None:
            qual = np.concatenate([self.qual, other.qual])
        names = list(self.names) + list(other.names)
        return ReadSet(seq=seq, offsets=offsets, qual=qual, names=names)

    # -- device materialization -------------------------------------------
    def to_padded(self, max_len: Optional[int] = None, pad_to: int = 128,
                  dtype=np.uint8):
        """Dense [n, L] code matrix padded with N_CODE, plus int32 lengths.

        L is max read length rounded up to ``pad_to`` (lane alignment).
        Reads longer than ``max_len`` are truncated (caller should bucket
        first; truncation is logged by callers, not silent policy here).
        """
        lens = self.lengths
        if self.n == 0:
            return (np.zeros((0, pad_to), dtype=dtype), lens)
        L = int(lens.max()) if max_len is None else int(max_len)
        L = max(pad_to, -(-L // pad_to) * pad_to)
        out = np.full((self.n, L), N_CODE, dtype=dtype)
        clipped = np.minimum(lens, L)
        for i in range(self.n):
            li = int(clipped[i])
            out[i, :li] = self.seq[self.offsets[i]:self.offsets[i] + li]
        return out, clipped.astype(np.int32)

    def qual_padded(self, max_len: Optional[int] = None, pad_to: int = 128):
        """Dense [n, L] phred matrix (0 where padded); None if no quals."""
        if self.qual is None:
            return None
        lens = self.lengths
        L = int(lens.max()) if max_len is None else int(max_len)
        L = max(pad_to, -(-L // pad_to) * pad_to)
        out = np.zeros((self.n, L), dtype=np.uint8)
        clipped = np.minimum(lens, L)
        for i in range(self.n):
            li = int(clipped[i])
            out[i, :li] = self.qual[self.offsets[i]:self.offsets[i] + li]
        return out
