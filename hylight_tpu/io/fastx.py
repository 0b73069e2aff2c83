"""FASTQ/FASTA parsing and writing.

Replaces the reference's format shims: ``toolkits.fq_or_fa()``
(``toolkits.py:7``), ``fq2fa/fa2fq`` (``toolkits.py:40,54``),
``fastq2fasta.py``, ``utils.filter_non_atcg()`` (``utils.py:81``) and
``rename_fas.py`` integer renaming — all folded into one parse that yields a
ReadSet with integer ids (positions) and sanitized codes.

A C++ fast path (native/fastx.cpp) accelerates large files; this module is
the always-available fallback and the single definition of semantics.
"""

from __future__ import annotations

import gzip
import io
import os
from typing import List, Optional, Tuple

import numpy as np

from hylight_tpu.io.readset import ReadSet, decode_seq, encode_seq


def _open(path: str):
    if path.endswith(".gz"):
        return gzip.open(path, "rb")
    return open(path, "rb")


def sniff_format(path: str) -> str:
    """'fastq' or 'fasta' by first non-empty byte (toolkits.py:7-38 behavior)."""
    with _open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            if line.startswith(b">"):
                return "fasta"
            if line.startswith(b"@"):
                return "fastq"
            raise ValueError(f"{path}: unrecognized fastx leader {line[:1]!r}")
    raise ValueError(f"{path}: empty file")


def read_fastx(path: str, keep_qual: bool = True) -> ReadSet:
    """Parse FASTA or FASTQ (optionally .gz) into a ReadSet.

    Name handling matches ``filter_non_atcg`` (``utils.py:81``): everything
    after the first whitespace is dropped. Multi-line FASTA is supported.
    """
    fmt = sniff_format(path)
    # Try the native C++ parser for plain (non-gz) files.
    if not path.endswith(".gz"):
        try:
            from hylight_tpu.native import parse_fastx_native
            rs = parse_fastx_native(path, fmt, keep_qual)
            if rs is not None:
                return rs
        except Exception:
            pass
    names: List[str] = []
    seqs: List[np.ndarray] = []
    quals: Optional[List[np.ndarray]] = [] if (fmt == "fastq" and keep_qual) else None
    with _open(path) as fb:
        f = io.BufferedReader(fb) if not isinstance(fb, io.BufferedReader) else fb
        if fmt == "fasta":
            name = None
            chunks: List[bytes] = []
            for line in f:
                line = line.rstrip()
                if not line:
                    continue
                if line.startswith(b">"):
                    if name is not None:
                        seqs.append(encode_seq(b"".join(chunks)))
                        names.append(name)
                    name = line[1:].split()[0].decode()
                    chunks = []
                else:
                    chunks.append(line)
            if name is not None:
                seqs.append(encode_seq(b"".join(chunks)))
                names.append(name)
        else:
            while True:
                h = f.readline()
                if not h:
                    break
                h = h.rstrip()
                if not h:
                    continue
                s = f.readline().rstrip()
                plus = f.readline()
                q = f.readline().rstrip()
                if not plus.startswith(b"+"):
                    raise ValueError(f"{path}: malformed FASTQ near {h[:40]!r}")
                names.append(h[1:].split()[0].decode())
                seqs.append(encode_seq(s))
                if quals is not None:
                    quals.append(np.frombuffer(q, dtype=np.uint8).astype(np.uint8) - 33)
    return ReadSet.from_seqs(seqs, quals=quals, names=names)


def write_fasta(path: str, rs: ReadSet, wrap: int = 0) -> None:
    with open(path, "w") as f:
        for i in range(rs.n):
            s = rs.get_str(i)
            name = rs.names[i] if rs.names else str(i)
            f.write(f">{name}\n")
            if wrap > 0:
                for j in range(0, len(s), wrap):
                    f.write(s[j:j + wrap] + "\n")
            else:
                f.write(s + "\n")


def write_fastq(path: str, rs: ReadSet, default_phred: int = 30) -> None:
    with open(path, "w") as f:
        for i in range(rs.n):
            s = rs.get_str(i)
            q = rs.get_qual(i)
            qs = "".join(chr(int(x) + 33) for x in q) if q is not None \
                else chr(default_phred + 33) * len(s)
            name = rs.names[i] if rs.names else str(i)
            f.write(f"@{name}\n{s}\n+\n{qs}\n")


def split_pairs(rs: ReadSet) -> Tuple[np.ndarray, np.ndarray]:
    """Classify interleaved paired-end reads by '/1' / '/2' name suffix.

    Returns (idx1, idx2) index arrays. Reference behavior:
    ``get_fq_cluster.py:22-57`` routes by suffix; ``get_readnames.py`` uses
    '/1' names as cluster seeds.
    """
    i1, i2 = [], []
    for i, nm in enumerate(rs.names):
        if nm.endswith("/2"):
            i2.append(i)
        else:
            i1.append(i)
    return np.array(i1, dtype=np.int64), np.array(i2, dtype=np.int64)
