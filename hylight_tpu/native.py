"""Loader for the native C++ runtime components (native/*.cpp).

The reference ships native code for its irreducibly irregular work: miniasm's
string graph (C), ViralQuasispecies (C++), quick-cliques (C++). Our TPU-first
split keeps the FLOP-heavy regular work (seeding/chaining/DP/consensus) on
device and implements the pointer-chasing residue natively on host:

- fastx.cpp    : mmap FASTQ/FASTA parser (data loader fast path)
- graphcore.cpp: size-capped union-find, unitig walking, degeneracy-order
                 Bron-Kerbosch maximal cliques

Built on demand with g++ into ``_build/libhylight_native.so`` and bound via
ctypes (pybind11 is not available in this image).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_NATIVE_DIR = os.path.join(_ROOT, "native")
_BUILD_DIR = os.path.join(_NATIVE_DIR, "_build")
_LIB_PATH = os.path.join(_BUILD_DIR, "libhylight_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _sources():
    if not os.path.isdir(_NATIVE_DIR):
        return []
    return sorted(
        os.path.join(_NATIVE_DIR, f)
        for f in os.listdir(_NATIVE_DIR)
        if f.endswith(".cpp")
    )


def _needs_build() -> bool:
    srcs = _sources()
    if not srcs:
        return False
    if not os.path.exists(_LIB_PATH):
        return True
    t = os.path.getmtime(_LIB_PATH)
    return any(os.path.getmtime(s) > t for s in srcs)


def load() -> Optional[ctypes.CDLL]:
    """Build (if stale) and load the native library; None if unavailable."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        srcs = _sources()
        if not srcs:
            _build_failed = True
            return None
        try:
            if _needs_build():
                os.makedirs(_BUILD_DIR, exist_ok=True)
                cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared",
                       "-fPIC", "-fopenmp", "-o", _LIB_PATH] + srcs
                subprocess.run(cmd, check=True, capture_output=True, text=True)
            _lib = ctypes.CDLL(_LIB_PATH)
            return _lib
        except Exception:
            _build_failed = True
            return None


def parse_fastx_native(path: str, fmt: str, keep_qual: bool):
    """Parse via native/fastx.cpp. Returns ReadSet or None (fallback)."""
    lib = load()
    if lib is None or not hasattr(lib, "hl_fastx_parse"):
        return None
    from hylight_tpu.io.readset import ReadSet

    lib.hl_fastx_parse.restype = ctypes.c_void_p
    lib.hl_fastx_parse.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int]
    lib.hl_fastx_nreads.restype = ctypes.c_longlong
    lib.hl_fastx_nreads.argtypes = [ctypes.c_void_p]
    lib.hl_fastx_total.restype = ctypes.c_longlong
    lib.hl_fastx_total.argtypes = [ctypes.c_void_p]
    lib.hl_fastx_fill.restype = None
    lib.hl_fastx_fill.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 3
    lib.hl_fastx_names.restype = ctypes.c_char_p
    lib.hl_fastx_names.argtypes = [ctypes.c_void_p]
    lib.hl_fastx_free.restype = None
    lib.hl_fastx_free.argtypes = [ctypes.c_void_p]

    h = lib.hl_fastx_parse(path.encode(), 1 if fmt == "fastq" else 0,
                           1 if keep_qual else 0)
    if not h:
        return None
    try:
        n = lib.hl_fastx_nreads(h)
        total = lib.hl_fastx_total(h)
        seq = np.empty(total, dtype=np.uint8)
        offsets = np.empty(n + 1, dtype=np.int64)
        has_q = fmt == "fastq" and keep_qual
        qual = np.empty(total, dtype=np.uint8) if has_q else np.empty(0, np.uint8)
        lib.hl_fastx_fill(
            h,
            seq.ctypes.data_as(ctypes.c_void_p),
            offsets.ctypes.data_as(ctypes.c_void_p),
            qual.ctypes.data_as(ctypes.c_void_p),
        )
        names = lib.hl_fastx_names(h).decode().split("\n") if n else []
        return ReadSet(seq=seq, offsets=offsets,
                       qual=qual if has_q else None, names=names)
    finally:
        lib.hl_fastx_free(h)


def label_orientations(eu: np.ndarray, ev: np.ndarray, parity: np.ndarray,
                       n: int, max_tries: int = 100):
    """Multi-try BFS orientation labelling (vertexLabellingHeuristic,
    GraphAlgos.cpp:178-248). Returns (labels int8[n], n_conflicts) or None
    when the native library is unavailable."""
    lib = load()
    if lib is None or not hasattr(lib, "hl_label_orientations"):
        return None
    lib.hl_label_orientations.restype = ctypes.c_longlong
    lib.hl_label_orientations.argtypes = [ctypes.c_void_p] * 3 + \
        [ctypes.c_longlong] * 3 + [ctypes.c_void_p]
    eu = np.ascontiguousarray(eu, dtype=np.int32)
    ev = np.ascontiguousarray(ev, dtype=np.int32)
    parity = np.ascontiguousarray(parity, dtype=np.uint8)
    labels = np.zeros(n, dtype=np.int8)
    conf = lib.hl_label_orientations(
        eu.ctypes.data_as(ctypes.c_void_p),
        ev.ctypes.data_as(ctypes.c_void_p),
        parity.ctypes.data_as(ctypes.c_void_p),
        len(eu), n, max_tries,
        labels.ctypes.data_as(ctypes.c_void_p))
    return labels, int(conf)


def find_backedges(eu: np.ndarray, ev: np.ndarray, key_pos: np.ndarray,
                   key_score: np.ndarray, key_ovlen: np.ndarray,
                   key_mism: np.ndarray, n: int, max_tries: int = 20):
    """Multi-try DFS back-edge detection (cycleRemovalHeuristic,
    GraphAlgos.cpp:352-541). Returns bool[E] mask of the best try's back
    edges, or None when the native library is unavailable."""
    lib = load()
    if lib is None or not hasattr(lib, "hl_find_backedges"):
        return None
    lib.hl_find_backedges.restype = ctypes.c_longlong
    lib.hl_find_backedges.argtypes = [ctypes.c_void_p] * 6 + \
        [ctypes.c_longlong] * 3 + [ctypes.c_void_p]
    eu = np.ascontiguousarray(eu, dtype=np.int32)
    ev = np.ascontiguousarray(ev, dtype=np.int32)
    k1 = np.ascontiguousarray(key_pos, dtype=np.float64)
    k2 = np.ascontiguousarray(key_score, dtype=np.float64)
    k3 = np.ascontiguousarray(key_ovlen, dtype=np.float64)
    k4 = np.ascontiguousarray(key_mism, dtype=np.float64)
    back = np.zeros(len(eu), dtype=np.uint8)
    lib.hl_find_backedges(
        eu.ctypes.data_as(ctypes.c_void_p),
        ev.ctypes.data_as(ctypes.c_void_p),
        k1.ctypes.data_as(ctypes.c_void_p),
        k2.ctypes.data_as(ctypes.c_void_p),
        k3.ctypes.data_as(ctypes.c_void_p),
        k4.ctypes.data_as(ctypes.c_void_p),
        len(eu), n, max_tries,
        back.ctypes.data_as(ctypes.c_void_p))
    return back.astype(bool)
