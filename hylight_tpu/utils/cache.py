"""Persistent XLA compilation cache setup + compile serialization.

Compiles through the axon TPU tunnel cost minutes; the on-disk cache brings
warm-process compile down to seconds. Enabled at package import (harmless on
CPU backends, essential on the tunneled chip).

Thread safety: JAX's persistent compilation cache is NOT safe under
concurrent compiles from multiple host threads — the per-cluster task farm
(assembly/pipeline.py `_assemble_clusters`) reproducibly segfaulted inside
``jax._src.compilation_cache.get/put_executable_and_time`` (executable
deserialize racing a concurrent compile in another worker thread).
``_serialize_compiles`` wraps ``jax._src.compiler.compile_or_get_cached``
— the single entry point for compile + cache read/write (pxla.py calls it
via the module attribute) — in a process-wide RLock. Executions stay fully
parallel; only compilation and cache IO serialize, which costs nothing
(XLA's compile is internally multithreaded, and concurrent Python-side
compiles contend on the GIL anyway).
"""

from __future__ import annotations

import functools
import os
import threading

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")

_compile_lock = threading.RLock()
_patched = False


def _serialize_compiles() -> None:
    global _patched
    if _patched:
        return
    try:
        from jax._src import compiler as _compiler
        orig = _compiler.compile_or_get_cached

        @functools.wraps(orig)
        def _locked_compile_or_get_cached(*args, **kwargs):
            with _compile_lock:
                return orig(*args, **kwargs)

        _compiler.compile_or_get_cached = _locked_compile_or_get_cached
        _patched = True
    except Exception:
        pass  # private API moved; better to run unlocked than not at all


def enable_compile_cache(path: str | None = None) -> None:
    import jax

    _serialize_compiles()
    # The test suite disables the on-disk cache entirely: it only pays off
    # ACROSS processes (the tunnel's minutes-long compiles), the suite is
    # one process with jit's in-memory cache, and the cache's C++
    # serialize/deserialize paths were the site of most of the sporadic
    # long-run segfaults (round-3 W1 / round-4 stabilization).
    if os.environ.get("HYLIGHT_DISABLE_COMPILE_CACHE") == "1":
        return
    cache_dir = path or os.environ.get("HYLIGHT_JAX_CACHE", _DEFAULT_DIR)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without these flags
