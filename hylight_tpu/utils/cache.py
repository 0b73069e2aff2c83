"""Persistent XLA compilation cache setup.

Compiles through the axon TPU tunnel cost minutes; the on-disk cache brings
warm-process compile down to seconds. Enabled at package import (harmless on
CPU backends, essential on the tunneled chip).
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable_compile_cache(path: str | None = None) -> None:
    import jax

    cache_dir = path or os.environ.get("HYLIGHT_JAX_CACHE", _DEFAULT_DIR)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without these flags
