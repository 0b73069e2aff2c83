"""Regression: concurrent pjit compiles under the persistent compile cache.

Round-3 verdict W1: `python -m pytest tests/ -q` segfaulted 4/4 inside
``jax._src.compilation_cache.get/put_executable_and_time`` when the
per-cluster thread farm (assembly/pipeline.py) issued concurrent first
compiles with the persistent cache enabled. utils/cache.py now serializes
``compile_or_get_cached`` behind a process lock; this test recreates the
crashing combination (cache writes + reads from 4 threads, fresh shapes so
compiles actually happen) and must complete without crashing the process.
"""

import os
import threading
from concurrent.futures import ThreadPoolExecutor

import jax
import jax.numpy as jnp
import numpy as np

from hylight_tpu.utils import cache as hl_cache


def test_concurrent_compiles_with_persistent_cache(tmp_path):
    assert hl_cache._patched, "compile serialization patch not applied"
    # the suite disables the persistent cache globally (conftest); this
    # test specifically exercises it, so lift the gate for its scope
    disable = os.environ.pop("HYLIGHT_DISABLE_COMPILE_CACHE", None)
    hl_cache.enable_compile_cache(str(tmp_path / "cache"))
    # force every compile to hit the persistent cache write path
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    try:
        barrier = threading.Barrier(4)

        def worker(wid):
            barrier.wait()   # maximize compile overlap
            outs = []
            for i in range(6):
                n = 16 + 8 * i + wid  # distinct shapes -> distinct compiles
                x = jnp.arange(n, dtype=jnp.float32)

                @jax.jit
                def f(v):
                    return jnp.sum(v * v) + jnp.max(jnp.sort(v))

                outs.append(float(f(x)))
            return outs

        with ThreadPoolExecutor(max_workers=4) as ex:
            results = list(ex.map(worker, range(4)))
        for wid, outs in enumerate(results):
            for i, got in enumerate(outs):
                n = 16 + 8 * i + wid
                v = np.arange(n, dtype=np.float32)
                want = float(np.sum(v * v) + np.max(v))
                assert abs(got - want) < 1e-3
        # second wave re-reads the entries written above (the get path)
        with ThreadPoolExecutor(max_workers=4) as ex:
            list(ex.map(worker, range(4)))
    finally:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        try:
            jax.config.update("jax_compilation_cache_dir", None)
        except Exception:
            pass
        if disable is not None:
            os.environ["HYLIGHT_DISABLE_COMPILE_CACHE"] = disable
