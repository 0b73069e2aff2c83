"""Compare minimizer compaction variants (scatter vs row-sort) on chip.

Usage: python tools/micro_minimizers.py [n_reads] [read_len] [w]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from hylight_tpu.ops.minimizers import minimizers  # noqa: E402

n_reads = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
read_len = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
w = int(sys.argv[3]) if len(sys.argv) > 3 else 10

rng = np.random.default_rng(7)
seqs = jnp.asarray(rng.integers(0, 4, (n_reads, read_len)).astype(np.uint8))
lens = jnp.asarray(np.full(n_reads, read_len, np.int32))
cap = ((int(2 * read_len / (w + 1)) + 64) + 63) // 64 * 64


def timeit(name, f):
    r = f()
    _ = np.asarray(r.count)[:1]
    t0 = time.perf_counter()
    iters = 10
    outs = [f() for _ in range(iters)]
    for o in outs:
        _ = np.asarray(o.count)[:1]
    dt = (time.perf_counter() - t0) / iters
    print(name, round(dt * 1000, 2), "ms", flush=True)
    return r


a = timeit("scatter", lambda: minimizers(seqs, lens, k=15, w=w, cap=cap,
                                         via_sort=False))
b = timeit("rowsort", lambda: minimizers(seqs, lens, k=15, w=w, cap=cap,
                                         via_sort=True))
same = (np.array_equal(np.asarray(a.hash), np.asarray(b.hash))
        and np.array_equal(np.asarray(a.pos), np.asarray(b.pos))
        and np.array_equal(np.asarray(a.strand), np.asarray(b.strand))
        and np.array_equal(np.asarray(a.count), np.asarray(b.count)))
print("outputs equal:", same)
