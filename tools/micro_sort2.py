"""Flat vs batched (segmented) 2-operand sort on the chip.

Hypothesis: XLA TPU sort goes superlinear past ~10M elements; a batched
[S, N/S] dim-1 sort keeps each row under the knee and vectorizes across
rows, so segmenting a big sort by hash-range could buy the block engine
its next multiple. Prints per-shape seconds.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp


def timeit(name, f, *a):
    r = f(*a); np.asarray(jax.tree.leaves(r)[0]).ravel()[:1]
    t0 = time.time(); it = 5
    for _ in range(it):
        r = f(*a)
    np.asarray(jax.tree.leaves(r)[0]).ravel()[:1]
    print(name, round((time.time() - t0) / it, 4), flush=True)


rng = np.random.default_rng(0)
f_flat = jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=2,
                                           is_stable=False))
f_bat = jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=2,
                                          is_stable=False, dimension=1))
f_one = jax.jit(lambda a: jax.lax.sort((a,), num_keys=1, is_stable=False))

for N in (6_000_000, 24_000_000, 48_000_000):
    k = jnp.asarray(rng.integers(0, 1 << 30, N).astype(np.int32))
    p = jnp.asarray(rng.integers(0, 1 << 30, N).astype(np.int32))
    timeit(f"flat2_{N//1_000_000}M", f_flat, k, p)
    timeit(f"flat1_{N//1_000_000}M", f_one, k)
    for S in (4, 8, 16):
        timeit(f"bat2_{N//1_000_000}M_s{S}", f_bat,
               k.reshape(S, -1), p.reshape(S, -1))
