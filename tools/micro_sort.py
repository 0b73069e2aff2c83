import sys, time; sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
def timeit(name, f, *a):
    r = f(*a); np.asarray(jax.tree.leaves(r)[0]).ravel()[:1]
    t0=time.time(); it=5
    for _ in range(it): r = f(*a)
    np.asarray(jax.tree.leaves(r)[0]).ravel()[:1]
    print(name, round((time.time()-t0)/it,4), flush=True)
rng = np.random.default_rng(0)
for N in (10_800_000, 21_600_000, 43_200_000):
    k = jnp.asarray(rng.integers(0, 1<<30, N).astype(np.int32))
    p = jnp.asarray(rng.integers(0, 1<<30, N).astype(np.int32))
    f = jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=2, is_stable=False))
    timeit(f"sort2_{N//1_000_000}M", f, k, p)
