"""Micro-timings of mxu_candidates sub-stages on the chip.

Outputs are reduced to scalars ON DEVICE before fetching — returning the
full arrays would time the axon tunnel transfer, not the op."""
import sys, time, numpy as np
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from hylight_tpu.overlap.seed_mxu import bitonic_merge

P, L = 16384, 2048
rng = np.random.default_rng(0)

def timeit(name, f, *a):
    r = f(*a); _ = np.asarray(r)
    t0=time.time(); iters=10
    for _ in range(iters): r = f(*a)
    _ = np.asarray(r)
    print(name, round((time.time()-t0)/iters,4), flush=True)

ka = jnp.asarray(np.sort(rng.integers(0, 1<<31, (P, L)).astype(np.uint32), axis=1))
pa = jnp.asarray(rng.integers(0, 1<<20, (P, L)).astype(np.int32))
kb = jnp.asarray(np.sort(rng.integers(0, 1<<31, (P, L)).astype(np.uint32), axis=1))
pb = jnp.asarray(rng.integers(0, 1<<20, (P, L)).astype(np.int32))
timeit("bitonic_merge_16kx2k", jax.jit(lambda a,b,c,d: jnp.sum(bitonic_merge(a,b,c,d)[1])), ka, pa, kb, pb)

k2 = jnp.asarray(rng.integers(0, 1<<31, (P, 2*L)).astype(np.int32))
p2 = jnp.asarray(rng.integers(0, 1<<20, (P, 2*L)).astype(np.int32))
timeit("rowsort_16kx4k_2op", jax.jit(lambda a,b: jnp.sum(jax.lax.sort((a,b), num_keys=1, dimension=1, is_stable=False)[1])), k2, p2)

tab = jnp.asarray(rng.integers(0, 1<<31, (1024, L)).astype(np.int32))
idx = jnp.asarray(rng.integers(0, 1024, P).astype(np.int32))
timeit("rowgather_16k_rows_of_2k", jax.jit(lambda t,i: jnp.sum(t[i])), tab, idx)

gi = jnp.asarray(rng.integers(0, 2*L, (P, 256)).astype(np.int32))
timeit("take_along_16kx4k_to_256", jax.jit(lambda x,g: jnp.sum(jnp.take_along_axis(x,g,axis=1))), k2, gi)

timeit("elemwise_16kx4k_x4", jax.jit(lambda x: jnp.sum(((x>>2)^(x+1))*3+((x>>1)&7))), k2)

# the A-scatter + matmul (count matrix core) at bench shape
hbuck = jnp.asarray(rng.integers(0, 32768, (1024, 1600)).astype(np.int32))
def countmat(bk):
    rows = jax.lax.broadcasted_iota(jnp.int32, bk.shape, 0)
    A = jnp.zeros((1024, 32768), jnp.float32).at[rows, bk].add(1.0, mode="drop")
    Ab = A.astype(jnp.bfloat16)
    C = jax.lax.dot_general(Ab, Ab, (((1,),(1,)),((),())), preferred_element_type=jnp.float32)
    return jnp.sum(C)
timeit("scatterA_matmul_1024x32k", jax.jit(countmat), hbuck)
