"""Gather cost law on the chip: time flat 1-D gathers of M elements from a
small table vs M, plus row-gather and take_along_axis for comparison."""
import sys, time, numpy as np
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp

rng = np.random.default_rng(0)
N = 1024 * 1056  # flat table size (the packed seq matrix)
table = jnp.asarray(rng.integers(0, 1 << 30, N).astype(np.int32))


def timeit(name, f, *a):
    r = f(*a); np.asarray(jax.tree.leaves(r)[0]).ravel()[:1]
    t0 = time.time(); iters = 20
    for _ in range(iters):
        r = f(*a)
    np.asarray(jax.tree.leaves(r)[0]).ravel()[:1]
    print(name, round((time.time() - t0) / iters * 1000, 2), "ms", flush=True)
    return r


@jax.jit
def g(table, idx):
    return table[idx]


for M in (1 << 17, 1 << 19, 1 << 21, 1 << 23):
    idx = jnp.asarray(rng.integers(0, N, (16384, M // 16384)).astype(np.int32))
    timeit(f"flat_gather_{M>>20 or 0}M_{M}", g, table, idx)

# multiple small gathers vs one big gather (same total volume)
idxs = [jnp.asarray(rng.integers(0, N, (16384, 32)).astype(np.int32))
        for _ in range(8)]


@jax.jit
def eight_small(table, *idxs):
    return [table[i] for i in idxs]


@jax.jit
def one_big(table, idx):
    return table[idx]


big = jnp.concatenate(idxs, axis=1)
timeit("eight_gathers_of_512k", eight_small, table, *idxs)
timeit("one_gather_of_4M", one_big, table, big)

# row gather (contiguous): [16K] row ids from [1024, 1056]
tab2 = table.reshape(1024, 1056)
rid = jnp.asarray(rng.integers(0, 1024, 16384).astype(np.int32))


@jax.jit
def rowg(tab2, rid):
    return tab2[rid]


timeit("row_gather_16K_rows_of_1056", rowg, tab2, rid)

# u8 row gather at seq scale [1024, 8192] u8 -> [16K, 8192]
seqs = jnp.asarray(rng.integers(0, 4, (1024, 8192)).astype(np.uint8))


@jax.jit
def rowg8(seqs, rid):
    return seqs[rid]


timeit("row_gather_16K_rows_of_8192_u8", rowg8, seqs, rid)

# take_along_axis within rows: [16K, 1056] -> [16K, 288]
rows = jnp.asarray(rng.integers(0, 1 << 30, (16384, 1056)).astype(np.int32))
cidx = jnp.asarray(rng.integers(0, 1056, (16384, 288)).astype(np.int32))


@jax.jit
def tal(rows, cidx):
    return jnp.take_along_axis(rows, cidx, axis=1)


timeit("take_along_16Kx1056_to_288", tal, rows, cidx)

# per-row dynamic roll via 11 power-of-2 stages: [16K, 1056] i32
shift = jnp.asarray(rng.integers(0, 1056, 16384).astype(np.int32))


@jax.jit
def roll_pow2(rows, shift):
    x = rows
    for b in range(11):
        s = 1 << b
        rolled = jnp.concatenate([x[:, s:], x[:, :s]], axis=1)
        x = jnp.where((shift[:, None] & s) != 0, rolled, x)
    return x


timeit("roll_pow2_16Kx1056_i32", roll_pow2, rows, shift)

seqrows = jnp.asarray(rng.integers(0, 4, (16384, 8192)).astype(np.uint8))
shift2 = jnp.asarray(rng.integers(0, 8192, 16384).astype(np.int32))


@jax.jit
def roll_pow2_u8(x, shift):
    for b in range(13):
        s = 1 << b
        rolled = jnp.concatenate([x[:, s:], x[:, :s]], axis=1)
        x = jnp.where((shift[:, None] & s) != 0, rolled, x)
    return x


timeit("roll_pow2_16Kx8192_u8", roll_pow2_u8, seqrows, shift2)
