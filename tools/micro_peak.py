"""Peak sanity: elementwise HBM bandwidth, MXU rate, gather law, roll cost.

TIMING PROTOCOL (axon tunnel): every timed jit REDUCES ITS OUTPUT TO A
SCALAR on device — fetching anything bigger ships the whole buffer over
the tunnel and corrupts the measurement (CLAUDE.md).  XLA may fuse the
reduction into the producer; that's fine — we measure "op feeding
compute", which is how the ops are consumed in the real pipeline.
"""
import sys, time, numpy as np
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp

rng = np.random.default_rng(0)


def timeit(name, f, *a, iters=10, work=None):
    r = f(*a)
    float(np.asarray(r))
    t0 = time.time()
    for _ in range(iters):
        r = f(*a)
    float(np.asarray(r))
    dt = (time.time() - t0) / iters
    extra = f"  ({work / dt / 1e9:.0f} G/s)" if work else ""
    print(name, round(dt * 1000, 2), "ms" + extra, flush=True)


# elementwise: read 256MB + write 256MB f32 (sum forces the add chain; the
# *2 multiplies defeat sum-of-constant folding)
x = jnp.asarray(rng.random((8192, 8192)).astype(np.float32))
timeit("eltwise_add_mul_256MB", jax.jit(lambda x: jnp.sum(x * 1.5 + 2.0)), x,
       work=x.size * 4)
timeit("reduce_sum_256MB", jax.jit(lambda x: jnp.sum(x)), x, work=x.size * 4)

y = jnp.asarray(rng.integers(0, 255, (8192, 8192)).astype(np.uint8))
timeit("eltwise_u8_xor_64MB", jax.jit(lambda y: jnp.sum((y ^ 1).astype(jnp.int32))), y,
       work=y.size)

a = jnp.asarray(rng.random((4096, 4096)).astype(np.float32)).astype(jnp.bfloat16)
b = jnp.asarray(rng.random((4096, 4096)).astype(np.float32)).astype(jnp.bfloat16)
timeit("matmul_bf16_4096",
       jax.jit(lambda a, b: jnp.sum(jnp.dot(a, b, preferred_element_type=jnp.float32))),
       a, b, work=2 * 4096**3)

# gather law: flat 1-D gathers of M elements from a 4MB table
N = 1024 * 1056
table = jnp.asarray(rng.integers(0, 1 << 30, N).astype(np.int32))


@jax.jit
def gsum(table, idx):
    return jnp.sum(table[idx])


for M in (1 << 17, 1 << 19, 1 << 21, 1 << 23):
    idx = jnp.asarray(rng.integers(0, N, (16384, M // 16384)).astype(np.int32))
    timeit(f"flat_gather_sum_{M}", gsum, table, idx)

# row gather (contiguous rows)
tab2 = table.reshape(1024, 1056)
rid = jnp.asarray(rng.integers(0, 1024, 16384).astype(np.int32))
timeit("row_gather_16Kx1056_i32",
       jax.jit(lambda t, r: jnp.sum(t[r])), tab2, rid)

seqs = jnp.asarray(rng.integers(0, 4, (1024, 8192)).astype(np.uint8))
timeit("row_gather_16Kx8192_u8",
       jax.jit(lambda t, r: jnp.sum(t[r].astype(jnp.int32))), seqs, rid)

# take_along within rows
rows = jnp.asarray(rng.integers(0, 1 << 30, (16384, 1056)).astype(np.int32))
cidx = jnp.asarray(rng.integers(0, 1056, (16384, 288)).astype(np.int32))
timeit("take_along_16Kx1056_to_288",
       jax.jit(lambda r, c: jnp.sum(jnp.take_along_axis(r, c, axis=1))),
       rows, cidx)

# per-row dynamic roll via power-of-2 stages
shift = jnp.asarray(rng.integers(0, 1056, 16384).astype(np.int32))


@jax.jit
def roll_sum(rows, shift):
    x = rows
    for bshift in range(11):
        s = 1 << bshift
        rolled = jnp.concatenate([x[:, s:], x[:, :s]], axis=1)
        x = jnp.where((shift[:, None] & s) != 0, rolled, x)
    return jnp.sum(x)


timeit("roll_pow2_16Kx1056_i32", roll_sum, rows, shift)

seqrows = jnp.asarray(rng.integers(0, 4, (16384, 1024)).astype(np.uint8))
shift2 = jnp.asarray(rng.integers(0, 1024, 16384).astype(np.int32))


@jax.jit
def roll_sum_u8(x, shift):
    for bshift in range(10):
        s = 1 << bshift
        rolled = jnp.concatenate([x[:, s:], x[:, :s]], axis=1)
        x = jnp.where((shift[:, None] & s) != 0, rolled, x)
    return jnp.sum(x.astype(jnp.int32))


timeit("roll_pow2_16Kx1024_u8", roll_sum_u8, seqrows, shift2)

# the extend window fetch, 3D fancy form, scalar-reduced
from hylight_tpu.overlap import extend as ex
packed = jnp.asarray(rng.integers(0, 1 << 30, (1024, 1056)).astype(np.int32))
rid1 = jnp.asarray(rng.integers(0, 1024, (16384, 1)).astype(np.int32))
start = jnp.asarray(rng.integers(0, 8192 - 200, (16384, 64)).astype(np.int32))
timeit("extract_windows_64x8_sum",
       jax.jit(lambda p, r, s: jnp.sum(ex._extract_windows(p, r, s, 8, 128))),
       packed, rid1, start)
start16 = start[:, :16]
timeit("extract_windows_16x32_sum",
       jax.jit(lambda p, r, s: jnp.sum(ex._extract_windows(p, r, s, 32, 128))),
       packed, rid1, start16)
