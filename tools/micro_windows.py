"""Microbench: gap-window word-fetch strategies at bench shapes (chip).

extend_chains fetches [P, AG, W] int32 words from the nibble-packed read
matrix. Candidates:
  a) direct 3-D gather (current)
  b) row-gather the pair's packed row once, take_along_axis within row
  c) fused single gather for all tiers' (row, word) pairs at once
"""
import time, numpy as np, jax, jax.numpy as jnp

P = 16384
NROWS, WORDS = 1024, 1088     # 8192/8 + pads
rng = np.random.default_rng(0)
packed = jnp.asarray(rng.integers(0, 1 << 31, (NROWS, WORDS)).astype(np.int32))
rid = jnp.asarray(rng.integers(0, NROWS, P).astype(np.int32))
w0_64 = jnp.asarray(rng.integers(0, WORDS - 8, (P, 64)).astype(np.int32))
w0_16 = jnp.asarray(rng.integers(0, WORDS - 8, (P, 16)).astype(np.int32))


def timeit(name, f, *a):
    r = f(*a); np.asarray(jax.tree.leaves(r)[0]).ravel()[:1]
    t0 = time.time(); iters = 10
    for _ in range(iters): r = f(*a)
    np.asarray(jax.tree.leaves(r)[0]).ravel()[:1]
    print(name, round((time.time() - t0) / iters, 4), flush=True)


@jax.jit
def direct(packed, rid, w0_64, w0_16):
    out = []
    for w0, W in ((w0_64, 2), (w0_16, 5), (w0_16, 5), (w0_16, 5)):
        widx = jnp.arange(W, dtype=jnp.int32)
        out.append(packed[rid[:, None, None], w0[:, :, None] + widx])
    return sum(jnp.sum(o) for o in out)
timeit("direct_gathers_4tier", direct, packed, rid, w0_64, w0_16)


@jax.jit
def rowgather(packed, rid, w0_64, w0_16):
    rows = packed[rid]                       # [P, WORDS] row gather
    out = []
    for w0, W in ((w0_64, 2), (w0_16, 5), (w0_16, 5), (w0_16, 5)):
        widx = jnp.arange(W, dtype=jnp.int32)
        idx = (w0[:, :, None] + widx).reshape(P, -1)
        out.append(jnp.take_along_axis(rows, idx, axis=1))
    return sum(jnp.sum(o) for o in out)
timeit("rowgather_takealong", rowgather, packed, rid, w0_64, w0_16)


@jax.jit
def fused(packed, rid, w0_64, w0_16):
    # one flat gather for everything
    widx2 = jnp.arange(2, dtype=jnp.int32)
    widx5 = jnp.arange(5, dtype=jnp.int32)
    idx = jnp.concatenate(
        [(w0_64[:, :, None] + widx2).reshape(P, -1)] +
        [(w0_16[:, :, None] + widx5).reshape(P, -1)] * 3, axis=1)
    flat = (rid[:, None] * WORDS + idx).reshape(-1)
    vals = packed.reshape(-1)[flat]
    return jnp.sum(vals)
timeit("fused_flat_gather", fused, packed, rid, w0_64, w0_16)
