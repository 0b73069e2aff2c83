"""Probe gather formulations for the [P, AG, W] window word fetch.

Round-4 note says word-gathers were ~39 ms for 7M words; micro_layout
measures 105 ms for 2M via 2-axis fancy indexing. Find the fast form.
"""
import sys, time, numpy as np
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp

P, AG, W = 16384, 64, 2
N, C = 1024, 1056
rng = np.random.default_rng(0)
packed = jnp.asarray(rng.integers(0, 1 << 30, (N, C)).astype(np.int32))
rid = jnp.asarray(rng.integers(0, N, (P, 1)).astype(np.int32))
w0 = jnp.asarray(rng.integers(0, C - W - 1, (P, AG)).astype(np.int32))
widx = jnp.arange(W, dtype=jnp.int32)


def timeit(name, f, *a):
    r = f(*a); np.asarray(jax.tree.leaves(r)[0]).ravel()[:1]
    t0 = time.time(); iters = 20
    for _ in range(iters):
        r = f(*a)
    np.asarray(jax.tree.leaves(r)[0]).ravel()[:1]
    print(name, round((time.time() - t0) / iters * 1000, 2), "ms", flush=True)
    return r


@jax.jit
def fancy2(packed, rid, w0):
    return packed[rid[..., None], w0[..., None] + widx]


@jax.jit
def flat1d(packed, rid, w0):
    flat = packed.reshape(-1)
    fidx = rid[..., None] * C + w0[..., None] + widx
    return flat[fidx.reshape(P, AG * W)].reshape(P, AG, W)


@jax.jit
def flat1d_take(packed, rid, w0):
    flat = packed.reshape(-1)
    fidx = rid[..., None] * C + w0[..., None] + widx
    return jnp.take(flat, fidx.reshape(P, AG * W), mode="clip").reshape(P, AG, W)


@jax.jit
def rowgather(packed, rid, w0):
    # gather the row per P once ([P, C] via 1-axis gather), then per-row
    # dynamic window select via take_along_axis
    rows = packed[rid[:, 0]]                     # [P, C]
    idx = (w0[..., None] + widx).reshape(P, AG * W)
    return jnp.take_along_axis(rows, idx, axis=1).reshape(P, AG, W)


@jax.jit
def onehot_mm(packed, rid, w0):
    # rows via one-hot matmul on the MXU: [P, N] @ [N, C]
    oh = jax.nn.one_hot(rid[:, 0], N, dtype=jnp.bfloat16)
    hi = jnp.dot(oh, (packed >> 15).astype(jnp.bfloat16),
                 preferred_element_type=jnp.float32).astype(jnp.int32)
    lo = jnp.dot(oh, (packed & 0x7FFF).astype(jnp.bfloat16),
                 preferred_element_type=jnp.float32).astype(jnp.int32)
    rows = (hi << 15) | lo
    idx = (w0[..., None] + widx).reshape(P, AG * W)
    return jnp.take_along_axis(rows, idx, axis=1).reshape(P, AG, W)


r0 = timeit("fancy2axis", fancy2, packed, rid, w0)
r1 = timeit("flat1d", flat1d, packed, rid, w0)
r2 = timeit("flat1d_take_clip", flat1d_take, packed, rid, w0)
r3 = timeit("row_then_take_along", rowgather, packed, rid, w0)
r4 = timeit("onehot_mxu_rows", onehot_mm, packed, rid, w0)
for nm, r in (("flat1d", r1), ("take", r2), ("rowgather", r3), ("onehot", r4)):
    assert np.array_equal(np.asarray(r0), np.asarray(r)), nm
print("all equal OK")
