"""Probe: does a tiny minor dim ([P, AG, G] with G=8/32 lanes vs the
128-lane tile) cost real time on the chip, and does flattening to
[P, AG*G] recover it?  Decides whether extend's tiers should compute in
flattened space."""
import sys, time, numpy as np
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp

P = 16384
rng = np.random.default_rng(0)


def timeit(name, f, *a):
    r = f(*a); np.asarray(jax.tree.leaves(r)[0]).ravel()[:1]
    t0 = time.time(); iters = 20
    for _ in range(iters):
        r = f(*a)
    np.asarray(jax.tree.leaves(r)[0]).ravel()[:1]
    print(name, round((time.time() - t0) / iters * 1000, 2), "ms", flush=True)
    return r


def chain_ops(x, incol):
    # ~the eq tier's elementwise volume: masks, compares, wheres, 2 reduces
    qb = jnp.where(incol, x, 4)
    tb = jnp.where(incol, x ^ 1, 4)
    both = (qb < 4) & (tb < 4) & incol
    eq = both & (qb == tb)
    mm = both & (qb != tb)
    a = jnp.sum(both, axis=-1).astype(jnp.int32)
    b = jnp.sum(eq, axis=-1).astype(jnp.int32)
    c = jnp.sum(mm & (qb > 1), axis=-1).astype(jnp.int32)
    return a.sum(-1) if a.ndim > 1 else a, b.reshape(P, -1), c.reshape(P, -1)


for AG, G in ((64, 8), (16, 32), (4, 128)):
    x3 = jnp.asarray(rng.integers(0, 6, (P, AG, G)).astype(np.int32))
    inc3 = jnp.asarray(rng.random((P, AG, G)) < 0.7)
    x2 = x3.reshape(P, AG * G)
    inc2 = inc3.reshape(P, AG * G)
    timeit(f"chain3d_{AG}x{G}", jax.jit(chain_ops), x3, inc3)
    timeit(f"chain2d_{AG*G}", jax.jit(chain_ops), x2, inc2)

# word-gather + in-register window extract, 3D vs flat output
from hylight_tpu.overlap import extend as ex
L = 8192
packed = jnp.asarray(rng.integers(0, 1 << 30, (1024, L // 8 + 32)).astype(np.int32))
rid = jnp.asarray(rng.integers(0, 1024, (P, 1)).astype(np.int32))
start = jnp.asarray(rng.integers(0, L - 200, (P, 64)).astype(np.int32))


@jax.jit
def extract3d(packed, rid, start):
    return ex._extract_windows(packed, rid, start, 8, 128)


@jax.jit
def extract_flat(packed, rid, start):
    G = 8
    W = ((G + 6) >> 3) + 1
    s = start + 128
    w0 = s >> 3
    off = s & 7
    widx = jnp.arange(W, dtype=jnp.int32)
    words = packed[rid[..., None], w0[..., None] + widx]      # [P, AG, W]
    AG = start.shape[1]
    # flat [P, AG*G]: j -> (a = j//G, g = j%G)
    jf = jnp.arange(AG * G, dtype=jnp.int32)
    a = jf // G
    gpos = jf % G
    t = off[:, a] + gpos[None, :]
    wsel = t >> 3
    val = jnp.zeros(t.shape, jnp.int32)
    for w in range(W):
        val = val | jnp.where(wsel == w, words[:, a, w], 0)
    return (val >> ((t & 7) * 4)) & 15


r3 = timeit("extract3d_64x8", extract3d, packed, rid, start)
rf = timeit("extract_flat_64x8", extract_flat, packed, rid, start)
assert np.array_equal(np.asarray(r3).reshape(P, -1), np.asarray(rf)), "mismatch"
print("extract equal OK")
