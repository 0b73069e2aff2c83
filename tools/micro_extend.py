"""Microbench: components of extend_chains on the chip."""
import time, numpy as np, jax, jax.numpy as jnp

P, AG, G, S = 4096, 64, 32, 64
rng = np.random.default_rng(0)
seqs = jnp.asarray(rng.integers(0,4,(256,8192)).astype(np.uint8))
qid = jnp.asarray(rng.integers(0,256,P).astype(np.int32))
q0 = jnp.asarray(rng.integers(0,8000,(P,AG,1)).astype(np.int32)) + np.arange(G,dtype=np.int32)[None,None,:]
mm = jnp.asarray(rng.random((P, AG*G)) < 0.01)

def timeit(name, f, *a):
    r = f(*a); np.asarray(jax.tree.leaves(r)[0]).ravel()[:1]
    t0=time.time(); iters=10
    for _ in range(iters): r = f(*a)
    np.asarray(jax.tree.leaves(r)[0]).ravel()[:1]
    print(name, round((time.time()-t0)/iters,4), flush=True)

@jax.jit
def g_elem(seqs, qid, q0):
    return seqs[qid[:,None,None], jnp.clip(q0,0,8191)]
timeit("elem_gather_8.4M_u8", g_elem, seqs, qid, q0)

@jax.jit
def g_elem32(seqs, qid, q0):
    return seqs.astype(jnp.int32)[qid[:,None,None], jnp.clip(q0,0,8191)]
timeit("elem_gather_8.4M_i32tab", g_elem32, seqs, qid, q0)

@jax.jit
def topk_mm(mm):
    col = jax.lax.broadcasted_iota(jnp.int32, mm.shape, 1)
    key = jnp.where(mm, -col, jnp.int32(-(1<<30)))
    return jax.lax.top_k(key, S)
timeit("topk_P2048_to_64", topk_mm, mm)

@jax.jit
def takealong(seqs, qid, q0):
    # row gather then take_along_axis per row
    rows = seqs[qid]               # [P, L] gather of rows (big copy 32MB)
    return jnp.take_along_axis(rows.reshape(P,1,8192), jnp.clip(q0,0,8191).reshape(P,AG*G,1)//1, axis=2)
timeit("rowgather_takealong", takealong, seqs, qid, q0)
