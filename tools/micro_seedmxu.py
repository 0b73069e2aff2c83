"""Per-stage chip timing of mxu_candidates (scalar-reduced protocol)."""
import sys, time, numpy as np
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from hylight_tpu.io.readset import ReadSet
from hylight_tpu.ops.minimizers import minimizers
from hylight_tpu.overlap import seed_mxu as sx

n_reads, read_len, w, max_occ = 1024, 8192, 10, 16
P, A = 16384, 256
rng = np.random.default_rng(7)
glen = n_reads * read_len // 12
g = rng.integers(0, 4, glen).astype(np.uint8)
reads = []
for s in rng.integers(0, glen - read_len, n_reads):
    r = g[s:s + read_len].copy()
    e = rng.random(read_len) < 0.01
    r[e] = (r[e] + rng.integers(1, 4, e.sum())) % 4
    reads.append(r)
rs = ReadSet.from_seqs(reads)
seqs_np, lens_np = rs.to_padded(max_len=read_len)
seqs = jnp.asarray(seqs_np); lens = jnp.asarray(lens_np).astype(jnp.int32)
mcap = ((int(2 * read_len / (w + 1)) + 64) + 63) // 64 * 64
ms = minimizers(seqs, lens, k=15, w=w, cap=mcap)
B, M = ms.hash.shape
print("B,M =", B, M)


def timeit(name, f, *a, iters=10):
    r = f(*a)
    float(np.asarray(r))
    t0 = time.time()
    for _ in range(iters):
        r = f(*a)
    float(np.asarray(r))
    print(name, round((time.time() - t0) / iters * 1000, 1), "ms", flush=True)


@jax.jit
def s1_count(ms):
    C, mu = sx.shared_count_matrix(ms, bucket_bits=15, max_occ=max_occ)
    return jnp.sum(C) + jnp.sum(mu)


@jax.jit
def s1_scatter_only(ms):
    nbuck = 1 << 15
    slot = jax.lax.broadcasted_iota(jnp.int32, (B, M), 1)
    valid = (slot < ms.count[:, None]) & (ms.pos >= 0)
    bucket = (ms.hash & np.uint32(nbuck - 1)).astype(jnp.int32)
    idx = jnp.where(valid, bucket, nbuck)
    rows = jax.lax.broadcasted_iota(jnp.int32, (B, M), 0)
    Amat = jnp.zeros((B, nbuck), jnp.float32).at[rows, idx].add(1.0, mode="drop")
    return jnp.sum(Amat)


@jax.jit
def s1_sorthist(ms):
    # histogram via per-row sort + run-length + matmul-free count
    nbuck = 1 << 15
    slot = jax.lax.broadcasted_iota(jnp.int32, (B, M), 1)
    valid = (slot < ms.count[:, None]) & (ms.pos >= 0)
    bucket = jnp.where(valid, (ms.hash & np.uint32(nbuck - 1)).astype(jnp.int32),
                       nbuck)
    (bs,) = jax.lax.sort((bucket,), num_keys=1, dimension=1, is_stable=False)
    return jnp.sum(bs)


@jax.jit
def full(ms, lens):
    c = sx.mxu_candidates(ms, lens, bandwidth=64, min_anchors=4,
                          max_pairs=P, anchors_per_pair=A, max_occ=max_occ,
                          k=15, n_reads=n_reads, max_len=read_len)
    return jnp.sum(c.aq) + jnp.sum(c.n_anchors)


# stage-by-stage: replicate mxu_candidates internals as separate jits
C, mu = sx.shared_count_matrix(ms, bucket_bits=15, max_occ=max_occ)
C = jax.block_until_ready(C)


@jax.jit
def s2_firstk(C, mu):
    thr = np.float32(4 + 2.0) + np.float32(8.0) * jnp.sqrt(mu)
    ii = jnp.arange(B, dtype=jnp.int32)
    good = (ii[:, None] < ii[None, :]) & ((C - mu) >= thr)
    pidx, pok, n = sx._first_k_true(good.reshape(-1), P)
    return jnp.sum(pidx) + jnp.sum(pok) + n


@jax.jit
def s3_rowsort(ms):
    slot = jax.lax.broadcasted_iota(jnp.int32, (B, M), 1)
    valid = (slot < ms.count[:, None]) & (ms.pos >= 0)
    h = jnp.where(valid, ms.hash, np.uint32(0xFFFFFFFF))
    pay = jnp.where(valid, (ms.pos << 2) | (ms.strand.astype(jnp.int32) << 1), 0)
    h, pay = jax.lax.sort((h, pay), num_keys=1, dimension=1, is_stable=False)
    return jnp.sum(pay) + jnp.sum(h.astype(jnp.float32))


# pair-level merge sort at [P, 2*Lp]
Lp = 1 << (M - 1).bit_length()
hq = jnp.asarray(rng.integers(0, 1 << 31, (P, Lp)).astype(np.uint32))
ht = jnp.asarray(rng.integers(0, 1 << 31, (P, Lp)).astype(np.uint32))
pq_ = jnp.asarray(rng.integers(0, 1 << 30, (P, Lp)).astype(np.int32))
pt_ = jnp.asarray(rng.integers(0, 1 << 30, (P, Lp)).astype(np.int32))


@jax.jit
def s4_mergesort(hq, ht, pq_, pt_):
    key, pay = jax.lax.sort(
        (jnp.concatenate([hq, ht], axis=1),
         jnp.concatenate([pq_, pt_], axis=1)),
        num_keys=1, dimension=1, is_stable=False)
    return jnp.sum(pay) + jnp.sum(key.astype(jnp.float32))


@jax.jit
def s5_packsort(pq_):
    big = jnp.concatenate([pq_, pq_], axis=1)
    (s,) = jax.lax.sort((big,), num_keys=1, dimension=1, is_stable=False)
    return jnp.sum(s)


timeit("full_mxu_candidates", full, ms, lens)
timeit("s1_count_matrix", s1_count, ms)
timeit("s1a_scatter_histogram", s1_scatter_only, ms)
timeit("s1b_rowsort_bucket", s1_sorthist, ms)
timeit("s2_firstk_pairs", s2_firstk, C, mu)
timeit("s3_perread_hashsort", s3_rowsort, ms)
timeit("s4_pairlevel_2op_sort_16Kx4096", s4_mergesort, hq, ht, pq_, pt_)
timeit("s5_1op_sort_16Kx4096", s5_packsort, pq_)
