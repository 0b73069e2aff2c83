"""Measure per-iteration-fetch vs single-device-summed-fetch timing of the
fused 1024x8kb block (axon tunnel fetch-cost accounting for bench.py)."""
import sys, time, numpy as np
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from hylight_tpu.config import OverlapConfig
from hylight_tpu.io.readset import ReadSet
from hylight_tpu.overlap.block import make_block_fn

n_reads, READ_LEN, ITERS = 1024, 8192, 5
rng = np.random.default_rng(7)
glen = n_reads * READ_LEN // 12
g = rng.integers(0, 4, size=glen).astype(np.uint8)
reads = []
for s in rng.integers(0, glen - READ_LEN, size=n_reads):
    r = g[s:s + READ_LEN].copy()
    e = rng.random(READ_LEN) < 0.01
    r[e] = (r[e] + rng.integers(1, 4, e.sum())) % 4
    reads.append(r)
rs = ReadSet.from_seqs(reads)
seqs_np, lens_np = rs.to_padded(max_len=READ_LEN)
cfg = OverlapConfig(k=15, w=10, min_ovlp_len=2000, min_identity=0.9,
                    min_anchors=4, min_chain_score=100, max_occ=16,
                    anchors_per_pair=256, gap_tile=32, seed_mode="mxu")
fn = make_block_fn(cfg, mcap=1600, max_pairs=16 * n_reads, snp_cap=64,
                   n_reads=n_reads, max_len=READ_LEN)
seqs = jnp.asarray(seqs_np); lens = jnp.asarray(lens_np)
ch, ext, sc = fn(seqs, lens)
print("admitted", int(np.asarray(jnp.sum(sc.valid.astype(np.int32)))), flush=True)

for name in ("per-iter-fetch", "summed-single-fetch", "summed-single-fetch2"):
    t0 = time.perf_counter()
    sums = []
    for _ in range(ITERS):
        ch, ext, sc = fn(seqs, lens)
        sums.append(jnp.sum(sc.valid.astype(np.int32)))
    if name == "per-iter-fetch":
        for s in sums:
            int(np.asarray(s))
    else:
        tot = sums[0]
        for s in sums[1:]:
            tot = tot + s
        int(np.asarray(tot))
    dt = (time.perf_counter() - t0) / ITERS
    print(name, round(dt, 4), "s/iter", flush=True)
