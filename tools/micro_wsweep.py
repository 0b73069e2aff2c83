"""A/B the seeding window w at a fixed block size on the chip.

Prints pairs/s and admitted-overlap counts per w — admitted counts must
stay ~equal for a w bump to be a legitimate speedup (same recall).

Usage: PYTHONPATH=/root/repo python tools/micro_wsweep.py [n_reads] [w ...]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax.numpy as jnp  # noqa: E402

from hylight_tpu.config import OverlapConfig  # noqa: E402
from hylight_tpu.io.readset import ReadSet  # noqa: E402
from hylight_tpu.overlap.block import make_block_fn  # noqa: E402

READ_LEN = 8192
n_reads = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
ws = [int(x) for x in sys.argv[2:]] or [10, 15, 19]

rng = np.random.default_rng(7)
glen = n_reads * READ_LEN // 12
g = rng.integers(0, 4, size=glen).astype(np.uint8)
starts = rng.integers(0, glen - READ_LEN, size=n_reads)
reads = []
for s in starts:
    r = g[s:s + READ_LEN].copy()
    e = rng.random(READ_LEN) < 0.01
    r[e] = (r[e] + rng.integers(1, 4, e.sum())) % 4
    reads.append(r)
rs = ReadSet.from_seqs(reads)
seqs_np, lens_np = rs.to_padded(max_len=READ_LEN)
seqs = jnp.asarray(seqs_np)
lens = jnp.asarray(lens_np)

for w in ws:
    cfg = OverlapConfig(k=15, w=w, min_ovlp_len=2000, min_identity=0.9,
                        min_anchors=4, min_chain_score=100, max_occ=16,
                        anchors_per_pair=256, gap_tile=32)
    fn = make_block_fn(cfg, mcap=1600, max_pairs=max(2048, 16 * n_reads),
                       snp_cap=64, n_reads=n_reads, max_len=READ_LEN)
    ch, ext, sc = fn(seqs, lens)
    n_pairs = int(np.asarray(jnp.sum(ch.valid.astype(np.int32))))
    n_adm = int(np.asarray(jnp.sum(sc.valid.astype(np.int32))))
    t0 = time.perf_counter()
    sums = []
    for _ in range(5):
        ch, ext, sc = fn(seqs, lens)
        sums.append(jnp.sum(sc.valid.astype(np.int32)))
    for s in sums:
        int(np.asarray(s))
    dt = (time.perf_counter() - t0) / 5
    print(f"w={w} block_s={dt:.4f} chained={n_pairs} admitted={n_adm} "
          f"pairs_per_s={n_pairs/dt:.1f}", flush=True)
