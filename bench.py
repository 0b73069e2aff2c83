"""Benchmark: overlap-engine throughput on the attached chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: aligned read-pairs per second through the full block program
(minimizer sketch -> hash-join -> band vote -> chain refine -> gap verify ->
admission filters) on synthetic 8 kb corrected-long-read data at ~12x
coverage — the workload of the reference's hot stage
(``utils.split_reads2`` driving minimap2 ava + filter_overlap_slr2).

vs_baseline: ratio against the reference CPU pipeline's estimated throughput
on the same data (see BASELINE.md: no published numbers exist; the 30-thread
estimate recorded there is ~2000 scored pairs/s for 8kb corrected reads —
minimap2 ava-pb + the Python CIGAR/SNP rescoring loop).
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_PAIRS_PER_S = 2000.0  # documented estimate, see BASELINE.md


def main():
    import jax
    import jax.numpy as jnp

    from hylight_tpu.config import OverlapConfig
    from hylight_tpu.io.readset import ReadSet
    from hylight_tpu.overlap.block import make_block_fn

    rng = np.random.default_rng(7)
    n_reads, read_len = 64, 8192
    glen = n_reads * read_len // 12          # ~12x coverage
    g = rng.integers(0, 4, size=glen).astype(np.uint8)
    starts = rng.integers(0, glen - read_len, size=n_reads)
    reads = [g[s:s + read_len] for s in starts]
    rs = ReadSet.from_seqs(reads)
    seqs_np, lens_np = rs.to_padded(max_len=read_len)

    cfg = OverlapConfig(k=15, w=5, min_ovlp_len=2000, min_identity=0.9,
                        min_anchors=4, min_chain_score=100, max_occ=16,
                        anchors_per_pair=256, gap_tile=32)
    fn = make_block_fn(cfg, mcap=2816, max_pairs=2048, snp_cap=64)

    seqs = jnp.asarray(seqs_np)
    lens = jnp.asarray(lens_np)

    # warmup / compile (NOTE: block_until_ready does not block under the
    # axon tunnel — force a scalar fetch to synchronize)
    ch, ext, sc = fn(seqs, lens)
    n_pairs = int(np.asarray(jnp.sum(ch.valid.astype(np.int32))))
    n_admitted = int(np.asarray(jnp.sum(sc.valid.astype(np.int32))))

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        ch, ext, sc = fn(seqs, lens)
        int(np.asarray(jnp.sum(sc.valid.astype(np.int32))))  # sync fetch
    dt = (time.perf_counter() - t0) / iters

    pairs_per_s = n_pairs / dt
    print(json.dumps({
        "metric": "aligned read-pairs/s (8kb LR ava block, 1 chip)",
        "value": round(pairs_per_s, 1),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_s / BASELINE_PAIRS_PER_S, 2),
        "detail": {
            "block_seconds": round(dt, 4),
            "chained_pairs": n_pairs,
            "admitted_overlaps": n_admitted,
            "reads": n_reads, "read_len": read_len,
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
