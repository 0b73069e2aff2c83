"""Benchmark: overlap-engine throughput on the attached chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: aligned read-pairs per second through the full all-vs-all block
program (minimizer sketch -> MXU pair finding -> per-pair join -> band
vote -> chain refine -> gap verify -> admission filters) on synthetic 8 kb
corrected-long-read data at ~12x coverage with 1% substitution errors — the
workload of the reference's hot stage (``utils.split_reads2`` driving
minimap2 ava + filter_overlap_slr2). Block sizes are measured ascending
under a wall-clock budget (compiles through the axon tunnel cost minutes;
the JSON is emitted with whatever completed, and a SIGTERM/SIGINT from the
driver's timeout still flushes the best completed row). The headline value
is the best measured block size; production block size is set by
``ParallelConfig.stream_chunk`` / ``query_block``, not auto-tuned.

vs_baseline: ratio against the reference CPU pipeline's estimated throughput
on the same data (see BASELINE.md: no published numbers exist; the 30-thread
estimate recorded there is ~2000 scored pairs/s for 8kb corrected reads —
minimap2 ava-pb + the Python CIGAR/SNP rescoring loop).
"""

from __future__ import annotations

import json
import os
import signal
import sys
import time

import numpy as np

BASELINE_PAIRS_PER_S = 2000.0  # documented estimate, see BASELINE.md
READ_LEN = 8192
SIZES = (64, 256, 1024, 2048)
ITERS = 5
BUDGET_S = float(os.environ.get("HYLIGHT_BENCH_BUDGET_S", "1500"))

_T_START = time.perf_counter()
_ROWS: list[dict] = []
_EMITTED = False


def _emit(status: str = "complete") -> None:
    global _EMITTED
    if _EMITTED:
        return
    _EMITTED = True
    if not _ROWS:
        print(json.dumps({
            "metric": "aligned read-pairs/s (8kb LR ava block, 1 chip)",
            "value": 0.0, "unit": "pairs/s", "vs_baseline": 0.0,
            "detail": {"status": "no block completed", "read_len": READ_LEN},
        }))
        sys.stdout.flush()
        return
    best = max(_ROWS, key=lambda r: r["pairs_per_s"])
    pairs_per_s = best["pairs_per_s"]
    device = "unknown"
    try:
        import jax
        device = str(jax.devices()[0])
    except Exception:
        pass
    print(json.dumps({
        "metric": "aligned read-pairs/s (8kb LR ava block, 1 chip)",
        "value": pairs_per_s,
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_s / BASELINE_PAIRS_PER_S, 2),
        "detail": {
            "read_len": READ_LEN,
            "blocks": _ROWS,
            "status": status,
            "elapsed_s": round(time.perf_counter() - _T_START, 1),
            "device": device,
        },
    }))
    sys.stdout.flush()


def _on_term(signum, frame):
    _emit(status=f"interrupted (signal {signum})")
    os._exit(0)


def _make_reads(rng, n_reads):
    glen = n_reads * READ_LEN // 12          # ~12x coverage
    g = rng.integers(0, 4, size=glen).astype(np.uint8)
    starts = rng.integers(0, glen - READ_LEN, size=n_reads)
    reads = []
    for s in starts:
        r = g[s:s + READ_LEN].copy()
        e = rng.random(READ_LEN) < 0.01       # corrected-LR realism
        r[e] = (r[e] + rng.integers(1, 4, e.sum())) % 4
        reads.append(r)
    return reads


def _bench_size(n_reads):
    import jax
    import jax.numpy as jnp

    from hylight_tpu.config import OverlapConfig
    from hylight_tpu.io.readset import ReadSet
    from hylight_tpu.overlap.block import make_block_fn

    rng = np.random.default_rng(7)
    rs = ReadSet.from_seqs(_make_reads(rng, n_reads))
    seqs_np, lens_np = rs.to_padded(max_len=READ_LEN)

    # production config for corrected LR blocks (cli.config_from_args):
    # MXU matmul pair finding + per-pair join (overlap/seed_mxu.py)
    cfg = OverlapConfig(k=15, w=10, min_ovlp_len=2000, min_identity=0.9,
                        min_anchors=4, min_chain_score=100, max_occ=16,
                        anchors_per_pair=256, gap_tile=32,
                        seed_mode="mxu")
    fn = make_block_fn(cfg, mcap=1600, max_pairs=max(2048, 16 * n_reads),
                       snp_cap=64, n_reads=n_reads, max_len=READ_LEN)

    seqs = jnp.asarray(seqs_np)
    lens = jnp.asarray(lens_np)

    # warmup / compile (NOTE: block_until_ready does not block under the
    # axon tunnel — force a scalar fetch to synchronize)
    ch, ext, sc = fn(seqs, lens)
    n_pairs = int(np.asarray(jnp.sum(ch.valid.astype(np.int32))))
    n_admitted = int(np.asarray(jnp.sum(sc.valid.astype(np.int32))))

    # sync-free timing loop: dispatches pipeline; one fetch at the end
    t0 = time.perf_counter()
    sums = []
    for _ in range(ITERS):
        ch, ext, sc = fn(seqs, lens)
        sums.append(jnp.sum(sc.valid.astype(np.int32)))
    for s in sums:
        int(np.asarray(s))
    dt = (time.perf_counter() - t0) / ITERS

    return {
        "reads": n_reads,
        "block_seconds": round(dt, 4),
        "chained_pairs": n_pairs,
        "admitted_overlaps": n_admitted,
        "pairs_per_s": round(n_pairs / dt, 1),
        "candidates_per_s": round(n_pairs / dt, 1),
        "reads_per_s": round(n_reads / dt, 1),
    }


def _bench_ultralong():
    """64x65kb ONT-style block through the packed ultralong self-join
    (find_overlaps path; >32 kb reads get bandwidth 256 + wide qshift) —
    recorded in detail, never the headline (different workload)."""
    import time as _t

    from hylight_tpu.config import OverlapConfig
    from hylight_tpu.io.readset import ReadSet
    from hylight_tpu.overlap.engine import find_overlaps

    n_reads, L = 64, 65536
    rng = np.random.default_rng(11)
    glen = n_reads * L // 12
    g = rng.integers(0, 4, size=glen).astype(np.uint8)
    reads = []
    for s in rng.integers(0, glen - L, size=n_reads):
        r = g[s:s + L].copy()
        e = rng.random(L) < 0.01
        r[e] = (r[e] + rng.integers(1, 4, e.sum())) % 4
        reads.append(r)
    rs = ReadSet.from_seqs(reads)
    cfg = OverlapConfig(k=15, w=10, min_ovlp_len=5000, min_identity=0.9,
                        min_anchors=8, min_chain_score=500, max_occ=16,
                        anchors_per_pair=256, gap_tile=32)
    t_warm = find_overlaps(rs, cfg=cfg)          # compile + correctness
    # ITERS-averaged like the block rows (a single warm repeat was too
    # noisy a basis for a tracked number — VERDICT r4 weak 6)
    reps = 3
    t0 = _t.perf_counter()
    for _ in range(reps):
        t = find_overlaps(rs, cfg=cfg)
    dt = (_t.perf_counter() - t0) / reps
    return {"reads": n_reads, "read_len": L, "block_seconds": round(dt, 4),
            "admitted_overlaps": int(t.n),
            "pairs_per_s": round(t.n / dt, 1),
            "path": "packed self-join (non-legacy)", "reps": reps,
            "warm_overlaps": int(t_warm.n)}


def main():
    signal.signal(signal.SIGTERM, _on_term)
    signal.signal(signal.SIGINT, _on_term)
    status = "complete"
    last_cost = 0.0
    for n in SIZES:
        elapsed = time.perf_counter() - _T_START
        # a larger block costs >= the previous one (compile + ITERS runs);
        # stop while there is still time to flush the JSON
        if _ROWS and elapsed + 1.5 * last_cost > BUDGET_S:
            status = f"budget stop before {n} ({elapsed:.0f}s elapsed)"
            break
        t0 = time.perf_counter()
        try:
            _ROWS.append(_bench_size(n))
        except Exception as e:  # one failed size must not kill the number
            status = f"size {n} failed: {type(e).__name__}: {e}"
            break
        last_cost = time.perf_counter() - t0
    # ultralong detail row if budget remains; "pairs_per_s" key is renamed
    # so the max() headline never picks this different workload
    if time.perf_counter() - _T_START + last_cost < BUDGET_S:
        try:
            ul = _bench_ultralong()
            ul["ultralong_pairs_per_s"] = ul.pop("pairs_per_s")
            ul["pairs_per_s"] = 0.0
            _ROWS.append(ul)
        except Exception as e:
            status = f"ultralong row failed: {type(e).__name__}: {e}"
    _emit(status=status)


if __name__ == "__main__":
    main()
