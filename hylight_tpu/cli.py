"""Command-line interface — drop-in for the reference's
``python HyLight.py -l long.fq -s short.fq -o out ...``
(flag set from ``script/HyLight.py:23-52``).

Flags kept for compatibility but without effect on this engine are accepted
and logged: --nsplit (sharding is automatic over the device mesh), -t
(device parallelism replaces the thread farm).
"""

from __future__ import annotations

import argparse
import os
import sys

from hylight_tpu.config import (Config, ClusterConfig, CorrectConfig,
                                LayoutConfig, OverlapConfig, SRCoreConfig)
from hylight_tpu.io.fastx import read_fastx
from hylight_tpu.assembly.pipeline import hybrid_assemble, write_outputs
from hylight_tpu.utils import STAGE_TIMES, get_logger


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="hylight-tpu",
        description="TPU-native strain-aware hybrid metagenome assembler")
    p.add_argument("-l", "--long_reads", required=True,
                   help="long reads (FASTQ/FASTA, ONT/PacBio)")
    p.add_argument("-s", "--short_reads", required=False, default=None,
                   help="interleaved paired-end short reads (FASTQ)")
    p.add_argument("-o", "--outdir", required=True)
    p.add_argument("-t", "--threads", type=int, default=20,
                   help="accepted for compatibility (device-parallel)")
    p.add_argument("--nsplit", type=int, default=60,
                   help="accepted for compatibility (auto-sharded)")
    p.add_argument("--min_identity", type=float, default=0.95)
    p.add_argument("--min_ovlp_len", type=int, default=3000)
    p.add_argument("--size", type=int, default=15000,
                   help="max reads per short-read cluster")
    p.add_argument("--max_tip_len", type=int, default=10000)
    p.add_argument("--min_span", type=int, default=2000,
                   help="miniasm -s: min hit span / selected sub-read span "
                        "(lower for read sets shorter than ~5 kb)")
    p.add_argument("--insert_size", type=float, default=450)
    p.add_argument("--average_read_len", type=float, default=250)
    p.add_argument("--corrected", action="store_true",
                   help="input reads are already error-corrected")
    p.add_argument("--low_q", action="store_true",
                   help="low-quality long reads (more layout rounds)")
    p.add_argument("--diploid", action="store_true",
                   help="diploid genome assembly (extra final merge stage "
                        "with the typical-double-branch evidence rule)")
    p.add_argument("--profile", metavar="DIR", default=None,
                   help="write a JAX profiler trace of the run to DIR "
                        "(viewable with xprof/tensorboard)")
    return p


def config_from_args(a) -> Config:
    cfg = Config()
    cfg = cfg.replace(
        overlap=OverlapConfig(min_ovlp_len=a.min_ovlp_len,
                              min_identity=a.min_identity,
                              w=5 if a.low_q else 10,
                              # corrected long reads share >> noise-floor
                              # minimizers per admissible overlap -> MXU
                              # matmul pair finding; raw high-error input
                              # keeps the exact global-sort join
                              seed_mode="sort" if a.low_q else "mxu",
                              # raw reads: indels fragment chains into many
                              # constant-diagonal runs — widen the dense
                              # verify budgets so identity stays measured,
                              # not extrapolated
                              verify_segments=16 if a.low_q else 4,
                              verify_event_words=96 if a.low_q else 64),
        # HyLight feeds --max_tip_len to miniasm -d, which IS the
        # bubble-popping distance (main.c:51,90; SURVEY.md §2.2)
        layout=LayoutConfig(max_tip_len=a.max_tip_len,
                            bubble_dist=a.max_tip_len,
                            rounds=3 if a.low_q else 1,
                            min_coverage=3 if a.low_q else 1,
                            min_span=a.min_span),
        cluster=ClusterConfig(max_cluster_size=a.size),
        sr_core=SRCoreConfig(insert_size=a.insert_size,
                             average_read_len=a.average_read_len,
                             diploid=a.diploid),
        correct=CorrectConfig(skip=a.corrected),
    )
    return cfg


def main(argv=None) -> int:
    log = get_logger()
    a = build_parser().parse_args(argv)
    cfg = config_from_args(a)

    lr = read_fastx(a.long_reads)
    sr = read_fastx(a.short_reads) if a.short_reads else None
    log.info("[CLI] %d long reads, %s short reads", lr.n,
             sr.n if sr else "no")

    prof = None
    if a.profile:
        import contextlib
        import jax
        prof = contextlib.ExitStack()
        prof.enter_context(jax.profiler.trace(a.profile))
        log.info("[CLI] profiling to %s", a.profile)
    # multi-chip: all-vs-all overlap stages shard over a 1-D device mesh
    # (ring exchange, parallel/sharded_overlap.py) — the production
    # replacement for the reference's --nsplit file sharding (utils.py:41-71)
    mesh = None
    import jax
    if len(jax.devices()) > 1:
        from hylight_tpu.parallel.mesh import make_mesh
        mesh = make_mesh()
        log.info("[CLI] %d devices -> 1-D '%s' mesh (ring overlap exchange)",
                 len(jax.devices()), mesh.axis_names[0])
    out = hybrid_assemble(lr, sr, cfg, corrected=a.corrected,
                          checkpoint_dir=os.path.join(a.outdir, "tmp"),
                          mesh=mesh)
    if prof is not None:
        prof.close()
    write_outputs(out, a.outdir)
    log.info("[CLI] wrote %s: final=%d long=%d short=%d", a.outdir,
             out.final_contigs.n, out.long_contigs.n, out.short_stageb.n)
    # stats.txt: per-stage wall clock + output counts (the reference's
    # stats.txt / pipeline.log observability contract)
    with open(os.path.join(a.outdir, "stats.txt"), "w") as f:
        f.write(f"final_contigs\t{out.final_contigs.n}\t"
                f"{int(out.final_contigs.lengths.sum()) if out.final_contigs.n else 0}\n")
        f.write(f"long_contigs\t{out.long_contigs.n}\t"
                f"{int(out.long_contigs.lengths.sum()) if out.long_contigs.n else 0}\n")
        f.write(f"short_stageb\t{out.short_stageb.n}\t"
                f"{int(out.short_stageb.lengths.sum()) if out.short_stageb.n else 0}\n")
        for k, v in STAGE_TIMES.items():
            f.write(f"stage_seconds\t{k}\t{v:.3f}\n")
        # per-iteration SR-core rows (ViralQuasispecies.cpp:471-489:
        # vertices/edges/overlaps per iteration + superread counts)
        for ci, rows in sorted((out.sr_stats or {}).items()):
            for it, r in enumerate(rows):
                f.write("sr_iter\t%d\t%d\t%s\t%d\t%d\t%d\t%d\t%d\t%d\t%d\n" % (
                    ci, it, r.get("kind"), r.get("vertices", 0),
                    r.get("overlaps", 0), r.get("edges_admitted", 0),
                    r.get("edges_kept", 0), r.get("superreads", 0),
                    r.get("paired", 0),
                    r.get("cliques", r.get("merges", 0))))
    for k, v in STAGE_TIMES.items():
        log.info("[CLI] stage %-24s %8.2f s", k, v)
    return 0


if __name__ == "__main__":
    sys.exit(main())
