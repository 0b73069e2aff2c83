"""Stage-b master-contig extension.

Reference: ``extend_con()`` (``HyLight.py:282-326``) — length-filter contigs
(>150bp), fake-phred FASTQ, then SAVAGE "stage b" merge-only iterations via
``pipeline_per_stage.py`` (``--no_error_correction --remove_branches true
--min_overlap_len 300 --edge_threshold 1``) looping ViralQuasispecies until
the read count is stable twice. Here: the SR core's merge iteration with
mismatch-free admission, looped to stability.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from hylight_tpu.config import Config
from hylight_tpu.io.readset import ReadSet
from hylight_tpu.assembly import srcore
from hylight_tpu.utils import get_logger, stage

log = get_logger()


def extend_contigs(contigs: ReadSet, cfg: Config, *,
                   min_overlap_len: Optional[int] = None,
                   min_contig_len: Optional[int] = None,
                   max_iterations: int = 30) -> ReadSet:
    sb = cfg.stage_b
    mol = min_overlap_len if min_overlap_len is not None else sb.min_overlap_len
    mcl = min_contig_len if min_contig_len is not None else sb.min_contig_len

    keep = np.nonzero(contigs.lengths >= mcl)[0]
    if len(keep) == 0:
        return ReadSet.from_seqs([])
    work = contigs.subset(keep)

    ws = srcore.WorkingSet.from_reads(
        work, ctx=srcore.SRContext.from_reads(work))
    stable = 0
    with stage("stage_b"):
        for it in range(max_iterations):
            prev = ws.n
            # the reference's stage b never re-runs minimap2: extend_con's
            # initial alignment feeds iteration 1 and every later iteration
            # consumes --FNO=1 induced overlaps (pipeline_per_stage.py:179-
            # 203) — matched here by reoverlap only on the first pass
            ws, n_merged = srcore.merge_iteration(
                ws, cfg, min_overlap_len=mol,
                edge_threshold=sb.edge_threshold, merge_eps=1e-6,
                remove_branches=sb.remove_branches,
                remove_tips=True, max_tip_len=sb.max_tip_len,
                reoverlap=(it == 0))
            if n_merged == 0 or ws.n == prev:
                stable += 1
                if stable >= 2:
                    break
            else:
                stable = 0
    out = ws.reads
    out.names = [f"extended_{i}" for i in range(out.n)]
    log.info("[B::stage_b] %d contigs -> %d extended", len(keep), out.n)
    return out
