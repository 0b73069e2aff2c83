"""Long-read assembly pipeline: the `long_con_polished.fa` path.

Mirrors the reference driver's long-read stages (``HyLight.py:114-203``):

  1. all-vs-all overlaps on (corrected) long reads, SNP-filtered
     (``split_reads2(s1,s1)`` + ``filter_overlap_slr2``)
  2. string-graph layout -> unitigs (``miniasm -d tip -n 1 -e 1 -c 1``)
  3. long-read polish (``racon --no-trimming -u``)
  4. pick_up loop (x2): reads with no overlap against current contigs are
     re-assembled and appended (``HyLight.py:158-184``, ``pick_up()`` ``:347``)
  5. optional short-read polish round (``HyLight.py:200-203``, len_over=70,
     mc=3)

All stages are the in-memory TPU engines; no intermediate files.
"""

from __future__ import annotations

from dataclasses import replace
from typing import List, Optional, Tuple

import numpy as np

from hylight_tpu.config import Config
from hylight_tpu.io.readset import ReadSet
from hylight_tpu.graph.string_graph import (
    miniasm_clean, unitig_seqs, unitigs)
from hylight_tpu.ops.consensus import polish_contigs
from hylight_tpu.overlap.engine import (find_overlaps,
                                        find_overlaps_streamed)
from hylight_tpu.overlap.snp import snp_filter
from hylight_tpu.utils import get_logger, stage

log = get_logger()


def _layout(reads: ReadSet, cfg: Config, *, query_block: int,
            gfa_sink: Optional[List[str]] = None, mesh=None) -> ReadSet:
    """overlaps -> SNP filter -> 2-pass read selection -> string graph ->
    unitig contigs.

    The 2-pass selection (hit-level coverage trimming, chimera filter and
    containment removal) is miniasm's main.c:119-142 cascade, implemented
    in assembly/readsel.py. gfa_sink: when given, the unitig-layout GFA
    text (miniasm ``ma_ug_print`` parity, asm.c:77) is appended to it."""
    from hylight_tpu.assembly import readsel

    oc = cfg.overlap
    lay = cfg.layout
    table = find_overlaps_streamed(reads, cfg=oc, query_block=query_block,
                                   chunk=cfg.parallel.stream_chunk,
                                   mesh=mesh)
    if table.n:
        keep = snp_filter(table, mc=cfg.snp.mc, max_frac=cfg.snp.max_snp_frac,
                          long_reads=True)
        table = table.select(keep)
    if table.n == 0:
        return ReadSet.from_seqs([])
    min_ovlp = lay.min_ovlp or lay.min_span
    hits, sub = readsel.select_reads(
        table, reads.n, min_dp=lay.min_coverage, min_span=lay.min_span,
        min_match=lay.min_match, max_hang=oc.max_overhang,
        int_frac=lay.int_frac, min_ovlp=min_ovlp, min_iden=lay.min_iden)
    arcs = readsel.sg_arcs_from_hits(hits, sub, max_hang=oc.max_overhang,
                                     int_frac=lay.int_frac,
                                     min_ovlp=min_ovlp)
    # the full miniasm cleaning cascade (main.c:154-188): -n maps to the
    # short-overlap drop rounds, -e to max_ext, -d to the bubble distance
    arcs, dropped = miniasm_clean(
        arcs, max_ext=lay.min_unitig_reads, bub_dist=lay.bubble_dist,
        n_rounds=lay.rounds)
    utg = unitigs(arcs, drop_reads=sub.deleted | dropped)
    trimmed = readsel.trimmed_reads(reads, sub)
    out = unitig_seqs(utg, trimmed)
    if gfa_sink is not None:
        from hylight_tpu.graph.gfa import unitigs_to_gfa
        gfa_sink.append(unitigs_to_gfa(utg, out, trimmed))
    return out


def _used_reads(reads: ReadSet, contigs: ReadSet, cfg: Config,
                *, query_block: int) -> np.ndarray:
    """Mask of reads that map to any contig (complement = pick_up set).

    Reference ``pick_up()`` (``HyLight.py:347``) collects reads absent from
    PAF columns 0/5 of the read->contig mapping.
    """
    if contigs.n == 0 or reads.n == 0:
        return np.zeros(reads.n, dtype=bool)
    # Deliberate deviation from the reference: pick_up maps with RELAXED
    # thresholds (identity - 0.05, min_ovlp_len / 4, floor 500) where the
    # reference reuses the polish mapping's full thresholds — a read that
    # *nearly* maps to an existing contig would otherwise be re-assembled
    # into a duplicate contig fragment. The SNP filter below still applies
    # at the reference's mc so cross-strain hits never mark a read used.
    oc = replace(cfg.overlap, min_ovlp_len=max(500, cfg.overlap.min_ovlp_len
                                               // 4),
                 min_identity=max(0.0, cfg.overlap.min_identity - 0.05))
    t = find_overlaps(reads, contigs, cfg=oc, query_block=query_block,
                      cap_overlaps=False)
    if t.n:
        # the reference's pick_up reads the mc=2-FILTERED ov_long_ref.paf
        # (HyLight.py:149,158-184): a cross-strain hit must not suppress
        # re-assembly of the read on its own strain
        from hylight_tpu.overlap.snp import snp_filter_mapped
        keep = snp_filter_mapped(t, n_query_ids=reads.n,
                                 mc=cfg.snp.mc_polish_long,
                                 max_frac=cfg.snp.max_snp_frac,
                                 long_reads=True)
        t = t.select(keep)
    used = np.zeros(reads.n, dtype=bool)
    used[t.qid] = True
    return used


def assemble_long_reads(lr: ReadSet, cfg: Config,
                        sr: Optional[ReadSet] = None, *,
                        pickup_rounds: int = 2,
                        query_block: int = 64,
                        gfa_sink: Optional[List[str]] = None,
                        mesh=None) -> ReadSet:
    """Full long-read path -> polished contigs (long_con_polished equivalent)."""
    contig_parts: List[ReadSet] = []
    remaining = lr
    rmap = np.arange(lr.n)

    for rnd in range(1 + pickup_rounds):
        if remaining.n < 2:
            break
        with stage(f"lr_layout_r{rnd}"):
            contigs = _layout(remaining, cfg, query_block=query_block,
                              gfa_sink=gfa_sink, mesh=mesh)
        log.info("[A::lr] round %d: %d reads -> %d contigs", rnd,
                 remaining.n, contigs.n)
        if contigs.n == 0:
            break
        with stage(f"lr_polish_r{rnd}"):
            contigs = polish_contigs(contigs, remaining, cfg=cfg.overlap,
                                     rounds=cfg.consensus.rounds_long,
                                     query_block=query_block,
                                     min_depth=cfg.consensus.min_depth,
                                     snp_mc=cfg.snp.mc_polish_long,
                                     snp_long=True,
                                     snp_max_frac=cfg.snp.max_snp_frac)
        contig_parts.append(contigs)
        if rnd == pickup_rounds:
            break
        with stage(f"lr_pickup_r{rnd}"):
            used = _used_reads(remaining, contigs, cfg,
                               query_block=query_block)
        if used.all() or (~used).sum() < 2:
            break
        keep_idx = np.nonzero(~used)[0]
        remaining = remaining.subset(keep_idx)
        rmap = rmap[keep_idx]

    if not contig_parts:
        return ReadSet.from_seqs([])
    contigs = contig_parts[0]
    for part in contig_parts[1:]:
        contigs = contigs.concat(part)
    # renumber (reference HyLight.py:189-196)
    contigs.names = [f"contig_{i}" for i in range(contigs.n)]

    if sr is not None and sr.n > 0 and contigs.n > 0:
        with stage("lr_sr_polish"):
            # reference SR round: shortr1.paf filtered with len_over=70,
            # mc=3, SR mode (drops a cross-strain pair outright) before
            # racon (HyLight.py:200-203)
            contigs = polish_contigs(contigs, sr, cfg=cfg.overlap_sr,
                                     rounds=1, query_block=256,
                                     min_depth=cfg.consensus.min_depth,
                                     min_len=70,
                                     snp_mc=cfg.snp.mc_short,
                                     snp_long=False,
                                     snp_max_frac=cfg.snp.max_snp_frac)
    return contigs
