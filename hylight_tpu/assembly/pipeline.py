"""The full hybrid assembly pipeline (HyLight.py main() equivalent).

Stage order mirrors the reference driver (``script/HyLight.py:80-280``):

  1. read correction: SR k-mer spectrum (bfc), LR against the SR spectrum
     x3 rounds (ropebwt2/fmlrc2) — skipped with ``corrected=True``;
  2. long-read path -> polished long contigs (``long_con_polished``);
  3. leftover short reads: SR that map to no long contig (``pick_up``);
  4. SNP-filtered SR overlap graph -> size-capped union-find clustering
     (PE mates share a cluster unit, as the reference strips '/1','/2');
  5. per-cluster strain-aware OLC assembly (POLYTE/ViralQuasispecies);
  6. stage-b extension of the pooled cluster contigs (``short_stageb``);
  7. stage-b extension of short_stageb + long contigs
     (``final_contigs``, the master output).

All stage boundaries are in-memory ReadSets; `write_outputs` materializes
the reference's four FASTA files.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, replace
from typing import Dict, List, Optional, Tuple

import numpy as np

from hylight_tpu.config import Config
from hylight_tpu.io.readset import ReadSet
from hylight_tpu.io.fastx import write_fasta
from hylight_tpu.assembly.longread import assemble_long_reads
from hylight_tpu.assembly.srcore import sr_assemble
from hylight_tpu.assembly.stageb import extend_contigs
from hylight_tpu.correct.kmer_correct import correct_reads
from hylight_tpu.graph.cluster import cluster_reads
from hylight_tpu.overlap.engine import (find_overlaps,
                                        find_overlaps_streamed)
from hylight_tpu.overlap.snp import snp_filter
from hylight_tpu.utils import get_logger, stage

log = get_logger()


@dataclass
class AssemblyOutputs:
    final_contigs: ReadSet
    long_contigs: ReadSet
    short_stageb: ReadSet
    all_contigs: ReadSet
    # per-layout-round unitig GFA texts (reference contigs{N}.gfa artifacts,
    # HyLight.py:137-140 + miniasm ma_ug_print)
    gfa: Optional[List[str]] = None
    # per-cluster per-iteration SR-core rows (vertices/overlaps/edges/
    # superreads per clique/merge iteration — ViralQuasispecies.cpp:471-489
    # observability), written into stats.txt by cli.py
    sr_stats: Optional[Dict[int, List[dict]]] = None


def pair_units(rs: ReadSet) -> np.ndarray:
    """Unit id per read: PE mates (names differing only in /1 /2) share a
    unit (reference strips the suffix, bin_pointer...py:79-80)."""
    unit_of = np.zeros(rs.n, dtype=np.int64)
    seen: Dict[str, int] = {}
    for i, nm in enumerate(rs.names):
        base = nm[:-2] if nm.endswith(("/1", "/2")) else nm
        if base not in seen:
            seen[base] = len(seen)
        unit_of[i] = seen[base]
    return unit_of


def hybrid_assemble(lr: ReadSet, sr: Optional[ReadSet], cfg: Config, *,
                    corrected: bool = False, query_block: int = 64,
                    checkpoint_dir: Optional[str] = None,
                    mesh=None) -> AssemblyOutputs:
    from hylight_tpu.io.checkpoint import Checkpointer
    ck = Checkpointer(checkpoint_dir)

    # 1. correction
    if not corrected and not cfg.correct.skip:
        if sr is not None and sr.n:
            cached = ck.load("corrected_sr")
            if cached is not None:
                sr = cached
            else:
                with stage("correct_sr"):
                    sr = correct_reads(sr, k=cfg.correct.sr_k,
                                       min_count=cfg.correct.sr_min_count,
                                       qual_thresh=cfg.correct.sr_qual_thresh)
                ck.save("corrected_sr", sr)
            cached = ck.load("corrected_lr")
            if cached is not None:
                lr = cached
            else:
                with stage("correct_lr"):
                    lr = correct_reads(lr, spectrum_reads=sr,
                                       k=cfg.correct.lr_k,
                                       min_count=cfg.correct.sr_min_count,
                                       rounds=cfg.correct.lr_rounds,
                                       indels=cfg.correct.lr_indels)
                ck.save("corrected_lr", lr)

    # 2. long-read contigs
    gfa_sink: List[str] = []
    long_contigs = ck.load("long_contigs")
    if long_contigs is None:
        long_contigs = assemble_long_reads(lr, cfg, sr=sr,
                                           query_block=query_block,
                                           gfa_sink=gfa_sink, mesh=mesh)
        ck.save("long_contigs", long_contigs)

    # 3-5. short-read clusters -> per-cluster strain assembly
    cluster_contigs = ck.load("cluster_contigs")
    sr_stats: Optional[Dict[int, List[dict]]] = None
    if cluster_contigs is None:
        cluster_contigs = ReadSet.from_seqs([])
        if sr is not None and sr.n:
            leftover = _leftover_short_reads(sr, long_contigs, cfg)
            log.info("[P::pipeline] %d/%d short reads left for clustering",
                     leftover.n, sr.n)
            if leftover.n >= cfg.cluster.min_cluster_size:
                cluster_contigs, sr_stats = _assemble_clusters(leftover, cfg,
                                                     mesh=mesh)
        ck.save("cluster_contigs", cluster_contigs)

    # 6. stage-b over pooled cluster contigs
    short_stageb = ck.load("short_stageb")
    if short_stageb is None:
        short_stageb = extend_contigs(cluster_contigs, cfg) \
            if cluster_contigs.n else ReadSet.from_seqs([])
        short_stageb.names = [f"short_{i}" for i in range(short_stageb.n)]
        ck.save("short_stageb", short_stageb)

    # 7. master contigs
    all_contigs = short_stageb.concat(long_contigs)
    all_contigs.names = [f"ctg_{i}" for i in range(all_contigs.n)]
    final = extend_contigs(all_contigs, cfg) if all_contigs.n \
        else ReadSet.from_seqs([])
    final.names = [f"final_{i}" for i in range(final.n)]
    return AssemblyOutputs(final_contigs=final, long_contigs=long_contigs,
                           short_stageb=short_stageb,
                           all_contigs=all_contigs, gfa=gfa_sink,
                           sr_stats=sr_stats)


def _leftover_short_reads(sr: ReadSet, contigs: ReadSet,
                          cfg: Config) -> ReadSet:
    """pick_up for short reads (HyLight.py:205-207): a short read is used
    only if it has a SAME-strain mapping to a long contig — the mapping is
    filtered like the reference's shortr1.paf (len_over=70 per
    HyLight.py:200, mc=3 SR mode killing cross-strain pairs outright,
    filter_overlap_slr2.py:99-100) so wrong-strain hits don't suppress a
    read's re-assembly in the cluster stage."""
    if contigs.n == 0:
        return sr
    oc = replace(cfg.overlap_sr, min_ovlp_len=70)
    with stage("sr_pickup_map"):
        t = find_overlaps(sr, contigs, cfg=oc, query_block=256,
                          cap_overlaps=False)
    if t.n:
        from hylight_tpu.overlap.snp import snp_filter_mapped
        keep = snp_filter_mapped(t, n_query_ids=sr.n, mc=cfg.snp.mc_short,
                                 max_frac=cfg.snp.max_snp_frac,
                                 long_reads=False)
        t = t.select(keep)
    used = np.zeros(sr.n, dtype=bool)
    used[t.qid] = True
    return sr.subset(np.nonzero(~used)[0])


def _assemble_clusters(leftover: ReadSet, cfg: Config, mesh=None
                       ) -> Tuple[ReadSet, Dict[int, List[dict]]]:
    with stage("sr_cluster_overlaps"):
        table = find_overlaps_streamed(leftover, cfg=cfg.overlap_sr,
                                       query_block=256,
                                       chunk=cfg.parallel.stream_chunk,
                                       mesh=mesh)
        if table.n:
            keep = snp_filter(table, mc=cfg.snp.mc_short,
                              max_frac=cfg.snp.max_snp_frac,
                              long_reads=False)
            table = table.select(keep)
    units = pair_units(leftover)
    n_units = int(units.max()) + 1 if len(units) else 0
    with stage("sr_clustering"):
        clusters = cluster_reads(
            table, n_units, max_size=cfg.cluster.max_cluster_size,
            min_size=max(2, cfg.cluster.min_cluster_size // 2),
            unit_of=units)
    unit_members: Dict[int, List[int]] = {}
    for i, u in enumerate(units):
        unit_members.setdefault(int(u), []).append(i)

    # per-cluster task farm (the reference's generated cmd_polyte.sh +
    # xargs -P, HyLight.py:241-246): host threads pipeline numpy/graph work
    # of one cluster with device programs of another; srcore carries all
    # state in SRContext so assemblies are concurrency-safe
    def one(ci_cl):
        ci, cl = ci_cl
        ridx = sorted(r for u in cl for r in unit_members[int(u)])
        sub = leftover.subset(ridx)
        rows: List[dict] = []
        try:
            with stage(f"sr_polyte_c{ci}"):
                contigs = sr_assemble(sub, cfg, stats=rows)
        except Exception:
            # a failed cluster is reported, not fatal (the reference only
            # reports missing per-cluster contigs, HyLight.py:250-256)
            log.exception("[P::pipeline] cluster %d assembly failed "
                          "(%d reads); continuing", ci, sub.n)
            return ci, None, rows
        if contigs.n:
            contigs.names = [f"cl{ci}_{nm}" for nm in contigs.names]
        return ci, contigs, rows

    workers = max(1, cfg.parallel.cluster_workers)
    if workers > 1 and len(clusters) > 1:
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=workers) as ex:
            results = list(ex.map(one, enumerate(clusters)))
    else:
        results = [one(x) for x in enumerate(clusters)]
    results.sort(key=lambda r: r[0])   # deterministic output order
    n_failed = sum(1 for _, c, _r in results if c is None)
    parts = [c for _, c, _r in results if c is not None and c.n]
    sr_stats = {ci: rows for ci, _, rows in results if rows}
    if n_failed:
        log.warning("[P::pipeline] %d/%d clusters failed", n_failed,
                    len(clusters))
    if not parts:
        return ReadSet.from_seqs([]), sr_stats
    out = parts[0]
    for p in parts[1:]:
        out = out.concat(p)
    return out, sr_stats


def write_outputs(out: AssemblyOutputs, outdir: str) -> None:
    """Materialize the reference's four output files (README.md:89-97)
    plus the per-round unitig GFA graphs (contigs{N}.gfa)."""
    os.makedirs(outdir, exist_ok=True)
    for i, text in enumerate(out.gfa or []):
        with open(os.path.join(outdir, f"contigs{i + 1}.gfa"), "w") as f:
            f.write(text)
    write_fasta(os.path.join(outdir, "final_contigs.fa"), out.final_contigs)
    write_fasta(os.path.join(outdir, "long_con_polished.fa"),
                out.long_contigs)
    write_fasta(os.path.join(outdir, "short_stageb.fa"), out.short_stageb)
    write_fasta(os.path.join(outdir, "all_contigs.fa"), out.all_contigs)
