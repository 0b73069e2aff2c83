"""Typed configuration tree.

The reference scatters its knobs over three tiers (argparse in
``script/HyLight.py:23-52``, ~50 boost::program_options flags in
``ViralQuasispecies.cpp:49-99``, getopt in ``miniasm/main.c:44-73``) plus
hard-coded magic constants in the drivers (``HyLight.py:130,200,236-239``).
Here every knob lives in one frozen dataclass tree so a whole run is a single
hashable value that can be closed over by jitted functions.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field


@dataclass(frozen=True)
class OverlapConfig:
    """Overlap engine knobs (replaces minimap2 presets + PAF filters).

    Reference invocations: ``filter_overlap_slr2.py:51`` (long-read preset
    ``ava-pb -Hk19 -m100 -g10000 -N40``), ``:55`` (short-read preset
    ``--sr -k21 -w11 -s60 -m30``), filter thresholds at
    ``filter_overlap_slr2.py:90-152`` and ``HyLight.py:39-42``.
    """

    k: int = 15                 # minimizer k-mer size (<=16 so a k-mer fits uint32)
    w: int = 10                 # minimizer window. The reference's ava-pb
    #                             preset uses w=5 for RAW 85-90%-identity
    #                             reads; HyLight overlaps CORRECTED long
    #                             reads (fmlrc2 x3 first, HyLight.py:106),
    #                             where w=10's ~5.5 bp anchor spacing keeps
    #                             hundreds of anchors per min_ovlp_len=3000
    #                             overlap at 1% residual error and halves
    #                             the seeding volume. --low_q (raw input)
    #                             drops back to w=5 (cli.py).
    min_ovlp_len: int = 3000    # HyLight --min_ovlp_len (long reads)
    min_identity: float = 0.95  # HyLight --min_identity
    min_anchors: int = 4        # min chained anchors to attempt extension (minimap2 -n 2..4)
    min_chain_score: int = 100  # minimap2 -m 100
    max_gap: int = 10000        # minimap2 -g 10000 (chain gap bound)
    max_occ: int = 64           # drop minimizers occurring more often (repeat filter)
    anchors_per_pair: int = 512 # static anchor budget per candidate pair
    max_overlaps_per_read: int = 60  # cap (filter_trans_ovlp_inline_v4.py:74-83)
    overhang_ratio: float = 0.8 # Algorithm-5 internal-match test (r in minimap paper)
    max_overhang: int = 1000    # max allowed overhang in bases (Algorithm 5)
    gap_tile: int = 64          # consensus-vote gap tile (ops/consensus.py)
    # dense diagonal verify budgets (extend.extend_chains): a chain is
    # verified as up to verify_segments maximal constant-diagonal anchor
    # runs (whole-span SWAR compare per run); columns between/beyond them
    # fall back to the calibrated estimate. cli.py raises the budgets for
    # --low_q raw reads, where indels fragment chains into many runs.
    verify_segments: int = 4       # diagonal-run budget K per chain
    verify_event_words: int = 64   # mismatch-event word budget E (8 cols/word)
    seed_mode: str = "sort"     # "sort": global-sort self-join (exact
    #                             minimap2 anchor multiset; works on raw
    #                             high-error reads). "mxu": matmul pair
    #                             finding + per-pair join (seed_mxu.py) —
    #                             for corrected/low-error read sets where
    #                             overlaps share >> noise-floor minimizers.
    mxu_bucket_bits: int = 15   # C-matrix histogram bucket count (2^bits)
    mxu_margin: float = 8.0     # sigmas above collision noise for pair admission
    mxu_join_frac: float = 0.5  # per-read join width cap (smallest-hash
    #                             subsample, consistent across reads); 1.0
    #                             joins every minimizer


@dataclass(frozen=True)
class SnpFilterConfig:
    """SNP-aware cross-strain overlap rejection.

    Reference: ``filter_overlap_slr2.py`` — ``prpare_mutation2()`` ``:289-367``
    (support >= mc and contradiction >= mc marks a mismatch column as a true
    SNP), ``mutation_re()`` ``:370-405``, kill threshold
    ``mutation[pair]/matchcount > 0.0025`` at ``:90-96``.
    """

    mc: int = 4                   # min read support AND min contradiction per SNP column
    max_snp_frac: float = 0.0025  # overlap killed above this SNP-per-match fraction
    mc_short: int = 3             # short-read stage value (HyLight.py:200 uses mc=3)
    mc_polish_long: int = 2       # read->contig mapping filter before LR
    #                               polish + pick_up (HyLight.py:149 mc=2)


@dataclass(frozen=True)
class LayoutConfig:
    """Long-read string-graph layout (miniasm-equivalent).

    Reference invocation ``miniasm -d <max_tip_len> -n 1 -e 1 -c 1``
    (``HyLight.py:137,140``); defaults from ``miniasm/common.c:5-23``.
    """

    min_coverage: int = 1       # -c == miniasm min_dp: the per-read coverage
    #                             plateau threshold of ma_hit_sub (hit.c:110);
    #                             HyLight passes -c 1 (strain preservation),
    #                             -c 3 in --low_q mode
    min_unitig_reads: int = 1   # -e
    rounds: int = 1             # -n graph-cleaning rounds
    max_tip_len: int = 10000    # HyLight --max_tip_len (passed to miniasm -d)
    min_span: int = 2000        # -s: min hit span / sub-read span (common.c:7)
    min_iden: float = 0.05      # -i: ma_hit_sub identity skip (common.c:10)
    int_frac: float = 0.8       # -I: hit->arc overhang fraction (ma_hit2arc)
    min_match: int = 100        # -m: min matching bases per hit (common.c:8)
    min_ovlp: int = 0           # -o: min overlap for arcs; 0 = min_span
    #                             (main.c: o_set? atoi : opt.min_span)
    bubble_dist: int = 50000    # bubble-popping search distance


@dataclass(frozen=True)
class ConsensusConfig:
    """Pileup/POA-lite consensus + polish (racon-equivalent).

    Reference: ``racon --no-trimming -u`` (``HyLight.py:152,182,203``);
    clique consensus in ``SRBuilder.cpp:297-533``.
    """

    rounds_long: int = 2        # LR polish rounds (HyLight.py:149-184 loop)
    min_depth: int = 1          # min coverage to change the draft (sub/indel)
    min_qual: float = 0.0       # clique-consensus posterior gate; below it a
    #                             column emits N (SRBuilder consensus_pos)


@dataclass(frozen=True)
class ClusterConfig:
    """Size-capped union-find short-read clustering.

    Reference: ``bin_pointer_limited_filechunks_shortpath2.py:55-93``
    (score-descending stream, cap 15000), ``getclusters.py:53`` (drop <20).
    """

    max_cluster_size: int = 15000  # HyLight --size
    min_cluster_size: int = 20


@dataclass(frozen=True)
class SRCoreConfig:
    """Strain-aware short-read OLC core (ViralQuasispecies-equivalent).

    Reference defaults from ``polyte.tune_params.py`` / ``HyLight.py:236-239``:
    ``-m 50 -m_EC 60 --hap_cov 10 --stddev 27 --edge1 0.93 --edge2 1.0``.
    """

    min_overlap_len: int = 50      # -m
    min_overlap_len_ec: int = 60   # -m_EC (error-correction iteration)
    edge_threshold_ec: float = 0.93   # edge1: iteration-1 clique EC
    edge_threshold: float = 1.0       # edge2: merge iterations
    min_clique_size: int = 2
    hap_cov: float = 10.0
    insert_size: float = 450.0     # HyLight --insert_size
    stddev: float = 27.0
    average_read_len: float = 250.0  # HyLight --average_read_len
    seq_err: float = 0.01          # min_ev_table.py seq_err
    accuracy: float = 1e-3         # min_ev_table.py binomial tail accuracy
    max_tip_len: int = 150
    max_iterations: int = 20
    graph_dumps: "str | None" = None  # write VQ digraph.txt/graph.fastg
    #                                   debug dumps per iteration here
    #                                   (OverlapGraph.cpp:388,412)
    careful: bool = True           # careful_diploid (VQ default true,
    #                                ViralQuasispecies.cpp:97): branch-
    #                                reduction components neighboring an
    #                                already-kept component are removed
    # FNO3 (FindNextOverlaps3.cpp:20-173): derive candidate pairs from
    # superreads SHARING an original subread (subread-index groupby)
    # instead of projecting the previous edge table. Inactive on the
    # reference's default path (program_settings.FNO defaults to 1), so
    # off by default here too.
    fno3: bool = False
    # Overlap source for iterations AFTER the first: False (default)
    # matches the reference exactly — polyte computes original_overlaps.txt
    # ONCE and every later iteration's overlaps.txt comes from
    # FindNextOverlaps projection + the nonedge carry (run_savage_assembly
    # polyte.tune_params.py:629-650 reads "overlaps.txt", written by the
    # previous VQ run's --FNO pass; no minimap2/sfo re-run inside the
    # loop). True re-runs the overlap engine each iteration — strictly
    # higher recall (more, smaller contigs) at ~1.3-1.7x the wall-clock
    # (measured: 5,012-read cluster 174 s vs 298 s CPU; 15,012 reads
    # 257.6 s vs 323 s on chip, N50 1650 vs 1350 at 5k).
    reoverlap: bool = False
    # diploid genome assembly (polyte --diploid, tune_params.py:371-418):
    # adds a final diploid merge stage with the typical-double-branch rule
    diploid: bool = False
    diploid_contig_len: int = 0     # min contig length entering the stage
    diploid_overlap_len: int = 0    # 0 = use min_overlap_len


@dataclass(frozen=True)
class StageBConfig:
    """Stage-b master-contig extension.

    Reference: ``extend_con()`` ``HyLight.py:282-326`` ->
    ``pipeline_per_stage.py`` with ``--no_error_correction
    --remove_branches true --min_overlap_len 300 --edge_threshold 1``.
    """

    min_overlap_len: int = 300
    edge_threshold: float = 1.0
    min_contig_len: int = 150      # length filter before extension (HyLight.py:284)
    max_tip_len: int = 1000        # VQ removeTips runs in stage b (default
    #                                true, ViralQuasispecies.cpp:85,322;
    #                                --max_tip_len 1000, HyLight.py:320-323)
    remove_branches: bool = True


@dataclass(frozen=True)
class CorrectConfig:
    """Read correction (bfc / fmlrc2 equivalents). ``HyLight.py:87,106-110``."""

    sr_k: int = 25              # short-read correction k-mer
    sr_min_count: int = 3       # solid k-mer threshold
    sr_qual_thresh: int = 20    # bfc -q: only k-mer occurrences whose
    #                             bases all have phred >= this count toward
    #                             solidity (0 disables; no-qual input is
    #                             always counted)
    lr_k: int = 21              # long-read correction k (fmlrc2-style short k)
    lr_rounds: int = 3          # fmlrc2 x3 (HyLight.py:107-110)
    lr_indels: bool = True      # fmlrc2 repairs indels; score del/ins edits
    skip: bool = False          # HyLight --corrected


@dataclass(frozen=True)
class ParallelConfig:
    """Device mesh / sharding. Replaces file-split + xargs -P (utils.py:41-71)."""

    mesh_axis: str = "shard"    # single data axis over reads/pairs
    read_block: int = 256       # reads per padded device block
    # static capacity factors for all_to_all bucket exchange
    bucket_capacity_factor: float = 1.5
    # host threads for the per-cluster task farm (xargs -P equivalent);
    # threads overlap host graph work with device programs
    cluster_workers: int = 4
    # all-vs-all read sets larger than this stream through chunk pairs so
    # at most two chunk matrices are device-resident (the reference's
    # "--nsplit >= 1000 for >5-10 GB inputs" recipe, README.md:120-122)
    stream_chunk: int = 8192


@dataclass(frozen=True)
class Config:
    """Top-level run configuration (the one object a pipeline run closes over)."""

    overlap: OverlapConfig = field(default_factory=OverlapConfig)
    overlap_sr: OverlapConfig = field(default_factory=lambda: OverlapConfig(
        k=15, w=5, min_ovlp_len=70, min_identity=0.95, min_anchors=2,
        min_chain_score=30, max_gap=500, max_overlaps_per_read=60))
    snp: SnpFilterConfig = field(default_factory=SnpFilterConfig)
    layout: LayoutConfig = field(default_factory=LayoutConfig)
    consensus: ConsensusConfig = field(default_factory=ConsensusConfig)
    cluster: ClusterConfig = field(default_factory=ClusterConfig)
    sr_core: SRCoreConfig = field(default_factory=SRCoreConfig)
    stage_b: StageBConfig = field(default_factory=StageBConfig)
    correct: CorrectConfig = field(default_factory=CorrectConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


DEFAULT = Config()
