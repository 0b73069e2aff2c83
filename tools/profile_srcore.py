"""SR-core scale profile: one cluster assembly wall-clock.

Usage: python tools/profile_srcore.py [n_frags] [--cpu]

Default platform is whatever jax picks (the attached TPU chip under the
axon tunnel — the chip-in-the-loop measurement); --cpu forces the XLA CPU
backend for the CPU-mode baseline rows recorded in BASELINE.md."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
print("platform:", jax.devices()[0].platform, flush=True)
from hylight_tpu.config import Config, OverlapConfig, SRCoreConfig, CorrectConfig
from hylight_tpu.io.readset import ReadSet, revcomp_codes
from hylight_tpu.assembly.srcore import sr_assemble

args = [a for a in sys.argv[1:] if not a.startswith("--")]
n_frags = int(args[0]) if args else 2500   # 2 reads/frag
rng = np.random.default_rng(9)
G = n_frags * 60 // 2 + 600   # ~PE tiling every 60bp over both strains
genome = rng.integers(0, 4, size=G).astype(np.uint8)
genomeB = genome.copy()
snp = np.arange(200, G - 200, 150)
genomeB[snp] = (genomeB[snp] + 1) % 4
seqs, names = [], []
fid = 0
for g in (genome, genomeB):
    for s in range(0, G - 450, max(1, (G - 450) * 2 // n_frags)):
        frag = g[s:s + 450]
        seqs.append(frag[:150].copy()); names.append(f"f{fid}/1")
        seqs.append(revcomp_codes(frag[-150:]).copy()); names.append(f"f{fid}/2")
        fid += 1
rs = ReadSet.from_seqs(seqs, names=names)
print("reads:", rs.n)
cfg = Config().replace(
    overlap_sr=OverlapConfig(k=13, w=5, min_ovlp_len=60, min_identity=0.9,
                             min_anchors=2, min_chain_score=30, max_occ=64,
                             max_gap=500, anchors_per_pair=64, gap_tile=16,
                             max_overlaps_per_read=60),
    sr_core=SRCoreConfig(min_overlap_len=60, min_overlap_len_ec=60,
                         edge_threshold_ec=0.93, edge_threshold=0.999,
                         min_clique_size=2, hap_cov=8.0, insert_size=450.0,
                         average_read_len=150.0, max_iterations=6),
    correct=CorrectConfig(skip=True))
if "--fno" in sys.argv:
    # reference-exact sourcing: overlaps computed once, later iterations
    # from FNO1 projection + carry (SRCoreConfig.reoverlap=False)
    import dataclasses
    cfg = cfg.replace(sr_core=dataclasses.replace(cfg.sr_core,
                                                  reoverlap=False))
t0 = time.time()
out = sr_assemble(rs, cfg)
dt = time.time() - t0
from hylight_tpu.io.readset import decode_seq
gA = decode_seq(genome); gB = decode_seq(genomeB)
n_exact = 0
tot = 0
for i in range(out.n):
    c = out.get(i)
    s = decode_seq(c); r = decode_seq(revcomp_codes(c))
    tot += len(c)
    if s in gA or s in gB or r in gA or r in gB:
        n_exact += 1
lens = sorted(out.lengths.tolist(), reverse=True)
cum = np.cumsum(lens)
n50 = lens[int(np.searchsorted(cum, cum[-1] / 2))] if lens else 0
print(f"sr_assemble({rs.n} reads) = {dt:.1f} s -> {out.n} contigs, "
      f"longest {int(out.lengths.max(initial=0))}, N50 {n50}, "
      f"{n_exact}/{out.n} strain-exact, {tot} bp total")
