"""End-to-end hybrid_assemble wall-clock with the chip in the loop.

Reference-shaped synthetic metagenome (VERDICT r4 item 4): two species,
each with two strains at ~1 SNP/200bp divergence; species 1 gets long +
short reads (the LR assembly + polish path), species 2 gets ONLY short
reads so its reads survive `pick_up` as leftovers and exercise the
clustering + per-cluster SR-core farm. Runs `hybrid_assemble` in
`--corrected` mode (HyLight's own flag for pre-corrected input) and
prints per-stage seconds + contig accounting.

Usage: python tools/profile_e2e.py [lr_cov] [sr_cov] [--cpu]
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
print("platform:", jax.devices()[0].platform, flush=True)

from hylight_tpu.config import Config, OverlapConfig, LayoutConfig, \
    SRCoreConfig, ClusterConfig, CorrectConfig
from hylight_tpu.io.readset import ReadSet, revcomp_codes, decode_seq
from hylight_tpu.assembly.pipeline import hybrid_assemble
from hylight_tpu.utils import STAGE_TIMES

args = [a for a in sys.argv[1:] if not a.startswith("--")]
LR_COV = float(args[0]) if len(args) > 0 else 10
SR_COV = float(args[1]) if len(args) > 1 else 12
GLEN = 150_000
rng = np.random.default_rng(5)

strains = []
for sp in range(2):
    a = rng.integers(0, 4, GLEN).astype(np.uint8)
    b = a.copy()
    snp = rng.choice(GLEN, GLEN // 200, replace=False)
    b[snp] = (b[snp] + 1 + rng.integers(0, 3, len(snp))) % 4
    strains.append((a, b))

# long reads: species 1 only, 8kb, 1% subs (corrected-LR realism)
lr_seqs, lr_names = [], []
n_lr_per = int(GLEN * LR_COV / 8000)
i = 0
for g in strains[0]:
    for s in rng.integers(0, GLEN - 8000, n_lr_per):
        r = g[s:s + 8000].copy()
        e = rng.random(8000) < 0.01
        r[e] = (r[e] + rng.integers(1, 4, e.sum())) % 4
        if rng.random() < 0.5:
            r = revcomp_codes(r)
        lr_seqs.append(r); lr_names.append(f"lr{i}"); i += 1
lr = ReadSet.from_seqs(lr_seqs, names=lr_names)

# short PE reads: BOTH species (species 2 has no LR -> its reads cluster)
sr_seqs, sr_names = [], []
fid = 0
for sp in range(2):
    for g in strains[sp]:
        n_frag = int(GLEN * SR_COV / 500)
        for s in rng.integers(0, GLEN - 450, n_frag):
            frag = g[s:s + 450]
            sr_seqs.append(frag[:250].copy())
            sr_names.append(f"p{fid}/1")
            sr_seqs.append(revcomp_codes(frag[-250:]).copy())
            sr_names.append(f"p{fid}/2")
            fid += 1
sr = ReadSet.from_seqs(sr_seqs, names=sr_names)
print(f"LR: {lr.n} x 8kb ({LR_COV}x sp1); SR: {sr.n} x 250bp "
      f"({SR_COV}x both species)", flush=True)

cfg = Config().replace(
    overlap=OverlapConfig(min_ovlp_len=2000, min_identity=0.9, w=10,
                          seed_mode="mxu"),
    layout=LayoutConfig(max_tip_len=10000, bubble_dist=10000, min_span=2000),
    cluster=ClusterConfig(max_cluster_size=15000),
    sr_core=SRCoreConfig(insert_size=450, average_read_len=250,
                         max_iterations=8),
    correct=CorrectConfig(skip=True),
)
t0 = time.time()
out = hybrid_assemble(lr, sr, cfg, corrected=True)
dt = time.time() - t0

gsets = [decode_seq(g) for pair in strains for g in pair]
def acc(rs_):
    n_sub = 0
    for ii in range(rs_.n):
        c = decode_seq(rs_.get(ii)); r = decode_seq(revcomp_codes(rs_.get(ii)))
        if any(c in g or r in g for g in gsets):
            n_sub += 1
    return n_sub

print(f"hybrid_assemble = {dt:.1f} s wall", flush=True)
print(f"final: {out.final_contigs.n} contigs "
      f"{int(out.final_contigs.lengths.sum())} bp; "
      f"long: {out.long_contigs.n}/{int(out.long_contigs.lengths.sum())} bp "
      f"(exact-substr {acc(out.long_contigs)}); "
      f"short_stageb: {out.short_stageb.n}/{int(out.short_stageb.lengths.sum())} bp")
for k, v in STAGE_TIMES.items():
    print(f"  stage {k:: <28} {v:8.2f} s")
