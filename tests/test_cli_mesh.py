"""CLI end-to-end over the device mesh.

conftest forces 8 virtual CPU devices, so ``cli.main`` must build the 1-D
shard mesh automatically (round-4 fix: the CLI previously never constructed
one despite its docstring) and drive the all-vs-all overlap stages through
``find_overlaps(mesh=...)`` -> ring exchange. Reference being replaced:
the --nsplit file-sharding of ``utils.py:41-71``.
"""

import numpy as np

import jax

from hylight_tpu.cli import main
from hylight_tpu.io.readset import decode_seq


def _write_fastq(path, reads, names):
    with open(path, "w") as f:
        for nm, codes in zip(names, reads):
            s = decode_seq(codes)
            f.write(f"@{nm}\n{s}\n+\n{'I' * len(s)}\n")


def test_cli_end_to_end_mesh(rng, tmp_path):
    assert len(jax.devices()) == 8            # conftest virtual mesh
    glen = 8000
    g = rng.integers(0, 4, size=glen).astype(np.uint8)

    lr_reads, lr_names = [], []
    for i, s in enumerate(range(0, glen - 1500, 120)):
        r = g[s:s + 1500].copy()
        e = rng.random(1500) < 0.005
        r[e] = (r[e] + rng.integers(1, 4, e.sum())) % 4
        lr_reads.append(r)
        lr_names.append(f"lr{i}")
    sr_reads, sr_names = [], []
    for i, s in enumerate(range(0, glen - 400, 40)):
        frag = g[s:s + 400]
        sr_reads.append(frag[:150].copy())
        sr_names.append(f"p{i}/1")
        sr_reads.append((3 - frag[-150:])[::-1].copy())
        sr_names.append(f"p{i}/2")

    lr_path = tmp_path / "lr.fq"
    sr_path = tmp_path / "sr.fq"
    _write_fastq(lr_path, lr_reads, lr_names)
    _write_fastq(sr_path, sr_reads, sr_names)

    rc = main(["-l", str(lr_path), "-s", str(sr_path),
               "-o", str(tmp_path / "out"), "--corrected",
               "--min_ovlp_len", "500", "--min_identity", "0.90",
               "--max_tip_len", "2000", "--min_span", "500"])
    assert rc == 0
    out = tmp_path / "out"
    for f in ["final_contigs.fa", "long_con_polished.fa",
              "short_stageb.fa", "all_contigs.fa", "stats.txt"]:
        assert (out / f).exists(), f

    # the biggest long contig reconstructs a large stretch of the genome
    seqs = []
    cur = []
    for line in open(out / "long_con_polished.fa"):
        if line.startswith(">"):
            if cur:
                seqs.append("".join(cur))
            cur = []
        else:
            cur.append(line.strip())
    if cur:
        seqs.append("".join(cur))
    assert seqs, "no long contigs"
    gstr = decode_seq(g)
    grc = decode_seq((3 - g)[::-1])
    big = max(seqs, key=len)
    assert len(big) > 3000
    assert big in gstr or big in grc, "long contig not a genome substring"
