"""Multi-host (multi-process) execution over jax.distributed — the DCN
story of SURVEY.md §2.5/§7.3-8.

Two OS processes, each owning 2 virtual CPU devices, initialize
jax.distributed (Gloo collectives — the CPU stand-in for DCN), build ONE
global 4-device mesh and run the ring overlap exchange on row shards fed
through ``make_array_from_process_local_data`` (the production multi-host
ingestion path, parallel/mesh.put_global_rows). Each process dumps the
admitted pairs of its addressable output shards; the union must equal the
single-process engine's admitted set.

The ≥80% 2-host scaling *efficiency* target needs real hardware; what this
pins down is that the multi-host mechanics (process-local ingestion,
cross-process collectives inside shard_map, addressable-shard readback)
are correct end-to-end.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hylight_tpu.config import OverlapConfig
from hylight_tpu.io.readset import ReadSet
from hylight_tpu.overlap.block import make_block_fn

CFG = OverlapConfig(k=11, w=5, min_ovlp_len=150, min_identity=0.9,
                    min_anchors=4, min_chain_score=60, max_occ=16,
                    anchors_per_pair=64, gap_tile=32)

WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
pid, port, outdir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
from hylight_tpu.parallel.mesh import (init_multihost, global_mesh,
                                       put_global_rows)
init_multihost(f"localhost:{port}", num_processes=2, process_id=pid)
import numpy as np, jax.numpy as jnp
from hylight_tpu.config import OverlapConfig
from hylight_tpu.io.readset import ReadSet
from hylight_tpu.parallel.sharded_overlap import make_ring_overlap_fn

CFG = OverlapConfig(k=11, w=5, min_ovlp_len=150, min_identity=0.9,
                    min_anchors=4, min_chain_score=60, max_occ=16,
                    anchors_per_pair=64, gap_tile=32)
rng = np.random.default_rng(7)
g = rng.integers(0, 4, size=2400).astype(np.uint8)
step = (2400 - 600) // 15
rs = ReadSet.from_seqs([g[i * step:i * step + 600] for i in range(16)])
seqs, lens = rs.to_padded(max_len=640)

mesh = global_mesh()
assert len(jax.devices()) == 4, jax.devices()
# per-process local rows: this process owns global rows [pid*8, pid*8+8)
lo = pid * 8
seqs_d = put_global_rows(mesh, seqs[lo:lo + 8])
lens_d = put_global_rows(mesh, lens[lo:lo + 8])
fn = make_ring_overlap_fn(mesh, CFG, mcap=256, max_pairs=64)
out, n_valid = fn(seqs_d, lens_d)

def local(arr):
    shards = sorted(arr.addressable_shards, key=lambda s: s.index)
    return np.concatenate([np.asarray(s.data) for s in shards])

qid, tid, valid = local(out["qid"]), local(out["tid"]), local(out["valid"])
ident = local(out["identity"])
np.savez(f"{outdir}/pairs_{pid}.npz", qid=qid[valid], tid=tid[valid],
         identity=ident[valid], n_valid=int(np.asarray(n_valid)))
print("WORKER_OK", pid, int(np.asarray(n_valid)), flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def test_two_process_ring_matches_single(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(pid), str(port), str(tmp_path)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd="/root/repo") for pid in (0, 1)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        outs.append(out)
    for p, out in zip(procs, outs):
        if p.returncode != 0:
            if "distributed" in out.lower() and "initialize" in out.lower():
                pytest.skip(f"jax.distributed unavailable: {out[-400:]}")
            raise AssertionError(f"worker failed:\n{out[-2000:]}")
        assert "WORKER_OK" in out

    got = set()
    n_valids = []
    for pid in (0, 1):
        z = np.load(tmp_path / f"pairs_{pid}.npz")
        got |= set(zip(z["qid"].tolist(), z["tid"].tolist()))
        n_valids.append(int(z["n_valid"]))
        assert (z["identity"] > 0.99).all()
    # the psum'd global count is replicated: both processes agree
    assert n_valids[0] == n_valids[1] == len(got)

    # single-process ground truth (this pytest process, 8 local devices)
    rng = np.random.default_rng(7)
    g = rng.integers(0, 4, size=2400).astype(np.uint8)
    step = (2400 - 600) // 15
    rs = ReadSet.from_seqs([g[i * step:i * step + 600] for i in range(16)])
    seqs, lens = rs.to_padded(max_len=640)
    single = make_block_fn(CFG, mcap=256, max_pairs=512)
    ch, ext, sc = single(jnp.asarray(seqs), jnp.asarray(lens))
    want = {(int(q), int(t)) for q, t, v in
            zip(np.array(ch.qid), np.array(ch.tid), np.array(sc.valid)) if v}
    assert got == want and len(got) > 0
