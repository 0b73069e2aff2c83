"""Test configuration: force an 8-device virtual CPU mesh.

All sharding-aware code is exercised on faked devices (the driver separately
dry-runs the multi-chip path; real benches run on the one real TPU chip).
Must run before jax initializes a backend, hence env vars at import time.
"""

import os

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The axon sitecustomize imports jax at interpreter startup with
# JAX_PLATFORMS=axon, so the env var above is read too late — override the
# live config as well (backends initialize lazily, so this still wins).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


def make_genome(rng, length: int) -> np.ndarray:
    """Random genome as uint8 codes 0..3."""
    return rng.integers(0, 4, size=length).astype(np.uint8)


def mutate_snps(rng, genome: np.ndarray, rate: float) -> np.ndarray:
    """Introduce SNPs at the given rate; returns a strain variant."""
    g = genome.copy()
    pos = np.nonzero(rng.random(len(g)) < rate)[0]
    g[pos] = (g[pos] + rng.integers(1, 4, size=len(pos))) % 4
    return g


def sample_reads(rng, genome: np.ndarray, n: int, read_len: int,
                 sub_rate: float = 0.0, ins_rate: float = 0.0,
                 del_rate: float = 0.0, circular: bool = False):
    """Sample error-laden reads; returns (list of code arrays, starts)."""
    reads, starts = [], []
    span = len(genome) - (0 if circular else read_len)
    assert span > 0
    for _ in range(n):
        s = int(rng.integers(0, span))
        if circular:
            raw = np.take(genome, np.arange(s, s + read_len), mode="wrap")
        else:
            raw = genome[s:s + read_len]
        out = []
        for b in raw:
            r = rng.random()
            if r < del_rate:
                continue
            if r < del_rate + ins_rate:
                out.append(int(rng.integers(0, 4)))
            if rng.random() < sub_rate:
                out.append((int(b) + int(rng.integers(1, 4))) % 4)
            else:
                out.append(int(b))
        reads.append(np.array(out, dtype=np.uint8))
        starts.append(s)
    return reads, np.array(starts)
