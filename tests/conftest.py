"""Test configuration: force an 8-device virtual CPU mesh.

All sharding-aware code is exercised on faked devices (the driver separately
dry-runs the multi-chip path; real benches run on the one real TPU chip).
Must run before jax initializes a backend, hence env vars at import time.

Re-exec note: the axon sitecustomize dlopens /opt/axon/libaxon_pjrt.so into
EVERY python process at interpreter start (gated on PALLAS_AXON_POOL_IPS).
Tests run pure-CPU, but the loaded plugin's C++ (its own LLVM/absl copies)
coexists with jaxlib's CPU compiler in-process and long compile-heavy suite
runs segfaulted sporadically inside ``backend_compile_and_load`` /
executable deserialize (round-3 W1; reproduced single-threaded in round 4,
so it was never just the cache x thread-farm race). The suite therefore
re-execs itself once WITHOUT the trigger env var so the axon .so is never
loaded in test processes.
"""

import os
import sys


def pytest_configure(config):
    """Re-exec the whole pytest process without the axon trigger env var.

    Done here (not at module import) so pytest's FD capturing can be
    stopped first — an execve under active capture inherits the redirected
    stdout and the re-exec'd run becomes silent."""
    if os.environ.get("PALLAS_AXON_POOL_IPS") and \
            os.environ.get("HYLIGHT_TEST_REEXEC") != "1":
        capman = config.pluginmanager.getplugin("capturemanager")
        if capman is not None:
            capman.stop_global_capturing()
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["HYLIGHT_TEST_REEXEC"] = "1"
        env["JAX_PLATFORMS"] = "cpu"
        sys.stdout.flush()
        sys.stderr.flush()
        os.execve(sys.executable,
                  [sys.executable, "-m", "pytest"] + sys.argv[1:], env)


os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")
# No persistent compile cache in tests: one process + in-memory jit cache
# make it useless here, and its executable serialize/deserialize was the
# crash surface of the long-run segfaults (see utils/cache.py).
os.environ["HYLIGHT_DISABLE_COMPILE_CACHE"] = "1"

# Defense in depth (also the path for non-axon environments): force the
# live config to CPU even if jax was already imported by a sitecustomize.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import zlib  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def _n_maps() -> int:
    try:
        return sum(1 for _ in open("/proc/self/maps"))
    except OSError:
        return 0


def pytest_runtest_teardown(item):
    # opt-in VMA telemetry for the long-run segfault hunt:
    # HYLIGHT_MAPS_DEBUG=<path> appends the process map count per test
    # (plain file append: pytest captures hook stdio, and a crash would
    # lose buffered output)
    path = os.environ.get("HYLIGHT_MAPS_DEBUG")
    n = _n_maps()
    if path and path != "0":
        with open(path, "a") as f:
            f.write(f"{n}\t{item.nodeid}\n")
    # long-run guard: a full cold suite compiles ~2000 executables in one
    # process and every live executable holds mmap'd code; past ~30k
    # process mappings the XLA CPU compiler segfaulted deterministically
    # (runs 5/6 of the round-4 hunt: always the first big compile after
    # test_pipeline pushed the count past ~30k; with this guard firing
    # there the suite is green). Dropping the jit caches releases
    # executables the finished tests will never reuse; later tests simply
    # recompile their own programs (~1 extra minute over the suite).
    if n > 25000:
        import jax
        jax.clear_caches()


@pytest.fixture()
def rng(request):
    """Per-test deterministic rng, seeded from the test's nodeid.

    A session-scoped stream made every test's data depend on which tests
    ran before it — adding ANY test reshuffled all later tests' synthetic
    genomes (order-dependent flakes each round). Per-test seeding pins
    each test's data forever."""
    seed = zlib.crc32(request.node.nodeid.encode()) & 0x7FFFFFFF
    return np.random.default_rng(seed)


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
