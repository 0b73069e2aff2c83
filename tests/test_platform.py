import os

import jax


def test_platform():
    assert jax.default_backend() == "cpu", jax.default_backend()
    assert jax.device_count() == 8, jax.device_count()


def test_axon_plugin_not_loaded():
    """The suite must run WITHOUT /opt/axon/libaxon_pjrt.so in-process:
    the plugin's C++ (own LLVM/absl copies) coexisting with jaxlib's CPU
    compiler produced sporadic segfaults inside backend_compile_and_load
    during long compile-heavy runs (round-3 W1). conftest re-execs the
    suite with the trigger env var removed; this test pins that it
    worked. Skipped when the environment never had the axon plugin."""
    if os.environ.get("HYLIGHT_TEST_REEXEC") != "1":
        import pytest
        pytest.skip("no axon sitecustomize in this environment")
    maps = open("/proc/self/maps").read()
    assert "libaxon" not in maps, "axon plugin loaded despite re-exec"
