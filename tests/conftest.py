"""Test config: force JAX onto CPU with 8 virtual devices so multi-chip
sharding tests run without TPUs (SURVEY.md §4 implication).

Note: pytest plugin autoload may import jax before this file runs, so setting
os.environ alone is not enough — we also update jax.config, which works as
long as no backend has been initialized yet.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import hashlib

import jax

jax.config.update("jax_platforms", "cpu")


def _host_fingerprint() -> str:
    """CPU-feature hash for the cache key. XLA:CPU's persistent cache does
    not key on host machine features: executables AOT-compiled on one machine
    load on another with an error log ("machine type ... doesn't match") and
    *different instruction selection* — which breaks bit-exactness guarantees
    (caught by the DP-equivalence test when the sandbox moved hosts)."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.md5(line.encode()).hexdigest()[:10]
    except OSError:
        pass
    return "nocpuinfo"


# Persistent compilation cache: the trainer tests compile full GAN steps,
# which is minutes of XLA time on CPU — cache across runs (per host type).
jax.config.update(
    "jax_compilation_cache_dir", f"/root/.cache/jax_test_cache_{_host_fingerprint()}"
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import pytest


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu_backend():
    assert jax.default_backend() == "cpu", (
        "tests must run on the virtual CPU mesh, not the TPU tunnel"
    )
    assert jax.device_count() == 8
    yield


# Modules that jit FULL train steps (or drive the CLI end-to-end): >35 min
# on a cold compile cache on this 1-core box. `pytest -m "not slow"` runs
# the op/model/kernel/metric tiers in minutes for a quick green signal;
# run everything before committing.
_SLOW_MODULES = {
    "test_train",
    "test_parity_trajectory",
    "test_parity_cyclegan",
    "test_parity_nemar",
    "test_parity_stn",
    "test_parity_thermalgan",
    "test_parity_debiased",
    "test_parity_diffusion",
    "test_integration_cli",
    "test_graft_entry",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__ in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
