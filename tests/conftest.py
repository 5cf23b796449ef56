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

import jax

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: the trainer tests compile full GAN steps,
# which is minutes of XLA time on CPU — cache across runs.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import pytest


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu_backend():
    assert jax.default_backend() == "cpu", (
        "tests must run on the virtual CPU mesh, not the TPU tunnel"
    )
    assert jax.device_count() == 8
    yield
