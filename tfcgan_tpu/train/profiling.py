"""Profiling and numerical-health hooks.

The reference has no tracing at all (SURVEY.md §5.1 — wall-clock ETA strings
only) and guards numerics solely via AMP's GradScaler. Here:

- ``trace``: context manager around ``jax.profiler`` emitting a TensorBoard-
  loadable trace of the jitted step.
- ``assert_finite``: raises on NaN/Inf loss with the offending metric names —
  the bf16 pipeline needs no loss scaling, but divergence should fail loudly
  instead of training on garbage.
- ``StepTimer``: throughput tracking (images/sec) with tunnel-safe host sync.
"""

from __future__ import annotations

import contextlib
import time

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def assert_finite(metrics: dict, step: int | None = None) -> None:
    bad = [k for k, v in metrics.items() if not np.isfinite(float(np.asarray(v)))]
    if bad:
        raise FloatingPointError(
            f"non-finite metrics at step {step}: {bad} — "
            f"values {[float(np.asarray(metrics[k])) for k in bad]}"
        )


class StepTimer:
    """Tracks steps/sec with a forced host sync (block_until_ready is not
    reliable on tunneled TPU platforms)."""

    def __init__(self, batch_size: int):
        self.batch_size = batch_size
        self._t0 = None
        self._steps = 0

    def tick(self, sync_value=None) -> float | None:
        if sync_value is not None:
            float(np.asarray(sync_value))
        now = time.perf_counter()
        if self._t0 is None:
            self._t0 = now
            return None
        self._steps += 1
        return self._steps * self.batch_size / (now - self._t0)


def count_params(tree) -> int:
    """Total parameter count (the reference's ``print_network``,
    ``TFCGAN_multigpu_globalFFT.py:374-381``)."""
    import jax

    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))


def device_memory_summary(device=None) -> dict:
    """Accelerator memory counters (the reference's pynvml helpers,
    ``TFC-Diff/prototype_tfcgan.py:36-45`` — ``print_gpu_utilization``), via
    the backend's allocator stats. Returns {} when the platform doesn't
    expose them (e.g. CPU)."""
    import jax

    d = device or jax.devices()[0]
    stats = getattr(d, "memory_stats", lambda: None)() or {}
    out = {}
    for k in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit",
              "largest_alloc_size"):
        if k in stats:
            out[k] = int(stats[k])
    return out


def print_memory_summary(prefix: str = "") -> None:
    s = device_memory_summary()
    if not s:
        print(f"{prefix}no device memory stats on this platform")
        return
    gb = lambda b: b / 1e9
    print(
        f"{prefix}device memory:"
        + (f" {gb(s['bytes_in_use']):.2f} GB in use" if "bytes_in_use" in s else "")
        + (f" / {gb(s['bytes_limit']):.2f} GB limit" if "bytes_limit" in s else "")
        + (f" (peak {gb(s['peak_bytes_in_use']):.2f} GB)" if "peak_bytes_in_use" in s else "")
    )
