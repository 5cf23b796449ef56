"""Multi-host (multi-slice / DCN) runtime setup.

The reference has no multi-node story at all (SURVEY.md §2.8: vestigial
``torch.distributed`` imports, never used). The TPU-native path needs no
launcher framework: ``jax.distributed.initialize()`` + the same jitted step.
The trainer already expresses everything through NamedSharding on a Mesh, so
going multi-host only changes two things:

1. call :func:`initialize` once per process before any JAX computation;
2. feed each process its own shard of the global batch
   (:func:`local_batch_slice`), then ``shard_batch`` as usual — under
   ``jax.make_array_from_process_local_data`` semantics, ``jax.device_put``
   with a NamedSharding accepts per-process local data addressed to the
   process's devices.

Gradient psum rides ICI within a slice and DCN across slices — both inserted
by XLA from the sharding annotations; nothing in the recipes changes.
"""

from __future__ import annotations

import jax
import numpy as np


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Per-process runtime init. On Cloud TPU all arguments auto-detect from
    the metadata server; pass them explicitly elsewhere.

    MUST be the first JAX call in the process — even ``jax.devices()`` or
    ``jax.process_count()`` initializes the local backend, after which
    ``jax.distributed.initialize`` raises. For that reason this wrapper does
    NOT probe runtime state first, and errors are propagated rather than
    swallowed (a silently-single-process "multi-host" job trains N
    unsynchronized copies). Single-process jobs simply don't call this
    (``num_processes=1`` is an explicit no-op for launcher convenience)."""
    if num_processes == 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def local_batch_slice(global_batch: dict, axis: int = 0) -> dict:
    """Slice a host-side global batch to this process's share.

    Per-host data loading (each host reads only its shard) is preferred for
    real input pipelines; this helper covers the simple case where every host
    can produce the full batch and keeps only its slice.
    """
    n, i = jax.process_count(), jax.process_index()

    def cut(x):
        x = np.asarray(x)
        size = x.shape[axis]
        assert size % n == 0, f"global batch {size} not divisible by {n} hosts"
        sh = size // n
        return np.take(x, np.arange(i * sh, (i + 1) * sh), axis=axis)

    return {k: cut(v) for k, v in global_batch.items()}


def global_mesh_devices() -> np.ndarray:
    """All devices across processes, ordered process-major — the device array
    to hand to ``make_mesh`` in a multi-host job."""
    return np.asarray(jax.devices())
