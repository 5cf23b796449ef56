"""Mesh + sharding helpers.

The reference's ``torch.nn.DataParallel`` (single-process scatter/gather,
SURVEY.md §2.8) becomes a 1-D ``jax.sharding.Mesh`` over the data axis:
parameters replicated, batches sharded, gradients reduced by XLA-inserted
``psum`` over ICI. The same code path scales to multi-host (DCN) because
``jax.jit`` + NamedSharding is process-count agnostic; extra mesh axes (e.g.
a model axis for spatial sharding) can be added without touching the trainer.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int | None = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Put a host batch dict onto the mesh, sharded along the batch dim."""
    s = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params/state) across the mesh."""
    s = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)
