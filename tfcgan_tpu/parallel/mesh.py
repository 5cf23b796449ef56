"""Mesh + sharding helpers.

The reference's ``torch.nn.DataParallel`` (single-process scatter/gather,
SURVEY.md §2.8) becomes a 1-D ``jax.sharding.Mesh`` over the data axis:
parameters replicated, batches sharded, gradients reduced by XLA-inserted
``psum`` over ICI. The same code path scales to multi-host (DCN) because
``jax.jit`` + NamedSharding is process-count agnostic; extra mesh axes (e.g.
a model axis for spatial sharding) can be added without touching the trainer.
"""

from __future__ import annotations

import contextlib

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Mesh visible to ops while the train step is being traced (see loss_mesh).
_ACTIVE_MESH: Mesh | None = None


@contextlib.contextmanager
def loss_mesh(mesh: Mesh | None):
    """Make ``mesh`` visible to in-graph ops during tracing.

    The trainer wraps each jitted-step *call* in this context; since jax
    traces inside the call, ops like the FFT losses can look the mesh up and
    emit sharding constraints without threading it through every recipe.
    """
    global _ACTIVE_MESH
    prev = _ACTIVE_MESH
    _ACTIVE_MESH = mesh
    try:
        yield
    finally:
        _ACTIVE_MESH = prev


def gather_spatial(x: jax.Array) -> jax.Array:
    """Constrain ``x`` (N, ...) to batch-only sharding if a spatial mesh axis
    is active — i.e. all-gather image rows before an op that needs full H.

    Used by the FFT losses: XLA's CPU fft thunk RET_CHECKs on the transposed
    layouts spatial sharding produces (fft_thunk.cc:167
    ``IsMonotonicWithDim0Major``), and on TPU the gather makes the (cheap)
    redundant-compute explicit rather than leaving GSPMD to resharde inside
    the fft. No-op on 1-D data meshes.
    """
    mesh = _ACTIVE_MESH
    if mesh is None or "spatial" not in mesh.axis_names:
        return x
    spec = P("data", *([None] * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def make_mesh(
    num_devices: int | None = None, axis: str = "data", spatial: int = 1
) -> Mesh:
    """1-D data mesh, or a 2-D (data, spatial) mesh when ``spatial`` > 1.

    The spatial axis shards the image H dimension across devices (GSPMD
    inserts the conv halo exchanges) — the TPU analog of scaling the spatial
    dimension, complementing the reference's patch decomposition
    (SURVEY.md §5.7). Verified to compile fwd+grad for the UNet; the 1×1
    bottleneck triggers a (warned, correct) remat on current XLA.
    """
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    if spatial > 1:
        assert len(devices) % spatial == 0
        arr = np.asarray(devices).reshape(len(devices) // spatial, spatial)
        return Mesh(arr, (axis, "spatial"))
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    if "spatial" in mesh.axis_names:
        return NamedSharding(mesh, P(axis, "spatial"))
    return NamedSharding(mesh, P(axis))


def image_sharding(mesh: Mesh, ndim: int, axis: str = "data") -> NamedSharding:
    """Sharding for an (N, H, W, C) tensor: batch over data, H over spatial."""
    if "spatial" in mesh.axis_names and ndim >= 3:
        return NamedSharding(mesh, P(axis, "spatial", *([None] * (ndim - 2))))
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Put a host batch dict onto the mesh: batch dim over ``data``, and for
    image-rank arrays the H dim over ``spatial`` when that axis exists."""
    n_data = mesh.shape.get(axis, 1)
    leaves = jax.tree_util.tree_leaves(batch)
    if leaves and getattr(leaves[0], "shape", (n_data,))[0] % n_data != 0:
        raise ValueError(
            f"global batch size {leaves[0].shape[0]} is not divisible by the "
            f"mesh's '{axis}' axis ({n_data} devices) — raise the batch size "
            f"or shrink the mesh (tfcgan_tpu shards the batch dim over "
            f"'{axis}')"
        )

    def put(x):
        return jax.device_put(x, image_sharding(mesh, getattr(x, "ndim", 1), axis))

    return jax.tree_util.tree_map(put, batch)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params/state) across the mesh."""
    s = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)
