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
    num_devices: int | None = None,
    axis: str = "data",
    spatial: int = 1,
    tensor: int = 1,
) -> Mesh:
    """1-D data mesh, optionally extended with a spatial and/or tensor axis.

    - ``spatial`` > 1 shards the image H dimension across devices (GSPMD
      inserts the conv halo exchanges) — the TPU analog of scaling the
      spatial dimension, complementing the reference's patch decomposition
      (SURVEY.md §5.7). Verified to compile fwd+grad for the UNet; the 1×1
      bottleneck triggers a (warned, correct) remat on current XLA.
    - ``tensor`` > 1 adds a tensor-parallel axis: parameters (conv
      out-channels / dense out-features) are sharded over it by
      ``param_sharding`` and GSPMD inserts the activation collectives.
      Shrinks per-device weight+optimizer memory ~1/tensor — the axis to
      reach for when a model (not the batch) outgrows one chip's HBM.

    Axis order is (data, spatial, tensor) with minor axes innermost, so the
    tensor collectives ride the fastest ICI links on a real slice.
    """
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    names, shape = [axis], [len(devices)]
    for extra_axis, n in (("spatial", spatial), ("tensor", tensor)):
        if n > 1:
            assert shape[0] % n == 0, (extra_axis, n, shape)
            shape[0] //= n
            names.append(extra_axis)
            shape.append(n)
    if len(names) == 1:
        return Mesh(np.asarray(devices), (axis,))
    return Mesh(np.asarray(devices).reshape(shape), tuple(names))


def param_sharding(mesh: Mesh, x) -> NamedSharding:
    """Tensor-parallel placement rule for one parameter/optimizer leaf.

    Shape-based (the same rule then covers Adam's mu/nu mirrors for free):
    shard the LAST dim — conv HWIO out-channels, dense out-features — over
    the ``tensor`` axis whenever it divides evenly; replicate everything
    else (biases, norm scales, and any head whose out-dim the tensor size
    does not divide — e.g. a 7-class logit head on tensor=2). Small heads
    whose out-dim *is* divisible (the STN's 6-dim theta fc on tensor=2)
    are sharded; GSPMD keeps the math exact either way.
    GSPMD propagates the activation shardings and inserts the collectives;
    no layer code changes. On meshes without a tensor axis this is exactly
    ``replicated_sharding``.
    """
    if "tensor" not in mesh.axis_names:
        return replicated_sharding(mesh)
    nt = mesh.shape["tensor"]
    shape = getattr(x, "shape", ())
    if len(shape) >= 2 and shape[-1] % nt == 0 and shape[-1] >= nt:
        return NamedSharding(mesh, P(*([None] * (len(shape) - 1)), "tensor"))
    return replicated_sharding(mesh)


def shard_params(tree, mesh: Mesh):
    """device_put a params/optimizer pytree under the tensor-parallel rule."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, param_sharding(mesh, x)), tree
    )


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


def place_state(state, mesh: Mesh):
    """Place a ``GANTrainState`` on the mesh.

    Without a tensor axis this is plain replication (the dp / dp×sp regime).
    With one, the weight-shaped subtrees — params, their Adam mirrors, and
    the frozen nets — go under the ``param_sharding`` rule; scalars, RNG,
    spectral u/v vectors, and recipe extras stay replicated.
    """
    if "tensor" not in mesh.axis_names:
        return replicate(state, mesh)
    rep = replicated_sharding(mesh)
    put_rep = lambda t: jax.tree_util.tree_map(
        lambda x: jax.device_put(x, rep), t
    )
    return state.replace(
        step=jax.device_put(state.step, rep),
        rng=jax.device_put(state.rng, rep),
        g_params=shard_params(state.g_params, mesh),
        d_params=shard_params(state.d_params, mesh),
        frozen=shard_params(state.frozen, mesh),
        g_opt_state=shard_params(state.g_opt_state, mesh),
        d_opt_state=shard_params(state.d_opt_state, mesh),
        spectral=put_rep(state.spectral),
        extra=put_rep(state.extra),
    )
