"""Pipeline parallelism (GPipe-style) over a ``pipe`` mesh axis.

The reference has no pipeline parallelism (its ~40M-param convnets fit one
card many times over, SURVEY.md §2.8) — this module is the TPU-native
building block for when a model trunk *does* outgrow a chip: stages live on
different devices of a ``pipe`` mesh axis, microbatches stream through via
``lax.ppermute``, and reverse-mode AD transposes the schedule into the
backward pipeline automatically (``ppermute``'s transpose is the inverse
permute), so one ``jax.grad`` of a pipelined forward IS pipeline-parallel
training — no hand-written backward schedule.

Shape contract: the pipelined region must be a *homogeneous* stack of
blocks (stage_fn: (stage_params, x) -> y with ``y.shape == x.shape``). In
this model zoo that is the CycleGAN/NeMAR ResNet trunk
(``cyclegan_og/cyclegan.py:111-167``: 9 identical 256-ch residual blocks at
64²) — see ``tests/test_pipeline.py`` for fwd+grad equivalence against the
serial trunk. Heterogeneous stems/heads stay outside the pipelined region
(standard GPipe practice).

Schedule (classic GPipe fill/drain): with S stages and M microbatches each
device ticks ``M + S - 1`` times; at tick t device 0 ingests microbatch t,
device i computes on what device i-1 produced at tick t-1, and the last
device emits microbatch ``t-(S-1)``. Bubble fraction (S-1)/(M+S-1) — pick
M >> S. Devices compute on zero-filled buffers during fill/drain (the
bubble); those results are masked out of the final ``psum``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def stack_stages(per_stage_params: list):
    """Stack S per-stage pytrees (identical treedef/shapes) along a new
    leading stage axis, giving leaves of shape (S, ...) ready to shard with
    ``PartitionSpec('pipe')`` — each pipe device then holds exactly its own
    stage's weights (1/S of the trunk per device, the memory point of PP)."""
    return jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves), *per_stage_params
    )


def pipeline_apply(
    stage_fn,
    stacked_params,
    x: jax.Array,
    *,
    mesh: Mesh,
    microbatches: int,
    axis: str = "pipe",
) -> jax.Array:
    """Apply ``stage_{S-1}(…stage_1(stage_0(x)))`` pipelined over ``axis``.

    stage_fn
        ``(stage_params, x) -> y`` with ``y.shape == x.shape`` (homogeneous
        stages; stage_params = one slice of ``stacked_params``).
    stacked_params
        pytree with leading stage dim S on every leaf (``stack_stages``).
        Sharded ``P(axis)`` inside; callers may pass host or device arrays.
    x
        (N, ...) batch; N must divide by ``microbatches``. Replicated in,
        replicated out — compose an outer data axis by vmapping/sharding
        *around* this call.

    Identical numerics to the serial loop: each microbatch sees exactly the
    same per-stage op sequence, and microbatching only re-tiles the batch
    dim (every op here is batch-elementwise; instance norm normalizes per
    sample, so microbatch boundaries do not change its statistics).
    """
    S = mesh.shape[axis]
    M = microbatches
    n = x.shape[0]
    assert n % M == 0, (n, M)
    mb = n // M
    T = M + S - 1
    xs = x.reshape(M, mb, *x.shape[1:])
    # pad the feed to T ticks so the scan indexes statically-shaped storage
    pad = jnp.zeros((S - 1, mb) + x.shape[1:], x.dtype)
    xs = jnp.concatenate([xs, pad], axis=0) if S > 1 else xs

    def per_device(params, xs):
        # params leaves arrive as (1, ...): this device's stage slice
        params = jax.tree_util.tree_map(lambda l: l[0], params)
        p = jax.lax.axis_index(axis)
        last = S - 1
        fwd = [(i, (i + 1) % S) for i in range(S)]  # i -> i+1 ring

        def tick(carry, t):
            state = carry  # what this device computed last tick
            # activation handoff: device i receives device i-1's output
            recv = jax.lax.ppermute(state, axis, fwd)
            inp = jnp.where(p == 0, xs[jnp.minimum(t, T - 1)], recv)
            out = stage_fn(params, inp)
            # last stage emits microbatch t-(S-1) (garbage during fill)
            emit = jnp.where((p == last) & (t >= last), out, 0.0)
            return out, emit

        state0 = jnp.zeros_like(xs[0])
        _, emits = jax.lax.scan(tick, state0, jnp.arange(T))
        ys = emits[last:]  # (M, mb, ...): drain window of the last stage
        # only the last stage holds real data; psum broadcasts it to all
        return jax.lax.psum(ys, axis)

    pspec = jax.tree_util.tree_map(lambda _: P(axis), stacked_params)
    ys = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(pspec, P()),
        out_specs=P(),
        check_vma=False,
    )(stacked_params, xs)
    return ys.reshape(n, *x.shape[1:])


def make_pipe_mesh(num_stages: int) -> Mesh:
    """1-D ``pipe`` mesh over the first ``num_stages`` local devices."""
    import numpy as np

    devices = jax.devices()
    if len(devices) < num_stages:
        raise ValueError(
            f"make_pipe_mesh({num_stages}) needs {num_stages} devices, "
            f"only {len(devices)} available"
        )
    return Mesh(np.asarray(devices[:num_stages]), ("pipe",))


def resnet_trunk_pipeline(
    block_apply,
    block_params: list,
    x: jax.Array,
    *,
    mesh: Mesh,
    microbatches: int,
) -> jax.Array:
    """Pipeline a list of identical residual blocks (the CycleGAN/NeMAR
    ResNet trunk) over the ``pipe`` axis: blocks are grouped into S
    contiguous stages of len(block_params)/S blocks each; within a stage the
    blocks run as a ``lax.scan`` over their stacked weights.

    ``block_apply(params, x) -> y`` is one residual block (e.g.
    ``ResidualBlock(feats).apply``).
    """
    S = mesh.shape["pipe"]
    B = len(block_params)
    assert B % S == 0, (B, S)
    k = B // S
    stages = [
        stack_stages(block_params[i * k:(i + 1) * k]) for i in range(S)
    ]
    stacked = stack_stages(stages)  # leaves (S, k, ...)

    def stage_fn(stage_params, x):
        def body(h, blk):
            return block_apply(blk, h), None

        h, _ = jax.lax.scan(body, x, stage_params)
        return h

    return pipeline_apply(
        stage_fn, stacked, x, mesh=mesh, microbatches=microbatches
    )
