"""Pipeline parallelism (parallel/pipeline.py): GPipe schedule over a
``pipe`` mesh axis must be numerically identical to the serial trunk —
forward AND grads (AD transposes the ppermute schedule into the backward
pipeline) — on the virtual CPU mesh. The pipelined region is the model
zoo's one homogeneous stack: the CycleGAN/NeMAR ResNet trunk
(``cyclegan_og/cyclegan.py:111-167``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfcgan_tpu.models.resnet_gen import ResidualBlock
from tfcgan_tpu.parallel.pipeline import (
    make_pipe_mesh,
    pipeline_apply,
    resnet_trunk_pipeline,
    stack_stages,
)

FEATS = 8
BLOCKS = 6


@pytest.fixture(scope="module")
def trunk():
    block = ResidualBlock(FEATS, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 12, 12, FEATS))
    params = [
        block.init(jax.random.PRNGKey(i), x[:1])["params"]
        for i in range(BLOCKS)
    ]
    apply = lambda p, h: block.apply({"params": p}, h)
    return apply, params, x


def serial(apply, params, x):
    h = x
    for p in params:
        h = apply(p, h)
    return h


class TestPipelineForward:
    @pytest.mark.parametrize("stages,microbatches", [(2, 4), (3, 2), (6, 8)])
    def test_matches_serial_trunk(self, trunk, stages, microbatches):
        apply, params, x = trunk
        mesh = make_pipe_mesh(stages)
        y_ref = serial(apply, params, x)
        y = resnet_trunk_pipeline(
            apply, params, x, mesh=mesh, microbatches=microbatches
        )
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   rtol=1e-5, atol=2e-5)

    def test_single_stage_degenerates_to_serial(self, trunk):
        apply, params, x = trunk
        mesh = make_pipe_mesh(1)
        y = resnet_trunk_pipeline(apply, params, x, mesh=mesh, microbatches=4)
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(serial(apply, params, x)),
            rtol=1e-5, atol=2e-5,
        )

    def test_stage_weights_are_sharded_one_stage_per_device(self, trunk):
        # the memory point of PP: each pipe device holds 1/S of the trunk
        apply, params, x = trunk
        mesh = make_pipe_mesh(2)
        stacked = stack_stages([stack_stages(params[:3]),
                                stack_stages(params[3:])])
        from jax.sharding import NamedSharding, PartitionSpec as P

        leaf = jax.device_put(
            jax.tree_util.tree_leaves(stacked)[0],
            NamedSharding(mesh, P("pipe")),
        )
        assert leaf.addressable_shards[0].data.shape[0] == 1  # one stage


class TestPipelineBackward:
    def test_grads_match_serial(self, trunk):
        apply, params, x = trunk
        mesh = make_pipe_mesh(3)
        stacked = stack_stages(
            [stack_stages(params[i * 2:(i + 1) * 2]) for i in range(3)]
        )

        def stage_fn(stage_params, h):
            def body(h, blk):
                return apply(blk, h), None

            h, _ = jax.lax.scan(body, h, stage_params)
            return h

        def loss_pipe(stacked, x):
            y = pipeline_apply(stage_fn, stacked, x, mesh=mesh, microbatches=4)
            return jnp.sum(y**2)

        def loss_serial(stacked, x):
            flat = [jax.tree_util.tree_map(lambda l: l[s][k], stacked)
                    for s in range(3) for k in range(2)]
            return jnp.sum(serial(apply, flat, x) ** 2)

        gp, gx = jax.grad(loss_pipe, argnums=(0, 1))(stacked, x)
        rp, rx = jax.grad(loss_serial, argnums=(0, 1))(stacked, x)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                                   rtol=1e-4, atol=5e-5)
        for (path, a), b in zip(jax.tree_util.tree_leaves_with_path(gp),
                                jax.tree_util.tree_leaves(rp)):
            a, b = np.asarray(a), np.asarray(b)
            if "bias" in jax.tree_util.keystr(path):
                # instance norm subtracts the per-channel spatial mean, so a
                # conv bias cannot affect the block output: its true grad is
                # exactly 0 and both sides hold only fp32 cancellation noise
                # of O(1e-3) against kernel grads of O(1e4) — assert small,
                # don't compare noise to noise.
                assert np.abs(a).max() < 1e-2 and np.abs(b).max() < 1e-2
            else:
                np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-2)

    def test_training_step_descends(self, trunk):
        # one SGD step through the pipelined trunk lowers the loss
        apply, params, x = trunk
        mesh = make_pipe_mesh(2)
        stacked = stack_stages([stack_stages(params[:3]),
                                stack_stages(params[3:])])

        def stage_fn(sp, h):
            h, _ = jax.lax.scan(lambda h, b: (apply(b, h), None), h, sp)
            return h

        def loss(stacked):
            y = pipeline_apply(stage_fn, stacked, x, mesh=mesh, microbatches=4)
            return jnp.mean((y - 0.5) ** 2)

        l0, g = jax.value_and_grad(loss)(stacked)
        stepped = jax.tree_util.tree_map(lambda p, g: p - 0.05 * g, stacked, g)
        l1 = loss(stepped)
        assert np.isfinite(float(l0)) and float(l1) < float(l0)
