"""End-to-end trainer tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tfcgan_tpu.config import get_experiment
from tfcgan_tpu.data.synth import synthetic_batch, synthetic_iterator
from tfcgan_tpu.data.mixture import BalancedMixture
from tfcgan_tpu.recipes import build_recipe
from tfcgan_tpu.train.trainer import Trainer
from tfcgan_tpu.train.checkpoint import save_checkpoint, restore_checkpoint


def small_cfg(name="fft_glo", **loss_kw):
    cfg = get_experiment(name)
    cfg = cfg.replace(
        data=cfg.data.__class__(batch_size=8, image_size=64),
        train=cfg.train.__class__(compute_dtype="float32"),
    )
    if loss_kw:
        cfg = cfg.replace(loss=cfg.loss.__class__(**{**cfg.loss.__dict__, **loss_kw}))
    return cfg


class TestFFTGloTraining:
    def test_two_steps_update_everything(self):
        cfg = small_cfg()
        recipe = build_recipe(cfg)
        trainer = Trainer(cfg, recipe)
        batch = synthetic_batch(batch_size=8, image_size=64)
        state = trainer.init_state(jax.random.PRNGKey(0), batch)
        g0 = jax.device_get(state.g_params)

        state = trainer.fit(state, synthetic_iterator(2, batch_size=8, image_size=64))
        assert int(state.step) == 2
        g1 = jax.device_get(state.g_params)
        diffs = jax.tree_util.tree_map(lambda a, b: float(np.abs(a - b).max()), g0, g1)
        assert max(jax.tree_util.tree_leaves(diffs)) > 0
        # spectral state advanced
        u = jax.device_get(state.spectral)["D"]
        assert np.isfinite(jax.tree_util.tree_leaves(u)[0]).all()

    def test_metrics_finite_and_complete(self):
        cfg = small_cfg()
        recipe = build_recipe(cfg)
        trainer = Trainer(cfg, recipe)
        batch = synthetic_batch(batch_size=8, image_size=64)
        state = trainer.init_state(jax.random.PRNGKey(1), batch)
        step = trainer.compiled_step()
        from tfcgan_tpu.parallel.mesh import shard_batch

        state, metrics = step(state, shard_batch(batch, trainer.mesh))
        m = {k: float(v) for k, v in metrics.items()}
        for key in ("loss_G", "loss_D", "g_adv", "g_triplet", "g_temp", "g_lpips", "g_fft"):
            assert key in m and np.isfinite(m[key]), (key, m)

    def test_deterministic_given_seed(self):
        cfg = small_cfg()
        recipe = build_recipe(cfg)
        trainer = Trainer(cfg, recipe)
        batch = synthetic_batch(batch_size=8, image_size=64)

        def run():
            state = trainer.init_state(jax.random.PRNGKey(7), batch)
            state = trainer.fit(state, synthetic_iterator(2, batch_size=8, image_size=64))
            return jax.device_get(state.g_params)

        a, b = run(), run()
        same = jax.tree_util.tree_map(lambda x, y: np.array_equal(x, y), a, b)
        assert all(jax.tree_util.tree_leaves(same))

    def test_batch_actually_sharded(self):
        cfg = small_cfg()
        trainer = Trainer(cfg, build_recipe(cfg))
        from tfcgan_tpu.parallel.mesh import shard_batch

        batch = shard_batch(synthetic_batch(batch_size=8, image_size=64), trainer.mesh)
        shard_counts = {len(v.sharding.device_set) for v in batch.values()}
        assert shard_counts == {8}

    def test_indivisible_batch_raises_clearly(self):
        cfg = small_cfg()
        trainer = Trainer(cfg, build_recipe(cfg))
        from tfcgan_tpu.parallel.mesh import shard_batch

        with pytest.raises(ValueError, match="not divisible"):
            shard_batch(synthetic_batch(batch_size=4, image_size=64), trainer.mesh)


class TestRecipeMatrix:
    @pytest.mark.parametrize(
        "name", ["fft_glo_16p", "fft_patch_16", "original_16p", "ablation_nopatch",
                  "ablation_noperc", "fft_patch_region", "fft_patch_region_kl",
                  "fft_patch_mask"]
    )
    def test_one_step_runs(self, name):
        cfg = small_cfg(name)
        size = 64
        cfg = cfg.replace(data=cfg.data.__class__(batch_size=8, image_size=size))
        recipe = build_recipe(cfg)
        trainer = Trainer(cfg, recipe)
        batch = synthetic_batch(batch_size=8, image_size=size)
        state = trainer.init_state(jax.random.PRNGKey(0), batch)
        state = trainer.fit(state, [batch])
        assert int(state.step) == 1

    @pytest.mark.parametrize(
        "name", ["fft_patch_debiased_v1", "fft_patch_debiased_v2",
                  "fft_patch_debiased_v3", "fft_patch_debiased_v4",
                  "fft_patch_debiased_v5", "fft_patch_debiased_v6",
                  "fft_patch_debiased"]
    )
    def test_debiased_conditional(self, name):
        cfg = small_cfg(name)
        cfg = cfg.replace(data=cfg.data.__class__(batch_size=8, image_size=64))
        recipe = build_recipe(cfg)
        trainer = Trainer(cfg, recipe)
        batch = synthetic_batch(batch_size=8, image_size=64, with_labels=True)
        state = trainer.init_state(jax.random.PRNGKey(0), batch)
        v = cfg.loss.debias_version
        # frozen-CNN placement per variant (debias_axes): backbone always
        # frozen; fc trains with G in V4-V6; everything frozen in V7
        if v >= 4:
            if v == 7:
                assert "cnn_hair" in state.frozen and "cnn_hair" not in state.g_params
            else:
                assert "cnn_hair" in state.g_params  # fc only
                assert "cnn_hair_bb" in state.frozen
                assert set(state.g_params["cnn_hair"]) == {"fc"}
        else:
            assert not any("cnn" in k for k in state.frozen)
        step = trainer.compiled_step()
        from tfcgan_tpu.parallel.mesh import shard_batch

        state, metrics = step(state, shard_batch(batch, trainer.mesh))
        assert np.isfinite(float(metrics["g_ce"]))
        assert np.isfinite(float(metrics["d_ce"]))
        assert np.isfinite(float(metrics["loss_G"]))


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        cfg = small_cfg()
        recipe = build_recipe(cfg)
        trainer = Trainer(cfg, recipe)
        batch = synthetic_batch(batch_size=8, image_size=64)
        state = trainer.init_state(jax.random.PRNGKey(0), batch)
        state = trainer.fit(state, [batch])
        path = save_checkpoint(str(tmp_path), state)
        template = trainer.init_state(jax.random.PRNGKey(99), batch)
        restored = restore_checkpoint(path, jax.device_get(template))
        eq = jax.tree_util.tree_map(
            lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)),
            jax.device_get(state.g_params), jax.device_get(restored.g_params),
        )
        assert all(jax.tree_util.tree_leaves(eq))
        assert int(restored.step) == 1


class TestBalancedMixture:
    def test_even_shares_and_refill(self):
        def fac(seed):
            def f():
                return synthetic_iterator(2, batch_size=4, image_size=16, )
            return f

        mix = BalancedMixture([fac(0), fac(1)], batch_size=8)
        for _ in range(5):  # forces refill past the 2-batch sources
            b = next(mix)
            assert b["A"].shape == (8, 16, 16, 3)


class TestSTNRecipe:
    def test_one_step(self):
        cfg = get_experiment("stn_newmodel3")
        cfg = cfg.replace(
            data=cfg.data.__class__(batch_size=8, image_size=64),
            train=cfg.train.__class__(compute_dtype="float32"),
        )
        recipe = build_recipe(cfg)
        trainer = Trainer(cfg, recipe)
        batch = synthetic_batch(batch_size=8, image_size=64)
        state = trainer.init_state(jax.random.PRNGKey(0), batch)
        step = trainer.compiled_step()
        from tfcgan_tpu.parallel.mesh import shard_batch

        state, metrics = step(state, shard_batch(batch, trainer.mesh))
        for k in ("loss_G", "loss_D", "g_morph", "g_recon"):
            assert np.isfinite(float(metrics[k])), k
        # identity-init dtheta head: step-1 theta is still ~identity, and the
        # warp-health metric is surfaced (round-4 journey regression)
        assert float(metrics["theta_t"]) < 0.05
        # the zero-init default must have threaded through build_recipe
        assert recipe.STN.identity_init is True
        # STN params must receive gradient through fake_A2 (not detached)
        stn0 = jax.device_get(state.g_params["STN"])  # before donation
        state2, _ = step(state, shard_batch(batch, trainer.mesh))
        stn1 = jax.device_get(state2.g_params["STN"])
        diffs = jax.tree_util.tree_map(lambda a, b: float(np.abs(a - b).max()), stn0, stn1)
        assert max(jax.tree_util.tree_leaves(diffs)) > 0


class TestBaselineRecipes:
    def test_cyclegan_step_and_replay_buffer(self):
        cfg = get_experiment("cyclegan").replace(
            data=get_experiment("cyclegan").data.__class__(batch_size=8, image_size=64),
            train=get_experiment("cyclegan").train.__class__(
                compute_dtype="float32", steps_per_epoch=10
            ),
        )
        recipe = build_recipe(cfg)
        trainer = Trainer(cfg, recipe)
        batch = synthetic_batch(batch_size=8, image_size=64)
        state = trainer.init_state(jax.random.PRNGKey(0), batch)
        step = trainer.compiled_step()
        from tfcgan_tpu.parallel.mesh import shard_batch

        state, metrics = step(state, shard_batch(batch, trainer.mesh))
        assert np.isfinite(float(metrics["loss_G"]))
        assert np.isfinite(float(metrics["loss_D"]))
        assert int(jax.device_get(state.extra["buf_A"]["count"])) == 8
        state, _ = step(state, shard_batch(batch, trainer.mesh))
        assert int(jax.device_get(state.extra["buf_A"]["count"])) == 16

    def test_thermalgan_step(self):
        cfg = get_experiment("thermalgan")
        # G2 is an 8-level UNet: needs >=256 input (smaller leaves a 0x0
        # bottleneck — GeneratorG2 rejects it)
        cfg = cfg.replace(
            data=cfg.data.__class__(batch_size=2, image_size=256),
            train=cfg.train.__class__(compute_dtype="float32"),
            mesh=cfg.mesh.__class__(num_devices=2),  # batch 2 can't split 8 ways
        )
        recipe = build_recipe(cfg)
        trainer = Trainer(cfg, recipe)
        batch = synthetic_batch(batch_size=2, image_size=256)
        state = trainer.init_state(jax.random.PRNGKey(0), batch)
        step = trainer.compiled_step()
        from tfcgan_tpu.parallel.mesh import shard_batch

        state, metrics = step(state, shard_batch(batch, trainer.mesh))
        for k in ("loss_G", "loss_D", "g_kl", "g_latent", "g_pixel_pix",
                  "g_vae_gan", "d_pix"):
            assert np.isfinite(float(metrics[k])), k
        # named noAMP config: the reference's torch.tensor() leaf rebuild
        # severs the stage-1 adversarial graph -> D_VAE stays frozen
        assert recipe.d_vae_mode == "detached"
        assert "D_vae" in state.frozen and "D_vae" not in state.d_params

    def test_thermalgan_multi_l1_trains_d_vae(self):
        """The bug-fixed cVAE-GAN mode: gradients flow, D_VAE updates."""
        cfg = get_experiment("thermalgan")
        cfg = cfg.replace(
            data=cfg.data.__class__(batch_size=2, image_size=256),
            train=cfg.train.__class__(compute_dtype="float32"),
            mesh=cfg.mesh.__class__(num_devices=2),
            extra={**cfg.extra, "d_vae_mode": "multi_l1"},
        )
        recipe = build_recipe(cfg)
        trainer = Trainer(cfg, recipe)
        batch = synthetic_batch(batch_size=2, image_size=256)
        state = trainer.init_state(jax.random.PRNGKey(0), batch)
        before = jax.device_get(
            state.d_params["D_vae"]["disc_0"]["conv0"]["kernel"])
        step = trainer.compiled_step()
        from tfcgan_tpu.parallel.mesh import shard_batch

        state, metrics = step(state, shard_batch(batch, trainer.mesh))
        assert np.isfinite(float(metrics["d_vae"]))
        after = jax.device_get(
            state.d_params["D_vae"]["disc_0"]["conv0"]["kernel"])
        assert np.abs(after - before).max() > 0

    def test_nemar_step(self):
        cfg = get_experiment("nemar")
        cfg = cfg.replace(
            data=cfg.data.__class__(batch_size=8, image_size=128),
            train=cfg.train.__class__(compute_dtype="float32"),
        )
        recipe = build_recipe(cfg)
        trainer = Trainer(cfg, recipe)
        batch = synthetic_batch(batch_size=8, image_size=128)
        state = trainer.init_state(jax.random.PRNGKey(0), batch)
        step = trainer.compiled_step()
        from tfcgan_tpu.parallel.mesh import shard_batch

        state, metrics = step(state, shard_batch(batch, trainer.mesh))
        for k in ("loss_G", "loss_D", "g_l1_tr", "g_l1_rt"):
            assert np.isfinite(float(metrics[k])), k

    def test_diffusion_step_and_schedule(self):
        cfg = get_experiment("tfc_diff")
        cfg = cfg.replace(
            data=cfg.data.__class__(batch_size=8, image_size=32),
            train=cfg.train.__class__(compute_dtype="float32"),
            extra={"timesteps": 10},
        )
        recipe = build_recipe(cfg)
        trainer = Trainer(cfg, recipe)
        batch = synthetic_batch(batch_size=8, image_size=32)
        state = trainer.init_state(jax.random.PRNGKey(0), batch)
        step = trainer.compiled_step()
        from tfcgan_tpu.parallel.mesh import shard_batch

        state, metrics = step(state, shard_batch(batch, trainer.mesh))
        assert np.isfinite(float(metrics["g_noise_mse"]))
        # on-device ancestral sampling produces finite images in range
        out = recipe.sample(
            jax.device_get(state.g_params), jnp.asarray(batch["A"][:2]),
            jax.random.PRNGKey(3),
        )
        assert out.shape == (2, 32, 32, 1)
        assert np.isfinite(np.asarray(out)).all()


class TestSpatialMesh:
    def test_dp_x_spatial_step(self):
        from tfcgan_tpu.parallel.mesh import make_mesh, shard_batch

        cfg = small_cfg("original_16p")
        cfg = cfg.replace(mesh=cfg.mesh.__class__(num_devices=8, spatial=2))
        recipe = build_recipe(cfg)
        trainer = Trainer(cfg, recipe, mesh=make_mesh(8, spatial=2))
        assert trainer.mesh.axis_names == ("data", "spatial")
        batch = synthetic_batch(batch_size=4, image_size=64)
        state = trainer.init_state(jax.random.PRNGKey(0), batch)
        step = trainer.compiled_step()
        sb = shard_batch(batch, trainer.mesh)
        # image arrays sharded over 8 devices (4 data x 2 spatial)
        assert len(sb["A"].sharding.device_set) == 8
        state, metrics = step(state, sb)
        assert np.isfinite(float(metrics["loss_G"]))
        assert np.isfinite(float(metrics["loss_D"]))

    def test_dp_x_spatial_fft_matches_dp(self):
        """FFT loss under spatial sharding (round-1 workaround removed):
        ops/fftloss gathers the spatial axis in-graph via gather_spatial,
        which both satisfies XLA's layout-picky CPU fft thunk and keeps the
        math identical to the pure-DP mesh."""
        from tfcgan_tpu.parallel.mesh import make_mesh, shard_batch

        cfg = small_cfg("fft_glo")
        batch = synthetic_batch(batch_size=8, image_size=64)
        results = {}
        for spatial in (1, 2):
            c = cfg.replace(mesh=cfg.mesh.__class__(num_devices=8, spatial=spatial))
            trainer = Trainer(c, build_recipe(c), mesh=make_mesh(8, spatial=spatial))
            state = trainer.init_state(jax.random.PRNGKey(0), batch)
            state, metrics = trainer.compiled_step()(
                state, shard_batch(batch, trainer.mesh)
            )
            results[spatial] = {k: float(v) for k, v in metrics.items()}
        for k in ("loss_G", "loss_D", "g_fft"):
            assert np.isfinite(results[2][k]), (k, results[2])
            np.testing.assert_allclose(
                results[1][k], results[2][k], rtol=2e-4, err_msg=k
            )


class TestTensorMesh:
    """dp×tp: conv out-channels / dense out-features sharded over a 'tensor'
    mesh axis (parallel.mesh.param_sharding); GSPMD inserts the activation
    collectives. The reference has no model parallelism at all (SURVEY §2.8:
    nn.DataParallel only) — this is TPU-native extra capability."""

    def test_dp_x_tensor_step_and_memory(self):
        from tfcgan_tpu.parallel.mesh import make_mesh, shard_batch

        cfg = small_cfg("fft_glo")
        cfg = cfg.replace(mesh=cfg.mesh.__class__(num_devices=8, tensor=2))
        recipe = build_recipe(cfg)
        trainer = Trainer(cfg, recipe, mesh=make_mesh(8, tensor=2))
        assert trainer.mesh.axis_names == ("data", "tensor")
        batch = synthetic_batch(batch_size=8, image_size=64)
        state = trainer.init_state(jax.random.PRNGKey(0), batch)
        # a G conv kernel is really sharded: each device holds half the
        # out-channels (weight memory ~1/tensor — the point of the axis)
        kern = state.g_params["G"]["down1"]["conv"]["kernel"]
        assert len(kern.sharding.device_set) == 8
        shard_shape = kern.addressable_shards[0].data.shape
        assert shard_shape[-1] * 2 == kern.shape[-1], (shard_shape, kern.shape)
        # Adam mirrors follow the same rule
        mu_kern = state.g_opt_state[0].mu["G"]["down1"]["conv"]["kernel"]
        assert mu_kern.addressable_shards[0].data.shape[-1] * 2 == mu_kern.shape[-1]
        step = trainer.compiled_step()
        state, metrics = step(state, shard_batch(batch, trainer.mesh))
        assert np.isfinite(float(metrics["loss_G"]))
        assert np.isfinite(float(metrics["loss_D"]))
        # params keep their tensor sharding across the donated-state update
        kern1 = state.g_params["G"]["down1"]["conv"]["kernel"]
        assert kern1.addressable_shards[0].data.shape[-1] * 2 == kern1.shape[-1]

    def test_dp_x_tensor_matches_dp(self):
        """Sharding weights over the tensor axis must not change the math:
        one step on dp8 and on dp4×tp2 from identical inits, losses equal."""
        from tfcgan_tpu.parallel.mesh import make_mesh, shard_batch

        cfg = small_cfg("fft_glo")
        batch = synthetic_batch(batch_size=8, image_size=64)
        results = {}
        for tensor in (1, 2):
            c = cfg.replace(mesh=cfg.mesh.__class__(num_devices=8, tensor=tensor))
            trainer = Trainer(c, build_recipe(c), mesh=make_mesh(8, tensor=tensor))
            state = trainer.init_state(jax.random.PRNGKey(0), batch)
            state, metrics = trainer.compiled_step()(
                state, shard_batch(batch, trainer.mesh)
            )
            results[tensor] = {k: float(v) for k, v in metrics.items()}
        for k in ("loss_G", "loss_D", "g_fft", "g_lpips"):
            assert np.isfinite(results[2][k]), (k, results[2])
            np.testing.assert_allclose(
                results[1][k], results[2][k], rtol=2e-4, err_msg=k
            )

    def test_restore_dp_checkpoint_onto_tensor_mesh(self, tmp_path):
        """Elastic resume across PARALLELISM STRATEGIES: a checkpoint written
        on a pure-dp mesh restores onto a dp×tp mesh (place_state re-shards
        the weights), and the continued step matches the dp continuation."""
        from tfcgan_tpu.parallel.mesh import make_mesh, place_state, shard_batch

        cfg = small_cfg()
        recipe = build_recipe(cfg)
        t_dp = Trainer(cfg, recipe, mesh=make_mesh(8))
        batches = [synthetic_batch(batch_size=8, image_size=64, seed=s)
                   for s in range(2)]
        state = t_dp.fit(t_dp.init_state(jax.random.PRNGKey(3), batches[0]),
                         batches[:1])
        path = save_checkpoint(str(tmp_path), state)
        _, m_dp = t_dp.compiled_step()(state, shard_batch(batches[1], t_dp.mesh))

        c_tp = cfg.replace(mesh=cfg.mesh.__class__(num_devices=8, tensor=2))
        t_tp = Trainer(c_tp, build_recipe(c_tp), mesh=make_mesh(8, tensor=2))
        template = jax.device_get(
            t_tp.init_state(jax.random.PRNGKey(4), batches[0]))
        restored = place_state(restore_checkpoint(path, template), t_tp.mesh)
        kern = restored.g_params["G"]["down1"]["conv"]["kernel"]
        assert kern.addressable_shards[0].data.shape[-1] * 2 == kern.shape[-1]
        _, m_tp = t_tp.compiled_step()(restored, shard_batch(batches[1], t_tp.mesh))
        for k in ("loss_G", "loss_D"):
            np.testing.assert_allclose(
                float(m_dp[k]), float(m_tp[k]), rtol=2e-4, err_msg=k
            )


class TestTempModesAndDiffusionVariants:
    @pytest.mark.parametrize("name", ["favtgan_l1", "favtgan_tempmap"])
    def test_temp_modes(self, name):
        cfg = get_experiment(name)
        cfg = cfg.replace(
            data=cfg.data.__class__(batch_size=8, image_size=64),
            train=cfg.train.__class__(compute_dtype="float32"),
        )
        recipe = build_recipe(cfg)
        trainer = Trainer(cfg, recipe)
        batch = synthetic_batch(batch_size=8, image_size=64)
        state = trainer.init_state(jax.random.PRNGKey(0), batch)
        step = trainer.compiled_step()
        from tfcgan_tpu.parallel.mesh import shard_batch

        state, metrics = step(state, shard_batch(batch, trainer.mesh))
        assert np.isfinite(float(metrics["g_temp"]))

    @pytest.mark.parametrize("name", ["tfc_diff_label", "tfc_diff_hybrid"])
    def test_diffusion_variants(self, name):
        cfg = get_experiment(name)
        size = 64 if name == "tfc_diff_hybrid" else 32  # UNet G needs >=64
        cfg = cfg.replace(
            data=cfg.data.__class__(batch_size=8, image_size=size),
            train=cfg.train.__class__(compute_dtype="float32"),
            extra={**cfg.extra, "timesteps": 10},
        )
        recipe = build_recipe(cfg)
        trainer = Trainer(cfg, recipe)
        batch = synthetic_batch(batch_size=8, image_size=size, with_labels=True)
        state = trainer.init_state(jax.random.PRNGKey(0), batch)
        step = trainer.compiled_step()
        from tfcgan_tpu.parallel.mesh import shard_batch

        state, metrics = step(state, shard_batch(batch, trainer.mesh))
        assert np.isfinite(float(metrics["g_noise_mse"]))
        if name == "tfc_diff_hybrid":
            assert np.isfinite(float(metrics["g_recon"]))
            # the noise loss must reach G (not detached)
            g0 = jax.device_get(state.g_params["G"])
            state2, _ = step(state, shard_batch(batch, trainer.mesh))
            g1 = jax.device_get(state2.g_params["G"])
            d = jax.tree_util.tree_map(lambda a, b: float(np.abs(a - b).max()), g0, g1)
            assert max(jax.tree_util.tree_leaves(d)) > 0


class TestNeMARMultiRes:
    def test_multi_resolution_d(self):
        cfg = get_experiment("nemar")
        cfg = cfg.replace(
            data=cfg.data.__class__(batch_size=8, image_size=128),
            train=cfg.train.__class__(compute_dtype="float32"),
            extra={"multi_resolution": 2},
        )
        recipe = build_recipe(cfg)
        trainer = Trainer(cfg, recipe)
        batch = synthetic_batch(batch_size=8, image_size=128)
        state = trainer.init_state(jax.random.PRNGKey(0), batch)
        assert "D_mr0" in state.d_params
        from tfcgan_tpu.parallel.mesh import shard_batch

        state, metrics = step_once(trainer, state, batch)
        assert np.isfinite(float(metrics["loss_D"]))


def step_once(trainer, state, batch):
    from tfcgan_tpu.parallel.mesh import shard_batch

    return trainer.compiled_step()(state, shard_batch(batch, trainer.mesh))


class TestDataExtras:
    def test_unpaired_dataset(self, tmp_path):
        from tfcgan_tpu.data.pairs import UnpairedImageDataset
        from PIL import Image as PILImage

        for side, n in (("trainA", 3), ("trainB", 5)):
            d = tmp_path / side
            d.mkdir()
            for i in range(n):
                arr = (np.random.RandomState(i).rand(32, 32, 3) * 255).astype(np.uint8)
                PILImage.fromarray(arr).save(d / f"{i}.png")
        ds = UnpairedImageDataset(str(tmp_path), "train", 32)
        item = ds[0]
        assert item["A"].shape == (32, 32, 3)
        assert item["B"].shape == (32, 32, 3)
        assert -1.0 <= item["A"].min() and item["A"].max() <= 1.0

    def test_annotations_csv(self, tmp_path):
        from tfcgan_tpu.data.pairs import load_annotations_csv

        p = tmp_path / "annots.csv"
        p.write_text("file,gender,ethnicity,age\nx/001.png,0,2,1\n002.png,1,3,0\n")
        labels = load_annotations_csv(str(p))
        assert labels == {"001.png": 2, "002.png": 3}


class TestLRSchedules:
    @pytest.mark.parametrize("schedule", ["linear_decay", "step", "cosine"])
    def test_schedules_evaluate(self, schedule):
        from tfcgan_tpu.train.state import _lr

        cfg = get_experiment("cyclegan")
        cfg = cfg.replace(
            optim=cfg.optim.__class__(schedule=schedule, decay_start_epoch=5),
            train=cfg.train.__class__(n_epochs=10, steps_per_epoch=10),
        )
        fn = _lr(cfg)
        start = float(fn(0))
        end = float(fn(99))
        assert start == pytest.approx(cfg.optim.lr, rel=1e-5)
        assert end < start

    def test_plateau_controller_matches_torch(self):
        # Same decision sequence as torch ReduceLROnPlateau(min, 0.2, 5, 0.01)
        from tfcgan_tpu.train.state import ReduceLROnPlateau

        sched = ReduceLROnPlateau(lr=0.1)
        t = torch.optim.lr_scheduler.ReduceLROnPlateau(
            torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=0.1),
            mode="min", factor=0.2, threshold=0.01, patience=5,
        )
        rng = np.random.RandomState(0)
        metrics = np.abs(rng.randn(40)) + 0.01
        metrics[10:] = 1.0  # long plateau forces reductions
        for m in metrics:
            got = sched.step(float(m))
            t.step(float(m))
            want = t.optimizer.param_groups[0]["lr"]
            assert got == pytest.approx(want, rel=1e-9), (m, got, want)

    def test_plateau_updates_opt_state(self):
        from tfcgan_tpu.train.state import set_learning_rate

        cfg = small_cfg()
        cfg = cfg.replace(optim=cfg.optim.__class__(schedule="plateau"))
        recipe = build_recipe(cfg)
        trainer = Trainer(cfg, recipe)
        batch = synthetic_batch(batch_size=8, image_size=64)
        state = trainer.init_state(jax.random.PRNGKey(0), batch)
        state = set_learning_rate(state, 1e-5)
        state, metrics = step_once(trainer, state, batch)
        assert np.isfinite(float(metrics["loss_G"]))
        assert float(state.g_opt_state.hyperparams["learning_rate"]) == pytest.approx(1e-5)


class TestSTNVariants:
    @pytest.mark.parametrize("name", ["stn_dark_visible", "stn_b2a"])
    def test_variant_one_step(self, name):
        import dataclasses

        cfg = get_experiment(name)
        cfg = cfg.replace(
            # dataclasses.replace: stn_b2a's direction="BtoA" must survive
            data=dataclasses.replace(cfg.data, batch_size=8, image_size=64),
            train=cfg.train.__class__(compute_dtype="float32"),
        )
        recipe = build_recipe(cfg)
        if name == "stn_b2a":
            # NewModel3 structure, morph -> FFT(fake_A1, A), BtoA direction
            assert recipe.use_morph is False and recipe.use_fft
            assert cfg.data.direction == "BtoA"
            assert recipe.recon_weight == 0.01 and recipe.d_head_weight == 0.25
        else:
            # single-G2-pass variant: unweighted warp recon, unquartered D
            assert recipe.stn_condition == "fake_B" and recipe.use_fft
            assert not recipe.use_morph
            assert recipe.recon_weight == 1.0 and recipe.d_head_weight == 1.0
        assert cfg.loss.fft_weight == 2.0  # reference adds UNhalved amp+pha
        trainer = Trainer(cfg, recipe)
        batch = synthetic_batch(batch_size=8, image_size=64)
        state = trainer.init_state(jax.random.PRNGKey(0), batch)
        state, metrics = step_once(trainer, state, batch)
        assert np.isfinite(float(metrics["loss_G"]))
        assert "g_fft" in metrics and "g_morph" not in metrics


class TestDPNumericalEquivalence:
    def test_1dev_vs_8dev_same_losses_and_grads(self):
        """Data parallelism must be a pure implementation detail: the same
        global batch on a 1-device and an 8-device mesh gives the same losses
        and G gradients (up to fp32 reduction-order noise from the psum).

        Post-Adam *parameters* are deliberately not compared: near-zero
        gradient elements can flip sign under reduction reordering and Adam
        turns a sign flip into a full ±lr update."""
        from tfcgan_tpu.parallel.mesh import make_mesh, shard_batch

        cfg = small_cfg()
        recipe = build_recipe(cfg)
        batch = synthetic_batch(batch_size=8, image_size=64, seed=0)

        def run(n_dev):
            trainer = Trainer(cfg, recipe, mesh=make_mesh(n_dev))
            state = trainer.init_state(jax.random.PRNGKey(3), batch)
            sb = shard_batch(batch, trainer.mesh)
            step = trainer.compiled_step()
            grads, _ = jax.jit(jax.grad(recipe.g_loss, has_aux=True))(
                state.g_params, state.d_params, state.spectral, state.frozen,
                sb, jax.random.PRNGKey(5),
            )
            _, metrics = step(state, sb)
            return {k: float(v) for k, v in metrics.items()}, jax.device_get(grads)

        m1, g1 = run(1)
        m8, g8 = run(8)
        for k in m1:
            assert m1[k] == pytest.approx(m8[k], rel=2e-3, abs=1e-5), (k, m1[k], m8[k])

        def close(x, y):
            # per-leaf scale-relative bound: the 8-way psum reorders fp32
            # accumulation, and conv-kernel grads sum ~32k partially
            # cancelling terms, so element-wise rtol is meaningless for
            # near-zero elements. Observed noise ~5e-4 of leaf scale; a
            # sharding bug (wrong mean, missing shard) shifts O(scale).
            scale = np.max(np.abs(x)) + 1e-8
            np.testing.assert_allclose(x / scale, y / scale, atol=3e-3)

        jax.tree_util.tree_map(close, g1, g8)


class TestThermalGANBN:
    def test_one_step_thermalgan2_variant(self):
        cfg = get_experiment("thermalgan_bn")
        cfg = cfg.replace(  # 8-level G2 needs >=256 input
            data=cfg.data.__class__(batch_size=2, image_size=256),
            train=cfg.train.__class__(compute_dtype="float32"),
            mesh=cfg.mesh.__class__(num_devices=2),
        )
        recipe = build_recipe(cfg)
        assert recipe.G1.norm == "batch"
        # ThermalGAN2: single MSE stage-1 D with live grads, raw temps
        assert recipe.d_vae_mode == "single_mse" and recipe.bn_variant
        trainer = Trainer(cfg, recipe)
        batch = synthetic_batch(batch_size=2, image_size=256)
        state = trainer.init_state(jax.random.PRNGKey(0), batch)
        assert "D_vae" in state.d_params
        state, metrics = step_once(trainer, state, batch)
        assert np.isfinite(float(metrics["g_ge"]))
        assert np.isfinite(float(metrics["d_vae"]))
        assert np.isfinite(float(metrics["loss_D"]))


class TestResumeBitExact:
    def test_interrupted_run_continues_bit_identically(self, tmp_path):
        """Full-state checkpoints (params + both optimizers + spectral + PRNG
        + step) must make resume invisible: 2 steps + save/restore + 2 steps
        == 4 uninterrupted steps, bit for bit. (The reference loses optimizer
        moments, scaler, and RNG on resume — SURVEY §5.3/§5.4.)"""
        cfg = small_cfg()
        recipe = build_recipe(cfg)
        trainer = Trainer(cfg, recipe)
        batches = [synthetic_batch(batch_size=8, image_size=64, seed=s)
                   for s in range(4)]

        def run(bs, state):
            return trainer.fit(state, bs)

        straight = run(batches, trainer.init_state(jax.random.PRNGKey(11), batches[0]))

        state = run(batches[:2], trainer.init_state(jax.random.PRNGKey(11), batches[0]))
        path = save_checkpoint(str(tmp_path), state)
        template = trainer.init_state(jax.random.PRNGKey(12), batches[0])
        restored = restore_checkpoint(path, jax.device_get(template))
        from tfcgan_tpu.parallel.mesh import replicate

        resumed = run(batches[2:], replicate(restored, trainer.mesh))

        assert int(resumed.step) == int(straight.step) == 4
        for field in ("g_params", "d_params", "spectral"):
            eq = jax.tree_util.tree_map(
                lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)),
                jax.device_get(getattr(straight, field)),
                jax.device_get(getattr(resumed, field)),
            )
            assert all(jax.tree_util.tree_leaves(eq)), field

    def test_restore_across_mesh_sizes(self, tmp_path):
        """Elastic resume: a checkpoint written on an 8-device mesh restores
        onto a 1-device mesh (and would restore onto any other layout — state
        is replicated, so the manifest is layout-free). SURVEY §5.3."""
        from tfcgan_tpu.parallel.mesh import make_mesh, replicate

        cfg = small_cfg()
        recipe = build_recipe(cfg)
        t8 = Trainer(cfg, recipe, mesh=make_mesh(8))
        batches = [synthetic_batch(batch_size=8, image_size=64, seed=s)
                   for s in range(2)]
        state8 = t8.fit(t8.init_state(jax.random.PRNGKey(3), batches[0]), batches)
        path = save_checkpoint(str(tmp_path), state8)

        t1 = Trainer(cfg, recipe, mesh=make_mesh(1))
        template = jax.device_get(
            t1.init_state(jax.random.PRNGKey(4), batches[0]))
        restored = restore_checkpoint(path, template)
        state1 = t1.fit(replicate(restored, t1.mesh), batches[:1])
        assert int(state1.step) == 3
        m = {k: float(v) for k, v in t1.last_metrics.items()}
        assert all(np.isfinite(v) for v in m.values()), m

    def test_async_checkpoint_matches_sync(self, tmp_path):
        """AsyncCheckpointManager: save() overlaps IO with training; the
        written state must restore bit-identical to the sync path, and
        training continuing while the save is in flight must not corrupt it
        (the snapshot is taken before save() returns)."""
        from tfcgan_tpu.train.checkpoint import AsyncCheckpointManager

        cfg = small_cfg()
        trainer = Trainer(cfg, build_recipe(cfg))
        batches = [synthetic_batch(batch_size=8, image_size=64, seed=s)
                   for s in range(3)]
        state = trainer.fit(
            trainer.init_state(jax.random.PRNGKey(5), batches[0]), batches[:1])
        snap = jax.device_get(state)

        mgr = AsyncCheckpointManager(str(tmp_path / "async"))
        path = mgr.save(state)
        # keep training while the write is in flight
        state = trainer.fit(state, batches[1:])
        mgr.wait()

        template = jax.device_get(
            trainer.init_state(jax.random.PRNGKey(6), batches[0]))
        restored = restore_checkpoint(path, template)
        eq = jax.tree_util.tree_map(
            lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)),
            snap.g_params, restored.g_params)
        assert all(jax.tree_util.tree_leaves(eq))
        assert int(restored.step) == 1 and int(state.step) == 3
        # idempotent re-save of the same step
        assert mgr.save(restored) == path
        mgr.close()


class TestSinglePassD:
    """TFCGAN_SINGLE_PASS_D is a pure perf knob: concatenating (fake, real)
    into one spectral-norm PatchGAN forward per phase is the same math as the
    reference's two-forward form (``globalFFT.py:458-460,519-526``) — no
    cross-batch coupling anywhere in D (VERDICT r3 weak #3). Losses and D
    logits must match tightly; gradients only to ~1e-3 relative, because the
    batch-16 conv backward accumulates in a different order than two batch-8
    ones (fp32 reduction-order noise, max observed 1.8e-4 on grads of
    magnitude ~400)."""

    def _logits(self, monkeypatch, flag):
        monkeypatch.setenv("TFCGAN_SINGLE_PASS_D", flag)
        cfg = small_cfg()
        recipe = build_recipe(cfg)
        batch = synthetic_batch(batch_size=8, image_size=64)
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        state = recipe.init(jax.random.PRNGKey(0), batch)
        if flag == "1":
            pf, pr = recipe._disc_pair(
                state["d_params"], state["spectral"], batch["B"], batch["B"][::-1],
                batch["A"])
        else:
            pf = recipe._disc(state["d_params"], state["spectral"], batch["B"],
                              batch["A"])
            pr = recipe._disc(state["d_params"], state["spectral"],
                              batch["B"][::-1], batch["A"])
        return np.asarray(pf), np.asarray(pr)

    def _losses_and_grads(self, monkeypatch, flag):
        monkeypatch.setenv("TFCGAN_SINGLE_PASS_D", flag)
        cfg = small_cfg()
        recipe = build_recipe(cfg)
        batch = synthetic_batch(batch_size=8, image_size=64)
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        state = recipe.init(jax.random.PRNGKey(0), batch)
        rng = jax.random.PRNGKey(7)

        def g_total(gp):
            total, _ = recipe.g_loss(
                gp, state["d_params"], state["spectral"], state["frozen"],
                batch, rng)
            return total

        g_val, g_grad = jax.value_and_grad(g_total)(state["g_params"])
        _, (aux, _) = recipe.g_loss(
            state["g_params"], state["d_params"], state["spectral"],
            state["frozen"], batch, rng)

        def d_total(dp):
            loss, _ = recipe.d_loss(dp, state["spectral"], aux, batch, rng)
            return loss

        d_val, d_grad = jax.value_and_grad(d_total)(state["d_params"])
        return (np.asarray(g_val), jax.device_get(g_grad),
                np.asarray(d_val), jax.device_get(d_grad))

    def test_logits_identical(self, monkeypatch):
        pf1, pr1 = self._logits(monkeypatch, "1")
        pf0, pr0 = self._logits(monkeypatch, "0")
        np.testing.assert_allclose(pf1, pf0, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(pr1, pr0, rtol=1e-5, atol=1e-6)

    def test_dispatch_is_pure_perf_knob(self, monkeypatch):
        gv1, gg1, dv1, dg1 = self._losses_and_grads(monkeypatch, "1")
        gv0, gg0, dv0, dg0 = self._losses_and_grads(monkeypatch, "0")
        np.testing.assert_allclose(gv1, gv0, rtol=1e-6)
        np.testing.assert_allclose(dv1, dv0, rtol=1e-6)
        # grads: compare at each leaf's own scale — conv-backward reduction
        # order differs between one batch-16 and two batch-8 convs, giving
        # elementwise noise ~1e-3 relative on near-zero elements of tensors
        # whose magnitudes span 1e-2..1e5 (logits above pin exact semantics)
        for t1, t0 in ((gg1, gg0), (dg1, dg0)):
            for l1, l0 in zip(jax.tree_util.tree_leaves(t1),
                              jax.tree_util.tree_leaves(t0)):
                scale = max(float(np.max(np.abs(l0))), 1e-6)
                err = float(np.max(np.abs(np.asarray(l1) - np.asarray(l0)))) / scale
                assert err < 1e-4, (err, scale)

    def test_per_forward_cadence_forces_two_pass(self, monkeypatch):
        monkeypatch.setenv("TFCGAN_SINGLE_PASS_D", "1")
        cfg = small_cfg()
        cfg = cfg.replace(extra={**cfg.extra, "spectral_cadence": "per_forward"})
        recipe = build_recipe(cfg)
        assert recipe._single_pass_d() is False


class TestSTNSinglePassD:
    def test_d_pair_matches_two_forwards(self, monkeypatch):
        """STN heads: one concatenated D forward == two forwards (logits)."""
        cfg = get_experiment("stn_newmodel3")
        cfg = cfg.replace(
            data=cfg.data.__class__(batch_size=4, image_size=64),
            train=cfg.train.__class__(compute_dtype="float32"),
            extra={**cfg.extra, "vit_depth": 1, "vit_dim": 64, "vit_heads": 2,
                   "vit_mlp": 64, "fast_warp": False},
        )
        recipe = build_recipe(cfg)
        batch = synthetic_batch(batch_size=4, image_size=64)
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        state = recipe.init(jax.random.PRNGKey(0), batch)

        monkeypatch.setenv("TFCGAN_SINGLE_PASS_D", "1")
        f1, r1 = recipe._d_pair(state["d_params"], state["spectral"], "D1",
                                batch["B"], batch["A"], batch["A"])
        monkeypatch.setenv("TFCGAN_SINGLE_PASS_D", "0")
        f0, r0 = recipe._d_pair(state["d_params"], state["spectral"], "D1",
                                batch["B"], batch["A"], batch["A"])
        np.testing.assert_allclose(np.asarray(f1), np.asarray(f0),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(r1), np.asarray(r0),
                                   rtol=1e-5, atol=1e-6)
