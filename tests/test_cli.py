"""CLI surface guards: parsers construct, experiments resolve."""

import pytest

from tfcgan_tpu import cli
from tfcgan_tpu.config import EXPERIMENTS, get_experiment
from tfcgan_tpu.recipes import build_recipe


class TestImportHygiene:
    def test_package_import_never_initializes_a_backend(self):
        """Importing the library (incl. the CLI and model zoo) must not touch
        the device: a module-level ``jnp.asarray`` constant would initialize
        the backend at import, which hangs host-only CLI commands
        (prep-combine/prep-crop/gallery) whenever the TPU tunnel is down.
        Poisoning the platform makes any init attempt raise."""
        import subprocess
        import sys

        code = (
            "import jax\n"
            "jax.config.update('jax_platforms', 'nonexistent-backend')\n"
            "import tfcgan_tpu.cli, tfcgan_tpu.ops, tfcgan_tpu.models\n"
            "import tfcgan_tpu.data.prep, tfcgan_tpu.recipes, tfcgan_tpu.evaluation\n"
            "print('IMPORT_CLEAN')\n"
        )
        r = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=180,
        )
        assert r.returncode == 0 and "IMPORT_CLEAN" in r.stdout, r.stderr[-2000:]


class TestCLI:
    @pytest.mark.parametrize("cmd", [
        ["train", "--experiment", "fft_glo"],
        ["train", "--experiment", "fft_glo", "--hist-every", "100"],
        ["test", "--experiment", "fft_glo", "--checkpoint", "x"],
        ["gen", "--experiment", "tfc_diff", "--checkpoint", "x"],
        ["eval", "--fake-dir", "a", "--real-dir", "b"],
        ["eval-reg", "--real-a-dir", "a", "--real-b-dir", "b", "--reg-b-dir", "c"],
        # --cpu pins host-only commands to the CPU backend (tunnel hazard
        # escape hatch); a no-op here since conftest already pins cpu
        ["eval-reg", "--cpu", "--real-a-dir", "a", "--real-b-dir", "b",
         "--reg-b-dir", "c"],
        ["eval", "--cpu", "--fake-dir", "a", "--real-dir", "b"],
        ["prep-combine", "--dir-a", "a", "--dir-b", "b", "--dir-ab", "c"],
        ["prep-crop", "--stack-dir", "a", "--out-root", "b"],
    ])
    def test_parsers_accept(self, cmd, monkeypatch):
        # parse_args succeeds and dispatch target exists; don't execute
        import argparse

        parser_calls = {}

        def fake_fn(args):
            parser_calls["fn"] = True

        # build the parser exactly as main() does, but stub execution
        import unittest.mock as mock

        with mock.patch.object(cli, "cmd_train", fake_fn), \
             mock.patch.object(cli, "cmd_test", fake_fn), \
             mock.patch.object(cli, "cmd_gen", fake_fn), \
             mock.patch.object(cli, "cmd_eval", fake_fn), \
             mock.patch.object(cli, "cmd_eval_reg", fake_fn), \
             mock.patch.object(cli, "cmd_prep_combine", fake_fn), \
             mock.patch.object(cli, "cmd_prep_crop", fake_fn):
            cli.main(cmd)
        assert parser_calls.get("fn")


class TestPrepMorphs:
    def test_writes_morph_views(self, tmp_path):
        """Reconstructed morph_plots.py (TFC-STN/evaluation/make_morphs.sh:3
        invokes it but the file is missing upstream): 1 - morph gradient of
        each PNG, the map the STN morph triplet trains on."""
        import numpy as np
        from PIL import Image

        from tfcgan_tpu.cli import main
        from tfcgan_tpu.data.synth import _face_scene

        src = tmp_path / "in"
        src.mkdir()
        scenes = _face_scene(np.random.RandomState(3), 2, 64) * 255.0
        for i, s in enumerate(scenes):
            Image.fromarray(np.repeat(s[..., None], 3, -1).astype(np.uint8)
                            ).save(src / f"{i:05d}.png")
        out = tmp_path / "morphs"
        main(["prep-morphs", "--cpu", "--in-dir", str(src), "--out-dir", str(out)])
        import os

        assert sorted(os.listdir(out)) == ["00000.png", "00001.png"]
        m = np.asarray(Image.open(out / "00000.png"))
        orig = np.asarray(Image.open(src / "00000.png"))
        assert m.shape == orig.shape and m.dtype == np.uint8
        # flat regions -> morph gradient 0 -> m saturates at 255; edges dark
        assert m.max() == 255 and m.min() < 200


class TestBalancedMixtureConfigs:
    def test_ed_without_extra_root_raises_clear_error(self, tmp_path):
        # triptemp_ed/_ea need two dataset roots; launching with one must fail
        # with an actionable message, not a FileNotFoundError on a placeholder
        with pytest.raises(SystemExit, match="--extra-root"):
            cli.main(["train", "--experiment", "triptemp_ed",
                      "--data-root", str(tmp_path)])

    def test_no_placeholder_roots_in_registry(self):
        for name, cfg in EXPERIMENTS.items():
            for r in cfg.data.extra_roots:
                assert not r.startswith("<"), (name, r)


class TestRegistry:
    def test_every_experiment_builds_a_recipe(self):
        for name in EXPERIMENTS:
            cfg = get_experiment(name)
            recipe = build_recipe(cfg)
            assert hasattr(recipe, "g_loss") and hasattr(recipe, "d_loss"), name

    def test_experiment_count_covers_reference_matrix(self):
        # 13 tfcgan-family + 3 stn + 4 baselines/diffusion-variants + ...
        assert len(EXPERIMENTS) >= 24, sorted(EXPERIMENTS)


class TestDistributedHelpers:
    def test_local_batch_slice_single_process(self):
        import numpy as np
        from tfcgan_tpu.parallel.distributed import initialize, local_batch_slice

        initialize(num_processes=1)  # explicit single-process no-op
        b = {"A": np.arange(16).reshape(8, 2), "T": np.arange(8)}
        out = local_batch_slice(b)
        assert np.array_equal(out["A"], b["A"])  # 1 process keeps everything
        assert np.array_equal(out["T"], b["T"])

    def test_initialize_is_strict_after_backend_init(self):
        # the backend is already up in this process, so a real multi-host
        # init must FAIL LOUDLY (not silently fall back to single-process)
        import jax
        import pytest as _pytest
        from tfcgan_tpu.parallel.distributed import initialize

        jax.devices()  # ensure backend is initialized
        with _pytest.raises(RuntimeError):
            initialize(coordinator_address="127.0.0.1:1", num_processes=2,
                       process_id=0)


class TestRecipeGuards:
    def test_conditional_plus_mask_rejected(self):
        import pytest as _pytest
        from tfcgan_tpu.config import get_experiment
        from tfcgan_tpu.recipes import build_recipe

        cfg = get_experiment("fft_patch_debiased")
        cfg = cfg.replace(loss=cfg.loss.__class__(
            **{**cfg.loss.__dict__, "use_mask": True}))
        with _pytest.raises(ValueError, match="mutually exclusive"):
            build_recipe(cfg)


class TestMemorySummary:
    def test_returns_dict_and_prints(self, capsys):
        from tfcgan_tpu.train.profiling import device_memory_summary, print_memory_summary

        s = device_memory_summary()
        assert isinstance(s, dict)  # CPU backend: usually empty
        print_memory_summary("x: ")
        assert "x: " in capsys.readouterr().out


class TestDataPrep:
    def _imgs(self, d, names, seed=0):
        import numpy as np
        from PIL import Image

        d.mkdir(parents=True, exist_ok=True)
        r = np.random.RandomState(seed)
        for n in names:
            Image.fromarray((r.rand(16, 16, 3) * 255).astype("uint8")).save(d / n)

    def test_combine_a_and_b_pairs_matching_names(self, tmp_path):
        import numpy as np
        from PIL import Image
        from tfcgan_tpu.data.prep import combine_a_and_b

        self._imgs(tmp_path / "A", ["1.png", "2.png", "only_a.png"], seed=1)
        self._imgs(tmp_path / "B", ["1.png", "2.png", "only_b.png"], seed=2)
        n = combine_a_and_b(str(tmp_path / "A"), str(tmp_path / "B"),
                            str(tmp_path / "AB"), workers=1)
        assert n == 2  # only the intersection is paired
        ab = np.asarray(Image.open(tmp_path / "AB" / "1.png"))
        assert ab.shape == (16, 32, 3)
        a = np.asarray(Image.open(tmp_path / "A" / "1.png").convert("RGB"))
        np.testing.assert_array_equal(ab[:, :16], a)  # left half is A

    def test_crop_stacks_roundtrip(self, tmp_path):
        import numpy as np
        from PIL import Image
        from tfcgan_tpu.data.prep import crop_stacks

        r = np.random.RandomState(3)
        stack = (r.rand(48, 16, 3) * 255).astype("uint8")  # 3 x 16px roles
        (tmp_path / "stacks").mkdir()
        Image.fromarray(stack).save(tmp_path / "stacks" / "s.png")
        n = crop_stacks(str(tmp_path / "stacks"), str(tmp_path / "out"),
                        ["real_A", "fake_B", "real_B"])
        assert n == 1
        for i, role in enumerate(["real_A", "fake_B", "real_B"]):
            got = np.asarray(Image.open(tmp_path / "out" / role / "s.png"))
            np.testing.assert_array_equal(got, stack[i * 16:(i + 1) * 16])

    def test_make_registered_dataset_with_fake_inferencer(self, tmp_path):
        import numpy as np
        from PIL import Image
        from tfcgan_tpu.data.prep import make_registered_dataset

        r = np.random.RandomState(4)
        batch = {"A": np.tanh(r.randn(2, 16, 16, 3)).astype(np.float32),
                 "B": np.tanh(r.randn(2, 16, 16, 3)).astype(np.float32)}
        fake_inf = lambda b: {"warped_B": b["B"][:, ::-1]}  # any warp
        n = make_registered_dataset(fake_inf, [batch], str(tmp_path / "reg"))
        assert n == 2
        pair = np.asarray(Image.open(tmp_path / "reg" / "00000.png"))
        assert pair.shape == (16, 32, 3)


class TestInferencerOutputs:
    def test_run_test_set_stacks_spectra_patches(self, tmp_path):
        import numpy as np
        from tfcgan_tpu.config import get_experiment
        from tfcgan_tpu.data.synth import synthetic_batch
        from tfcgan_tpu.infer import Inferencer
        from tfcgan_tpu.recipes import build_recipe
        import jax

        cfg = get_experiment("fft_glo")
        cfg = cfg.replace(
            data=cfg.data.__class__(batch_size=2, image_size=64),
            train=cfg.train.__class__(compute_dtype="float32"),
        )
        recipe = build_recipe(cfg)
        batch = synthetic_batch(batch_size=2, image_size=64)
        g_vars = recipe.G.init(jax.random.PRNGKey(0), batch["A"])
        inf = Inferencer(cfg, recipe, {"G": g_vars["params"]})
        n = inf.run_test_set([batch], str(tmp_path), save_spectra=True,
                             save_patches=2)
        assert n == 2
        import os
        assert sorted(os.listdir(tmp_path / "spectra")) == ["00000_mag.png", "00001_mag.png"]
        assert sorted(os.listdir(tmp_path / "patches")) == ["00000_p.png", "00001_p.png"]
        from PIL import Image
        stack = np.asarray(Image.open(tmp_path / "00000.png"))
        assert stack.shape == (64 * 3, 64, 3)  # A | fake_B | real_B vertical

    def test_nemar_serve_stack_feeds_eval_reg(self, tmp_path):
        """NeMAR test-mode visuals (nemar/test.py:1-60, visual_names
        nemar_model.py:74-87) through the crop -> eval-reg chain."""
        import os

        import jax
        import numpy as np
        from PIL import Image

        from tfcgan_tpu.config import get_experiment
        from tfcgan_tpu.data.prep import crop_stacks
        from tfcgan_tpu.data.synth import synthetic_batch
        from tfcgan_tpu.evaluation.suite import _load_dir, registration_metrics
        from tfcgan_tpu.infer import Inferencer
        from tfcgan_tpu.recipes import build_recipe

        cfg = get_experiment("nemar")
        cfg = cfg.replace(
            data=cfg.data.__class__(batch_size=2, image_size=64),
            train=cfg.train.__class__(compute_dtype="float32"),
            extra={**cfg.extra, "resnet_blocks": 1, "stn_type": "affine",
                   "fast_warp": False},
        )
        recipe = build_recipe(cfg)
        batch = synthetic_batch(batch_size=2, image_size=64)
        params = recipe.init(jax.random.PRNGKey(0), batch)["g_params"]
        inf = Inferencer(cfg, recipe, params)
        out = inf(batch)
        assert set(out) == {"registered_A", "fake_B", "fake_TR_B", "fake_RT_B"}
        stacks_dir = tmp_path / "stacks"
        n = inf.run_test_set([batch], str(stacks_dir))
        assert n == 2
        stack = np.asarray(Image.open(stacks_dir / "00000.png"))
        assert stack.shape == (64 * 6, 64, 3)
        roles = ["real_A", "real_B", "reg_A", "fake_B", "fake_TR_B", "fake_RT_B"]
        crop_stacks(str(stacks_dir), str(tmp_path), roles)
        assert sorted(os.listdir(tmp_path / "reg_A")) == ["00000.png", "00001.png"]
        # eval-reg consumption: netR warps A onto B, so the moving image is A
        _, a = _load_dir(str(tmp_path / "real_A"))
        _, b = _load_dir(str(tmp_path / "real_B"))
        _, ra = _load_dir(str(tmp_path / "reg_A"))
        to = lambda x: x / 127.5 - 1.0
        m = registration_metrics(to(b), to(a), to(ra))
        for v in m.values():
            assert np.all(np.isfinite(np.asarray(v)))

    def test_cyclegan_serve_both_legs(self, tmp_path):
        """CycleGAN serves both directions: the reference sample grid is
        real_A | fake_B | real_B | fake_A (cyclegan_og/cyclegan.py:327-342)."""
        import jax
        import numpy as np
        from PIL import Image

        from tfcgan_tpu.config import get_experiment
        from tfcgan_tpu.data.synth import synthetic_batch
        from tfcgan_tpu.infer import Inferencer
        from tfcgan_tpu.recipes import build_recipe

        cfg = get_experiment("cyclegan")
        cfg = cfg.replace(
            data=cfg.data.__class__(batch_size=2, image_size=64),
            train=cfg.train.__class__(compute_dtype="float32"),
            extra={**cfg.extra, "resnet_blocks": 1},
        )
        recipe = build_recipe(cfg)
        batch = synthetic_batch(batch_size=2, image_size=64)
        params = recipe.init(jax.random.PRNGKey(0), batch)["g_params"]
        inf = Inferencer(cfg, recipe, params)
        out = inf(batch)
        assert set(out) == {"fake_B", "fake_A"}
        assert np.asarray(out["fake_A"]).shape == (2, 64, 64, 3)
        n = inf.run_test_set([batch], str(tmp_path / "s"))
        assert n == 2
        stack = np.asarray(Image.open(tmp_path / "s" / "00000.png"))
        assert stack.shape == (64 * 4, 64, 3)


class TestInferencerMesh:
    def test_data_parallel_serving_matches_single_device(self):
        """Mesh-sharded serving == unsharded, incl. a ragged batch (n=10 on
        an 8-device data axis -> pad 6, trim back)."""
        import jax
        import numpy as np
        from tfcgan_tpu.config import get_experiment
        from tfcgan_tpu.data.synth import synthetic_batch
        from tfcgan_tpu.infer import Inferencer
        from tfcgan_tpu.parallel.mesh import make_mesh
        from tfcgan_tpu.recipes import build_recipe

        cfg = get_experiment("fft_glo")
        cfg = cfg.replace(
            data=cfg.data.__class__(batch_size=10, image_size=64),
            train=cfg.train.__class__(compute_dtype="float32"),
        )
        recipe = build_recipe(cfg)
        batch = synthetic_batch(batch_size=10, image_size=64)
        g_vars = recipe.G.init(jax.random.PRNGKey(0), batch["A"])
        params = {"G": g_vars["params"]}

        single = np.asarray(Inferencer(cfg, recipe, params)(batch))
        mesh = make_mesh()  # 8 virtual CPU devices (conftest)
        assert mesh.shape["data"] > 1
        sharded = np.asarray(Inferencer(cfg, recipe, params, mesh=mesh)(batch))
        assert sharded.shape == single.shape == (10, 64, 64, 3)
        np.testing.assert_allclose(sharded, single, atol=2e-5)


class TestGallery:
    def test_write_gallery(self, tmp_path):
        from PIL import Image
        import numpy as np
        from tfcgan_tpu.evaluation.gallery import write_gallery

        for i in range(3):
            Image.fromarray(
                np.zeros((8, 8, 3), np.uint8) + i * 40
            ).save(tmp_path / f"{i:07d}.png")
        out = write_gallery(str(tmp_path), title="run-x")
        txt = open(out).read()
        assert "run-x" in txt
        assert txt.count("<img") == 3
        # newest first
        assert txt.index("0000002.png") < txt.index("0000000.png")

    def test_empty_dir(self, tmp_path):
        from tfcgan_tpu.evaluation.gallery import write_gallery

        out = write_gallery(str(tmp_path))
        assert "no images yet" in open(out).read()
