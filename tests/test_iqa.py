"""NR-IQA stage tests (reference protocol: eval/Devcom/IQA.sh:13-28).

Formula-level checks of the NIQE implementation (GGD/AGGD moment fits,
MSCN statistics, score monotonicity under distortion) plus the CLI
``eval --iqa`` wiring and the weights-gate for MANIQA/DBCNN.
"""

import numpy as np
import pytest


class TestGGDFit:
    def test_recovers_gaussian_alpha2(self):
        from tfcgan_tpu.evaluation.niqe import fit_ggd

        r = np.random.RandomState(0)
        x = r.randn(200_000) * 0.7
        alpha, sigma_sq = fit_ggd(x)
        assert abs(alpha - 2.0) < 0.1
        assert abs(sigma_sq - 0.49) < 0.02

    def test_recovers_laplacian_alpha1(self):
        from tfcgan_tpu.evaluation.niqe import fit_ggd

        r = np.random.RandomState(1)
        x = r.laplace(scale=0.5, size=200_000)
        alpha, _ = fit_ggd(x)
        assert abs(alpha - 1.0) < 0.1

    def test_aggd_detects_asymmetry(self):
        from tfcgan_tpu.evaluation.niqe import fit_aggd

        r = np.random.RandomState(2)
        x = r.randn(200_000)
        x = np.where(x < 0, x * 2.0, x)  # heavier left tail
        alpha, eta, bl_sq, br_sq = fit_aggd(x)
        assert bl_sq > 2.5 * br_sq
        assert eta < 0  # mean term pulled left
        # symmetric input: eta ~ 0, bl ~ br
        alpha_s, eta_s, bl_s, br_s = fit_aggd(r.randn(200_000))
        assert abs(eta_s) < 0.02 and abs(bl_s - br_s) < 0.05
        assert abs(alpha_s - 2.0) < 0.25


class TestMSCN:
    def test_normalizes_first_and_second_moments(self):
        from tfcgan_tpu.evaluation.niqe import mscn

        r = np.random.RandomState(3)
        # smooth natural-ish field with strong global gradient
        from scipy import ndimage

        img = ndimage.gaussian_filter(r.randn(192, 192), 4.0) * 60.0 + 120.0
        img += np.linspace(0, 80, 192)[None, :]
        m = mscn(img)
        assert abs(float(m.mean())) < 0.05  # global gradient removed
        assert float(np.abs(m).max()) < 8.0


class TestNIQEScore:
    def test_distortions_raise_score(self):
        from scipy import ndimage

        from tfcgan_tpu.data.synth import textured_face_scene
        from tfcgan_tpu.evaluation.niqe import load_pristine_model, niqe

        model = load_pristine_model()
        r = np.random.RandomState(9)
        img = textured_face_scene(r, 1, 288)[0] * 255.0
        clean = niqe(img, model)
        noisy = niqe(np.clip(img + r.randn(*img.shape) * 25, 0, 255), model)
        blurry = niqe(ndimage.gaussian_filter(img, 4.0), model)
        assert np.isfinite(clean)
        assert noisy > 3 * clean
        assert blurry > clean

    def test_rgb_and_gray_agree(self):
        from tfcgan_tpu.data.synth import _face_scene
        from tfcgan_tpu.evaluation.niqe import load_pristine_model, niqe

        model = load_pristine_model()
        g = _face_scene(np.random.RandomState(4), 1, 192)[0] * 255.0
        rgb = np.repeat(g[..., None], 3, axis=-1)
        # luma of equal channels = g*(0.299+0.587+0.114) — exact up to f64
        # rounding, but a 1-ulp shift can flip one gamma-grid argmin bin and
        # the tight pristine cov amplifies that in the Mahalanobis distance,
        # so compare scores loosely rather than bitwise
        sg, sr = niqe(g, model, patch=96), niqe(rgb, model, patch=96)
        assert abs(sg - sr) < 0.05 * max(1.0, sg), (sg, sr)

    def test_pristine_model_patch_selection(self):
        from tfcgan_tpu.data.synth import _face_scene
        from tfcgan_tpu.evaluation.niqe import fit_niqe_model

        imgs = _face_scene(np.random.RandomState(5), 4, 192) * 255.0
        mu, cov = fit_niqe_model(list(imgs), patch=96)
        assert mu.shape == (36,) and cov.shape == (36, 36)
        assert np.all(np.isfinite(mu)) and np.all(np.isfinite(cov))


class TestIQAStage:
    def test_weights_gated_metrics_raise_with_recipe(self):
        from tfcgan_tpu.evaluation.iqa import IQAWeightsUnavailable, compute_iqa

        imgs = [np.zeros((128, 128), np.float64)]
        for m in ("maniqa", "dbcnn"):
            with pytest.raises(IQAWeightsUnavailable, match="convert_iqa"):
                compute_iqa(imgs, metrics=(m,))

    def test_cli_eval_iqa_columns(self, tmp_path, capsys):
        from PIL import Image

        from tfcgan_tpu.cli import main
        from tfcgan_tpu.data.synth import textured_face_scene

        # textured scenes: near the pristine manifold, so clean reals score
        # low and the noise-corrupted fakes score higher (plain blob scenes
        # sit OFF-manifold where the ordering is undefined)
        r = np.random.RandomState(6)
        scenes = textured_face_scene(r, 2, 128) * 255.0

        for d in ("fake_B", "real_B"):
            (tmp_path / d).mkdir()
        for i, s in enumerate(scenes):
            rgb = np.repeat(s[..., None], 3, -1).astype(np.uint8)
            Image.fromarray(rgb).save(tmp_path / "real_B" / f"{i:05d}.png")
            noisy = np.clip(rgb + r.randn(*rgb.shape) * 20, 0, 255).astype(np.uint8)
            Image.fromarray(noisy).save(tmp_path / "fake_B" / f"{i:05d}.png")
        csv = tmp_path / "m.csv"
        main(["eval", "--cpu", "--fake-dir", str(tmp_path / "fake_B"),
              "--real-dir", str(tmp_path / "real_B"),
              "--out-csv", str(csv), "--iqa", "niqe"])
        import pandas as pd

        df = pd.read_csv(csv)
        assert {"niqe_fake", "niqe_real"} <= set(df.columns)
        assert np.all(np.isfinite(df["niqe_fake"]))
        # the noisy fakes must read as less natural than the clean reals
        assert df["niqe_fake"].mean() > df["niqe_real"].mean()
