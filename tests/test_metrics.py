"""Tests for the on-device metric kernels vs independent numpy references."""

import numpy as np

import jax.numpy as jnp

from tfcgan_tpu import ops


def _imgs(seed=0, n=2, h=32, w=32, c=3):
    rng = np.random.RandomState(seed)
    return (
        rng.randint(0, 256, (n, h, w, c)).astype(np.float32),
        rng.randint(0, 256, (n, h, w, c)).astype(np.float32),
    )


class TestPSNR:
    def test_matches_reference_formula(self):
        real, fake = _imgs(1)
        got = np.asarray(ops.psnr(jnp.asarray(real), jnp.asarray(fake)))
        for i in range(2):
            mse = np.mean((real[i] - fake[i]) ** 2)
            want = 20 * np.log10(255.0 / np.sqrt(mse))
            np.testing.assert_allclose(got[i], want, rtol=1e-5)

    def test_identical_images(self):
        real, _ = _imgs(2)
        got = np.asarray(ops.psnr(jnp.asarray(real), jnp.asarray(real)))
        np.testing.assert_array_equal(got, 100.0)


def _ssim_numpy(x, y, data_range=255.0, win=7):
    """Independent skimage-formula SSIM (uniform filter, ddof-1 covariances)."""
    from scipy.ndimage import uniform_filter

    np_ = win * win
    cov_norm = np_ / (np_ - 1)
    ux = uniform_filter(x, win)
    uy = uniform_filter(y, win)
    uxx = uniform_filter(x * x, win)
    uyy = uniform_filter(y * y, win)
    uxy = uniform_filter(x * y, win)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / ((ux**2 + uy**2 + c1) * (vx + vy + c2))
    pad = (win - 1) // 2
    return s[pad:-pad, pad:-pad].mean()


class TestSSIM:
    def test_matches_skimage_formula_gray(self):
        real, fake = _imgs(3, c=1)
        got = np.asarray(ops.ssim(jnp.asarray(real[..., 0]), jnp.asarray(fake[..., 0])))
        for i in range(2):
            want = _ssim_numpy(real[i, :, :, 0].astype(np.float64), fake[i, :, :, 0].astype(np.float64))
            np.testing.assert_allclose(got[i], want, rtol=1e-4)

    def test_multichannel_averages(self):
        real, fake = _imgs(4)
        got = np.asarray(ops.ssim(jnp.asarray(real), jnp.asarray(fake)))
        per_c = [
            np.asarray(ops.ssim(jnp.asarray(real[..., c]), jnp.asarray(fake[..., c])))
            for c in range(3)
        ]
        np.testing.assert_allclose(got, np.mean(per_c, axis=0), rtol=1e-6)

    def test_identical_is_one(self):
        real, _ = _imgs(5)
        got = np.asarray(ops.ssim(jnp.asarray(real), jnp.asarray(real)))
        np.testing.assert_allclose(got, 1.0, atol=1e-6)


class TestBhattacharyya:
    def test_matches_opencv_formula(self):
        real, fake = _imgs(6)

        def cv_ref(r, f):
            def hist(img):
                q = np.clip(img.astype(np.int64) // 32, 0, 7)
                idx = q[..., 0] * 64 + q[..., 1] * 8 + q[..., 2]
                h = np.bincount(idx.ravel(), minlength=512).astype(np.float64)
                return h / np.linalg.norm(h)

            h1, h2 = hist(r), hist(f)
            n = 512
            num = np.sum(np.sqrt(h1 * h2))
            den = np.sqrt(h1.mean() * h2.mean()) * n
            return np.sqrt(max(1 - num / den, 0.0))

        got = np.asarray(ops.bhattacharyya(jnp.asarray(real), jnp.asarray(fake)))
        for i in range(2):
            np.testing.assert_allclose(got[i], cv_ref(real[i], fake[i]), atol=1e-5)

    def test_identical_is_zero(self):
        real, _ = _imgs(7)
        got = np.asarray(ops.bhattacharyya(jnp.asarray(real), jnp.asarray(real)))
        np.testing.assert_allclose(got, 0.0, atol=1e-3)


class TestNCC:
    def test_matches_reference(self):
        # calc_NCC.py: (1/(n-1)) * sum(znorm(a) * znorm(b))
        real, fake = _imgs(8, c=1)
        a, b = real[..., 0] / 255.0, fake[..., 0] / 255.0
        got = np.asarray(ops.ncc(jnp.asarray(a), jnp.asarray(b)))
        for i in range(2):
            az = (a[i] - a[i].mean()) / a[i].std()
            bz = (b[i] - b[i].mean()) / b[i].std()
            want = (az * bz).sum() / (a[i].size - 1)
            np.testing.assert_allclose(got[i], want, rtol=1e-4)

    def test_self_correlation_is_one(self):
        real, _ = _imgs(9, c=1)
        a = real[..., 0] / 255.0
        got = np.asarray(ops.ncc(jnp.asarray(a), jnp.asarray(a)))
        np.testing.assert_allclose(got, 1.0, rtol=1e-3)


class TestMutualInformation:
    def test_matches_histogram2d_reference(self):
        real, fake = _imgs(10, c=1)
        a, b = real[..., 0] / 255.0, fake[..., 0] / 255.0
        got = np.asarray(ops.mutual_information(jnp.asarray(a), jnp.asarray(b)))
        for i in range(2):
            h, _, _ = np.histogram2d(a[i].ravel(), b[i].ravel(), bins=20)
            pxy = h / h.sum()
            px = pxy.sum(axis=1)[:, None]
            py = pxy.sum(axis=0)[None, :]
            nz = pxy > 0
            want = np.sum(pxy[nz] * np.log(pxy[nz] / (px @ py)[nz]))
            np.testing.assert_allclose(got[i], want, rtol=1e-3, atol=1e-3)


class TestFFTMagMSE:
    def test_zero_for_identical(self):
        rng = np.random.RandomState(11)
        x = rng.uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32)
        got = np.asarray(ops.fft_mag_mse(jnp.asarray(x), jnp.asarray(x)))
        np.testing.assert_allclose(got, 0.0, atol=1e-6)


class TestFFTMagMAE:
    def test_matches_reference_recomputation(self):
        """Golden vs an independent scipy/PIL recomputation of
        ``Eurecom_MagOther.py::other_spec``: MAE of log|fftshift(fft2(gray))|
        (the script's skimage ``window`` import is dead code; sklearn's
        uniform-average MAE == plain mean |diff|). The script grayscales via
        cv2 (identical ITU-R 601 weights to the PIL 'L' path our op uses)."""
        from PIL import Image
        from scipy.fft import fft2, fftshift

        rng = np.random.RandomState(12)
        r255 = rng.randint(0, 256, (2, 32, 32, 3)).astype(np.uint8)
        f255 = rng.randint(0, 256, (2, 32, 32, 3)).astype(np.uint8)

        def want_one(r, f):
            gr = np.asarray(Image.fromarray(r).convert("L"), np.float32)
            gf = np.asarray(Image.fromarray(f).convert("L"), np.float32)
            mr = np.log(np.abs(fftshift(fft2(gr))))
            mf = np.log(np.abs(fftshift(fft2(gf))))
            return np.mean(np.abs(mr - mf))

        to = lambda x: jnp.asarray(x.astype(np.float32) / 127.5 - 1.0)
        got = np.asarray(ops.fft_mag_mae(to(r255), to(f255)))
        for i in range(2):
            np.testing.assert_allclose(got[i], want_one(r255[i], f255[i]), rtol=1e-4)

    def test_zero_for_identical(self):
        rng = np.random.RandomState(13)
        x = rng.uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32)
        got = np.asarray(ops.fft_mag_mae(jnp.asarray(x), jnp.asarray(x)))
        np.testing.assert_allclose(got, 0.0, atol=1e-6)


class TestFFTLogMagnitudeDegenerate:
    def test_constant_image_is_finite(self):
        """Regression (VERDICT r3 weak #7): log|fft| of a constant image is
        -inf in every non-DC bin, which propagated NaNs into infer.py's
        spectra normalization. The op floors |f| at float32 tiny."""
        from tfcgan_tpu.ops.fftloss import fft_log_magnitude

        const = jnp.full((1, 16, 16, 3), 0.5, jnp.float32)
        spec = np.asarray(fft_log_magnitude(const))
        assert np.all(np.isfinite(spec)), spec
        # and the infer.py normalization over it stays NaN-free
        lo, hi = spec.min(), spec.max()
        norm = (spec - lo) / max(hi - lo, 1e-9) * 2 - 1
        assert np.all(np.isfinite(norm))

    def test_floor_does_not_perturb_nondegenerate(self):
        from scipy.fft import fft2, fftshift
        from PIL import Image
        from tfcgan_tpu.ops.fftloss import fft_log_magnitude

        rng = np.random.RandomState(21)
        r255 = rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
        gray = np.asarray(Image.fromarray(r255).convert("L"), np.float32)
        want = np.log(np.abs(fftshift(fft2(gray))))
        x = jnp.asarray(r255.astype(np.float32) / 127.5 - 1.0)[None]
        got = np.asarray(fft_log_magnitude(x))[0]
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


class TestFaceMeshOverlay:
    def test_draw_landmarks_and_directory(self, tmp_path):
        from PIL import Image
        from tfcgan_tpu.evaluation.face_mesh import (
            draw_landmarks, overlay_directory,
        )

        img = np.zeros((32, 32, 3), np.uint8)
        pts = np.array([[8.0, 8.0], [24.0, 8.0], [16.0, 24.0]])
        out = draw_landmarks(img, pts, connections=[(0, 1), (1, 2)])
        assert out.shape == img.shape
        assert out.sum() > 0  # something was drawn
        assert img.sum() == 0  # input untouched

        src = tmp_path / "real_B"
        src.mkdir()
        Image.fromarray(img).save(src / "0001.png")
        # swap-in detector (mediapipe unavailable here)
        fake = lambda image: (pts, [(0, 1)])
        n = overlay_directory(str(src), str(tmp_path / "real_B_mesh"), detector=fake)
        assert n == 1
        assert (tmp_path / "real_B_mesh" / "0001.png").exists()

    def test_mediapipe_gate_raises_cleanly(self):
        import pytest as _pytest
        from tfcgan_tpu.evaluation import face_mesh

        try:
            import mediapipe  # noqa: F401
        except ImportError:
            pass
        else:
            _pytest.skip("mediapipe installed — gate not exercised here")
        with _pytest.raises(ImportError, match="mediapipe"):
            face_mesh.detect_landmarks_mediapipe(np.zeros((8, 8, 3), np.uint8))


class TestDifferencePlot:
    def test_five_panel_figure_written(self, tmp_path):
        from tfcgan_tpu.evaluation.suite import difference_plot

        rng = np.random.RandomState(0)
        a, b, rb = (np.tanh(rng.randn(24, 24, 3)).astype(np.float32) for _ in range(3))
        out = tmp_path / "plots" / "0001.png"
        difference_plot(a, b, rb, str(out))
        assert out.exists() and out.stat().st_size > 0
