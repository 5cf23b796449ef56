"""On-device evaluation metrics.

Mirrors the reference's offline CPU metric suite so eval can run in-loop on
TPU (SURVEY.md §5.5):

- PSNR: ``eval/Eurecom/evaluation_psnr_ssim.py:52-60`` (20*log10(255/sqrt(mse))).
- SSIM: skimage ``structural_similarity`` defaults (uniform 7x7 window,
  K1=0.01, K2=0.03; per-channel then averaged for multichannel).
- Bhattacharyya: ``evaluation_bhatt.py:45-67`` — 8x8x8 RGB histogram,
  L2-normalized (cv2.normalize default), OpenCV HISTCMP_BHATTACHARYYA.
- NCC: ``TFC-STN/evaluation/calc_NCC.py:54-93``.
- Mutual information: ``calc_MI.py`` (20-bin joint histogram).
- FFT magnitude MSE: ``Eurecom_MagMSE.py:91-118`` (MSE of log|fftshift(fft2)|).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tfcgan_tpu.ops.fftloss import fft_log_magnitude


def psnr(real: jax.Array, fake: jax.Array, max_value: float = 255.0) -> jax.Array:
    """Per-image PSNR over uint8-scale images. real/fake: (N, ...) float."""
    axes = tuple(range(1, real.ndim))
    mse = jnp.mean(
        jnp.square(real.astype(jnp.float32) - fake.astype(jnp.float32)), axis=axes
    )
    val = 20.0 * jnp.log10(max_value / jnp.sqrt(mse))
    return jnp.where(mse == 0, 100.0, val)


def _uniform_filter(x: jax.Array, size: int) -> jax.Array:
    """Mean filter with 'valid' boundary over (N, H, W) planes."""
    win = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, size, size), (1, 1, 1), "VALID"
    )
    return win / (size * size)


def ssim(
    real: jax.Array,
    fake: jax.Array,
    data_range: float = 255.0,
    win_size: int = 7,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jax.Array:
    """skimage-default SSIM per image. real/fake: (N, H, W) or (N, H, W, C).

    Uses the uniform filter + sample (ddof=1) covariance normalization that
    skimage applies (cov_norm = NP/(NP-1)), crops the filter margin, and for
    multichannel inputs averages the per-channel scores
    (skimage multichannel=True behavior).
    """
    if real.ndim == 4:
        per_c = [
            ssim(real[..., c], fake[..., c], data_range, win_size, k1, k2)
            for c in range(real.shape[-1])
        ]
        return jnp.mean(jnp.stack(per_c, axis=0), axis=0)

    x = real.astype(jnp.float32)
    y = fake.astype(jnp.float32)
    np_ = win_size * win_size
    cov_norm = np_ / (np_ - 1.0)
    ux = _uniform_filter(x, win_size)
    uy = _uniform_filter(y, win_size)
    uxx = _uniform_filter(x * x, win_size)
    uyy = _uniform_filter(y * y, win_size)
    uxy = _uniform_filter(x * y, win_size)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    a1 = 2.0 * ux * uy + c1
    a2 = 2.0 * vxy + c2
    b1 = ux * ux + uy * uy + c1
    b2 = vx + vy + c2
    s = (a1 * a2) / (b1 * b2)
    # skimage crops pad = (win_size-1)//2 from each side; with VALID filtering
    # the maps are already cropped to (H-win+1, W-win+1) == skimage's interior.
    return jnp.mean(s, axis=(1, 2))


def _hist_rgb8(img: jax.Array) -> jax.Array:
    """uint8-scale RGB (H, W, 3) -> 512-bin joint histogram (8 per channel)."""
    q = jnp.clip(img.astype(jnp.int32) // 32, 0, 7)
    idx = (q[..., 0] * 64 + q[..., 1] * 8 + q[..., 2]).reshape(-1)
    return jnp.zeros((512,), jnp.float32).at[idx].add(1.0)


def bhattacharyya(real: jax.Array, fake: jax.Array) -> jax.Array:
    """OpenCV HISTCMP_BHATTACHARYYA over L2-normalized 8^3 RGB histograms.

    real/fake: (N, H, W, 3) uint8-scale. Returns (N,) distances.
    d = sqrt(1 - sum(sqrt(h1*h2)) / sqrt(mean(h1)*mean(h2)*B^2)), B = 512.
    """

    def one(r, f):
        h1 = _hist_rgb8(r)
        h2 = _hist_rgb8(f)
        h1 = h1 / jnp.maximum(jnp.linalg.norm(h1), 1e-12)
        h2 = h2 / jnp.maximum(jnp.linalg.norm(h2), 1e-12)
        n = h1.shape[0]
        num = jnp.sum(jnp.sqrt(h1 * h2))
        den = jnp.sqrt(jnp.mean(h1) * jnp.mean(h2)) * n
        s = jnp.clip(1.0 - num / jnp.maximum(den, 1e-12), 0.0, None)
        return jnp.sqrt(s)

    return jax.vmap(one)(real, fake)


def ncc(a: jax.Array, b: jax.Array) -> jax.Array:
    """Normalized cross-correlation per image. a/b: (N, H, W) grayscale."""
    axes = (1, 2)
    az = (a - jnp.mean(a, axes, keepdims=True)) / jnp.std(a, axes, keepdims=True)
    bz = (b - jnp.mean(b, axes, keepdims=True)) / jnp.std(b, axes, keepdims=True)
    n = a.shape[1] * a.shape[2]
    return jnp.sum(az * bz, axes) / (n - 1)


def mutual_information(a: jax.Array, b: jax.Array, bins: int = 20) -> jax.Array:
    """MI from a joint histogram (``calc_MI.py``). a/b: (N, H, W) in [0, 1]."""

    def one(x, y):
        # np.histogram2d with `bins` equal-width bins over the data range.
        x = x.reshape(-1)
        y = y.reshape(-1)
        xmin, xmax = jnp.min(x), jnp.max(x)
        ymin, ymax = jnp.min(y), jnp.max(y)
        xi = jnp.clip(((x - xmin) / jnp.maximum(xmax - xmin, 1e-12) * bins).astype(jnp.int32), 0, bins - 1)
        yi = jnp.clip(((y - ymin) / jnp.maximum(ymax - ymin, 1e-12) * bins).astype(jnp.int32), 0, bins - 1)
        h = jnp.zeros((bins * bins,), jnp.float32).at[xi * bins + yi].add(1.0)
        pxy = h / jnp.sum(h)
        pxy = pxy.reshape(bins, bins)
        px = jnp.sum(pxy, axis=1, keepdims=True)
        py = jnp.sum(pxy, axis=0, keepdims=True)
        pxpy = px * py
        nz = pxy > 0
        ratio = jnp.where(nz, pxy / jnp.where(nz, pxpy, 1.0), 1.0)
        return jnp.sum(jnp.where(nz, pxy * jnp.log(ratio), 0.0))

    return jax.vmap(one)(a, b)


def fft_mag_mse(real: jax.Array, fake: jax.Array) -> jax.Array:
    """Spectral-parity metric: MSE of log-magnitude spectra
    (``Eurecom_MagMSE.py:91-118``). real/fake: (N, H, W, 3) in [-1, 1]."""
    mr = fft_log_magnitude(real)
    mf = fft_log_magnitude(fake)
    return jnp.mean(jnp.square(mr - mf), axis=(1, 2))


def fft_mag_mae(real: jax.Array, fake: jax.Array) -> jax.Array:
    """The ``Eurecom_MagOther.py`` "other" spectral metric: MAE of
    log-magnitude spectra (``other_spec``/``my_wimage_fft``:
    sklearn ``mean_absolute_error(log|fftshift(fft2(gray))|)``; the script's
    skimage ``window`` import is dead code — no window is ever applied).
    real/fake: (N, H, W, 3) in [-1, 1]."""
    mr = fft_log_magnitude(real)
    mf = fft_log_magnitude(fake)
    return jnp.mean(jnp.abs(mr - mf), axis=(1, 2))
