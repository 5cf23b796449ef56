"""Laplacian-of-Gaussian saliency mask (the "Gaussian mask" experiment).

Rebuilds ``mask_maker`` from
``TFC-GAN-FFT/TFCGAN_multigpu_patchFFT_experiment.py:385-390``:

    mask = kornia.filters.laplacian(rgb_to_grayscale(img), 7).abs()
    mask = (mask - mask.min()) / (mask.max() - mask.min())   # global min/max
    mask = gaussian_blur2d(mask, (9, 9), (1.6, 1.6))
    mask = mask / mask.max()                                  # global max

kornia semantics reproduced here: grayscale = 0.299 R + 0.587 G + 0.114 B;
the Laplacian kernel is all-ones with center ``1 - k²``, normalized by its
absolute sum (``normalize_kernel2d``); the Gaussian kernel is the sampled
``exp(-x²/2σ²)`` normalized to sum 1, applied separably; all filters use
reflect border padding. The min/max normalizations are over the WHOLE batch
tensor — a batch-coupling quirk of the reference that is kept (the mask is a
saliency signal, not a per-sample statistic).

Everything is a few depthwise convs — XLA fuses this into the surrounding
step; mask math runs in fp32 regardless of compute dtype.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _filter2d_reflect(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """Depthwise 2-D filter with reflect padding. x: (N,H,W,1) fp32."""
    kh, kw = kernel.shape
    x = jnp.pad(
        x, ((0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2), (0, 0)),
        mode="reflect",
    )
    k = kernel.astype(jnp.float32)[:, :, None, None]  # HWIO
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )


def laplacian_kernel2d(size: int) -> jax.Array:
    """kornia get_laplacian_kernel2d + normalize_kernel2d: ones with center
    ``1 - size²``, divided by the kernel's absolute sum."""
    k = jnp.ones((size, size), jnp.float32)
    k = k.at[size // 2, size // 2].set(1.0 - size * size)
    return k / jnp.sum(jnp.abs(k))


def gaussian_kernel1d(size: int, sigma: float) -> jax.Array:
    """kornia get_gaussian_kernel1d: sampled Gaussian normalized to sum 1."""
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x**2) / (2.0 * sigma * sigma))
    return g / jnp.sum(g)


def rgb_to_grayscale_kornia(img: jax.Array) -> jax.Array:
    """kornia rgb_to_grayscale: 0.299/0.587/0.114. (N,H,W,3) -> (N,H,W,1).

    Deliberately named: ``ops.color``'s torchvision lineage uses 0.2989 —
    don't mix the two in parity paths."""
    w = jnp.asarray([0.299, 0.587, 0.114], jnp.float32)
    return jnp.sum(img.astype(jnp.float32) * w, axis=-1, keepdims=True)


def gaussian_blur(x: jax.Array, size: int, sigma: float) -> jax.Array:
    """Separable Gaussian blur with reflect border (kornia gaussian_blur2d)."""
    g = gaussian_kernel1d(size, sigma)
    x = _filter2d_reflect(x, g[None, :])  # along W
    return _filter2d_reflect(x, g[:, None])  # along H


def saliency_mask(img: jax.Array) -> jax.Array:
    """|Laplacian₇(gray)| → global minmax → Gaussian₉,₁.₆ → /max.

    img: (N,H,W,C) in [-1,1] (or any range — the mask is scale-normalized).
    Returns (N,H,W,1) fp32 in [0,1].
    """
    gray = rgb_to_grayscale_kornia(img) if img.shape[-1] == 3 else img.astype(jnp.float32)
    lap = jnp.abs(_filter2d_reflect(gray, laplacian_kernel2d(7)))
    lo, hi = jnp.min(lap), jnp.max(lap)
    norm = (lap - lo) / jnp.maximum(hi - lo, 1e-12)
    blur = gaussian_blur(norm, 9, 1.6)
    return blur / jnp.maximum(jnp.max(blur), 1e-12)
