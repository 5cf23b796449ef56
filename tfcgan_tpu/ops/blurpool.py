"""Anti-aliased blur-pool (Zhang 2019, "Making Convolutions Shift-Invariant").

The reference uses ``antialiased_cnns.BlurPool(C, stride=s)`` with the default
``filt_size=4`` in every generator/discriminator block (e.g.
``/root/reference/TFC-GAN-FFT/TFCGAN_multigpu_globalFFT.py:111,125,194``).
Semantics reproduced here:

- binomial filter ``[1, 3, 3, 1]`` (outer product, normalized to sum 1),
- reflection padding of (1, 2) on each spatial dim,
- depthwise conv with the given stride (stride 1 = pure blur, used in UNetUp).

TPU-first: expressed as a feature-group-count depthwise ``conv_general_dilated``
in NHWC so XLA lowers it onto the MXU/VPU and fuses the pad.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


@functools.lru_cache(maxsize=None)
def _binomial_1d(filt_size: int) -> tuple[float, ...]:
    row = np.array([1.0])
    for _ in range(filt_size - 1):
        row = np.convolve(row, [1.0, 1.0])
    return tuple(row)


def make_blur_kernel(filt_size: int = 4, dtype=jnp.float32) -> jax.Array:
    """2D normalized binomial blur kernel of shape (filt_size, filt_size)."""
    a = jnp.asarray(_binomial_1d(filt_size), dtype=jnp.float32)
    k = jnp.outer(a, a)
    return (k / jnp.sum(k)).astype(dtype)


def blur_pool(x: jax.Array, stride: int = 2, filt_size: int = 4) -> jax.Array:
    """Blur + subsample. ``x``: (N, H, W, C). Matches antialiased_cnns.BlurPool.

    Reflection-pads (pad_l, pad_r) = ((filt_size-1)//2, ceil((filt_size-1)/2))
    then runs a depthwise conv with ``stride``.
    """
    n, h, w, c = x.shape
    pad_l = (filt_size - 1) // 2
    pad_r = filt_size - 1 - pad_l  # == ceil((filt_size-1)/2)
    xp = jnp.pad(x, ((0, 0), (pad_l, pad_r), (pad_l, pad_r), (0, 0)), mode="reflect")
    k = make_blur_kernel(filt_size, dtype=x.dtype)
    # Depthwise: kernel (H, W, 1, C) with feature_group_count=C in HWIO.
    kernel = jnp.broadcast_to(k[:, :, None, None], (filt_size, filt_size, 1, c))
    return lax.conv_general_dilated(
        xp,
        kernel,
        window_strides=(stride, stride),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
