"""On-device image resize.

The reference resizes with PIL bicubic on host (``datasets_temp.py:59-63``);
the data pipeline keeps that host path for bit-parity, but augmentation /
multi-scale discriminators (ThermalGAN pyramid) need an in-graph resize.
``jax.image.resize`` uses the Keys cubic kernel with antialiasing on
downsample — the same family as PIL bicubic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def resize_bicubic_torch(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """x: (N, H, W, C) -> (N, out_h, out_w, C), cubic interpolation."""
    n, _, _, c = x.shape
    return jax.image.resize(x, (n, out_hw[0], out_hw[1], c), method="cubic")


def avg_pool_2x(x: jax.Array) -> jax.Array:
    """ThermalGAN's downsample between pyramid discriminators
    (``/root/reference/ThermalGAN/ThermalGAN.py`` MultiDiscriminator):
    nn.AvgPool2d(3, stride=2, padding=[1, 1], count_include_pad=False).
    """
    n, h, w, c = x.shape
    ones = jnp.ones_like(x)
    sum_ = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    cnt = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    return sum_ / cnt
