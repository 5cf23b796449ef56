"""Per-pixel temperature maps, fully in-graph.

The reference builds ``T = np.linspace(24, 38, 256)`` and maps each uint8 red-
channel value through a dict via ``np.searchsorted``
(``/root/reference/TFC-GAN-FFT/datasets_temp.py:14-35,43-44``), leaving the
device per-sample inside the train loop (``TFCGAN_multigpu_globalFFT.py:233-241``).
linspace(24, 38, 256)[i] == 24 + 14*i/255, so the LUT is affine — on TPU it's
a single fused multiply-add, no gather needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tfcgan_tpu.ops.quantize import quantize_uint8_torch

TEMP_MIN_C = 24.0
TEMP_MAX_C = 38.0


def temperature_lut(x: jax.Array, mode: str = "exact") -> jax.Array:
    """Thermal image -> Celsius map using the reference's red-channel LUT.

    x: (N, H, W, C) normalized to [-1, 1] (any C >= 1; red channel used,
    matching ``make_pixel_vectors``'s ``img[:, :, 0]``).
    Returns (N, H, W) float32 temperatures in [24, 38].

    mode="exact":  torch ToPILImage uint8 emulation (wraps negatives), zero
                   gradient — matches ``vectorize_temps`` on fake images.
    mode="smooth": differentiable affine map of the red channel.
    """
    scale = (TEMP_MAX_C - TEMP_MIN_C) / 255.0
    red = x[..., 0]
    if mode == "exact":
        v = quantize_uint8_torch(red)
    elif mode == "smooth":
        v = (red.astype(jnp.float32) * 0.5 + 0.5) * 255.0
    else:
        raise ValueError(f"unknown mode {mode!r}")
    return TEMP_MIN_C + v * scale


def temperature_lut_uint8(img_uint8: jax.Array) -> jax.Array:
    """uint8 (or uint8-valued float) red channel -> Celsius, for real images.

    Matches the dataset-side ``TempVector_PyTorch`` applied to the un-normalized
    PIL image (``datasets_temp.py:66-67``).
    """
    scale = (TEMP_MAX_C - TEMP_MIN_C) / 255.0
    return TEMP_MIN_C + img_uint8.astype(jnp.float32) * scale
