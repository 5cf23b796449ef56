"""In-graph emulation of the reference's host-side image quantization.

The reference losses leave the device per sample:
``transforms.ToPILImage()(x).convert("L")`` inside ``fft_components``
(``/root/reference/TFC-GAN-FFT/TFCGAN_multigpu_globalFFT.py:266-284``) and
``.convert("RGB")`` inside ``vectorize_temps`` (``:233-241``). To bit-match
those loss values on TPU we emulate the two host steps in-graph:

1. ``ToPILImage`` on a float tensor does ``pic.mul(255).byte()`` — truncation
   toward zero then wrap-around mod 256 (verified against torch 2.13: −1.0 → 1,
   −0.5 → 129, 0.999 → 254).
2. ``PIL.Image.convert("L")`` computes ITU-R 601 luma in fixed point:
   ``(R*19595 + G*38470 + B*7471 + 0x8000) >> 16`` (verified against PIL 12).

Both are zero-gradient (the reference detaches to numpy, so its FFT/temp loss
terms contribute no generator gradient either). ``mode="smooth"`` variants give
a differentiable relaxation (no quantization, float luma) for when the losses
should actually train the generator.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_LUMA_R, _LUMA_G, _LUMA_B = 19595.0, 38470.0, 7471.0  # /65536 fixed point


def quantize_uint8_torch(x: jax.Array) -> jax.Array:
    """float in (nominally) [0,1] -> float uint8 value, torch ToPILImage exact.

    trunc(x*255) wrapped mod 256. Returns float32 values in [0, 255].
    Zero gradient (wrapped in stop_gradient).
    """
    v = jnp.trunc(x.astype(jnp.float32) * 255.0)
    v = jnp.mod(v, 256.0)
    return jax.lax.stop_gradient(v)


def luma_pil(rgb_uint8: jax.Array) -> jax.Array:
    """uint8-valued float RGB (..., 3) -> PIL-exact L values (...,) in [0,255]."""
    r = rgb_uint8[..., 0]
    g = rgb_uint8[..., 1]
    b = rgb_uint8[..., 2]
    acc = r * _LUMA_R + g * _LUMA_G + b * _LUMA_B + 32768.0
    return jnp.floor(acc / 65536.0)


def rgb_to_luma_uint8(x: jax.Array, mode: str = "exact") -> jax.Array:
    """Normalized image (N, H, W, 3) in [-1, 1] -> grayscale plane (N, H, W).

    mode="exact":  emulates ToPILImage + convert("L") bit-exactly ([0,255],
                   zero gradient) — parity with the reference loss values.
    mode="smooth": differentiable: maps [-1,1] -> [0,255] floats and applies
                   the luma weights without quantization.
    """
    if mode == "exact":
        u8 = quantize_uint8_torch(x)
        return luma_pil(u8)
    elif mode == "smooth":
        v = (x.astype(jnp.float32) * 0.5 + 0.5) * 255.0
        return (
            v[..., 0] * (_LUMA_R / 65536.0)
            + v[..., 1] * (_LUMA_G / 65536.0)
            + v[..., 2] * (_LUMA_B / 65536.0)
        )
    elif mode == "eval":
        # the OFFLINE-EVAL path: a [-1,1] image saved to PNG
        # (clip(round((x·0.5+0.5)·255))) and re-read as uint8, then
        # grayscaled. Distinct from "exact", which reproduces the TRAINING
        # losses' ToPILImage-on-[-1,1] wraparound quirk — eval scripts
        # (``eval/Eurecom/*MagMSE*.py``, ``Eurecom_MagOther.py``) never see
        # wrapped values because they read files from disk.
        v = (x.astype(jnp.float32) * 0.5 + 0.5) * 255.0
        u8 = jnp.clip(jnp.round(v), 0.0, 255.0)
        return jax.lax.stop_gradient(luma_pil(u8))
    raise ValueError(f"unknown mode {mode!r}")
