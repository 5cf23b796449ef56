"""On-device color ops: grayscale, HSV, and torchvision-style ColorJitter.

The reference draws its temperature-triplet *negatives* from
``transforms.ColorJitter(brightness=0.5, contrast=0.75, saturation=1.5,
hue=0.5)(real_B)`` on device each step
(``/root/reference/TFC-GAN-FFT/TFCGAN_multigpu_globalFFT.py:484-487``).
We reimplement torchvision's functional formulas in jnp, applied in [0, 1]
space, with factor sampling and op-order shuffling driven by a JAX PRNG key so
the step stays deterministic under jit/sharding.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# numpy, not jnp: a module-level device constant would initialize the JAX
# backend at import time (importing the library must never touch the device)
_GRAY_W = np.array([0.2989, 0.587, 0.114], dtype=np.float32)


def rgb_to_grayscale(x: jax.Array) -> jax.Array:
    """(..., 3) in [0,1] -> (..., 1). torchvision rgb_to_grayscale weights."""
    return jnp.sum(x * _GRAY_W, axis=-1, keepdims=True)


def rgb_to_hsv(x: jax.Array) -> jax.Array:
    """(..., 3) RGB in [0,1] -> HSV in [0,1] (torchvision _rgb2hsv)."""
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    eqc = maxc == minc
    cr = maxc - minc
    ones = jnp.ones_like(maxc)
    s = cr / jnp.where(eqc, ones, maxc)
    cr_divisor = jnp.where(eqc, ones, cr)
    rc = (maxc - r) / cr_divisor
    gc = (maxc - g) / cr_divisor
    bc = (maxc - b) / cr_divisor
    hr = (maxc == r) * (bc - gc)
    hg = ((maxc == g) & (maxc != r)) * (2.0 + rc - bc)
    hb = ((maxc != g) & (maxc != r)) * (4.0 + gc - rc)
    h = (hr + hg + hb) / 6.0
    h = jnp.mod(h + 1.0, 1.0)
    return jnp.stack([h, s, maxc], axis=-1)


def hsv_to_rgb(x: jax.Array) -> jax.Array:
    """(..., 3) HSV in [0,1] -> RGB (torchvision _hsv2rgb)."""
    h, s, v = x[..., 0], x[..., 1], x[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    i = i.astype(jnp.int32) % 6
    p = jnp.clip(v * (1.0 - s), 0.0, 1.0)
    q = jnp.clip(v * (1.0 - s * f), 0.0, 1.0)
    t = jnp.clip(v * (1.0 - s * (1.0 - f)), 0.0, 1.0)
    i1 = i[..., None]
    idx = jnp.arange(6)
    mask = i1 == idx  # (..., 6)
    r_opts = jnp.stack([v, q, p, p, t, v], axis=-1)
    g_opts = jnp.stack([t, v, v, q, p, p], axis=-1)
    b_opts = jnp.stack([p, p, t, v, v, q], axis=-1)
    r = jnp.sum(r_opts * mask, axis=-1)
    g = jnp.sum(g_opts * mask, axis=-1)
    b = jnp.sum(b_opts * mask, axis=-1)
    return jnp.stack([r, g, b], axis=-1)


def adjust_brightness(x: jax.Array, f: jax.Array) -> jax.Array:
    return jnp.clip(x * f, 0.0, 1.0)


def adjust_contrast(x: jax.Array, f: jax.Array) -> jax.Array:
    # Per-image scalar mean of grayscale (torchvision adjust_contrast).
    mean = jnp.mean(rgb_to_grayscale(x), axis=(-3, -2, -1), keepdims=True)
    return jnp.clip(f * x + (1.0 - f) * mean, 0.0, 1.0)


def adjust_saturation(x: jax.Array, f: jax.Array) -> jax.Array:
    gray = rgb_to_grayscale(x)
    return jnp.clip(f * x + (1.0 - f) * gray, 0.0, 1.0)


def adjust_hue(x: jax.Array, delta: jax.Array) -> jax.Array:
    hsv = rgb_to_hsv(jnp.clip(x, 0.0, 1.0))
    h = jnp.mod(hsv[..., 0] + delta, 1.0)
    return hsv_to_rgb(jnp.stack([h, hsv[..., 1], hsv[..., 2]], axis=-1))


def color_jitter(
    key: jax.Array,
    x: jax.Array,
    brightness: float = 0.5,
    contrast: float = 0.75,
    saturation: float = 1.5,
    hue: float = 0.5,
) -> jax.Array:
    """ColorJitter over a batch (N, H, W, 3) in [-1, 1] -> [-1, 1].

    Factors sampled per batch (one draw per op, like a single torchvision call
    on a batched tensor); op order shuffled per call via lax.switch.
    """
    x01 = jnp.clip(x.astype(jnp.float32) * 0.5 + 0.5, 0.0, 1.0)
    kb, kc, ks, kh, kperm = jax.random.split(key, 5)
    fb = jax.random.uniform(kb, (), minval=max(0.0, 1 - brightness), maxval=1 + brightness)
    fc = jax.random.uniform(kc, (), minval=max(0.0, 1 - contrast), maxval=1 + contrast)
    fs = jax.random.uniform(ks, (), minval=max(0.0, 1 - saturation), maxval=1 + saturation)
    fh = jax.random.uniform(kh, (), minval=-hue, maxval=hue)

    ops = [
        lambda y: adjust_brightness(y, fb),
        lambda y: adjust_contrast(y, fc),
        lambda y: adjust_saturation(y, fs),
        lambda y: adjust_hue(y, fh),
    ]
    order = jax.random.permutation(kperm, 4)

    def apply_i(y, i):
        return jax.lax.switch(i, ops, y), None

    out, _ = jax.lax.scan(apply_i, x01, order)
    return out * 2.0 - 1.0
