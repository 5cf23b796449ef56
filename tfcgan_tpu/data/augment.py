"""On-device augmentations.

The reference's robustness probes apply test-time random h/v flips and
RandomErasing via a dataset variant
(``/root/reference/TFC-STN/datasets_augs_erase.py:25-56``,
``test_TFCGAN_STN21_refine3_randomflips*.py``). Here they are jittable
batch-level ops driven by PRNG keys, usable at train or test time.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def random_hflip(key: jax.Array, x: jax.Array, p: float = 0.5) -> jax.Array:
    """Per-sample horizontal flip. x: (N, H, W, C)."""
    flip = jax.random.uniform(key, (x.shape[0],)) < p
    return jnp.where(flip[:, None, None, None], x[:, :, ::-1, :], x)


def random_vflip(key: jax.Array, x: jax.Array, p: float = 0.5) -> jax.Array:
    flip = jax.random.uniform(key, (x.shape[0],)) < p
    return jnp.where(flip[:, None, None, None], x[:, ::-1, :, :], x)


def random_erasing(
    key: jax.Array,
    x: jax.Array,
    p: float = 0.5,
    scale: tuple[float, float] = (0.02, 0.33),
    ratio: tuple[float, float] = (0.3, 3.3),
    value: float = 0.0,
) -> jax.Array:
    """torchvision-style RandomErasing: per sample, erase one random rectangle
    with probability p (area/aspect sampled from scale/ratio)."""
    n, h, w, _ = x.shape
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    apply = jax.random.uniform(k1, (n,)) < p
    area = jax.random.uniform(k2, (n,), minval=scale[0], maxval=scale[1]) * (h * w)
    log_r = jax.random.uniform(
        k3, (n,), minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1])
    )
    aspect = jnp.exp(log_r)
    eh = jnp.clip(jnp.round(jnp.sqrt(area * aspect)), 1, h - 1).astype(jnp.int32)
    ew = jnp.clip(jnp.round(jnp.sqrt(area / aspect)), 1, w - 1).astype(jnp.int32)
    top = (jax.random.uniform(k4, (n,)) * (h - eh)).astype(jnp.int32)
    left = (jax.random.uniform(k5, (n,)) * (w - ew)).astype(jnp.int32)
    rows = jnp.arange(h)[None, :, None]  # (1, H, 1)
    cols = jnp.arange(w)[None, None, :]  # (1, 1, W)
    in_rect = (
        (rows >= top[:, None, None]) & (rows < (top + eh)[:, None, None])
        & (cols >= left[:, None, None]) & (cols < (left + ew)[:, None, None])
    )
    mask = in_rect & apply[:, None, None]
    return jnp.where(mask[..., None], value, x)


def test_time_augment(key: jax.Array, batch: dict, erase: bool = False) -> dict:
    """The reference's flip(+erase) test-time augmentation applied coherently
    to the A/B pair (same flips on both sides)."""
    kh, kv, ke = jax.random.split(key, 3)
    out = dict(batch)
    for name in ("A", "B"):
        x = out[name]
        x = random_hflip(kh, x)
        x = random_vflip(kv, x)
        if erase:
            x = random_erasing(ke, x)
        out[name] = x
    return out
