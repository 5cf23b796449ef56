"""Fixed (parameter-free) perceptual anchor: multi-scale L1 + NCC pyramid.

Why this exists: the reference's perceptual term is pretrained-VGG LPIPS
(``/root/reference/TFC-GAN-FFT/TFCGAN_multigpu_globalFFT.py:71-74,492``;
``/root/reference/TFC-STN/TFCGAN_STN21_Original_NewModel3_Official.py:637-639``),
but pretrained weights cannot be downloaded in a zero-egress environment and a
*random*-weight LPIPS is measured to be noise that collapses the VTF-STN
recipe (theta drifts off-image — tools/train_smoke_stn_tpu.py, round 1).

This module provides a deterministic, non-degenerate substitute: an image
pyramid (avg-pool /2 per level) scored with L1 plus (1 − NCC) per level.
The NCC term is contrast/brightness-invariant — the property that makes the
reference's registration metrics (``TFC-STN/evaluation/calc_NCC.py:54-93``)
meaningful across the visible/thermal gap — and the coarse pyramid levels
give smooth, long-range gradients that anchor the STN the way LPIPS' deep
layers do. Recipes use it when no converted LPIPS weights are supplied
(see ``models/lpips.py`` + ``tools/convert_lpips.py`` for the real thing).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _avg_pool2(x: jax.Array) -> jax.Array:
    """2x2/2 average pool on NHWC."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    return x.mean(axis=(2, 4))


def ncc_loss(x: jax.Array, y: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Per-image normalized cross-correlation over all pixels+channels.

    Loss-grade NCC: NHWC inputs, eps-guarded denominator (the eval-grade
    ``ops.metrics.ncc`` matches the reference's ``calc_NCC.py:54-93`` exactly
    and may divide by zero on constant images). Returns (N,) in [-1, 1].
    """
    x = x.astype(jnp.float32).reshape(x.shape[0], -1)
    y = y.astype(jnp.float32).reshape(y.shape[0], -1)
    xm = x - x.mean(axis=1, keepdims=True)
    ym = y - y.mean(axis=1, keepdims=True)
    num = (xm * ym).mean(axis=1)
    den = jnp.sqrt((xm * xm).mean(axis=1) * (ym * ym).mean(axis=1))
    return num / (den + eps)


def multiscale_recon(x: jax.Array, y: jax.Array, levels: int = 4) -> jax.Array:
    """Σ_levels [ mean|x−y| + 0.5·(1 − NCC(x, y)) ], scalar.

    ``levels`` counts pyramid levels including full resolution; each level
    halves H and W. All reductions in fp32 (bf16-safe).
    """
    total = jnp.zeros((), jnp.float32)
    for lv in range(levels):
        total = total + jnp.mean(
            jnp.abs(x.astype(jnp.float32) - y.astype(jnp.float32))
        ) + 0.5 * jnp.mean(1.0 - ncc_loss(x, y))
        if lv + 1 < levels:
            x, y = _avg_pool2(x), _avg_pool2(y)
    return total
