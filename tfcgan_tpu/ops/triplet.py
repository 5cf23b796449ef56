"""Triplet margin loss matching torch ``nn.TripletMarginLoss`` exactly.

Used for the patch triplet, temperature triplet, and morphological-gradient
triplet losses (``/root/reference/TFC-GAN-FFT/TFCGAN_multigpu_globalFFT.py:76,82``,
``TFC-STN/TFCGAN_STN21_Original_NewModel3_Official.py:103``).

torch semantics (verified vs torch 2.13): distances are p-norms along the
**last** dimension of ``anchor - other + eps`` with eps=1e-6, then
``relu(d_ap - d_an + margin)`` averaged over all remaining dims.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def triplet_margin_loss(
    anchor: jax.Array,
    positive: jax.Array,
    negative: jax.Array,
    margin: float = 1.0,
    p: float = 2.0,
    eps: float = 1e-6,
    axis: int = -1,
) -> jax.Array:
    """``axis`` selects the norm dimension. torch reduces along its last dim,
    which for the reference's NCHW images is W — callers passing NHWC images
    should use axis=2 to reproduce the reference values (the mean over the
    remaining dims makes the result identical)."""
    a = anchor.astype(jnp.float32)
    pos = positive.astype(jnp.float32)
    neg = negative.astype(jnp.float32)

    def dist(x, y):
        d = x - y + eps
        if p == 2.0:
            # sqrt is non-differentiable at 0; the +eps keeps us off it in
            # practice exactly as torch's pairwise_distance does.
            return jnp.sqrt(jnp.sum(d * d, axis=axis))
        return jnp.sum(jnp.abs(d) ** p, axis=axis) ** (1.0 / p)

    d_ap = dist(a, pos)
    d_an = dist(a, neg)
    return jnp.mean(jnp.maximum(d_ap - d_an + margin, 0.0))
