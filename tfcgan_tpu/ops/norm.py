"""Instance norm matching torch ``nn.InstanceNorm2d`` defaults.

The reference uses ``nn.InstanceNorm2d(C)`` with default ``affine=False,
track_running_stats=False, eps=1e-5`` in every UNet block
(``/root/reference/TFC-GAN-FFT/TFCGAN_multigpu_globalFFT.py:109,126``): a pure
per-(sample, channel) standardization over the spatial dims, no parameters.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def instance_norm(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """x: (N, H, W, C). Normalizes each (n, c) plane over (H, W).

    Statistics are computed in fp32 for bf16 stability, result cast back.
    """
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 2), keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    return out.astype(x.dtype)
