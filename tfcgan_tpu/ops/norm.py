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

    Statistics accumulate in fp32. For low-precision inputs the E[x²]−μ² form
    avoids materializing an fp32 copy of the activation (measured 6.2→4.0 ms
    for (32,256,256,64) bf16 on v5e); for fp32 inputs the centered two-pass
    form is kept for exactness (torch parity to 1e-5).
    """
    if x.dtype == jnp.float32:
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=(1, 2), keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + eps)
    m = jnp.mean(x, axis=(1, 2), keepdims=True, dtype=jnp.float32)
    m2 = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=(1, 2), keepdims=True)
    var = jnp.maximum(m2 - jnp.square(m), 0.0)
    scale = jax.lax.rsqrt(var + eps).astype(x.dtype)
    return (x - m.astype(x.dtype)) * scale
