"""2×2/stride-2 max-pool with an elementwise backward (OPT-IN).

``nn.max_pool``'s VJP lowers to XLA's SelectAndScatter thunk; VGG16's four
pools sit on the LPIPS backward path of every FFT-family G step
(``/root/reference/TFC-GAN-FFT/TFCGAN_multigpu_globalFFT.py:71-74,492`` —
LPIPS is the reference's heaviest loss term). For the non-overlapping 2×2/2
window the scatter is just "route the cotangent to the first max of each
2×2 block": a reshape + compare + where, all fusable elementwise work.

**Measured in situ it is a REGRESSION** (same lesson as the Pallas
blur-pool): the fft_glo b128 full step went 396 → 424.5 ms/step on v5e
(bench 322.96 → 302.93 img/s, confirmed by the device-timeline profile).
The (N, H/2, 2, W/2, 2, C) reshape splits W — a minor, lane-adjacent dim —
so Mosaic inserts relayout copies that cost more than SelectAndScatter
saves. ``pool22`` therefore dispatches to XLA's ``nn.max_pool`` by default;
set ``TFCGAN_ELEMENTWISE_MAXPOOL=1`` to opt in (e.g. on backends where
SelectAndScatter is the bottleneck).

Forward is bit-identical to ``nn.max_pool``. Backward matches XLA's (and
torch's) tie rule — the FIRST maximum in row-major window order wins —
verified against ``jax.grad`` of ``nn.max_pool`` including crafted ties
(tests/test_ops_basic.py::TestMaxPool22).
"""

from __future__ import annotations

import os

import flax.linen as nn
import jax
import jax.numpy as jnp


def _windows(h: jax.Array) -> jax.Array:
    n, hh, ww, c = h.shape
    return h.reshape(n, hh // 2, 2, ww // 2, 2, c)


@jax.custom_vjp
def max_pool22(h: jax.Array) -> jax.Array:
    """(N, H, W, C) -> (N, H/2, W/2, C); H and W must be even."""
    return jnp.max(_windows(h), axis=(2, 4))


def _fwd(h):
    return max_pool22(h), h


def _bwd(h, g):
    n, hh, ww, c = h.shape
    w = _windows(h)
    y = jnp.max(w, axis=(2, 4), keepdims=True)  # recomputed; fuses into bwd
    eq = w == y
    # first max in row-major window order (flat index 2·dy + dx), matching
    # SelectAndScatter's GE scan and torch's max_pool2d indices
    idx = 2 * jax.lax.broadcasted_iota(jnp.int32, (1, 1, 2, 1, 2, 1), 2) \
        + jax.lax.broadcasted_iota(jnp.int32, (1, 1, 2, 1, 2, 1), 4)
    first = jnp.min(jnp.where(eq, idx, 4), axis=(2, 4), keepdims=True)
    gw = jnp.where(eq & (idx == first), g[:, :, None, :, None, :], 0)
    return (gw.reshape(n, hh, ww, c).astype(h.dtype),)


max_pool22.defvjp(_fwd, _bwd)


def pool22(h: jax.Array) -> jax.Array:
    """2×2/2 max-pool; XLA ``nn.max_pool`` unless TFCGAN_ELEMENTWISE_MAXPOOL=1.

    Read at trace time (like TFCGAN_PALLAS_BLUR); both paths are bit-identical
    in forward and gradient, so the flag is purely a performance knob.
    """
    if os.environ.get("TFCGAN_ELEMENTWISE_MAXPOOL", "0") == "1":
        return max_pool22(h)
    return nn.max_pool(h, (2, 2), strides=(2, 2))
