"""Grayscale morphology on TPU via ``lax.reduce_window``.

The STN flagship's morphological-gradient triplet loss uses
``kornia.morphology.gradient(x, kernel)`` with a 3x3 cross kernel
(``/root/reference/TFC-STN/TFCGAN_STN21_Original_NewModel3_Official.py:444-459``).
kornia semantics: flat structuring element (positions where kernel != 0),
gradient = dilation - erosion, 'geodesic' border (pad -inf for dilation,
+inf for erosion, i.e. borders only see valid pixels).

TPU-first trick: the 3x3 cross neighborhood is the union of a 3x1 and a 1x3
window, so dilation = max(maxpool_3x1, maxpool_1x3) — two cheap rank-1
reduce_windows instead of an 8-neighborhood gather.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _pool_cross(x: jax.Array, init: float, op) -> jax.Array:
    """Reduce over the 3x3 cross neighborhood of each pixel. x: (N, H, W, C)."""
    v = lax.reduce_window(
        x, init, op, window_dimensions=(1, 3, 1, 1), window_strides=(1, 1, 1, 1),
        padding=((0, 0), (1, 1), (0, 0), (0, 0)),
    )
    h = lax.reduce_window(
        x, init, op, window_dimensions=(1, 1, 3, 1), window_strides=(1, 1, 1, 1),
        padding=((0, 0), (0, 0), (1, 1), (0, 0)),
    )
    return op(v, h)


def gray_dilation(x: jax.Array) -> jax.Array:
    """Flat dilation with the 3x3 cross, geodesic border. x: (N, H, W, C)."""
    return _pool_cross(x, -jnp.inf, lax.max)


def gray_erosion(x: jax.Array) -> jax.Array:
    """Flat erosion with the 3x3 cross, geodesic border."""
    return _pool_cross(x, jnp.inf, lax.min)


def morphological_gradient(x: jax.Array) -> jax.Array:
    """kornia ``morph.gradient`` with the cross kernel: dilation − erosion."""
    return gray_dilation(x) - gray_erosion(x)
