"""On-chip patch decomposition (the reference's spatial-scaling mechanism).

The reference slices 4 quadrants in the dataset
(``/root/reference/TFC-GAN-FFT/datasets_temp.py:76-102``) and 16 patches
in-trainer with 16 hand-written slices
(``TFCGAN_multigpu_patchFFT_16P.py:227-253``), row-major over (H-block,
W-block). On TPU this is a single reshape/transpose — XLA folds it into the
surrounding ops; the per-patch losses are then vmapped over the patch axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def patchify(x: jax.Array, grid: int) -> jax.Array:
    """(N, H, W, C) -> (grid*grid, N, H/grid, W/grid, C), row-major patches.

    Patch p = x[:, (p//grid)*ph:(p//grid+1)*ph, (p%grid)*pw:(p%grid+1)*pw, :],
    matching the reference's B1..B16 ordering.
    """
    n, h, w, c = x.shape
    ph, pw = h // grid, w // grid
    x = x.reshape(n, grid, ph, grid, pw, c)
    x = x.transpose(1, 3, 0, 2, 4, 5)  # (gh, gw, N, ph, pw, C)
    return x.reshape(grid * grid, n, ph, pw, c)


def unpatchify(p: jax.Array, grid: int) -> jax.Array:
    """Inverse of :func:`patchify`."""
    gg, n, ph, pw, c = p.shape
    assert gg == grid * grid
    x = p.reshape(grid, grid, n, ph, pw, c)
    x = x.transpose(2, 0, 3, 1, 4, 5)  # (N, gh, ph, gw, pw, C)
    return x.reshape(n, grid * ph, grid * pw, c)


def patch4(x: jax.Array) -> jax.Array:
    """4-quadrant decomposition (B1..B4 of ``datasets_temp.py:99-102``)."""
    return patchify(x, 2)


def patch16(x: jax.Array) -> jax.Array:
    """16-patch decomposition (``make_16_patches``)."""
    return patchify(x, 4)
