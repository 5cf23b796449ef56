"""Affine grid generation + grid sampling (the STN warp), TPU-native.

Replaces torch ``F.affine_grid`` + ``F.grid_sample`` used by the STN flagship
(``/root/reference/TFC-STN/TFCGAN_STN21_Original_NewModel3_Official.py:226-230``,
bicubic/border/align_corners=True) and NeMAR's deformable STN
(``/root/reference/nemar/models/stn/unet_stn.py:173``, bilinear/zeros).

Semantics match torch:
- ``affine_grid(theta, (N,H,W), align_corners)``: normalized (x, y) coords,
  x along W; align_corners=True -> linspace(-1, 1, W).
- ``grid_sample``: modes "bilinear"/"bicubic"/"nearest", padding
  "zeros"/"border"/"reflection". Bicubic uses the cubic convolution kernel
  with A = -0.75, padding applied per tap.

Everything is batched gathers + FMA weight polynomials — XLA fuses the weight
computation; gradients flow to both the source image (scatter-add of gather)
and the grid coordinates (through the fractional part, floor() contributing
zero, exactly as torch).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def affine_grid(theta: jax.Array, size: tuple[int, int, int], align_corners: bool = True) -> jax.Array:
    """theta: (N, 2, 3) -> grid (N, H, W, 2) of normalized (x, y) coords."""
    n, h, w = size
    if align_corners:
        xs = jnp.linspace(-1.0, 1.0, w, dtype=jnp.float32)
        ys = jnp.linspace(-1.0, 1.0, h, dtype=jnp.float32)
    else:
        xs = (2.0 * jnp.arange(w, dtype=jnp.float32) + 1.0) / w - 1.0
        ys = (2.0 * jnp.arange(h, dtype=jnp.float32) + 1.0) / h - 1.0
    gx, gy = jnp.meshgrid(xs, ys)  # (H, W)
    th = theta.astype(jnp.float32)
    # Explicit FMA instead of einsum: on TPU, einsum defaults to bf16 MXU
    # precision, which corrupts pixel coordinates by up to ~0.25 px.
    def row(i):
        return (
            th[:, i, 0][:, None, None] * gx[None]
            + th[:, i, 1][:, None, None] * gy[None]
            + th[:, i, 2][:, None, None]
        )

    return jnp.stack([row(0), row(1)], axis=-1)


def _unnormalize(coord: jax.Array, size: int, align_corners: bool) -> jax.Array:
    if align_corners:
        return (coord + 1.0) * 0.5 * (size - 1)
    return ((coord + 1.0) * size - 1.0) * 0.5


def _reflect(x: jax.Array, lo: float, hi: float) -> jax.Array:
    """torch reflect_coordinates: reflect into [lo, hi] (twice the true range)."""
    span = hi - lo
    x = jnp.abs(x - lo)
    x = jnp.mod(x, 2.0 * span)
    return jnp.where(x > span, 2.0 * span - x, x) + lo


def _apply_padding_coord(ix: jax.Array, size: int, padding_mode: str, align_corners: bool) -> jax.Array:
    if padding_mode == "reflection":
        if align_corners:
            ix = _reflect(ix, 0.0, float(size - 1))
        else:
            ix = _reflect(ix, -0.5, size - 0.5)
        ix = jnp.clip(ix, 0.0, float(size - 1))
    return ix


def _gather_2d(inp: jax.Array, ix: jax.Array, iy: jax.Array, padding_mode: str):
    """Gather inp[n, iy, ix, :] with OOB handling.

    inp: (N, H, W, C); ix, iy: (N, ...) integer arrays.
    Returns (vals (N, ..., C), mask (N, ..., 1) float in {0,1}).
    """
    n, h, w, c = inp.shape
    in_range = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
    ixc = jnp.clip(ix, 0, w - 1)
    iyc = jnp.clip(iy, 0, h - 1)
    flat = inp.reshape(n, h * w, c)
    idx = (iyc * w + ixc).reshape(n, -1)
    vals = jnp.take_along_axis(flat, idx[:, :, None], axis=1)
    vals = vals.reshape(*ix.shape, c)
    mask = in_range.astype(inp.dtype)[..., None]
    if padding_mode == "zeros":
        vals = vals * mask
    # border/reflection: clipped gather already implements the semantics.
    return vals, mask


def grid_sample(
    inp: jax.Array,
    grid: jax.Array,
    mode: str = "bilinear",
    padding_mode: str = "zeros",
    align_corners: bool = False,
) -> jax.Array:
    """inp: (N, H, W, C); grid: (N, Hg, Wg, 2) normalized (x, y) -> (N, Hg, Wg, C)."""
    n, h, w, c = inp.shape
    gx = grid[..., 0].astype(jnp.float32)
    gy = grid[..., 1].astype(jnp.float32)
    ix = _unnormalize(gx, w, align_corners)
    iy = _unnormalize(gy, h, align_corners)
    if mode != "bicubic":
        # torch applies reflection to the base coordinate for nearest/bilinear;
        # bicubic keeps the unnormalized coordinate and bounds each tap instead.
        ix = _apply_padding_coord(ix, w, padding_mode, align_corners)
        iy = _apply_padding_coord(iy, h, padding_mode, align_corners)

    if mode == "nearest":
        jx = jnp.round(ix).astype(jnp.int32)
        jy = jnp.round(iy).astype(jnp.int32)
        vals, _ = _gather_2d(inp, jx, jy, padding_mode)
        return vals

    if mode == "bilinear":
        x0 = jnp.floor(ix)
        y0 = jnp.floor(iy)
        tx = ix - x0
        ty = iy - y0
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        out = 0.0
        for dy, wy in ((0, 1.0 - ty), (1, ty)):
            for dx, wx in ((0, 1.0 - tx), (1, tx)):
                v, _ = _gather_2d(inp, x0i + dx, y0i + dy, padding_mode)
                out = out + v * (wx * wy)[..., None].astype(inp.dtype)
        return out

    if mode == "bicubic":
        x0 = jnp.floor(ix)
        y0 = jnp.floor(iy)
        tx = ix - x0
        ty = iy - y0
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        wx = cubic_coeffs(tx)
        wy = cubic_coeffs(ty)

        def bound_tap(idx, size):
            # torch get_value_bounded: reflect (per padding mode) each tap
            # coordinate, then clip; zeros-mode OOB handled inside _gather_2d.
            if padding_mode == "reflection":
                f = idx.astype(jnp.float32)
                if align_corners:
                    f = _reflect(f, 0.0, float(size - 1))
                else:
                    f = _reflect(f, -0.5, size - 0.5)
                f = jnp.clip(f, 0.0, float(size - 1))
                return jnp.round(f).astype(jnp.int32)
            return idx

        out = 0.0
        for j in range(4):
            row = 0.0
            ty_idx = bound_tap(y0i + j - 1, h)
            for i in range(4):
                tx_idx = bound_tap(x0i + i - 1, w)
                v, _ = _gather_2d(inp, tx_idx, ty_idx, padding_mode)
                row = row + v * wx[i][..., None].astype(inp.dtype)
            out = out + row * wy[j][..., None].astype(inp.dtype)
        return out

    raise ValueError(f"unknown mode {mode!r}")


def cubic_coeffs(t: jax.Array, a: float = -0.75) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Weights for the 4 taps at integer offsets (-1, 0, 1, 2) around t in [0,1).

    Matches torch's get_cubic_upsampling_coefficients with A = -0.75:
      w0 = K(1+t), w1 = K(t), w2 = K(1-t), w3 = K(2-t)
    where K is the Keys cubic convolution kernel.
    """
    def k1(x):  # |x| <= 1
        return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0

    def k2(x):  # 1 < |x| < 2
        return ((a * x - 5.0 * a) * x + 8.0 * a) * x - 4.0 * a

    w0 = k2(t + 1.0)
    w1 = k1(t)
    w2 = k1(1.0 - t)
    w3 = k2(2.0 - t)
    return w0, w1, w2, w3


def warp_affine(
    src: jax.Array,
    theta: jax.Array,
    mode: str = "bicubic",
    padding_mode: str = "border",
    align_corners: bool = True,
) -> jax.Array:
    """The STN flagship warp: per-sample affine_grid + grid_sample
    (``TFC-STN/...Official.py:226-230``). src: (N, H, W, C), theta: (N, 2, 3).
    """
    n, h, w, _ = src.shape
    grid = affine_grid(theta, (n, h, w), align_corners=align_corners)
    return grid_sample(src, grid, mode=mode, padding_mode=padding_mode, align_corners=align_corners)
