"""Dense-flow bilinear grid_sample as a Pallas TPU one-hot-matmul kernel.

Why a kernel: NeMAR's deformable STN warps full-resolution images through
torch ``F.grid_sample`` with a *dense* (per-pixel) flow field
(``/root/reference/nemar/models/stn/unet_stn.py:164-178``), and XLA lowers
that gather catastrophically on TPU: the two grid_sample calls in the NeMAR
G step account for 1552 GiB of HBM traffic at batch 16 — ~250x the tensors'
actual footprint — because the TPU gather thunk re-reads whole image rows per
output index (tools/cost_nemar.py). The affine separable kernel
(``resample.py``) cannot help: a dense flow has no row/column shear
decomposition.

TPU-native redesign — there is NO dynamic gather anywhere. For one output
row (W_out pixels) of one sample, with per-pixel source coordinates
(y, x) = (y0+ty, x0+tx):

- x-contraction on the MXU: ``tmp[h, p] = sum_x X[h, x] * Wx[x, p]`` where
  ``Wx[x, p] = (x==x0_p)(1-tx_p) + (x==x0_p+1) tx_p`` is a 2-tap one-hot
  built from an iota compare (VPU) — a plain (H, W_in) @ (W_in, W_out)
  matmul. It resamples EVERY input row at every output pixel's x position.
- y-contraction on the VPU: ``out[p] = sum_h Wy[h, p] * tmp[h, p]`` with the
  same 2-tap one-hot structure over rows — multiply + sublane reduce.

Out-of-range taps match no iota value, so zeros padding falls out naturally;
border padding clamps the tap indices before the compare (both taps clamping
to the same pixel sum to weight 1, exactly torch's behaviour). The custom
VJP is exact and is built from the same pieces:

- image adjoint:      ``X̄ = (Wy ⊙ ḡ) @ Wxᵀ``      (another matmul),
- coordinate grads:   ``t̄y = Σ (dWy ⊙ (X @ Wx)) ḡ``,  ``t̄x = Σ (Wy ⊙ (X @ dWx)) ḡ``
  with ``dW = onehot(tap1) − onehot(tap0)`` — torch's grid_sample backward
  (zero for clamped border taps, zero outside the image for zeros padding).

The matmul does 2·H·W_in·W_out FLOPs per output row against 4 useful taps —
but it rides the MXU instead of the gather thunk: the NeMAR G step drops
from 752.7 to a few tens of GiB accessed at b16 (see BASELINE.md).

On the CPU backend ``grid_sample_dense`` falls back to the torch-exact
``ops.warp.grid_sample`` (XLA's CPU gather is fine); the kernel itself is
validated in interpret mode by tests/test_pallas_gridsample.py and under
real Mosaic lowering by tools/aot_compile_check.py.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tfcgan_tpu.ops.pallas_kernels.dispatch import default_interpret


def _taps(coord, size: int, border: bool):
    """floor/frac decomposition + the two (possibly clamped) tap indices."""
    c0f = jnp.floor(coord)
    t = coord - c0f
    c0 = c0f.astype(jnp.int32)
    if border:
        return jnp.clip(c0, 0, size - 1), jnp.clip(c0 + 1, 0, size - 1), t
    return c0, c0 + 1, t


def _onehots(x_ref_shape, iy, ix, h, w, border):
    """Build Wxᵀ (W_in, W_out), Wyᵀ (H_in, W_out) and their d/dt variants."""
    hp, wp = x_ref_shape
    wgp = ix.shape[1]
    x0, x1, tx = _taps(ix, w, border)
    y0, y1, ty = _taps(iy, h, border)
    cols = jax.lax.broadcasted_iota(jnp.int32, (wp, wgp), 0)
    rows = jax.lax.broadcasted_iota(jnp.int32, (hp, wgp), 0)
    ex0 = (cols == x0).astype(jnp.float32)
    ex1 = (cols == x1).astype(jnp.float32)
    ey0 = (rows == y0).astype(jnp.float32)
    ey1 = (rows == y1).astype(jnp.float32)
    wxt = ex0 * (1.0 - tx) + ex1 * tx
    wyt = ey0 * (1.0 - ty) + ey1 * ty
    return wxt, wyt, ex1 - ex0, ey1 - ey0


def _mm(a, b):  # (M, K) @ (K, N) on the MXU, fp32 accumulation
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _mm_t(a, b):  # (M, K) @ (N, K)ᵀ -> (M, N)
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


_RB = 8  # output rows per kernel invocation (sublane-aligned block height)


def _fwd_kernel(x_ref, iy_ref, ix_ref, out_ref, *, h, w, c, border):
    ximg = x_ref[0]  # (Hp, C*Wp) fp32
    wp = ximg.shape[1] // c
    rows = []
    for ri in range(_RB):
        wxt, wyt, _, _ = _onehots(
            (ximg.shape[0], wp),
            iy_ref[0, ri : ri + 1], ix_ref[0, ri : ri + 1], h, w, border,
        )
        outs = []
        for ci in range(c):
            tmp = _mm(ximg[:, ci * wp : (ci + 1) * wp], wxt)  # (Hp, Wgp)
            outs.append(jnp.sum(wyt * tmp, axis=0, keepdims=True))
        rows.append(jnp.concatenate(outs, axis=1))
    out_ref[0] = jnp.concatenate(rows, axis=0)


def _bwd_kernel(
    x_ref, iy_ref, ix_ref, g_ref, xbar_ref, tybar_ref, txbar_ref, *, h, w, c, border
):
    r = pl.program_id(1)
    ximg = x_ref[0]
    hp = ximg.shape[0]
    wp = ximg.shape[1] // c
    wgp = ix_ref.shape[2]
    g = g_ref[0]  # (RB, C*Wgp)
    xb = jnp.zeros((hp, c * wp), jnp.float32)
    ty_rows, tx_rows = [], []
    for ri in range(_RB):
        wxt, wyt, dwxt, dwyt = _onehots(
            (hp, wp),
            iy_ref[0, ri : ri + 1], ix_ref[0, ri : ri + 1], h, w, border,
        )
        ty_acc = jnp.zeros((1, wgp), jnp.float32)
        tx_acc = jnp.zeros((1, wgp), jnp.float32)
        xbar_parts = []
        for ci in range(c):
            xc = ximg[:, ci * wp : (ci + 1) * wp]
            gc = g[ri : ri + 1, ci * wgp : (ci + 1) * wgp]
            tmp = _mm(xc, wxt)   # fwd x-resample (recomputed, stays in VMEM)
            xd = _mm(xc, dwxt)   # d tmp / d tx
            ty_acc = ty_acc + jnp.sum(dwyt * tmp, axis=0, keepdims=True) * gc
            tx_acc = tx_acc + jnp.sum(wyt * xd, axis=0, keepdims=True) * gc
            xbar_parts.append(_mm_t(wyt * gc, wxt))  # (Hp, Wp)
        xb = xb + jnp.concatenate(xbar_parts, axis=1)
        ty_rows.append(ty_acc)
        tx_rows.append(tx_acc)

    @pl.when(r == 0)
    def _():
        xbar_ref[0] = xb

    @pl.when(r > 0)
    def _():
        xbar_ref[0] = xbar_ref[0] + xb

    tybar_ref[0] = jnp.concatenate(ty_rows, axis=0)
    txbar_ref[0] = jnp.concatenate(tx_rows, axis=0)


def _pad_lanes(n: int) -> int:
    return -(-n // 128) * 128


def _specs(n_grid, hp, cwp, wgp, c):
    ximg_spec = pl.BlockSpec((1, hp, cwp), lambda n, r: (n, 0, 0), memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, _RB, wgp), lambda n, r: (n, r, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, _RB, c * wgp), lambda n, r: (n, r, 0), memory_space=pltpu.VMEM)
    return ximg_spec, row_spec, out_spec


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _sample_padded(ximg, iy, ix, h, w, c, border, interpret):
    """ximg: (N, Hp, C*Wp) fp32 channel-major lanes; iy/ix: (N, Hg, Wgp) pixel
    coords (lanes beyond the true grid width padded with -2). Returns
    (N, Hg, C*Wgp) fp32."""
    n, hg, wgp = iy.shape
    _, hp, cwp = ximg.shape
    ximg_spec, row_spec, out_spec = _specs(n, hp, cwp, wgp, c)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, h=h, w=w, c=c, border=border),
        out_shape=jax.ShapeDtypeStruct((n, hg, c * wgp), jnp.float32),
        grid=(n, hg // _RB),
        in_specs=[ximg_spec, row_spec, row_spec],
        out_specs=out_spec,
        interpret=interpret,
    )(ximg, iy, ix)


def _sp_fwd(ximg, iy, ix, h, w, c, border, interpret):
    return _sample_padded(ximg, iy, ix, h, w, c, border, interpret), (ximg, iy, ix)


def _sp_bwd(h, w, c, border, interpret, res, g):
    ximg, iy, ix = res
    n, hg, wgp = iy.shape
    _, hp, cwp = ximg.shape
    ximg_spec, row_spec, out_spec = _specs(n, hp, cwp, wgp, c)
    xbar, tybar, txbar = pl.pallas_call(
        functools.partial(_bwd_kernel, h=h, w=w, c=c, border=border),
        out_shape=[
            jax.ShapeDtypeStruct((n, hp, cwp), jnp.float32),
            jax.ShapeDtypeStruct((n, hg, wgp), jnp.float32),
            jax.ShapeDtypeStruct((n, hg, wgp), jnp.float32),
        ],
        grid=(n, hg // _RB),
        in_specs=[ximg_spec, row_spec, row_spec, out_spec],
        out_specs=[ximg_spec, row_spec, row_spec],
        interpret=interpret,
    )(ximg, iy, ix, g)
    return xbar, tybar, txbar


_sample_padded.defvjp(_sp_fwd, _sp_bwd)


def _sample_pix(inp, iy, ix, border: bool, interpret: bool):
    """inp: (N, H, W, C); iy/ix: (N, Hg, Wg) absolute pixel coords."""
    n, h, w, c = inp.shape
    _, hg, wg = iy.shape
    wp, wgp, hp = _pad_lanes(w), _pad_lanes(wg), -(-h // 8) * 8
    hgp = -(-hg // _RB) * _RB
    ximg = jnp.transpose(inp.astype(jnp.float32), (0, 1, 3, 2))  # (N, H, C, W)
    ximg = jnp.pad(ximg, ((0, 0), (0, hp - h), (0, 0), (0, wp - w)))
    ximg = ximg.reshape(n, hp, c * wp)
    # pad rows/lanes carry coord -2 (off-image); their outputs are sliced off
    # and their cotangents are zero, so xbar sees no pad contribution.
    iyp = jnp.pad(iy.astype(jnp.float32),
                  ((0, 0), (0, hgp - hg), (0, wgp - wg)), constant_values=-2.0)
    ixp = jnp.pad(ix.astype(jnp.float32),
                  ((0, 0), (0, hgp - hg), (0, wgp - wg)), constant_values=-2.0)
    out = _sample_padded(ximg, iyp, ixp, h, w, c, border, interpret)
    out = out[:, :hg].reshape(n, hg, c, wgp)[..., :wg]
    return jnp.transpose(out, (0, 1, 3, 2))  # (N, Hg, Wg, C)


def grid_sample_dense(
    inp: jax.Array,
    grid: jax.Array,
    mode: str = "bilinear",
    padding_mode: str = "zeros",
    align_corners: bool = False,
    interpret: bool | None = None,
) -> jax.Array:
    """Drop-in for ``ops.warp.grid_sample`` (bilinear) for dense flow fields.

    inp: (N, H, W, C); grid: (N, Hg, Wg, 2) normalized (x, y). On the CPU
    backend (host test meshes) this dispatches to the torch-exact XLA path —
    CPU gather is efficient and keeps host-mesh numerics reference-exact.
    """
    if mode != "bilinear":
        raise ValueError("grid_sample_dense implements bilinear only")
    from tfcgan_tpu.ops import warp

    if interpret is None:
        env = os.environ.get("TFCGAN_PALLAS_INTERPRET", "auto").lower()
        if jax.default_backend() == "cpu" and env in ("auto", ""):
            # host meshes: CPU gather is fine — keep numerics torch-exact.
            # An explicit "1" still runs the kernel (interpret) end-to-end.
            return warp.grid_sample(
                inp, grid, mode=mode, padding_mode=padding_mode,
                align_corners=align_corners,
            )
        interpret = default_interpret()
    n, h, w, _ = inp.shape
    gx = grid[..., 0].astype(jnp.float32)
    gy = grid[..., 1].astype(jnp.float32)
    ix = warp._unnormalize(gx, w, align_corners)
    iy = warp._unnormalize(gy, h, align_corners)
    # reflection folds into border after reflecting the base coordinate,
    # exactly as ops.warp.grid_sample does for non-bicubic modes
    ix = warp._apply_padding_coord(ix, w, padding_mode, align_corners)
    iy = warp._apply_padding_coord(iy, h, padding_mode, align_corners)
    border = padding_mode in ("border", "reflection")
    out = _sample_pix(inp, iy, ix, border, interpret)
    return out.astype(inp.dtype)
