"""Anti-aliased blur-pool as a native NHWC Pallas TPU kernel (+ exact VJP).

Why a kernel: blur-pool (reflect pad (1,2) + depthwise [1,3,3,1]⊗[1,3,3,1]/64,
stride 1 or 2) sits in EVERY TFC-GAN generator/discriminator block
(``/root/reference/TFC-GAN-FFT/TFCGAN_multigpu_globalFFT.py:111,125,194``),
and every XLA formulation measured on the b128 FFT-GLO train step is far off
the bandwidth roofline:

- ``jnp.pad(reflect)`` + depthwise conv: 138 ms/step (pad copies + VPU conv),
- zero-pad-in-conv separable + DUS edge fixes: 113 ms (+copy overhead),
- banded-matrix einsum on the MXU: 130 ms (layout transposes around the
  contraction dominate).

The op is memory-bound (read X, write X/4): this kernel does exactly that —
one VMEM-resident separable shift-add per tile, fp32 accumulation. Boundary
handling is split so the kernel stays uniform across tiles:

- H (the tiled axis): halo rows are gathered THIN in XLA with the true
  reflect mapping (including the two right-edge reflect rows), one (1+k)-row
  strip per tile; odd-H stride-2 inputs get one appended reflect row so the
  main blocks tile evenly.
- W (fully resident per block): reflect columns are re-created in VMEM.

The backward is a second kernel computing the exact adjoint (transposed
banded blur) with thin XLA folds for the reflect-boundary gradient terms;
gradients match autodiff of the direct form to fp32 rounding
(tests/test_pallas_kernels.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tfcgan_tpu.ops.pallas_kernels.dispatch import default_interpret

_A4 = np.array([1.0, 3.0, 3.0, 1.0])
_K1 = (_A4 / _A4.sum()).astype(np.float32)  # separable 1-D taps, sum 1
_PAD_L, _PAD_R, _F = 1, 2, 4


def _reflect(j: int, n: int) -> int:
    if n == 1:
        return 0
    j = j % (2 * (n - 1))
    return j if j < n else 2 * (n - 1) - j


def _out_len(n: int, stride: int) -> int:
    return (n + _PAD_L + _PAD_R - _F) // stride + 1


def _pick_ht(ho: int, w: int, ct: int, stride: int) -> int:
    """Largest divisor of ho whose input block stays under ~512 KB of bf16.

    The budget bounds SCOPED VMEM, not just the block: the kernel body holds
    ~10 fp32 copies of the block (fp32 upcast, parity-split relayouts, concat
    pads), and the deployed backend enforces a 16 MB scoped-vmem stack limit.
    History of on-chip OOMs that set the value: 2 MB budget -> 23.8 MB scoped
    (round 2); 1 MB -> 18.77 MB on the round-3 backend for the b128
    (256, 255) D-block backward. 512 KB keeps the largest observed shape at
    ~9.4 MB. Override via TFCGAN_BLUR_VMEM_BUDGET (bytes) for tuning."""
    import os

    budget = int(os.environ.get("TFCGAN_BLUR_VMEM_BUDGET", 1 << 19))
    budget_rows = max(1, budget // max(1, (w + 3) * ct * 2))
    best = 1
    for d in range(1, ho + 1):
        if ho % d == 0 and d * stride + 3 <= budget_rows:
            best = d
    return best


# ------------------------------------------------------------------ forward


def _fwd_kernel(xm_ref, hb_ref, o_ref, *, s, ht, w, wo, n_after):
    xm = xm_ref[0].astype(jnp.float32)        # (s*ht, W, ct) rows p0+1..p0+s*ht
    hb = hb_ref[0, 0].astype(jnp.float32)     # (1+n_after, W, ct)
    # p ascending: [before | main | after]
    rows = jnp.concatenate([hb[0:1], xm, hb[1 : 1 + n_after]], axis=0)
    # H pass: yh[i] = sum_a k[a] * rows[s*i + a]. The deployed backend's
    # Mosaic rejects strided vector slices ("strides confined to [1, 2)",
    # tools/probe_mosaic_ops.py), so the s=2 path splits rows into even/odd
    # parity planes via a leading-dim reshape and uses stride-1 slices only.
    if s == 2:
        r2_ = rows.reshape(ht + 1, 2, w, -1)  # rows = 2ht+2 when s=2
        ev, od = r2_[:, 0], r2_[:, 1]         # rows[2m], rows[2m+1]
        yh = (_K1[0] * ev[0:ht] + _K1[1] * od[0:ht]
              + _K1[2] * ev[1 : ht + 1] + _K1[3] * od[1 : ht + 1])
    else:
        yh = None
        for a in range(_F):
            t = _K1[a] * lax.slice_in_dim(rows, a, a + ht, axis=0)
            yh = t if yh is None else yh + t
    # W reflect pad in VMEM: padded col p_w maps to col reflect(p_w - 1)
    left = lax.slice_in_dim(yh, _reflect(-1, w), _reflect(-1, w) + 1, axis=1)
    r1, r2 = _reflect(w, w), _reflect(w + 1, w)
    xw = jnp.concatenate(
        [left, yh, lax.slice_in_dim(yh, r1, r1 + 1, axis=1),
         lax.slice_in_dim(yh, r2, r2 + 1, axis=1)], axis=1)  # (ht, W+3, ct)
    if s == 2:
        # yw[j] = sum_b k[b] * xw[:, 2j+b]: parity-split the padded cols via
        # a sublane-axis reshape (probe-validated) instead of strided slices.
        p = w + 3
        if p % 2 == 1:  # make the col count even; the extra col is never read
            xw = jnp.concatenate([xw, xw[:, -1:]], axis=1)
            p += 1
        sp = xw.reshape(ht, p // 2, 2, -1)
        ev, od = sp[:, :, 0], sp[:, :, 1]     # xw[:, 2m], xw[:, 2m+1]
        yw = (_K1[0] * ev[:, 0:wo] + _K1[1] * od[:, 0:wo]
              + _K1[2] * ev[:, 1 : wo + 1] + _K1[3] * od[:, 1 : wo + 1])
    else:
        yw = None
        for b in range(_F):
            t = _K1[b] * lax.slice_in_dim(xw, b, b + wo, axis=1)
            yw = t if yw is None else yw + t
    o_ref[0] = yw.astype(o_ref.dtype)


def _fwd_halo_indices(h: int, s: int, ht: int, t_tiles: int) -> np.ndarray:
    """(T, 1 + (3-s)) x-row indices: tile t needs padded rows p0 = s*ht*t
    (before-main) and p = s*ht*(t+1)+1 .. +(3-s) (after-main); padded row p
    reads x[reflect(p-1)]."""
    n_after = 3 - s
    idx = np.zeros((t_tiles, 1 + n_after), np.int32)
    for t in range(t_tiles):
        idx[t, 0] = _reflect(s * ht * t - 1, h)
        for k in range(n_after):
            idx[t, 1 + k] = _reflect(s * ht * (t + 1) + k, h)
    return idx


def _blur_pool_fwd_impl(x: jax.Array, stride: int) -> jax.Array:
    n, h, w, c = x.shape
    ho, wo = _out_len(h, stride), _out_len(w, stride)
    h_orig = h
    if stride == 2 and h % 2 == 1:
        # append the p = H+1 reflect row so main blocks tile H+1 evenly
        x = jnp.concatenate([x, x[:, h - 2 : h - 1]], axis=1)
        h = h + 1
    ct = c if c <= 128 else 128
    assert c % ct == 0
    ht = _pick_ht(ho, w, ct, stride)
    t_tiles = ho // ht
    n_after = 3 - stride
    # halo rows gathered from the ORIGINAL x (true reflect values)
    idx = _fwd_halo_indices(h_orig, stride, ht, t_tiles)
    halo = jnp.take(x[:, :h_orig], jnp.asarray(idx.reshape(-1)), axis=1)
    halo = halo.reshape(n, t_tiles, 1 + n_after, w, c)
    interpret = default_interpret()
    return pl.pallas_call(
        functools.partial(_fwd_kernel, s=stride, ht=ht, w=w, wo=wo,
                          n_after=n_after),
        out_shape=jax.ShapeDtypeStruct((n, ho, wo, c), x.dtype),
        grid=(n, t_tiles, c // ct),
        in_specs=[
            pl.BlockSpec((1, stride * ht, w, ct), lambda i, t, j: (i, t, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1 + n_after, w, ct),
                         lambda i, t, j: (i, t, 0, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ht, wo, ct), lambda i, t, j: (i, t, 0, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, halo)


# ----------------------------------------------------------------- backward


def _bwd_kernel(dym_ref, hb_ref, o_ref, *, s, ht, wo, w, n_before):
    """dx_eff rows [s*ht*t, s*ht*t + s*ht) from dy rows
    [ht*t - n_before, ht*(t+1)] (halo zero-masked at array edges)."""
    dym = dym_ref[0].astype(jnp.float32)      # (ht, Wo, ct)
    hb = hb_ref[0, 0].astype(jnp.float32)     # (n_before + 1, Wo, ct)
    dyr = jnp.concatenate([hb[:n_before], dym, hb[n_before:]], axis=0)
    # FH^T: dxp[p] = sum_a k[a] * dy[(p - a)/s] for integral, in-range i.
    # Local dy row li = i - (ht*t - n_before); dx row r = p - 1,
    # local u = r - s*ht*t in [0, s*ht).
    if s == 2:
        # p odd  (u even, u=2v):  a in {1,3}: i = ht*t + v, ht*t + v - 1
        # p even (u odd, u=2v+1): a in {0,2}: i = ht*t + v + 1, ht*t + v
        odd = (_K1[1] * lax.slice_in_dim(dyr, 1, 1 + ht, axis=0)
               + _K1[3] * lax.slice_in_dim(dyr, 0, ht, axis=0))
        even = (_K1[0] * lax.slice_in_dim(dyr, 2, 2 + ht, axis=0)
                + _K1[2] * lax.slice_in_dim(dyr, 1, 1 + ht, axis=0))
        dxh = jnp.stack([odd, even], axis=1).reshape(2 * ht, wo, -1)
    else:
        # p = ht*t + 1 + u: i = p - a, local li = u + (3 - a)
        dxh = None
        for a in range(_F):
            t_ = _K1[a] * lax.slice_in_dim(dyr, 3 - a, 3 - a + ht, axis=0)
            dxh = t_ if dxh is None else dxh + t_
    # FW^T with three zero cols each side: dxpw[pw] = sum_b k[b]*dxh[(pw-b)/s]
    # (dy col i lives at padded col j = i + 3; zeros absorb out-of-range i)
    rows = dxh.shape[0]
    z = jnp.zeros((rows, 3, dxh.shape[-1]), jnp.float32)
    dyp = jnp.concatenate([z, dxh, z], axis=1)
    if s == 2:
        # pw = 2v (even): taps i = v (k0), v-1 (k2); pw = 2v+1: i = v (k1),
        # v-1 (k3). Interleave EVEN-first so dxpw index == pw.
        lo = (w + 4) // 2
        evenw = (_K1[0] * lax.slice_in_dim(dyp, 3, 3 + lo, axis=1)
                 + _K1[2] * lax.slice_in_dim(dyp, 2, 2 + lo, axis=1))
        oddw = (_K1[1] * lax.slice_in_dim(dyp, 3, 3 + lo, axis=1)
                + _K1[3] * lax.slice_in_dim(dyp, 2, 2 + lo, axis=1))
        dxpw = jnp.stack([evenw, oddw], axis=2).reshape(rows, 2 * lo, -1)
    else:
        dxpw = None
        for b in range(_F):
            t_ = _K1[b] * lax.slice_in_dim(dyp, 3 - b, 3 - b + w + 3, axis=1)
            dxpw = t_ if dxpw is None else dxpw + t_
    # SW^T fold: dxw[v] = dxpw[v+1]; [1] += dxpw[0]; [refl(W)] += dxpw[W+1];
    # [refl(W+1)] += dxpw[W+2]
    dxw = lax.slice_in_dim(dxpw, 1, 1 + w, axis=1)
    vi = lax.broadcasted_iota(jnp.int32, (rows, w, 1), 1)
    for pw, col in ((0, 1), (w + 1, _reflect(w, w)), (w + 2, _reflect(w + 1, w))):
        e = lax.slice_in_dim(dxpw, pw, pw + 1, axis=1)
        dxw = dxw + jnp.where(vi == col, e, 0.0)
    o_ref[0] = dxw.astype(o_ref.dtype)


def _bwd_halo(dy: jax.Array, ht: int, t_tiles: int, n_before: int):
    """(N, T, n_before+1, Wo, C) dy halo rows, zeroed outside [0, Ho)."""
    n, ho, wo, c = dy.shape
    idx, valid = [], []
    for t in range(t_tiles):
        for q in [*range(ht * t - n_before, ht * t), ht * (t + 1)]:
            idx.append(min(max(q, 0), ho - 1))
            valid.append(1.0 if 0 <= q < ho else 0.0)
    rows = jnp.take(dy, jnp.asarray(idx, dtype=jnp.int32), axis=1)
    mask = jnp.asarray(valid, dtype=dy.dtype).reshape(1, -1, 1, 1)
    return (rows * mask).reshape(n, t_tiles, n_before + 1, wo, c)


def _w_adjoint_rows(rows: jax.Array, w: int, stride: int) -> jax.Array:
    """Exact W adjoint (incl. reflect folds) of thin (N, R, Wo, C) rows — the
    banded-matrix transpose is fine in XLA at this size."""
    wo = rows.shape[2]
    m = np.zeros((wo, w), np.float32)
    for i in range(wo):
        for b in range(_F):
            m[i, _reflect(stride * i + b - _PAD_L, w)] += _K1[b]
    mj = jnp.asarray(m, rows.dtype)
    return jnp.einsum("pw,nrpc->nrwc", mj, rows,
                      precision=lax.Precision.HIGHEST)


def _blur_pool_bwd_impl(dy: jax.Array, stride: int, h: int, w: int) -> jax.Array:
    n, ho, wo, c = dy.shape
    h_eff = h + 1 if (stride == 2 and h % 2 == 1) else h
    ct = c if c <= 128 else 128
    ht = _pick_ht(ho, max(w, wo), ct, stride)
    t_tiles = ho // ht
    n_before = 3 - stride
    halo = _bwd_halo(dy, ht, t_tiles, n_before)
    interpret = default_interpret()
    dx_eff = pl.pallas_call(
        functools.partial(_bwd_kernel, s=stride, ht=ht, wo=wo, w=w,
                          n_before=n_before),
        out_shape=jax.ShapeDtypeStruct((n, h_eff, w, c), dy.dtype),
        grid=(n, t_tiles, c // ct),
        in_specs=[
            pl.BlockSpec((1, ht, wo, ct), lambda i, t, j: (i, t, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_before + 1, wo, ct),
                         lambda i, t, j: (i, t, 0, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, stride * ht, w, ct),
                               lambda i, t, j: (i, t, 0, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(dy, halo)
    dx = dx_eff[:, :h]
    if h_eff != h:  # appended reflect row's gradient folds back to x[h-2]
        dx = dx.at[:, h - 2].add(dx_eff[:, h])
    # SH^T folds: padded rows the kernel's p-range [1, h_eff] excludes.
    dyw0 = _w_adjoint_rows(dy[:, 0:1], w, stride)          # (N,1,W,C)
    dywL = _w_adjoint_rows(dy[:, ho - 1 : ho], w, stride)

    def _add(dxv, row, term):
        return dxv.at[:, row].add(term.astype(dxv.dtype))

    dx = _add(dx, _reflect(-1, h), _K1[0] * dyw0[:, 0])    # p = 0, a=0, i=0
    for p in range(h_eff + 1, h + _PAD_R + 1):             # p beyond kernel
        r = _reflect(p - 1, h)
        for a in range(_F):
            if (p - a) % stride == 0:
                i = (p - a) // stride
                if 0 <= i < ho:
                    if i == 0:
                        dx = _add(dx, r, _K1[a] * dyw0[:, 0])
                    elif i == ho - 1:
                        dx = _add(dx, r, _K1[a] * dywL[:, 0])
                    else:  # interior dy row: gather it (rare: tiny ho)
                        extra = _w_adjoint_rows(dy[:, i : i + 1], w, stride)
                        dx = _add(dx, r, _K1[a] * extra[:, 0])
    return dx


# --------------------------------------------------------------- public api


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def blur_pool_fast(x: jax.Array, stride: int = 2) -> jax.Array:
    """Exact ``antialiased_cnns.BlurPool(filt_size=4)`` on TPU via Pallas.
    x: (N, H, W, C) NHWC. Use ``ops.blur_pool`` which dispatches here."""
    return _blur_pool_fwd_impl(x, stride)


def _bp_fwd(x, stride):
    return _blur_pool_fwd_impl(x, stride), (x.shape,)


def _bp_bwd(stride, res, dy):
    (shape,) = res
    return (_blur_pool_bwd_impl(dy, stride, shape[1], shape[2]),)


blur_pool_fast.defvjp(_bp_fwd, _bp_bwd)


def blur_pool_supported(shape: tuple[int, ...], stride: int) -> bool:
    """Shapes the kernel handles: NHWC, filt 4, C tiles of <=128, H tileable."""
    if len(shape) != 4 or stride not in (1, 2):
        return False
    n, h, w, c = shape
    if min(n, h, w, c) < 1 or (c > 128 and c % 128 != 0):
        return False
    if h < 4 or w < 4:  # tiny spatial dims: fall back to the direct form
        return False
    return True


# kept for tests/benches of the historical NCHW variant — superseded
def blur_pool_pallas(x: jax.Array, stride: int = 2, interpret: bool | None = None):
    """Back-compat alias for the NHWC fast path (old NCHW kernel removed)."""
    del interpret
    return blur_pool_fast(x, stride)
