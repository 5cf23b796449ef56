"""Anti-aliased blur-pool (Zhang 2019, "Making Convolutions Shift-Invariant").

The reference uses ``antialiased_cnns.BlurPool(C, stride=s)`` with the default
``filt_size=4`` in every generator/discriminator block (e.g.
``/root/reference/TFC-GAN-FFT/TFCGAN_multigpu_globalFFT.py:111,125,194``).
Semantics reproduced exactly:

- binomial filter ``[1, 3, 3, 1]`` (outer product, normalized to sum 1),
- reflection padding of (1, 2) on each spatial dim,
- depthwise conv with the given stride (stride 1 = pure blur, used in UNetUp).

TPU-first implementation: dispatches to the Pallas kernel in
``ops/pallas_kernels/blurpool.py`` (VMEM-resident separable shift-add with
exact reflect halos and a custom exact VJP). The op is memory-bound (read X,
write X/4) and every pure-XLA formulation profiled on the b128 FFT-GLO train
step was far off that roofline: materialized ``jnp.pad(reflect)`` +
depthwise conv = 138 ms/step, zero-pad-in-conv separable + DUS edge fixes =
113 ms, banded-matrix MXU einsum = 130 ms (layout transposes around the
contraction). CPU and odd shapes use the direct padded form below.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


@functools.lru_cache(maxsize=None)
def _binomial_1d(filt_size: int) -> tuple[float, ...]:
    row = np.array([1.0])
    for _ in range(filt_size - 1):
        row = np.convolve(row, [1.0, 1.0])
    return tuple(row)


def make_blur_kernel(filt_size: int = 4, dtype=jnp.float32) -> jax.Array:
    """2D normalized binomial blur kernel of shape (filt_size, filt_size)."""
    a = jnp.asarray(_binomial_1d(filt_size), dtype=jnp.float32)
    k = jnp.outer(a, a)
    return (k / jnp.sum(k)).astype(dtype)


def blur_pool(x: jax.Array, stride: int = 2, filt_size: int = 4) -> jax.Array:
    """Blur + subsample. ``x``: (N, H, W, C). Matches
    ``antialiased_cnns.BlurPool(filt_size=4)`` =
    ReflectionPad2d((1,2,1,2)) -> depthwise [1,3,3,1]⊗[1,3,3,1]/64 conv.

    Default path: the direct XLA form. The Pallas kernel
    (ops/pallas_kernels/blurpool.py: fp32-accumulated separable shift-add,
    exact reflect semantics, custom exact VJP) is OPT-IN via
    TFCGAN_PALLAS_BLUR=1: it wins standalone microbenches, but in the full
    b128 FFT-GLO step the deployed backend surrounds every pallas_call with
    layout copies (convs want batch-minor {0,3,2,1}, Mosaic requires the
    default layout) that cost ~128 MB each and push the step to an HBM OOM
    (16.64 G > 15.75 G, round 3 measurement) — the round-2 "win" was a
    silent fallback to this XLA path all along."""
    import os

    use_pallas = (
        filt_size == 4
        and jax.default_backend() != "cpu"
        and os.environ.get("TFCGAN_PALLAS_BLUR", "0") == "1"  # opt-in
    )
    if use_pallas:
        from tfcgan_tpu.ops.pallas_kernels.blurpool import (
            blur_pool_fast,
            blur_pool_supported,
        )

        if blur_pool_supported(x.shape, stride):
            return blur_pool_fast(x, stride)
    if filt_size == 4 and os.environ.get("TFCGAN_BLUR_IMPL", "zerofix") == "zerofix":
        return blur_pool_zerofix(x, stride=stride)
    return blur_pool_padded(x, stride=stride, filt_size=filt_size)


@functools.lru_cache(maxsize=None)
def _fix_pairs(n: int, s: int) -> tuple[tuple[int, int, int], ...]:
    """(out_idx, in_idx, tap_idx) triples where a zero-pad filt-4 conv with
    pad (1, 2) differs from the reflect-pad one along an axis of length n.

    Output o reads input p = s·o + a − 1 for taps a ∈ 0..3; reflect maps
    p = −1 → x[1], p = n → x[n−2], p = n+1 → x[n−3] (torch ReflectionPad2d),
    zero-pad drops them — each triple is one dropped contribution to restore.
    2 triples/axis at stride 2 (even n), 4 at stride 1."""
    pairs = [(0, 1, 0)]  # p = -1 happens only at o=0, a=0
    n_out = (n - 1) // s + 1
    for target, src in ((n + 1, n - 2), (n + 2, n - 3)):  # p = n, n+1
        for a in range(4):
            o, rem = divmod(target - a, s)
            if rem == 0 and 0 <= o < n_out:
                pairs.append((o, src, a))
    return tuple(pairs)


def blur_pool_zerofix(x: jax.Array, stride: int = 2, filt_size: int = 4) -> jax.Array:
    """Reflect blur-pool as ONE zero-padded depthwise conv + O(H+W) border
    corrections — no materialized pad (fwd) and no pad-transpose slice-add
    cluster (bwd; ~26 ms/step of the b128 FFT-GLO profile).

    Exact decomposition (B = reflect blur, Z = zero-pad conv, F = B − Z,
    per axis):  Bh·Bw = Zh·Zw + Fh·(Zw x) + Bh·(Fw x).  The F terms touch
    2–4 border rows/cols (``_fix_pairs``); their inputs are computed with
    tiny 1-D convs on sliced rows/cols, so the main term is a single
    pad-free conv. Round-2 measured this shape at 113 vs 138 ms/step but its
    +0.3 GB peak HBM broke b128 at the old 16.3 GiB cliff; the upsample
    fusion's 13.49 GiB peak leaves room (BASELINE.md round 3)."""
    assert filt_size == 4, "zerofix is derived for the reference filt_size=4"
    n, h, w, c = x.shape
    if h < 4 or w < 4:
        return blur_pool_padded(x, stride=stride, filt_size=filt_size)
    dt = x.dtype
    w1 = jnp.asarray(_binomial_1d(4), jnp.float32)
    w1 = (w1 / jnp.sum(w1)).astype(dt)  # [1,3,3,1]/8
    k2 = make_blur_kernel(4, dtype=dt)
    dn = ("NHWC", "HWIO", "NHWC")
    dw = lambda lhs, kern, strides, padding: lax.conv_general_dilated(
        lhs, kern, window_strides=strides, padding=padding,
        dimension_numbers=dn, feature_group_count=c,
    )
    # main term: zero-pad 2-D depthwise conv, no materialized pad
    y = dw(x, jnp.broadcast_to(k2[:, :, None, None], (4, 4, 1, c)),
           (stride, stride), ((1, 2), (1, 2)))

    kw = jnp.broadcast_to(w1[None, :, None, None], (1, 4, 1, c))
    kh = jnp.broadcast_to(w1[:, None, None, None], (4, 1, 1, c))

    # Border corrections via static slices + one concat per axis. The
    # original `x[:, rows]` / `y.at[:, o].add(...)` forms lowered to
    # gather + full-tensor copy + scatter-add per site — profiled at
    # ~62 ms/step of the stn b32 step (39.5 copy + 22.6 gather, round-5
    # trace) across the D/G blur sites; slices and concats fuse instead.
    def grouped(pairs):
        by_o: dict[int, list] = {}
        for o, r, a in pairs:
            by_o.setdefault(o, []).append((r, a))
        return by_o

    def reassemble(y, axis, by_o, corr_of):
        """y + corrections at rows/cols o, as zero-pad + add: the pad fuses
        into the add's epilogue (no gather/scatter/concat rewrite of y) and
        its transpose is a slice."""
        total = None
        for o in sorted(by_o):
            cfg = [(0, 0)] * y.ndim
            cfg[axis] = (o, y.shape[axis] - o - 1)
            p = jnp.pad(corr_of(o), cfg)
            total = p if total is None else total + p
        return y + total

    # Fh(Zw x): restore dropped H-taps of the W-zero-conv at border out rows
    hp = grouped(_fix_pairs(h, stride))
    rows = sorted({r for rs in hp.values() for r, _ in rs})
    x_rows = jnp.concatenate([x[:, r : r + 1] for r in rows], axis=1)
    zr = dw(x_rows, kw, (1, stride), ((0, 0), (1, 2)))  # (n,|R|,w_out,c)

    def corr_row(o):
        i = lambda r: rows.index(r)
        return sum(w1[a] * zr[:, i(r) : i(r) + 1] for r, a in hp[o])

    y = reassemble(y, 1, hp, corr_row)

    # Bh(Fw x): dropped W-taps feed border out cols, then take the FULL
    # reflect H-blur (pad rows (1,2) reflect + valid conv)
    wp = grouped(_fix_pairs(w, stride))
    cols = sorted({ci for cs in wp.values() for ci, _ in cs})
    x_cols = jnp.concatenate([x[:, :, ci : ci + 1] for ci in cols], axis=2)
    xc = jnp.pad(x_cols, ((0, 0), (1, 2), (0, 0), (0, 0)), mode="reflect")
    bc = dw(xc, kh, (stride, 1), ((0, 0), (0, 0)))  # (n,h_out,|C|,c)

    def corr_col(q):
        i = lambda ci: cols.index(ci)
        return sum(w1[a] * bc[:, :, i(ci) : i(ci) + 1] for ci, a in wp[q])

    return reassemble(y, 2, wp, corr_col)


def blur_pool_padded(x: jax.Array, stride: int = 2, filt_size: int = 4) -> jax.Array:
    """The direct form (materialized reflect pad + one 2-D depthwise conv).
    Kept as the oracle for tests/benches of the matmul fast path."""
    n, h, w, c = x.shape
    pad_l = (filt_size - 1) // 2
    pad_r = filt_size - 1 - pad_l  # == ceil((filt_size-1)/2)
    xp = jnp.pad(x, ((0, 0), (pad_l, pad_r), (pad_l, pad_r), (0, 0)), mode="reflect")
    k = make_blur_kernel(filt_size, dtype=x.dtype)
    # Depthwise: kernel (H, W, 1, C) with feature_group_count=C in HWIO.
    kernel = jnp.broadcast_to(k[:, :, None, None], (filt_size, filt_size, 1, c))
    return lax.conv_general_dilated(
        xp,
        kernel,
        window_strides=(stride, stride),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
