"""Anti-aliased blur-pool as a Pallas kernel (reference implementation).

Status (tools/bench_blurpool.py, v5e, bf16): XLA's depthwise conv runs the
(32, 256, 256, 64) blur in 8.6 ms; this kernel is exact (maxdiff 0.0) but
slower (14.4 ms) because Mosaic's block constraints (last two dims (8k, 128k)
or full extent) force NCHW layout with XLA transposes on both sides, and a
separable shift-add XLA formulation is slower still (20 ms). The models
therefore keep ``ops.blur_pool`` (XLA depthwise); this kernel documents the
measured alternative and serves shapes where channel planes fit VMEM natively.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _binomial4():
    a = np.array([1.0, 3.0, 3.0, 1.0])
    k = np.outer(a, a)
    return (k / k.sum()).astype(np.float32)


_K = _binomial4()


def _blur_kernel(x_ref, out_ref, *, stride: int, h: int, w: int):
    # x_ref block: (1, 1, H+3, W+3); out block: (1, 1, H/s, W/s)
    x = x_ref[0, 0]
    acc = None
    for di in range(4):
        for dj in range(4):
            term = x[di : di + h, dj : dj + w] * _K[di, dj]
            acc = term if acc is None else acc + term
    if stride == 2:
        ho, wo = h // 2, w // 2
        acc = acc.reshape(ho, 2, wo, 2)[:, 0, :, 0]
    out_ref[0, 0] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("stride", "interpret"))
def blur_pool_pallas(x: jax.Array, stride: int = 2, interpret: bool | None = None) -> jax.Array:
    """Drop-in replacement for ``ops.blur_pool`` (filt_size=4). x: (N, H, W, C)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n, h, w, c = x.shape
    xc = x.transpose(0, 3, 1, 2)  # (N, C, H, W)
    xp = jnp.pad(xc, ((0, 0), (0, 0), (1, 2), (1, 2)), mode="reflect")
    ho, wo = (h // 2, w // 2) if stride == 2 else (h, w)
    out = pl.pallas_call(
        functools.partial(_blur_kernel, stride=stride, h=h, w=w),
        out_shape=jax.ShapeDtypeStruct((n, c, ho, wo), x.dtype),
        grid=(n, c),
        in_specs=[
            pl.BlockSpec((1, 1, h + 3, w + 3), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, ho, wo), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xp)
    return out.transpose(0, 2, 3, 1)
