"""Parameterized layers with reference (torch) semantics, NHWC, bf16-ready.

Building blocks shared by every model family (SURVEY.md §1: "every trainer
duplicates the same five blocks"). Convolutions use torch shape semantics:

- ``TorchConv(k=4, s=1, p=1)``: H -> H-1 (the reference's down-block conv,
  ``TFCGAN_multigpu_globalFFT.py:107``).
- ``TorchConvTranspose(k=4, s=2, p=1)``: H -> 2H (the up-block conv, ``:124``),
  expressed as an input-dilated conv so XLA lowers it straight onto the MXU.
- ``SpectralConv``: spectral normalization via power iteration with persistent
  (u, v) state in the ``"spectral"`` variable collection — the discriminator's
  ``torch.nn.utils.parametrizations.spectral_norm`` (``:190``). One iteration
  per update, sigma differentiable through the kernel, matching torch.

Weight init: normal(0, 0.02) for all conv kernels per ``weights_init_normal``
(``:220-226``); biases zero. Params are fp32; compute dtype configurable.
"""

from __future__ import annotations

from collections.abc import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from tfcgan_tpu.ops.blurpool import blur_pool
from tfcgan_tpu.ops.norm import instance_norm

conv_init = nn.initializers.normal(stddev=0.02)


class TorchConv(nn.Module):
    """Conv2d with explicit (possibly asymmetric) padding, NHWC."""

    features: int
    kernel_size: tuple[int, int] = (4, 4)
    strides: tuple[int, int] = (1, 1)
    padding: Sequence[tuple[int, int]] = ((1, 1), (1, 1))
    use_bias: bool = True
    kernel_init: nn.initializers.Initializer = conv_init
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init,
            (*self.kernel_size, in_ch, self.features), jnp.float32,
        )
        y = lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            window_strides=self.strides,
            padding=tuple(self.padding),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


class TorchConvTranspose(nn.Module):
    """ConvTranspose2d(k, s, p) via lhs-dilated conv (H -> s*H for k=4,s=2,p=1)."""

    features: int
    kernel_size: tuple[int, int] = (4, 4)
    strides: tuple[int, int] = (2, 2)
    padding: tuple[int, int] = (1, 1)
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", conv_init, (kh, kw, in_ch, self.features), jnp.float32
        )
        # torch convT(k, s, p) == conv(flip(kernel), lhs_dilation=s,
        # padding=k-1-p) with the kernel's in/out roles as stored here.
        ph = kh - 1 - self.padding[0]
        pw = kw - 1 - self.padding[1]
        y = lax.conv_general_dilated(
            x.astype(self.dtype),
            jnp.flip(kernel, axis=(0, 1)).astype(self.dtype),
            window_strides=(1, 1),
            padding=((ph, ph), (pw, pw)),
            lhs_dilation=self.strides,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


def _l2_normalize(v: jax.Array, eps: float = 1e-12) -> jax.Array:
    return v / jnp.maximum(jnp.linalg.norm(v), eps)


class SpectralConv(nn.Module):
    """Spectrally-normalized conv (power iteration, persistent u/v state)."""

    features: int
    kernel_size: tuple[int, int] = (4, 4)
    strides: tuple[int, int] = (1, 1)
    padding: Sequence[tuple[int, int]] = ((1, 1), (1, 1))
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, update_stats: bool = False) -> jax.Array:
        in_ch = x.shape[-1]
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", conv_init, (kh, kw, in_ch, self.features), jnp.float32
        )
        w_mat = kernel.reshape(-1, self.features).T  # (out, in*kh*kw)

        u_var = self.variable(
            "spectral", "u",
            lambda: _l2_normalize(
                jax.random.normal(jax.random.PRNGKey(0), (self.features,))
            ),
        )
        v_var = self.variable(
            "spectral", "v",
            lambda: _l2_normalize(jnp.ones((w_mat.shape[1],))),
        )
        u, v = u_var.value, v_var.value
        if update_stats and not self.is_initializing():
            # one torch power iteration: v <- normalize(W^T u); u <- normalize(W v)
            v = _l2_normalize(jax.lax.stop_gradient(w_mat).T @ u)
            u = _l2_normalize(jax.lax.stop_gradient(w_mat) @ v)
            u_var.value = u
            v_var.value = v
        u = jax.lax.stop_gradient(u)
        v = jax.lax.stop_gradient(v)
        sigma = u @ (w_mat @ v)  # differentiable through the kernel
        w_bar = (kernel / sigma).astype(self.dtype)

        y = lax.conv_general_dilated(
            x.astype(self.dtype), w_bar,
            window_strides=self.strides,
            padding=tuple(self.padding),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


class UNetDown(nn.Module):
    """Reference UNetDown (``TFCGAN_multigpu_globalFFT.py:104-117``):
    conv(k4,s1,p1, no bias) -> [instance norm] -> leaky_relu(0.2) ->
    blur_pool(stride 2) -> [dropout]."""

    features: int
    normalize: bool = True
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        x = TorchConv(self.features, use_bias=False, dtype=self.dtype, name="conv")(x)
        if self.normalize:
            x = instance_norm(x)
        x = nn.leaky_relu(x, 0.2)
        x = blur_pool(x, stride=2)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return x


class UNetUp(nn.Module):
    """Reference UNetUp (``:120-136``): convT(k4,s2,p1, no bias) ->
    blur_pool(stride 1) -> instance norm -> relu -> [dropout] -> cat(skip)."""

    features: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, skip: jax.Array, deterministic: bool = True) -> jax.Array:
        x = TorchConvTranspose(self.features, dtype=self.dtype, name="conv")(x)
        x = blur_pool(x, stride=1)
        x = instance_norm(x)
        x = nn.relu(x)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)


def upsample_nearest_2x(x: jax.Array) -> jax.Array:
    """nn.Upsample(scale_factor=2) (nearest) — used in the generator head."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, 2 * h, 2 * w, c)


def _up2_tap_map(k: int) -> np.ndarray:
    """(k+1, k) merged-tap map for fusing nearest-2x upsample into a conv(k):
    y[p] = Σ_a w[a]·x[floor((p+a)/2)] == Σ_j K[j]·z[p-1+j] on the zero-dilated
    input z, with K[j] = Σ w[a] over a ∈ {j-1, j} ∩ [0, k)."""
    m = np.zeros((k + 1, k), np.float32)
    for j in range(k + 1):
        for a in (j - 1, j):
            if 0 <= a < k:
                m[j, a] = 1.0
    return m


class Upsample2xConv(nn.Module):
    """nearest-2x upsample + zero-pad + Conv2d(k, s1) fused into ONE
    lhs-dilated conv.

    Functionally identical to ``upsample_nearest_2x`` followed by
    ``TorchConv(k, padding)`` — but XLA materializes the 2× broadcast as an
    HLO temp (~2 GB at b128 256² in the FFT-GLO generator head, the single
    largest allocation in the round-3 AOT dump) plus its read-back; the fused
    form feeds the MXU straight from the un-upsampled activation. The
    parameter tree is IDENTICAL to the unfused TorchConv ((k,k,in,out)
    "kernel" [+ "bias"]), so checkpoints and torch weight transfer are
    unaffected: the (k+1)² merged-tap kernel K[i,j] = Σ_{a∈A(i),b∈A(j)} w[a,b]
    is built in-graph (``_up2_tap_map``), and a post-upsample pad (pl, pr)
    maps to a dilated-conv pad (pl+1, pr+1).
    """

    features: int
    kernel_size: tuple[int, int] = (4, 4)
    padding: Sequence[tuple[int, int]] = ((2, 1), (2, 1))
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", conv_init, (kh, kw, in_ch, self.features), jnp.float32
        )
        mh, mw = jnp.asarray(_up2_tap_map(kh)), jnp.asarray(_up2_tap_map(kw))
        k_up = jnp.einsum("ia,jb,abco->ijco", mh, mw, kernel)
        (pt, pb), (pl, pr) = self.padding
        y = lax.conv_general_dilated(
            x.astype(self.dtype),
            k_up.astype(self.dtype),
            window_strides=(1, 1),
            padding=((pt + 1, pb + 1), (pl + 1, pr + 1)),
            lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


def spectral_power_iteration(params, spectral, order: str = "vu"):
    """One power iteration for every spectrally-normalized kernel.

    The iteration depends only on the kernels, so instead of threading
    ``update_stats`` through a discriminator forward (the reference runs it
    implicitly 4× per step inside D calls), the trainer advances (u, v) once
    per step here and every D evaluation then uses the same fixed state.
    Recipes opting into the reference's exact cadence
    (``extra["spectral_cadence"] = "per_forward"``) instead call this before
    *each* discriminator forward — see ``recipes/tfcgan.py``.

    ``order`` selects the update sequence within one iteration:

    - ``"vu"``: v ← normalize(Wᵀu); u ← normalize(Wv) — the legacy
      ``torch.nn.utils.spectral_norm`` order (the per-step default).
    - ``"uv"``: u ← normalize(Wv); v ← normalize(Wᵀu) — what the reference's
      ``torch.nn.utils.parametrizations.spectral_norm`` actually runs
      (``_SpectralNorm._power_method``; registered at
      ``TFCGAN_multigpu_globalFFT.py:190``), used by the per-forward cadence.

    ``spectral`` mirrors the params tree with {"u", "v"} leaves at modules
    that own a "kernel".
    """
    def rec(p, s):
        if not isinstance(s, dict):
            return s
        if set(s.keys()) == {"u", "v"}:
            kernel = p["kernel"]
            w = kernel.reshape(-1, kernel.shape[-1]).T  # (out, rest)
            w = jax.lax.stop_gradient(w)
            if order == "uv":
                u = _l2_normalize(w @ s["v"])
                v = _l2_normalize(w.T @ u)
            else:
                v = _l2_normalize(w.T @ s["u"])
                u = _l2_normalize(w @ v)
            return {"u": u, "v": v}
        return {k: rec(p[k], v) for k, v in s.items()}

    return rec(params, spectral)
