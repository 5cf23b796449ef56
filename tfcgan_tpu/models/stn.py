"""Spatial transformer networks: the ViT-affine STN (flagship) and the
NeMAR-style deformable STN.

- ``LocalizerViT`` + ``AffineSTN``: rebuild of ``Net`` in
  ``/root/reference/TFC-STN/TFCGAN_STN21_Original_NewModel3_Official.py:172-232``:
  ViT over the (img_A, img_B) 6-channel concat -> flatten 17×768 tokens ->
  MLP 1024-512-256(+sigmoid)-6 -> dtheta; theta = dtheta + identity; warp the
  source with bicubic/border grid_sample (align_corners=True). The reference's
  per-sample Python loop over the batch becomes one batched warp.
- ``CNNAffineSTN``: NeMAR's conv AffineNetwork
  (``/root/reference/nemar/models/stn/affine_stn.py:23-105``): 5 conv-pool
  blocks -> MLP -> dtheta (last layer ~zero-init), bilinear/zeros warp
  (align_corners=False), L1(dtheta) regularization.
- ``DeformableSTN``: NeMAR's UnetSTN (``unet_stn.py:28-201``): a ResUnet
  predicts a dense 2-channel offset field added to the identity grid, with
  bilateral smoothness regularization (``stn_losses.py:4-30``).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tfcgan_tpu.models.layers import TorchConv
from tfcgan_tpu.models.vit import ViT
from tfcgan_tpu.ops.norm import instance_norm
from tfcgan_tpu.ops.pooling import pool22
from tfcgan_tpu.ops.warp import affine_grid, grid_sample, warp_affine

# numpy, not jnp: module-level device constants would initialize the JAX
# backend at import time (importing the library must never touch the device)
IDENTITY_THETA = np.asarray([1.0, 0.0, 0.0, 0.0, 1.0, 0.0], dtype=np.float32)


def _dtheta_head(identity_init: bool, dtype) -> nn.Dense:
    """The 256->6 dtheta projection (name ``fc4``); zero-init when
    ``identity_init`` so theta starts at exact identity (see AffineSTN)."""
    kw = (
        dict(kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros)
        if identity_init
        else {}
    )
    return nn.Dense(6, dtype=dtype, name="fc4", **kw)


class LocalizerViT(nn.Module):
    """ViT(patch 64, in=6ch) localizer (``:150-165``)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return ViT(patch_size=64, dtype=self.dtype, name="vit")(x)


class AffineSTN(nn.Module):
    """The flagship STN ``Net``: predicts theta from (img_A, img_B), warps src.

    ``fast_warp=True`` uses the Pallas separable warp (63x faster on TPU than
    the gather path, exact for scale/shear/translation, tiny deviation on the
    rotation component); False uses the torch-exact gather implementation.

    ``identity_init=True`` zero-initializes the dtheta head so theta starts
    at EXACT identity (the NeMAR AffineNetwork convention,
    ``nemar/models/stn/affine_stn.py:52``). The reference's default torch
    Linear init puts |dtheta| ~ 0.3-0.7 at step 0 — measured round 4: with
    the msrecon anchor standing in for pretrained LPIPS, one seed recovered
    and another was pushed out of frame within 17 steps (tx 2.4, border
    padding => zero warp gradient, morph triplet margin-saturated at 1.0 =>
    a dead STN for the rest of training). Starting at identity keeps step 0
    inside the loss basin. Weight-transfer parity is unaffected (lockstep
    tests load torch weights); set False for reference-style init.
    """

    dtype: jnp.dtype = jnp.float32
    mode: str = "bicubic"
    padding_mode: str = "border"
    fast_warp: bool = True
    identity_init: bool = True

    @nn.compact
    def theta(self, img_a: jax.Array, img_b: jax.Array) -> jax.Array:
        x = jnp.concatenate([img_a, img_b], axis=-1)
        tokens = LocalizerViT(dtype=self.dtype, name="localization")(x)
        flat = tokens.reshape(tokens.shape[0], -1)
        h = nn.Dense(1024, dtype=self.dtype, name="fc1")(flat)
        h = nn.relu(h)
        h = nn.Dense(512, dtype=self.dtype, name="fc2")(h)
        h = nn.relu(h)
        h = nn.Dense(256, dtype=self.dtype, name="fc3")(h)
        h = nn.sigmoid(h)
        dtheta = _dtheta_head(self.identity_init, self.dtype)(h)
        theta = dtheta.astype(jnp.float32) + IDENTITY_THETA[None, :]
        return theta.reshape(-1, 2, 3)

    def __call__(self, img_a: jax.Array, img_b: jax.Array, src: jax.Array) -> jax.Array:
        theta = self.theta(img_a, img_b)
        return warp_src(
            src, theta, mode=self.mode, padding_mode=self.padding_mode,
            fast=self.fast_warp,
        )


def warp_src(src: jax.Array, theta: jax.Array, *, mode: str, padding_mode: str,
             fast: bool) -> jax.Array:
    """The AffineSTN warp dispatch (parameterless): Pallas separable kernel
    when ``fast``, else the torch-exact align_corners=True gather path.
    Exposed so callers that already hold theta (e.g. the STN recipe's
    observability path) can warp without re-running the localizer.

    Both branches cast back to ``src.dtype``: the gather path computes in
    fp32 internally, so bf16 callers of the reference-parity (``fast=False``)
    route get a bf16 result — consistent with the Pallas path. Lockstep
    parity tests run fp32, where the cast is a no-op."""
    if fast:
        from tfcgan_tpu.ops.pallas_kernels import warp_affine_separable

        return warp_affine_separable(
            src, theta, mode=mode, padding_mode=padding_mode
        ).astype(src.dtype)
    return warp_affine(
        src, theta, mode=mode, padding_mode=padding_mode, align_corners=True,
    ).astype(src.dtype)


def _dense_warp(img, grid, fast: bool):
    """bilinear/zeros/align_corners=False sample, via the Pallas one-hot
    matmul kernel on TPU (``ops/pallas_kernels/gridsample.py``; XLA's TPU
    gather costs ~250x the tensor bytes — tools/cost_nemar.py) or the
    torch-exact XLA path."""
    if fast:
        from tfcgan_tpu.ops.pallas_kernels import grid_sample_dense

        return grid_sample_dense(
            img, grid, mode="bilinear", padding_mode="zeros",
            align_corners=False,
        ).astype(img.dtype)
    return grid_sample(
        img, grid, mode="bilinear", padding_mode="zeros", align_corners=False
    ).astype(img.dtype)


class CNNAffineSTN(nn.Module):
    """NeMAR AffineNetwork/AffineSTN ('A' config): returns (warped list, reg)."""

    nconvs: int = 5
    nf0: int = 32
    max_nf: int = 256
    dtype: jnp.dtype = jnp.float32
    fast_warp: bool = True

    @nn.compact
    def __call__(
        self, img_a: jax.Array, img_b: jax.Array, apply_on: list[jax.Array] | None = None
    ) -> tuple[list[jax.Array], jax.Array]:
        x = jnp.concatenate([img_a, img_b], axis=-1).astype(self.dtype)
        nf = self.nf0
        for i in range(self.nconvs):
            x = TorchConv(
                nf, kernel_size=(3, 3), padding=((1, 1), (1, 1)),
                dtype=self.dtype, name=f"conv{i}",
            )(x)
            x = instance_norm(x)
            x = nn.relu(x)
            x = pool22(x)  # perf-knob dispatch (ops/pooling.py)
            nf = min(2 * nf, self.max_nf)
        flat = x.reshape(x.shape[0], -1)
        h = nn.Dense(nf, dtype=self.dtype, name="fc1")(flat)
        h = nn.relu(h)
        dtheta = nn.Dense(
            6, kernel_init=nn.initializers.normal(5e-4),
            bias_init=nn.initializers.zeros, dtype=self.dtype, name="fc2",
        )(h)
        theta = (dtheta.astype(jnp.float32) + IDENTITY_THETA[None, :]).reshape(-1, 2, 3)
        if apply_on is None:
            apply_on = [img_a]
        warped = []
        for img in apply_on:
            n, h_, w_, _ = img.shape
            grid = affine_grid(theta, (n, h_, w_), align_corners=False)
            warped.append(_dense_warp(img, grid, self.fast_warp))
        reg = jnp.mean(jnp.abs(dtheta.astype(jnp.float32)))
        return warped, reg


class _ResBlock(nn.Module):
    feats: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = TorchConv(self.feats, kernel_size=(3, 3), padding=((1, 1), (1, 1)),
                      dtype=self.dtype, name="c1")(x)
        h = nn.relu(h)
        h = TorchConv(self.feats, kernel_size=(3, 3), padding=((1, 1), (1, 1)),
                      dtype=self.dtype, name="c2")(h)
        return x + h


class DeformableSTN(nn.Module):
    """ResUnet offset-field STN ('A' config, simplified faithfully):
    7 down blocks (32,64×6) -> 1x1 bottleneck with 3 res-blocks -> 7 up blocks
    with skip concats -> refine -> 2-channel offset map (zero-init).

    Returns (warped list, smoothness regularization term).
    """

    down_nf: tuple[int, ...] = (32, 64, 64, 64, 64, 64, 64)
    up_nf: tuple[int, ...] = (64, 64, 64, 64, 64, 64, 32)
    res_blocks: int = 3
    alpha: float = 0.0  # bilateral weighting on the smoothness loss
    dtype: jnp.dtype = jnp.float32
    fast_warp: bool = True

    @nn.compact
    def __call__(
        self, img_a: jax.Array, img_b: jax.Array, apply_on: list[jax.Array] | None = None
    ) -> tuple[list[jax.Array], jax.Array]:
        x = jnp.concatenate([img_a, img_b], axis=-1).astype(self.dtype)
        n, hh, ww, _ = x.shape
        skips = []
        for i, nf in enumerate(self.down_nf):
            x = TorchConv(nf, kernel_size=(3, 3), padding=((1, 1), (1, 1)),
                          dtype=self.dtype, name=f"down{i}")(x)
            x = nn.leaky_relu(x, 0.2)
            skips.append(x)
            x = pool22(x)  # perf-knob dispatch (ops/pooling.py)
        nf = self.down_nf[-1]
        x = TorchConv(2 * nf, kernel_size=(1, 1), padding=((0, 0), (0, 0)),
                      dtype=self.dtype, name="c1")(x)
        x = nn.leaky_relu(x, 0.2)
        for i in range(self.res_blocks):
            x = _ResBlock(2 * nf, dtype=self.dtype, name=f"res{i}")(x)
        x = TorchConv(nf, kernel_size=(1, 1), padding=((0, 0), (0, 0)),
                      dtype=self.dtype, name="c2")(x)
        x = nn.leaky_relu(x, 0.2)
        for i, nf_up in enumerate(self.up_nf):
            s = skips[-(i + 1)]
            x = jax.image.resize(x, (n, s.shape[1], s.shape[2], x.shape[-1]), "bilinear")
            x = jnp.concatenate([x, s], axis=-1)
            x = TorchConv(nf_up, kernel_size=(3, 3), padding=((1, 1), (1, 1)),
                          dtype=self.dtype, name=f"up{i}")(x)
            x = nn.leaky_relu(x, 0.2)
        x = _ResBlock(self.up_nf[-1], dtype=self.dtype, name="refine_res")(x)
        x = TorchConv(self.up_nf[-1], kernel_size=(1, 1), padding=((0, 0), (0, 0)),
                      dtype=self.dtype, name="refine_conv")(x)
        x = nn.leaky_relu(x, 0.2)
        offset = TorchConv(
            2, kernel_size=(3, 3), padding=((1, 1), (1, 1)),
            kernel_init=nn.initializers.zeros, dtype=self.dtype, name="offset",
        )(x).astype(jnp.float32)

        # identity grid in normalized coords (align_corners=False), + offsets
        base = affine_grid(
            jnp.broadcast_to(IDENTITY_THETA.reshape(1, 2, 3), (n, 2, 3)),
            (n, hh, ww), align_corners=False,
        )
        grid = base + offset
        if apply_on is None:
            apply_on = [img_a]
        # one warp for all apply-targets: same grid -> concat channels so the
        # kernel's one-hot weights and matmul passes are built once
        stacked = jnp.concatenate(
            [img.astype(jnp.float32) for img in apply_on], axis=-1
        )
        wall = _dense_warp(stacked, grid, self.fast_warp)
        warped, c0 = [], 0
        for img in apply_on:
            c1 = c0 + img.shape[-1]
            warped.append(wall[..., c0:c1].astype(img.dtype))
            c0 = c1
        reg = smoothness_loss(offset, img_b, alpha=self.alpha)
        return warped, reg


def smoothness_loss(offset: jax.Array, img: jax.Array, alpha: float = 0.0) -> jax.Array:
    """NeMAR ``stn_losses.smoothness_loss``: mean absolute 4-direction total
    variation of the offset field, optionally bilateral-weighted by image
    gradients (weight = exp(-alpha * |∇img|), ``stn_losses.py:4-30``).
    offset: (N, H, W, 2); img: (N, H, W, C).
    """
    def tv(d, axis):
        return jnp.abs(jnp.diff(d, axis=axis))

    dy = tv(offset, 1)  # (N, H-1, W, 2)
    dx = tv(offset, 2)  # (N, H, W-1, 2)
    if alpha > 0:
        iy = jnp.mean(jnp.abs(jnp.diff(img, axis=1)), axis=-1, keepdims=True)
        ix = jnp.mean(jnp.abs(jnp.diff(img, axis=2)), axis=-1, keepdims=True)
        dy = dy * jnp.exp(-alpha * iy)
        dx = dx * jnp.exp(-alpha * ix)
    return jnp.mean(dy) + jnp.mean(dx)
