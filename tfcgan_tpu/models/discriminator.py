"""Discriminator families.

- ``PatchDiscriminator``: the TFC-GAN global relativistic PatchGAN
  (``/root/reference/TFC-GAN-FFT/TFCGAN_multigpu_globalFFT.py:184-213``):
  4 spectral-norm conv(k4,s1,p1)+leaky(0.2)+blurpool(s2) blocks over the
  (A, B) channel concat, then asym zero-pad + conv to a 16×16 logit map.
- ``AuxClassifierDiscriminator``: the debiased variant with an ethnicity
  softmax head over the flattened input (``..._debiased_V7.py:206-250``).
- ``NLayerDiscriminator`` / ``PixelDiscriminator``: NeMAR's 70×70 PatchGAN and
  1×1 pixel discriminator (``/root/reference/nemar/models/networks.py``).
  Also the CycleGAN discriminator (stride-2 convs + instance norm).
- ``MultiDiscriminator``: ThermalGAN's 3-scale pyramid
  (``/root/reference/ThermalGAN/ThermalGAN.py:217-303``) — returns the list of
  per-scale logit maps; the loss averages MSE against the target per scale.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from tfcgan_tpu.models.layers import SpectralConv, TorchConv
from tfcgan_tpu.ops.blurpool import blur_pool
from tfcgan_tpu.ops.norm import instance_norm
from tfcgan_tpu.ops.resize import avg_pool_2x


class PatchDiscriminator(nn.Module):
    """(img_a, img_b) -> (N, H/16, W/16, 1) logits (16×16 for 256² input)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, img_a: jax.Array, img_b: jax.Array, update_stats: bool = False
    ) -> jax.Array:
        x = jnp.concatenate([img_a, img_b], axis=-1).astype(self.dtype)
        for i, feats in enumerate((64, 128, 256, 512)):
            x = SpectralConv(feats, dtype=self.dtype, name=f"block{i}_conv")(
                x, update_stats=update_stats
            )
            x = nn.leaky_relu(x, 0.2)
            x = blur_pool(x, stride=2)
        # ZeroPad2d((1,0,1,0)) + Conv(k4, p1, bias=False)
        x = TorchConv(
            1, padding=((2, 1), (2, 1)), use_bias=False, dtype=self.dtype,
            name="final_conv",
        )(x)
        return x


class AuxClassifierDiscriminator(nn.Module):
    """PatchDiscriminator + softmax label head(s) over the flattened input.

    V6/V7 (``_V7.py:206-250``) carry an ethnicity head only; V1–V5
    (``debiased.py:218-233``) add gender (2-way) and age (3-way) heads —
    enabled via ``num_gender``/``num_age`` > 0, returning the probs as a
    (gender, ethnicity, age) tuple in the reference's head order.
    """

    num_classes: int = 4
    num_gender: int = 0
    num_age: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, img_a: jax.Array, img_b: jax.Array, update_stats: bool = False
    ) -> tuple[jax.Array, jax.Array | tuple[jax.Array, jax.Array, jax.Array]]:
        logits = PatchDiscriminator(dtype=self.dtype, name="patch")(
            img_a, img_b, update_stats
        )
        flat = jnp.concatenate([img_a, img_b], axis=-1).reshape(img_a.shape[0], -1)
        flat = flat.astype(self.dtype)

        def head(k: int, name: str) -> jax.Array:
            return nn.softmax(nn.Dense(k, name=name, dtype=self.dtype)(flat))

        probs_e = head(self.num_classes, "aux_ethn")
        if self.num_gender > 0:
            probs_g = head(self.num_gender, "aux_gender")
            probs_a = head(self.num_age, "aux_age")
            return logits, (probs_g, probs_e, probs_a)
        return logits, probs_e


class NLayerDiscriminator(nn.Module):
    """pix2pix/CycleGAN PatchGAN: conv(k4,s2) stacks with instance norm.

    n_layers=3 gives the 70×70 PatchGAN (``networks.py:168`` 'basic'|'n_layers'
    and ``cyclegan_og/cyclegan.py:168+``).
    """

    ndf: int = 64
    n_layers: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = x.astype(self.dtype)
        x = TorchConv(self.ndf, strides=(2, 2), name="conv0", dtype=self.dtype)(x)
        x = nn.leaky_relu(x, 0.2)
        nf = self.ndf
        for i in range(1, self.n_layers):
            nf = min(nf * 2, self.ndf * 8)
            x = TorchConv(nf, strides=(2, 2), use_bias=True, name=f"conv{i}", dtype=self.dtype)(x)
            x = instance_norm(x)
            x = nn.leaky_relu(x, 0.2)
        nf = min(nf * 2, self.ndf * 8)
        x = TorchConv(nf, strides=(1, 1), name=f"conv{self.n_layers}", dtype=self.dtype)(x)
        x = instance_norm(x)
        x = nn.leaky_relu(x, 0.2)
        return TorchConv(1, strides=(1, 1), name="final", dtype=self.dtype)(x)


class PixelDiscriminator(nn.Module):
    """NeMAR 'pixel': 1×1 conv stack (``networks.py:168`` netD='pixel')."""

    ndf: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = x.astype(self.dtype)
        x = TorchConv(self.ndf, kernel_size=(1, 1), padding=((0, 0), (0, 0)), name="conv0", dtype=self.dtype)(x)
        x = nn.leaky_relu(x, 0.2)
        x = TorchConv(self.ndf * 2, kernel_size=(1, 1), padding=((0, 0), (0, 0)), name="conv1", dtype=self.dtype)(x)
        x = instance_norm(x)
        x = nn.leaky_relu(x, 0.2)
        return TorchConv(1, kernel_size=(1, 1), padding=((0, 0), (0, 0)), name="final", dtype=self.dtype)(x)


class _PyramidD(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i, feats in enumerate((64, 128, 256, 512)):
            x = TorchConv(feats, strides=(2, 2), name=f"conv{i}", dtype=self.dtype)(x)
            if i > 0:
                x = instance_norm(x)
            x = nn.leaky_relu(x, 0.2)
        return TorchConv(
            1, kernel_size=(3, 3), padding=((1, 1), (1, 1)), name="final",
            dtype=self.dtype,
        )(x)


class MultiDiscriminator(nn.Module):
    """ThermalGAN pyramid: 3 discriminators, input avg-pooled 2× between them.

    Returns the list of per-scale logit maps; ``multiscale_loss`` below
    reproduces the reference's in-forward loss (mean of per-scale losses).
    """

    num_scales: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> list[jax.Array]:
        outs = []
        x = x.astype(self.dtype)
        for i in range(self.num_scales):
            outs.append(_PyramidD(dtype=self.dtype, name=f"disc_{i}")(x))
            if i + 1 < self.num_scales:
                x = avg_pool_2x(x)
        return outs


def multiscale_loss(outputs: list[jax.Array], target: float, loss: str = "l1") -> jax.Array:
    """ThermalGAN's in-forward D loss: mean over scales of L1(out, target)
    (``ThermalGAN.py:279-303``; ``my_loss`` is nn.L1Loss)."""
    terms = []
    for out in outputs:
        t = jnp.full_like(out, target)
        if loss == "l1":
            terms.append(jnp.mean(jnp.abs(out - t)))
        else:
            terms.append(jnp.mean(jnp.square(out - t)))
    return jnp.mean(jnp.stack(terms))
