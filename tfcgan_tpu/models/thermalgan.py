"""ThermalGAN two-stage baseline models
(``/root/reference/ThermalGAN/ThermalGAN.py``, noAMP variant in configs).

Stage 1 (BicycleGAN-style): ``GeneratorG1`` — UNet-7 over cat(A, temp-plane)
(3×3 stride-2 convs down, upsample+conv up, ``:89-180``); ``Encoder`` —
ResNet trunk -> (mu, logvar) for the KL term (``:183-215``);
``MultiDiscriminator`` (3-scale pyramid) lives in
``tfcgan_tpu.models.discriminator``.

Stage 2 (pix2pix): ``GeneratorG2`` — UNet-8 (k4 s2 convs / convT, ``:316-402``)
fake_S -> fake_B; ``DiscriminatorPix`` — stride-2 PatchGAN (``:405-434``).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from tfcgan_tpu.models.layers import (
    TorchConv,
    TorchConvTranspose,
    Upsample2xConv,
)
from tfcgan_tpu.ops.norm import instance_norm


class TrainBatchNorm(nn.Module):
    """torch ``BatchNorm2d(out, 0.8)`` in train mode (``ThermalGAN2.py:91,
    105``). The positional 0.8 lands on **eps**, not momentum — an old-GAN-
    repo quirk kept for parity. Running statistics are not tracked: the
    reference never runs this net in eval mode (sampling happens mid-training
    under train()), so normalization always uses the batch statistics —
    torch's biased (1/N) variance. Under data-parallel sharding XLA computes
    the *global* batch moments (unlike DataParallel's per-GPU stats, a quirk
    SURVEY §7 says not to copy)."""

    eps: float = 0.8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        # weights_init_normal (ThermalGAN2.py:375-381): weight~N(1,0.02), bias 0
        scale = self.param(
            "scale",
            lambda k, s: 1.0 + 0.02 * jax.random.normal(k, s, jnp.float32), (c,),
        )
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=(0, 1, 2))
        var = jnp.var(x32, axis=(0, 1, 2))
        y = (x32 - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias
        return y.astype(x.dtype)


class _DownBic(nn.Module):
    feats: int
    normalize: bool = True
    norm: str = "instance"  # "instance" (ThermalGAN) | "batch" (ThermalGAN2)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = TorchConv(self.feats, kernel_size=(3, 3), strides=(2, 2),
                      padding=((1, 1), (1, 1)), use_bias=False,
                      dtype=self.dtype, name="conv")(x)
        if self.normalize:
            if self.norm == "batch":
                x = TrainBatchNorm(dtype=self.dtype, name="bn")(x)
            else:
                x = instance_norm(x)
        return nn.leaky_relu(x, 0.2)


class _UpBic(nn.Module):
    feats: int
    norm: str = "instance"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip):
        # upsample fused into the conv (layers.Upsample2xConv; same params)
        x = Upsample2xConv(self.feats, kernel_size=(3, 3), padding=((1, 1), (1, 1)),
                           use_bias=False, dtype=self.dtype, name="conv")(x)
        if self.norm == "batch":
            x = TrainBatchNorm(dtype=self.dtype, name="bn")(x)
        else:
            x = instance_norm(x)
        x = nn.leaky_relu(x, 0.01)  # reference uses default LeakyReLU slope
        return jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)


class GeneratorG1(nn.Module):
    """UNet-7 conditioned on a per-pixel temperature plane: forward(x, t).

    ``norm="batch"`` selects the ThermalGAN2 variant (BatchNorm blocks and
    ``down7 normalize=False``, ``ThermalGAN2.py:26-32``)."""

    out_channels: int = 3
    norm: str = "instance"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, t: jax.Array) -> jax.Array:
        dt = self.dtype
        h = jnp.concatenate([x.astype(dt), t[..., None].astype(dt)], axis=-1)
        downs = []
        d = h
        down7_norm = self.norm != "batch"
        for i, (f, norm) in enumerate([(64, False), (128, True), (256, True),
                                       (512, True), (512, True), (512, True),
                                       (512, down7_norm)]):
            d = _DownBic(f, normalize=norm, norm=self.norm, dtype=dt,
                         name=f"down{i+1}")(d)
            downs.append(d)
        u = downs[-1]
        for i, f in enumerate([512, 512, 512, 256, 128, 64]):
            u = _UpBic(f, norm=self.norm, dtype=dt, name=f"up{i+1}")(u, downs[-(i + 2)])
        u = Upsample2xConv(self.out_channels, kernel_size=(3, 3),
                           padding=((1, 1), (1, 1)), dtype=dt, name="final")(u)
        return jnp.tanh(u)


class Encoder(nn.Module):
    """ResNet trunk -> pooled features -> (mu, logvar), latent_dim=8."""

    latent_dim: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> tuple[jax.Array, jax.Array]:
        from tfcgan_tpu.models.resnet import BasicBlock

        h = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, name="stem")(x.astype(self.dtype))
        h = nn.GroupNorm(num_groups=None, group_size=1, dtype=self.dtype, name="stem_norm")(h)
        h = nn.relu(h)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        # resnet18 children[:-3]: layers 1-3 only (up to 256 feats)
        for i, (feats, stride) in enumerate([(64, 1), (64, 1), (128, 2), (128, 1),
                                             (256, 2), (256, 1)]):
            h = BasicBlock(feats, stride, dtype=self.dtype, name=f"block{i}")(h)
        # AvgPool2d(kernel 8, stride 8) then flatten
        h = nn.avg_pool(h, (8, 8), strides=(8, 8))
        h = h.reshape(h.shape[0], -1)
        mu = nn.Dense(self.latent_dim, dtype=self.dtype, name="fc_mu")(h)
        logvar = nn.Dense(self.latent_dim, dtype=self.dtype, name="fc_logvar")(h)
        return mu, logvar


class _DownPix(nn.Module):
    feats: int
    normalize: bool = True
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        x = TorchConv(self.feats, strides=(2, 2), use_bias=False,
                      dtype=self.dtype, name="conv")(x)
        if self.normalize:
            x = instance_norm(x)
        x = nn.leaky_relu(x, 0.2)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return x


class _UpPix(nn.Module):
    feats: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip, deterministic=True):
        x = TorchConvTranspose(self.feats, dtype=self.dtype, name="conv")(x)
        x = instance_norm(x)
        x = nn.relu(x)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)


class GeneratorG2(nn.Module):
    """pix2pix UNet-8: fake_S -> fake_B."""

    out_channels: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        dt = self.dtype
        if x.shape[1] < 256 or x.shape[2] < 256:
            # 8 stride-2 downs: anything smaller leaves a 0x0 bottleneck that
            # XLA silently tolerates (degenerate all-bias up1) but torch
            # rejects — the reference only ever runs this net at 256^2
            raise ValueError(
                f"GeneratorG2 needs >=256^2 inputs (8 downsamples), got "
                f"{x.shape[1]}x{x.shape[2]}"
            )
        plan = [(64, False, 0.0), (128, True, 0.0), (256, True, 0.0),
                (512, True, 0.5), (512, True, 0.5), (512, True, 0.5),
                (512, True, 0.5), (512, False, 0.5)]
        downs = []
        d = x.astype(dt)
        for i, (f, norm, drop) in enumerate(plan):
            d = _DownPix(f, normalize=norm, dropout=drop, dtype=dt,
                         name=f"down{i+1}")(d, deterministic)
            downs.append(d)
        u = downs[-1]
        for i, (f, drop) in enumerate([(512, 0.5), (512, 0.5), (512, 0.5),
                                       (512, 0.5), (256, 0.0), (128, 0.0), (64, 0.0)]):
            u = _UpPix(f, dropout=drop, dtype=dt, name=f"up{i+1}")(
                u, downs[-(i + 2)], deterministic
            )
        u = Upsample2xConv(self.out_channels, padding=((2, 1), (2, 1)), dtype=dt,
                           name="final")(u)
        return jnp.tanh(u)


class VAEDiscriminator2(nn.Module):
    """ThermalGAN2's stage-1 D: a single pix2pix-style PatchGAN on the
    segmentation image alone (``ThermalGAN2.py:210-240`` — the 3-scale
    pyramid "was leading to numerical instability, so changed it to the
    pix2pix D"): 4 k4/s2 conv blocks (biased; IN on blocks 1-3) + k4/p1
    unbiased head, scored with MSE."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = x.astype(self.dtype)
        for i, f in enumerate((64, 128, 256, 512)):
            x = TorchConv(f, strides=(2, 2), name=f"conv{i}", dtype=self.dtype)(x)
            if i > 0:
                x = instance_norm(x)
            x = nn.leaky_relu(x, 0.2)
        return TorchConv(1, use_bias=False, name="final", dtype=self.dtype)(x)


class DiscriminatorPix(nn.Module):
    """pix2pix PatchGAN (k4 s2 blocks + asym-pad head), (img, cond) input."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, img: jax.Array, cond: jax.Array) -> jax.Array:
        x = jnp.concatenate([img, cond], axis=-1).astype(self.dtype)
        for i, f in enumerate((64, 128, 256, 512)):
            x = TorchConv(f, strides=(2, 2), name=f"conv{i}", dtype=self.dtype)(x)
            if i > 0:
                x = instance_norm(x)
            x = nn.leaky_relu(x, 0.2)
        return TorchConv(1, padding=((2, 1), (2, 1)), use_bias=False,
                         name="final", dtype=self.dtype)(x)


def thermal_mask(b: jax.Array) -> jax.Array:
    """Segmentation surrogate ``enlarge_and_bitwise_thermal`` (``:498-519``),
    implemented by intent: inverted grayscale of the thermal image,
    L2-normalized along H, broadcast to 3 channels.

    (The reference's cv2 path — .view() channel scramble + bitwise_not on
    float32 — is undefined-behavior bit-flipping we deliberately do not copy.)
    """
    gray = jnp.mean(b, axis=-1)  # (N, H, W) in [-1, 1]
    inv = -gray
    norm = jnp.sqrt(jnp.sum(inv * inv, axis=1, keepdims=True)) + 1e-12
    n = inv / norm
    return jnp.repeat(n[..., None], 3, axis=-1)


def normalized_temps(t: jax.Array) -> jax.Array:
    """vectorize_temps + F.normalize(p=2, dim=H) (``:483-493``): (N,H,W)->same."""
    norm = jnp.sqrt(jnp.sum(t * t, axis=1, keepdims=True)) + 1e-12
    return t / norm
