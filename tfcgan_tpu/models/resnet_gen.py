"""ResNet generator (CycleGAN baseline / NeMAR resnet_9blocks).

Rebuild of ``GeneratorResNet`` (``/root/reference/cyclegan_og/cyclegan.py:
111-167``): reflection-pad 7×7 stem -> 2 stride-2 downsampling convs ->
N residual blocks (reflect-pad 3×3 convs + instance norm) -> 2 nearest-upsample
+ conv stages -> reflection-pad 7×7 head + tanh. All instance-normalized.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from tfcgan_tpu.models.layers import TorchConv, Upsample2xConv
from tfcgan_tpu.ops.norm import instance_norm


def _reflect_pad(x: jax.Array, p: int) -> jax.Array:
    return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")


class ResidualBlock(nn.Module):
    feats: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = _reflect_pad(x, 1)
        h = TorchConv(self.feats, kernel_size=(3, 3), padding=((0, 0), (0, 0)),
                      dtype=self.dtype, name="conv1")(h)
        h = instance_norm(h)
        h = nn.relu(h)
        h = _reflect_pad(h, 1)
        h = TorchConv(self.feats, kernel_size=(3, 3), padding=((0, 0), (0, 0)),
                      dtype=self.dtype, name="conv2")(h)
        h = instance_norm(h)
        return x + h


class ResNetGenerator(nn.Module):
    out_channels: int = 3
    num_blocks: int = 9
    base_feats: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dt = self.dtype
        x = x.astype(dt)
        f = self.base_feats
        h = _reflect_pad(x, 3)
        h = TorchConv(f, kernel_size=(7, 7), padding=((0, 0), (0, 0)), dtype=dt,
                      name="stem")(h)
        h = instance_norm(h)
        h = nn.relu(h)
        for i in range(2):  # downsample
            f *= 2
            h = TorchConv(f, kernel_size=(3, 3), strides=(2, 2),
                          padding=((1, 1), (1, 1)), dtype=dt, name=f"down{i}")(h)
            h = instance_norm(h)
            h = nn.relu(h)
        for i in range(self.num_blocks):
            h = ResidualBlock(f, dtype=dt, name=f"res{i}")(h)
        for i in range(2):  # upsample
            f //= 2
            # upsample fused into the conv (layers.Upsample2xConv; same params)
            h = Upsample2xConv(f, kernel_size=(3, 3),
                               padding=((1, 1), (1, 1)), dtype=dt, name=f"up{i}")(h)
            h = instance_norm(h)
            h = nn.relu(h)
        h = _reflect_pad(h, 3)
        h = TorchConv(self.out_channels, kernel_size=(7, 7),
                      padding=((0, 0), (0, 0)), dtype=dt, name="head")(h)
        return jnp.tanh(h)
