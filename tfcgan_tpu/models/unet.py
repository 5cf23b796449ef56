"""The TFC-GAN U-Net generator family.

Rebuilds ``GeneratorUNet`` (``/root/reference/TFC-GAN-FFT/
TFCGAN_multigpu_globalFFT.py:138-176``): 6 BlurPool down blocks, 5 up blocks
with skip concats, and a nearest-upsample + asym-pad + conv + tanh head.
Channel plan (256² input): 64-128-256-512-512-512 down / 512-512-256-128-64 up.

``ConditionalGeneratorUNet`` adds the "debiased" label conditioning of
``TFCGAN_multigpu_patchFFT_debiased_V7.py:164-203``: an FC layer maps the
label vector to an H×W plane concatenated as an extra input channel.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from tfcgan_tpu.models.layers import (
    UNetDown,
    UNetUp,
    Upsample2xConv,
)


class GeneratorUNet(nn.Module):
    out_channels: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        dt = self.dtype
        x = x.astype(dt)
        d1 = UNetDown(64, normalize=False, dtype=dt, name="down1")(x, deterministic)
        d2 = UNetDown(128, dtype=dt, name="down2")(d1, deterministic)
        d3 = UNetDown(256, dropout=0.5, dtype=dt, name="down3")(d2, deterministic)
        d4 = UNetDown(512, dropout=0.5, dtype=dt, name="down4")(d3, deterministic)
        d5 = UNetDown(512, normalize=False, dtype=dt, name="down5")(d4, deterministic)
        d6 = UNetDown(512, dtype=dt, name="down6")(d5, deterministic)
        u1 = UNetUp(512, dtype=dt, name="up1")(d6, d5, deterministic)
        u2 = UNetUp(512, dropout=0.5, dtype=dt, name="up2")(u1, d4, deterministic)
        u3 = UNetUp(256, dropout=0.5, dtype=dt, name="up3")(u2, d3, deterministic)
        u4 = UNetUp(128, dtype=dt, name="up4")(u3, d2, deterministic)
        u5 = UNetUp(64, dtype=dt, name="up5")(u4, d1, deterministic)
        # final: Upsample(x2 nearest) -> ZeroPad2d((1,0,1,0)) -> Conv(k4,p1)
        # -> tanh, with the upsample FUSED into the conv (one lhs-dilated
        # MXU conv; same "final_conv" params — see layers.Upsample2xConv)
        y = Upsample2xConv(
            self.out_channels, padding=((2, 1), (2, 1)), dtype=dt, name="final_conv"
        )(u5)
        return jnp.tanh(y)


class ConditionalGeneratorUNet(nn.Module):
    """Label-conditional generator (debiased family).

    ``forward(x, labels)``: labels (N, L) -> FC -> (N, H, W, 1) plane,
    concatenated to the image as a 4th input channel (``_V7.py:188-203``).
    """

    out_channels: int = 3
    image_size: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, labels: jax.Array, deterministic: bool = True) -> jax.Array:
        n, h, w, _ = x.shape
        plane = nn.Dense(h * w, name="label_fc", dtype=self.dtype)(
            labels.astype(self.dtype)
        )
        plane = plane.reshape(n, h, w, 1)
        x = jnp.concatenate([x.astype(self.dtype), plane], axis=-1)
        return GeneratorUNet(self.out_channels, dtype=self.dtype, name="unet")(
            x, deterministic
        )
