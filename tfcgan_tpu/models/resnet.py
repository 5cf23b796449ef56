"""Small ResNet-18 classifier.

Stand-in for the reference's ``torchvision.models.resnet18(pretrained=True)``
used as (a) the frozen regional-ethnicity CNNs of the debiased family
(``/root/reference/TFC-GAN-FFT/TFCGAN_multigpu_patchFFT_debiased_V7.py:258-273``)
and (b) the ThermalGAN VAE encoder (``/root/reference/ThermalGAN/
ThermalGAN.py:183-215``). Pretrained ImageNet weights are not downloadable in
this environment; ``tools/convert_torchvision.py`` can inject them from a
torch checkpoint when available.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class BasicBlock(nn.Module):
    feats: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        h = nn.Conv(self.feats, (3, 3), strides=(self.stride, self.stride),
                    padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        h = nn.GroupNorm(num_groups=None, group_size=1, dtype=self.dtype, name="n1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.feats, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, name="conv2")(h)
        h = nn.GroupNorm(num_groups=None, group_size=1, dtype=self.dtype, name="n2")(h)
        if self.stride != 1 or x.shape[-1] != self.feats:
            x = nn.Conv(self.feats, (1, 1), strides=(self.stride, self.stride),
                        use_bias=False, dtype=self.dtype, name="down")(x)
            x = nn.GroupNorm(num_groups=None, group_size=1, dtype=self.dtype, name="dn")(x)
        return nn.relu(x + h)


class ResNet18(nn.Module):
    """Feature trunk + optional classifier head.

    Uses instance-style GroupNorm(group_size=1) instead of BatchNorm — running
    batch statistics add cross-replica state for zero quality benefit at GAN
    batch sizes, and norm choice is free here since weights are not ported.
    """

    num_classes: int | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        h = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, name="stem")(x.astype(self.dtype))
        h = nn.GroupNorm(num_groups=None, group_size=1, dtype=self.dtype, name="stem_norm")(h)
        h = nn.relu(h)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for i, (feats, blocks, stride) in enumerate(
            [(64, 2, 1), (128, 2, 2), (256, 2, 2), (512, 2, 2)]
        ):
            for b in range(blocks):
                h = BasicBlock(feats, stride if b == 0 else 1, dtype=self.dtype,
                               name=f"layer{i}_{b}")(h)
        h = jnp.mean(h, axis=(1, 2))  # global average pool
        if self.num_classes is not None:
            h = nn.Dropout(0.3, deterministic=not train)(h)
            h = nn.Dense(self.num_classes, dtype=self.dtype, name="fc")(h)
        return h


def encoder_head(features: jax.Array, latent_dim: int) -> tuple[jax.Array, jax.Array]:
    """Split trunk features into (mu, logvar) — see ThermalGAN Encoder."""
    raise NotImplementedError("use models.thermalgan.Encoder")
