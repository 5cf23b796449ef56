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
    # "gn": GroupNorm(group_size=1) after each conv (from-scratch training).
    # "folded": no norm layers, biased convs — for frozen torchvision weights
    # with eval-mode BatchNorm folded in (tools/convert_resnet.py).
    norm: str = "gn"

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        bias = self.norm == "folded"
        h = nn.Conv(self.feats, (3, 3), strides=(self.stride, self.stride),
                    padding=((1, 1), (1, 1)), use_bias=bias, dtype=self.dtype,
                    name="conv1")(x)
        if self.norm == "gn":
            h = nn.GroupNorm(num_groups=None, group_size=1, dtype=self.dtype, name="n1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.feats, (3, 3), padding=((1, 1), (1, 1)), use_bias=bias,
                    dtype=self.dtype, name="conv2")(h)
        if self.norm == "gn":
            h = nn.GroupNorm(num_groups=None, group_size=1, dtype=self.dtype, name="n2")(h)
        if self.stride != 1 or x.shape[-1] != self.feats:
            x = nn.Conv(self.feats, (1, 1), strides=(self.stride, self.stride),
                        use_bias=bias, dtype=self.dtype, name="down")(x)
            if self.norm == "gn":
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
    norm: str = "gn"  # see BasicBlock

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        bias = self.norm == "folded"
        h = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=bias, dtype=self.dtype, name="stem")(x.astype(self.dtype))
        if self.norm == "gn":
            h = nn.GroupNorm(num_groups=None, group_size=1, dtype=self.dtype, name="stem_norm")(h)
        h = nn.relu(h)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for i, (feats, blocks, stride) in enumerate(
            [(64, 2, 1), (128, 2, 2), (256, 2, 2), (512, 2, 2)]
        ):
            for b in range(blocks):
                h = BasicBlock(feats, stride if b == 0 else 1, dtype=self.dtype,
                               norm=self.norm, name=f"layer{i}_{b}")(h)
        h = jnp.mean(h, axis=(1, 2))  # global average pool
        if self.num_classes is not None:
            h = nn.Dropout(0.3, deterministic=not train)(h)
            h = nn.Dense(self.num_classes, dtype=self.dtype, name="fc")(h)
        return h


def load_resnet18_backbone(path: str):
    """Load a backbone tree converted by ``tools/convert_resnet.py``
    (torchvision resnet18 with eval-mode BatchNorm folded into biased convs),
    validated against the ``ResNet18(norm="folded")`` structure. Returns the
    backbone params only — the classifier ``fc`` is always trained fresh (the
    reference replaces it too, ``debiased_V7.py:266-269``)."""
    from flax import serialization

    template = ResNet18(num_classes=None, norm="folded").init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))
    )["params"]
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())
