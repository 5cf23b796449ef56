"""LPIPS perceptual metric (VGG16 backbone), in Flax.

The reference uses ``lpips_pytorch.LPIPS(net_type='vgg', version='0.1')`` as
its heaviest loss term (``/root/reference/TFC-GAN-FFT/
TFCGAN_multigpu_globalFFT.py:71-74,492``). Faithful structure:

1. input scaling: x_scaled = (x - shift) / scale with the published LPIPS
   constants (x in [-1, 1]),
2. VGG16 features at relu1_2 / relu2_2 / relu3_3 / relu4_3 / relu5_3,
3. channel-wise unit-normalize each feature map,
4. squared difference -> non-negative 1x1 "lin" calibration conv -> spatial
   mean -> sum over the 5 layers.

Pretrained VGG16 + lin weights cannot be downloaded in this environment
(zero egress); ``tools/convert_lpips.py`` converts them from torch checkpoints
when available. Until then params are seeded-random — the *structure* is
verified against a torch clone in tests (same weights injected both sides),
and random-VGG LPIPS still functions as a perceptual loss.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tfcgan_tpu.ops.pooling import pool22

# Published LPIPS input scaling constants.
# numpy, not jnp, so importing the model zoo never initializes the backend
_SHIFT = np.asarray([-0.030, -0.088, -0.188], dtype=np.float32)
_SCALE = np.asarray([0.458, 0.448, 0.450], dtype=np.float32)

# VGG16 conv plan: (out_channels, pool_before)
_VGG_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512]
# Indices (into conv counts) after which LPIPS taps features: relu1_2=conv2,
# relu2_2=conv4, relu3_3=conv7, relu4_3=conv10, relu5_3=conv13.
_TAPS = {2, 4, 7, 10, 13}
LPIPS_CHANNELS = (64, 128, 256, 512, 512)


class VGG16Features(nn.Module):
    """VGG16 conv tower returning the 5 LPIPS feature taps."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> list[jax.Array]:
        feats = []
        conv_idx = 0
        h = x.astype(self.dtype)
        for item in _VGG_CFG:
            if item == "M":
                h = pool22(h)  # perf-knob dispatch (ops/pooling.py)
                continue
            conv_idx += 1
            h = nn.Conv(
                item, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                name=f"conv{conv_idx}",
            )(h)
            h = nn.relu(h)
            if conv_idx in _TAPS:
                feats.append(h)
        return feats


def _unit_normalize(f: jax.Array, eps: float = 1e-10) -> jax.Array:
    norm = jnp.sqrt(jnp.sum(jnp.square(f), axis=-1, keepdims=True))
    return f / (norm + eps)


class LPIPS(nn.Module):
    """d(x, y) for x, y in [-1, 1], NHWC. Returns (N,) distances."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, y: jax.Array) -> jax.Array:
        sx = ((x - _SHIFT) / _SCALE).astype(self.dtype)
        sy = ((y - _SHIFT) / _SCALE).astype(self.dtype)
        net = VGG16Features(dtype=self.dtype, name="vgg")
        # two separate towers (NOT one concatenated pass): measured on v5e,
        # concat-batching keeps fwd flat but slows the backward 45->65 ms
        # because XLA can no longer drop the no-grad (reference-image) branch
        fx = net(sx)
        fy = net(sy)
        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            d = jnp.square(_unit_normalize(a.astype(jnp.float32)) - _unit_normalize(b.astype(jnp.float32)))
            w = self.param(
                f"lin{i}", nn.initializers.uniform(scale=0.1),
                (LPIPS_CHANNELS[i],), jnp.float32,
            )
            # non-negative calibration weights, as in the published model
            d = jnp.sum(d * jnp.abs(w), axis=-1)
            total = total + jnp.mean(d, axis=(1, 2))
        return total


def lpips_loss(module: LPIPS, params, x: jax.Array, y: jax.Array) -> jax.Array:
    """Mean LPIPS over the batch — the form used inside the G loss."""
    return jnp.mean(module.apply(params, x, y))


def load_lpips_params(path: str):
    """Load params converted by ``tools/convert_lpips.py`` (flax-serialized),
    validated against the LPIPS module structure."""
    from flax import serialization

    template = LPIPS().init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3))
    )
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


_WEIGHTS_ENV = {"lpips": "TFCGAN_LPIPS_WEIGHTS", "resnet": "TFCGAN_RESNET_WEIGHTS"}
_WEIGHTS_NAME = {"lpips": "lpips_flax.msgpack", "resnet": "resnet18_flax.msgpack"}


def default_weights_path(kind: str) -> str:
    """Auto-discover converted pretrained weights (turnkey drop-in, README
    'Pretrained weights'): ``$TFCGAN_LPIPS_WEIGHTS``/``$TFCGAN_RESNET_WEIGHTS``
    if set, else ``<repo>/weights/{lpips,resnet18}_flax.msgpack`` next to the
    package. Returns "" when nothing exists — callers then fall back to the
    weight-free paths (msrecon anchor / GroupNorm ResNet)."""
    import os

    env = os.environ.get(_WEIGHTS_ENV[kind], "")
    if env:
        return env
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    cand = os.path.join(here, "weights", _WEIGHTS_NAME[kind])
    return cand if os.path.exists(cand) else ""


def resolve_lpips_weights(loss_cfg) -> str:
    """Explicit ``LossConfig.lpips_weights`` wins; else auto-discovery."""
    return getattr(loss_cfg, "lpips_weights", "") or default_weights_path("lpips")


def resolve_resnet_weights(loss_cfg) -> str:
    """Explicit ``LossConfig.resnet_weights`` wins; else auto-discovery."""
    return getattr(loss_cfg, "resnet_weights", "") or default_weights_path("resnet")


def resolve_perceptual(loss_cfg) -> str:
    """Resolve LossConfig.perceptual: 'auto' -> 'lpips' iff converted weights
    exist (``loss_cfg.lpips_weights`` or the auto-discovered drop-in path),
    else the fixed 'msrecon' anchor."""
    import os

    mode = getattr(loss_cfg, "perceptual", "lpips")
    if mode != "auto":
        return mode
    path = resolve_lpips_weights(loss_cfg)
    return "lpips" if (path and os.path.exists(path)) else "msrecon"
