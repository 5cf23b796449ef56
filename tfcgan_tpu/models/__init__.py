"""Flax model families rebuilt TPU-first from the reference architectures."""

from tfcgan_tpu.models.layers import (
    TorchConv,
    TorchConvTranspose,
    SpectralConv,
    UNetDown,
    UNetUp,
)
from tfcgan_tpu.models.unet import GeneratorUNet, ConditionalGeneratorUNet
from tfcgan_tpu.models.discriminator import (
    PatchDiscriminator,
    AuxClassifierDiscriminator,
    NLayerDiscriminator,
    PixelDiscriminator,
    MultiDiscriminator,
)
from tfcgan_tpu.models.lpips import LPIPS, VGG16Features
from tfcgan_tpu.models.vit import ViT
from tfcgan_tpu.models.stn import AffineSTN, LocalizerViT, DeformableSTN
from tfcgan_tpu.models.resnet_gen import ResNetGenerator
