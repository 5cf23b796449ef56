"""TFC-GAN TPU — a TPU-native (JAX/XLA/Pallas/pjit) framework for
thermal<->visible face translation with the full capabilities of the
nudro/TFC-GAN reference codebase.

The reference (see /root/reference and SURVEY.md) is ~30 self-contained PyTorch
scripts; this package factors them into one library:

- ``tfcgan_tpu.ops``        — TPU-first primitive ops (BlurPool, spectral norm,
  instance norm, FFT amp/phase losses, temperature LUT, patch tiling, color
  jitter, warping, morphology, metrics). Everything runs in-graph: no
  host round-trips inside the train step.
- ``tfcgan_tpu.models``     — Flax model families (U-Net generator, PatchGAN
  discriminators, ViT-STN, ResNet generator, LPIPS, ThermalGAN stages,
  diffusion UNet).
- ``tfcgan_tpu.recipes``    — per-experiment loss recipes replacing the
  reference's 30 script clones (FFT-GLO, FFT-PATCH-16, STN NewModel3, ...).
- ``tfcgan_tpu.train``      — a single jitted alternating G/D train step,
  full-state checkpointing, metric sinks.
- ``tfcgan_tpu.parallel``   — mesh construction and sharding policies
  (data-parallel over ICI via NamedSharding; multi-host ready).
- ``tfcgan_tpu.data``       — host-side image pairing/decode; all math
  (normalize, LUT, patches, augmentation) stays on device.
- ``tfcgan_tpu.evaluation`` — on-device SSIM/PSNR/Bhattacharyya/FFT-MSE and
  offline CSV-compatible eval CLI.
"""

__version__ = "0.1.0"
