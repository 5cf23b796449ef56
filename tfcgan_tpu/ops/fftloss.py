"""Fourier amplitude/phase components, batched on device.

The reference computes ``np.fft.rfft2`` per sample on host PIL grayscale
(``/root/reference/TFC-GAN-FFT/TFCGAN_multigpu_globalFFT.py:244-284``):

    f = rfft2(gray_uint8); fshift = fftshift(f)       # BOTH axes shifted,
    amp = |fshift|; phase = arctan2(im, re)            # incl. truncated axis

On TPU this is one batched ``jnp.fft.rfft2`` over (N, H, W) fused into the
loss — the #1 host-round-trip the rebuild eliminates (SURVEY.md §3.1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tfcgan_tpu.ops.quantize import rgb_to_luma_uint8
from tfcgan_tpu.parallel.mesh import gather_spatial


def fft_amp_phase(x: jax.Array, mode: str = "exact") -> tuple[jax.Array, jax.Array]:
    """Normalized RGB (N, H, W, 3) -> (amp, phase), each (N, H, W//2 + 1).

    Matches ``FFT_Components.make_components``: rfft2 of the grayscale plane,
    fftshifted on both axes (numpy fftshift default — axis -1 has odd length
    W//2+1 for even W, so it rolls by (W//2+1)//2), unnormalized amplitude,
    phase = arctan2(imag, real).

    mode: "exact" (uint8+PIL-luma emulation, zero grad — reference parity) or
    "smooth" (differentiable luma, no quantization).
    """
    gray = rgb_to_luma_uint8(x, mode=mode)  # (N, H, W) in [0, 255]
    gray = gather_spatial(gray)  # full H per shard when a spatial axis exists
    f = jnp.fft.rfft2(gray.astype(jnp.float32))
    f = jnp.fft.fftshift(f, axes=(-2, -1))
    amp = jnp.abs(f)
    phase = jnp.arctan2(f.imag, f.real)
    return amp, phase


def fft_log_magnitude(x: jax.Array, mode: str = "eval") -> jax.Array:
    """``FFT_Components.make_spectra``: log|fftshift(fft2(gray))| (N, H, W).

    Default mode="eval": quantize [-1,1] back to the on-disk uint8 the
    offline eval scripts read (round+clip) before grayscaling — the metric
    path. mode="exact" reproduces the TRAINING losses' ToPILImage wraparound
    on [-1,1] tensors instead (``quantize.rgb_to_luma_uint8``)."""
    gray = gather_spatial(rgb_to_luma_uint8(x, mode=mode))
    f = jnp.fft.fftshift(jnp.fft.fft2(gray.astype(jnp.float32)), axes=(-2, -1))
    # Floor |f| at the smallest positive normal: a constant image has |f|=0
    # everywhere but DC, and log(0) = -inf poisoned downstream normalization
    # with NaNs (infer.py spectra rendering). For any non-degenerate image
    # |f| >> tiny so the metric value is bit-identical to the reference's
    # np.log(np.abs(...)) (``Eurecom_MagMSE.py:121-134``).
    return jnp.log(jnp.maximum(jnp.abs(f), jnp.finfo(jnp.float32).tiny))


def fft_l1_loss(
    fake: jax.Array, real: jax.Array, mode: str = "exact"
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """The reference FFT loss: L1(amp_f, amp_r), L1(pha_f, pha_r), and
    loss_FFT = 0.5*(amp + phase) (``TFCGAN_multigpu_globalFFT.py:495-499``).

    Returns (loss_fft, loss_amp, loss_phase).
    """
    amp_f, pha_f = fft_amp_phase(fake, mode=mode)
    amp_r, pha_r = fft_amp_phase(real, mode=mode)
    loss_amp = jnp.mean(jnp.abs(amp_f - amp_r))
    loss_pha = jnp.mean(jnp.abs(pha_f - pha_r))
    return 0.5 * (loss_amp + loss_pha), loss_amp, loss_pha
