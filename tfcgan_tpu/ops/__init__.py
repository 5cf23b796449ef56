"""TPU-first primitive ops.

Pure functions over jnp arrays (NHWC layout throughout — the TPU-native conv
layout). Parameterized layers live in ``tfcgan_tpu.models``.
"""

from tfcgan_tpu.ops.blurpool import blur_pool, make_blur_kernel
from tfcgan_tpu.ops.norm import instance_norm
from tfcgan_tpu.ops.quantize import quantize_uint8_torch, rgb_to_luma_uint8, luma_pil
from tfcgan_tpu.ops.temperature import (
    temperature_lut,
    temperature_lut_uint8,
    TEMP_MIN_C,
    TEMP_MAX_C,
)
from tfcgan_tpu.ops.fftloss import fft_amp_phase, fft_log_magnitude
from tfcgan_tpu.ops.patches import patchify, unpatchify, patch4, patch16
from tfcgan_tpu.ops.triplet import triplet_margin_loss
from tfcgan_tpu.ops.gan_losses import (
    bce_with_logits,
    relativistic_g_loss,
    relativistic_d_loss,
    lsgan_loss,
)
from tfcgan_tpu.ops.color import rgb_to_hsv, hsv_to_rgb, color_jitter
from tfcgan_tpu.ops.morphology import morphological_gradient, gray_dilation, gray_erosion
from tfcgan_tpu.ops.warp import affine_grid, grid_sample
from tfcgan_tpu.ops.resize import resize_bicubic_torch
from tfcgan_tpu.ops.metrics import psnr, ssim, bhattacharyya, ncc, mutual_information, fft_mag_mse, fft_mag_mae
from tfcgan_tpu.ops.saliency import saliency_mask, gaussian_blur
