"""Pallas TPU kernels for the memory-bound hot ops.

Measured motivation (tools/microbench.py + tools/profile_step.py, TPU v5e):
- XLA gather-based grid_sample: 239 ms (b32 @256²) -> separable MXU/lane-gather
  warp: its two 1-D resample passes cost ~1-8 ms each.
- blur-pool: every XLA formulation (reflect-pad + depthwise conv, separable
  zero-pad conv, banded-matrix MXU einsum) measured 113-138 ms on the b128
  FFT-GLO train step -> NHWC Pallas kernel with exact custom VJP.
"""

from tfcgan_tpu.ops.pallas_kernels.resample import resample_lanes, warp_affine_separable
from tfcgan_tpu.ops.pallas_kernels.blurpool import blur_pool_fast, blur_pool_pallas
from tfcgan_tpu.ops.pallas_kernels.gridsample import grid_sample_dense
