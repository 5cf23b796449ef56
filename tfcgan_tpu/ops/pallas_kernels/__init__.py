"""Pallas TPU kernels for the memory-bound hot ops.

Measured motivation (tools/microbench.py, TPU v5e, batch 32 @ 256²):
- XLA gather-based grid_sample: 239 ms  -> separable MXU/lane-gather warp: ~its
  two 1-D resample passes cost ~1-8 ms each.
- XLA depthwise blur-pool: 8.6 ms/layer -> fused pad+filter Pallas kernel.
"""

from tfcgan_tpu.ops.pallas_kernels.resample import resample_lanes, warp_affine_separable
from tfcgan_tpu.ops.pallas_kernels.blurpool import blur_pool_pallas
