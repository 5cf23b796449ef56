"""Evaluation: on-device metric suite + offline CSV-compatible CLI."""

from tfcgan_tpu.evaluation.suite import (
    pair_metrics,
    registration_metrics,
    evaluate_dirs,
    save_image_grid,
)
