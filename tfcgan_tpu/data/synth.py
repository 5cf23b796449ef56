"""Synthetic paired data for tests and benchmarks (no dataset required)."""

from __future__ import annotations

import numpy as np

from tfcgan_tpu.ops.temperature import TEMP_MAX_C, TEMP_MIN_C


def synthetic_batch(
    batch_size: int = 8,
    image_size: int = 64,
    channels: int = 3,
    seed: int = 0,
    with_labels: bool = False,
    num_classes: int = 4,
) -> dict[str, np.ndarray]:
    """Smooth random pair batch in the trainer's input format."""
    rng = np.random.RandomState(seed)

    def smooth(n):
        x = rng.randn(n, image_size // 8, image_size // 8, channels).astype(np.float32)
        x = x.repeat(8, axis=1).repeat(8, axis=2)
        return np.tanh(x)

    a = smooth(batch_size)
    b = smooth(batch_size)
    # real-image temperature map: LUT over the uint8 red channel of B
    red_u8 = np.round((b[..., 0] * 0.5 + 0.5) * 255.0)
    t_b = (TEMP_MIN_C + red_u8 * (TEMP_MAX_C - TEMP_MIN_C) / 255.0).astype(np.float32)
    batch = {"A": a, "B": b, "T_B": t_b}
    if with_labels:
        batch["LAB"] = rng.randint(0, num_classes, (batch_size,)).astype(np.int32)
    return batch


def synthetic_iterator(num_batches: int, **kw):
    for i in range(num_batches):
        yield synthetic_batch(seed=i, **kw)
