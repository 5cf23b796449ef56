"""Metric suites mirroring the reference's offline eval scripts, on device.

- ``pair_metrics``: PSNR / grayscale+multichannel SSIM / Bhattacharyya /
  FFT-magnitude MSE per pair — the acceptance metrics of
  ``eval/Eurecom/{evaluation_psnr_ssim, evaluation_bhatt, Eurecom_MagMSE}.py``.
- ``registration_metrics``: SSIM/NCC/MI before vs after registration —
  ``TFC-STN/evaluation/{calc_ssim, calc_NCC, calc_MI}.py``.
- ``evaluate_dirs``: offline CLI over fake/real PNG directories producing the
  same per-image CSV rows (pandas) the shell pipelines emitted.
"""

from __future__ import annotations

import os
from typing import Iterable

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp

from tfcgan_tpu import ops


def pair_metrics(real_b: jax.Array, fake_b: jax.Array) -> dict[str, jax.Array]:
    """real_b/fake_b: (N, H, W, 3) in [-1, 1]. Returns per-image arrays."""
    r255 = (real_b * 0.5 + 0.5) * 255.0
    f255 = (fake_b * 0.5 + 0.5) * 255.0
    gray_r = ops.quantize.rgb_to_luma_uint8(real_b, mode="smooth")
    gray_f = ops.quantize.rgb_to_luma_uint8(fake_b, mode="smooth")
    return {
        "psnr": ops.psnr(r255, f255),
        "ssim": ops.ssim(r255, f255),  # multichannel mean, skimage-style
        "ssim_gray": ops.ssim(gray_r, gray_f),
        "bhatt": ops.bhattacharyya(r255, f255),
        "fft_mag_mse": ops.fft_mag_mse(real_b, fake_b),
        # Eurecom_MagOther.py's "other" metric: log-magnitude MAE
        "fft_mag_mae": ops.fft_mag_mae(real_b, fake_b),
    }


def registration_metrics(
    real_a: jax.Array, real_b: jax.Array, reg_b: jax.Array
) -> dict[str, jax.Array]:
    """Before/after registration metrics on grayscale [0, 1] planes."""
    def gray01(x):
        return ops.quantize.rgb_to_luma_uint8(x, mode="smooth") / 255.0

    a, b, rb = gray01(real_a), gray01(real_b), gray01(reg_b)
    return {
        "ssim_before": ops.ssim(a, b, data_range=1.0),
        "ssim_after": ops.ssim(a, rb, data_range=1.0),
        "ncc_before": ops.ncc(a, b),
        "ncc_after": ops.ncc(a, rb),
        "mi_before": ops.mutual_information(a, b),
        "mi_after": ops.mutual_information(a, rb),
    }


def _load_dir(d: str) -> tuple[list[str], np.ndarray]:
    files = sorted(
        f for f in os.listdir(d) if f.lower().endswith((".png", ".jpg", ".jpeg"))
    )
    imgs = np.stack(
        [np.asarray(Image.open(os.path.join(d, f)).convert("RGB"), np.float32) for f in files]
    )
    return files, imgs


def evaluate_dirs(fake_dir: str, real_dir: str, out_csv: str | None = None):
    """Offline eval over two directories (filenames matched by sort order,
    the same join-by-digit convention the reference relies on)."""
    import pandas as pd

    files_f, fakes = _load_dir(fake_dir)
    files_r, reals = _load_dir(real_dir)
    assert len(files_f) == len(files_r), "directory size mismatch"
    real = jnp.asarray(reals / 127.5 - 1.0)
    fake = jnp.asarray(fakes / 127.5 - 1.0)
    m = {k: np.asarray(v) for k, v in pair_metrics(real, fake).items()}
    df = pd.DataFrame({"file": files_f, **m})
    if out_csv:
        df.to_csv(out_csv, index=False)
    return df


def to_uint8(x: np.ndarray) -> np.ndarray:
    return np.clip((x * 0.5 + 0.5) * 255.0, 0, 255).astype(np.uint8)


def save_image_grid(images: Iterable[np.ndarray], path: str, axis: int = 0) -> None:
    """Save a stack of [-1,1] HWC images concatenated along H (axis=0) or W
    (axis=1) — the reference's stacked sample/test PNGs
    (``test_TFCGAN.py:217-218`` uses vertical stacks)."""
    arr = np.concatenate([to_uint8(np.asarray(i)) for i in images], axis=axis)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(arr).save(path)


def crop_stack(stack_path: str, out_dirs: list[str], num: int = 3) -> None:
    """``crop_images.py`` equivalent: slice an N-image vertical stack into
    per-role directories (real_A/, fake_B/, real_B/ ...)."""
    img = np.asarray(Image.open(stack_path).convert("RGB"))
    h = img.shape[0] // num
    base = os.path.basename(stack_path)
    for i, d in enumerate(out_dirs[:num]):
        os.makedirs(d, exist_ok=True)
        Image.fromarray(img[i * h : (i + 1) * h]).save(os.path.join(d, base))


def difference_plot(
    real_a: np.ndarray, real_b: np.ndarray, reg_b: np.ndarray, out_path: str
) -> None:
    """5-panel before/after registration figure
    (``TFC-STN/evaluation/evaluation.py:23-80``): Visible | Before |
    Registered | Diff-Before | Diff-Registered, grayscale 'bone' panels and
    'RdBu' difference maps with the reference's vmin/vmax (-200, 50)."""
    # Figure + Agg canvas directly — does not touch the process-global
    # matplotlib backend (an interactive session's plt state stays intact)
    from matplotlib.backends.backend_agg import FigureCanvasAgg
    from matplotlib.figure import Figure

    def gray(x):
        return np.asarray(Image.fromarray(to_uint8(x)).convert("L"), np.float64)

    a, rb, gb = gray(real_a), gray(real_b), gray(reg_b)
    fig = Figure(figsize=(16, 6))
    FigureCanvasAgg(fig)
    fig.subplots_adjust(wspace=0.0, hspace=0.0)
    panels = [
        (a, "Visible", dict(cmap="bone", vmax=255)),
        (rb, "Before", dict(cmap="bone", vmax=255)),
        (gb, "Registered", dict(cmap="bone", vmax=255)),
        (a - rb, "Diff. Before", dict(cmap="RdBu", vmin=-200, vmax=50)),
        (a - gb, "Diff. Registered", dict(cmap="RdBu", vmin=-200, vmax=50)),
    ]
    for i, (img, title, kw) in enumerate(panels):
        ax = fig.add_subplot(1, 5, i + 1)
        ax.imshow(img, **kw)
        ax.set_xticks([])
        ax.set_yticks([])
        ax.set_title(title)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig.savefig(out_path, bbox_inches="tight")
