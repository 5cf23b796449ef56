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
        # LAB3 = (gender, ethnicity, age) raw ints like annots_csv rows
        # (datasets_temp_Debias.py); LAB keeps the ethnicity column for the
        # single-head consumers (diffusion label variant, cli).
        lab3 = np.stack(
            [
                rng.randint(0, 2, batch_size),
                rng.randint(0, num_classes, batch_size),
                rng.randint(0, 3, batch_size),
            ],
            axis=1,
        ).astype(np.int32)
        batch["LAB3"] = lab3
        batch["LAB"] = lab3[:, 1].copy()
    return batch


def synthetic_iterator(num_batches: int, **kw):
    for i in range(num_batches):
        yield synthetic_batch(seed=i, **kw)


def synthetic_batch_device(
    batch_size: int = 8,
    image_size: int = 64,
    channels: int = 3,
    seed: int = 0,
    with_labels: bool = False,
    num_classes: int = 4,
):
    """``synthetic_batch`` generated ON DEVICE (jitted PRNG, zero host->device
    transfer). Statistically equivalent to the host version, not bit-equal.

    Exists because the tunneled TPU in this environment moves a 100 MB b128
    batch in minutes when the tunnel degrades — benches/probes that only need
    *plausible* data should never pay that."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    @partial(jax.jit, static_argnums=(1, 2, 3, 4, 5))
    def make(key, batch_size, image_size, channels, with_labels, num_classes):
        ka, kb, kg, ke, kg2 = jax.random.split(key, 5)

        def smooth(k):
            x = jax.random.normal(
                k, (batch_size, image_size // 8, image_size // 8, channels),
                jnp.float32)
            x = jnp.repeat(jnp.repeat(x, 8, axis=1), 8, axis=2)
            return jnp.tanh(x)

        a, b = smooth(ka), smooth(kb)
        red_u8 = jnp.round((b[..., 0] * 0.5 + 0.5) * 255.0)
        t_b = TEMP_MIN_C + red_u8 * (TEMP_MAX_C - TEMP_MIN_C) / 255.0
        batch = {"A": a, "B": b, "T_B": t_b}
        if with_labels:
            lab3 = jnp.stack(
                [
                    jax.random.randint(kg, (batch_size,), 0, 2),
                    jax.random.randint(ke, (batch_size,), 0, num_classes),
                    jax.random.randint(kg2, (batch_size,), 0, 3),
                ],
                axis=1,
            ).astype(jnp.int32)
            batch["LAB3"] = lab3
            batch["LAB"] = lab3[:, 1]
        return batch

    return make(jax.random.PRNGKey(seed), batch_size, image_size, channels,
                with_labels, num_classes)


def _face_scene(rng: np.random.RandomState, n: int, size: int) -> np.ndarray:
    """Procedural face-like grayscale scenes in [0, 1], (N, H, W).

    Soft-edged head ellipse + eyes + mouth on a gradient background — enough
    structure for registration metrics (SSIM/NCC/MI) and morphological
    gradients to carry signal, with smooth falloffs so warps stay
    differentiable-looking at any resolution.
    """
    lin = np.linspace(-1.0, 1.0, size, dtype=np.float32)
    yy, xx = np.meshgrid(lin, lin, indexing="ij")

    def blob(cx, cy, rx, ry, sharp):
        # (N,1,1) params against (H,W) grids -> (N,H,W) soft masks
        d = ((xx - cx) / rx) ** 2 + ((yy - cy) / ry) ** 2
        return 1.0 / (1.0 + np.exp(np.clip((d - 1.0) * sharp, -50.0, 50.0)))

    col = lambda lo, hi: rng.uniform(lo, hi, (n, 1, 1)).astype(np.float32)
    head = blob(col(-0.08, 0.08), col(-0.08, 0.08), col(0.45, 0.6), col(0.6, 0.75), 8.0)
    eye_y = col(-0.3, -0.18)
    eye_dx = col(0.18, 0.28)
    eyes = blob(-eye_dx, eye_y, col(0.06, 0.1), col(0.04, 0.07), 14.0) + blob(
        eye_dx, eye_y, col(0.06, 0.1), col(0.04, 0.07), 14.0
    )
    mouth = blob(col(-0.05, 0.05), col(0.3, 0.45), col(0.15, 0.25), col(0.05, 0.09), 12.0)
    bg = 0.15 + 0.1 * (yy[None] * col(-1, 1) + xx[None] * col(-1, 1))
    scene = bg * (1 - head) + head * (0.65 + 0.1 * col(-1, 1)) - 0.35 * eyes - 0.25 * mouth
    return np.clip(scene, 0.0, 1.0)


def textured_face_scene(
    rng: np.random.RandomState, n: int, size: int, texture_amp: float = 0.04
) -> np.ndarray:
    """Face scenes with band-limited micro-texture, (N, H, W) in [0, 1].

    The plain ``_face_scene`` blobs are piecewise-smooth, so blurring them
    barely moves MSCN statistics; natural images (the NIQE premise) carry
    fine texture whose loss IS the blur signature. Used as the pristine
    domain for the synthetic-fitted NIQE model (tools/fit_niqe_pristine.py).
    """
    from scipy import ndimage

    base = _face_scene(rng, n, size)
    tex = np.stack([
        ndimage.gaussian_filter(rng.randn(size, size), 0.7) for _ in range(n)
    ])
    return np.clip(base + texture_amp * tex, 0.0, 1.0)


def synthetic_registration_batch(
    batch_size: int = 8,
    image_size: int = 64,
    seed: int = 0,
    max_translate: float = 0.12,
    max_rotate: float = 0.08,
) -> tuple[dict[str, np.ndarray], dict[str, np.ndarray]]:
    """Misaligned visible/thermal pairs with per-sample affine ground truth.

    A = "visible" rendering of a face-like scene; B_aligned = "thermal"
    rendering of the SAME geometry (different tone mapping, like the
    cross-modal pairs of ``TFC-STN/datasets_stn.py``); B = B_aligned warped by
    a random affine theta (rotation ±max_rotate rad, translation
    ±max_translate in [-1,1] grid units) — the unaligned-pairs setting the
    VTF-STN flagship trains on. Returns (batch, truth) where truth carries
    ``B_aligned`` and the 2x3 ``theta`` that produced the misalignment.
    """
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(seed)
    gray = _face_scene(rng, batch_size, image_size)  # (N,H,W) in [0,1]

    # visible: warm skin tones; thermal: inverted intensity, red-heavy
    a = np.stack(
        [gray * 1.0, gray * 0.82, gray * 0.70], axis=-1
    ).astype(np.float32) * 2.0 - 1.0
    hot = 1.0 - gray
    b_aligned = np.stack(
        [hot * 1.0, hot * 0.55, hot * 0.35], axis=-1
    ).astype(np.float32) * 2.0 - 1.0

    ang = rng.uniform(-max_rotate, max_rotate, batch_size).astype(np.float32)
    tx = rng.uniform(-max_translate, max_translate, batch_size).astype(np.float32)
    ty = rng.uniform(-max_translate, max_translate, batch_size).astype(np.float32)
    theta = np.zeros((batch_size, 2, 3), np.float32)
    theta[:, 0, 0] = np.cos(ang)
    theta[:, 0, 1] = -np.sin(ang)
    theta[:, 1, 0] = np.sin(ang)
    theta[:, 1, 1] = np.cos(ang)
    theta[:, 0, 2] = tx
    theta[:, 1, 2] = ty

    src = torch.from_numpy(b_aligned).permute(0, 3, 1, 2)
    grid = F.affine_grid(torch.from_numpy(theta), src.shape, align_corners=False)
    b = (
        F.grid_sample(src, grid, mode="bilinear", padding_mode="border",
                      align_corners=False)
        .permute(0, 2, 3, 1)
        .numpy()
        .astype(np.float32)
    )

    red_u8 = np.round((b[..., 0] * 0.5 + 0.5) * 255.0)
    t_b = (TEMP_MIN_C + red_u8 * (TEMP_MAX_C - TEMP_MIN_C) / 255.0).astype(np.float32)
    batch = {"A": a, "B": b, "T_B": t_b}
    truth = {"B_aligned": b_aligned, "theta": theta}
    return batch, truth


def synthetic_registration_iterator(num_batches: int, **kw):
    for i in range(num_batches):
        yield synthetic_registration_batch(seed=i + 1, **kw)[0]
