"""Adversarial losses.

The TFC-GAN family uses a relativistic average-free relativistic GAN with
``BCEWithLogitsLoss`` and label smoothing 0.9
(``/root/reference/TFC-GAN-FFT/TFCGAN_multigpu_globalFFT.py:69,442-444,456-460,
517-526``). NeMAR/CycleGAN variants add lsgan (MSE), vanilla, and wgan-gp
(``/root/reference/nemar/models/networks.py:215-283``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bce_with_logits(logits: jax.Array, targets: jax.Array | float) -> jax.Array:
    """Mean BCE-with-logits, numerically stable (matches torch)."""
    x = logits.astype(jnp.float32)
    t = jnp.asarray(targets, dtype=jnp.float32)
    loss = jnp.maximum(x, 0.0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))
    return jnp.mean(loss)


def relativistic_g_loss(
    pred_fake: jax.Array, pred_real: jax.Array, smooth: float = 0.9
) -> jax.Array:
    """Generator side: BCE(pred_fake - stop_grad(pred_real), smooth).

    Matches ``loss_GAN_g = criterion_GAN(pred_fake - real_pred.detach(), valid)``
    with valid filled to 0.9 (``TFCGAN_multigpu_globalFFT.py:443,460``).
    """
    return bce_with_logits(pred_fake - jax.lax.stop_gradient(pred_real), smooth)


def relativistic_d_loss(
    pred_real: jax.Array,
    pred_fake: jax.Array,
    smooth: float = 0.9,
    weight: float = 0.5,
) -> jax.Array:
    """Discriminator side (``:519-526``):

    0.5*(BCE(pred_real - pred_fake, 0.9) + BCE(pred_fake - pred_real, 0)).
    The STN trainer uses weight=0.25 per discriminator
    (``TFC-STN/...Official.py:499,506``).
    """
    loss_real = bce_with_logits(pred_real - pred_fake, smooth)
    loss_fake = bce_with_logits(pred_fake - pred_real, 0.0)
    return weight * (loss_real + loss_fake)


def lsgan_loss(pred: jax.Array, target: float) -> jax.Array:
    """MSE GAN loss (CycleGAN ``cyclegan_og/cyclegan.py:41``, NeMAR lsgan)."""
    return jnp.mean(jnp.square(pred.astype(jnp.float32) - target))


def vanilla_g_loss(pred_fake: jax.Array) -> jax.Array:
    """Non-relativistic saturating BCE generator loss (NeMAR 'vanilla')."""
    return bce_with_logits(pred_fake, 1.0)


def wgan_g_loss(pred_fake: jax.Array) -> jax.Array:
    """WGAN generator loss: -mean(D(fake)) (NeMAR gan_mode='wgangp')."""
    return -jnp.mean(pred_fake.astype(jnp.float32))


def wgan_d_loss(pred_real: jax.Array, pred_fake: jax.Array) -> jax.Array:
    """WGAN critic loss: mean(D(fake)) - mean(D(real))."""
    return jnp.mean(pred_fake.astype(jnp.float32)) - jnp.mean(pred_real.astype(jnp.float32))


def gradient_penalty(
    d_apply, real: jax.Array, fake: jax.Array, key: jax.Array,
    mode: str = "mixed", constant: float = 1.0, lambda_gp: float = 10.0,
) -> jax.Array:
    """WGAN-GP penalty (``nemar/models/networks.py:284`` cal_gradient_penalty):
    λ·mean((||∇_x D(x̂)||₂ − c)²) with x̂ real / fake / mixed."""
    if mode == "real":
        x = real
    elif mode == "fake":
        x = fake
    else:
        alpha = jax.random.uniform(key, (real.shape[0], 1, 1, 1))
        x = alpha * real + (1.0 - alpha) * fake

    def score(img):
        return jnp.sum(d_apply(img))

    grads = jax.grad(score)(x)
    g = grads.reshape(grads.shape[0], -1).astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(g * g, axis=-1) + 1e-16)
    return lambda_gp * jnp.mean((norm - constant) ** 2)
