"""Conditional DDPM (TFC-Diff rebuild).

The reference wraps ``diffusers.UNet2DModel`` (128², in=2 grayscale channels:
noisy B ⊕ condition A, out=1, layers_per_block=1, channels (32, 64, 64),
attention at the two lower resolutions) with
``DDPMScheduler(num_train_timesteps=500, beta_schedule='squaredcos_cap_v2')``
(``/root/reference/TFC-Diff/prototype_condA.py:59-90,137``). Its sampling loop
ships tensors to the CPU for every scheduler step
(``test_prototype.py:137-160``); here the whole ancestral chain runs on device
under ``lax.fori_loop``.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp


# ------------------------------------------------------------------ schedule
@dataclass(frozen=True)
class DDPMSchedule:
    """squaredcos_cap_v2 (Nichol & Dhariwal cosine) schedule, diffusers-exact."""

    num_timesteps: int = 500
    max_beta: float = 0.999

    def betas(self) -> jnp.ndarray:
        # static schedule: built host-side in float64 then cast, matching
        # diffusers' betas_for_alpha_bar (Python floats -> fp32 tensor); an
        # all-fp32 computation drifts ~1e-5 where ᾱ -> 0
        import numpy as np

        t = np.arange(self.num_timesteps + 1, dtype=np.float64) / self.num_timesteps

        def abar(x):
            return np.cos((x + 0.008) / 1.008 * math.pi / 2) ** 2

        ratio = abar(t[1:]) / abar(t[:-1])
        return jnp.asarray(np.clip(1.0 - ratio, 0.0, self.max_beta), jnp.float32)

    def alphas_cumprod(self) -> jnp.ndarray:
        # fp32 cumprod of the fp32 betas — diffusers-exact
        return jnp.cumprod(1.0 - self.betas())

    def add_noise(self, x0: jax.Array, noise: jax.Array, t: jax.Array) -> jax.Array:
        """q(x_t | x_0). t: (N,) int timesteps."""
        ab = self.alphas_cumprod()[t]
        while ab.ndim < x0.ndim:
            ab = ab[..., None]
        return jnp.sqrt(ab) * x0 + jnp.sqrt(1.0 - ab) * noise

    def step(
        self, eps_pred: jax.Array, t: jax.Array, x_t: jax.Array, key: jax.Array,
        clip_sample: bool = True,
    ) -> jax.Array:
        """One ancestral step x_t -> x_{t-1} (diffusers DDPMScheduler.step,
        variance_type='fixed_small', clip_sample=True)."""
        betas = self.betas()
        ab = self.alphas_cumprod()
        ab_t = ab[t]
        ab_prev = jnp.where(t > 0, ab[jnp.maximum(t - 1, 0)], 1.0)
        beta_t = betas[t]
        alpha_t = 1.0 - beta_t

        x0 = (x_t - jnp.sqrt(1.0 - ab_t) * eps_pred) / jnp.sqrt(ab_t)
        if clip_sample:
            x0 = jnp.clip(x0, -1.0, 1.0)
        coef_x0 = jnp.sqrt(ab_prev) * beta_t / (1.0 - ab_t)
        coef_xt = jnp.sqrt(alpha_t) * (1.0 - ab_prev) / (1.0 - ab_t)
        mean = coef_x0 * x0 + coef_xt * x_t
        var = jnp.clip(beta_t * (1.0 - ab_prev) / (1.0 - ab_t), 1e-20, None)
        noise = jax.random.normal(key, x_t.shape, x_t.dtype)
        return mean + jnp.where(t > 0, jnp.sqrt(var), 0.0) * noise


# ------------------------------------------------------------------- network
def timestep_embedding(t: jax.Array, dim: int) -> jax.Array:
    half = dim // 2
    freqs = jnp.exp(-math.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


class ResBlock(nn.Module):
    feats: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb):
        h = nn.GroupNorm(num_groups=8, dtype=self.dtype, name="n1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.feats, (3, 3), padding="SAME", dtype=self.dtype, name="c1")(h)
        h = h + nn.Dense(self.feats, dtype=self.dtype, name="temb")(nn.silu(temb))[:, None, None, :]
        h = nn.GroupNorm(num_groups=8, dtype=self.dtype, name="n2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.feats, (3, 3), padding="SAME", dtype=self.dtype, name="c2")(h)
        if x.shape[-1] != self.feats:
            x = nn.Conv(self.feats, (1, 1), dtype=self.dtype, name="skip")(x)
        return x + h


class AttnBlock(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        y = nn.GroupNorm(num_groups=8, dtype=self.dtype, name="norm")(x)
        y = y.reshape(n, h * w, c)
        y = nn.MultiHeadDotProductAttention(num_heads=max(1, c // 32),
                                            dtype=self.dtype, name="attn")(y, y)
        return x + y.reshape(n, h, w, c)


class CondUNet(nn.Module):
    """UNet2DModel-style denoiser: eps = f(cat(x_noisy, cond), t)."""

    out_channels: int = 1
    channels: tuple[int, ...] = (32, 64, 64)
    attn: tuple[bool, ...] = (False, True, True)
    layers_per_block: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, t: jax.Array, cond: jax.Array) -> jax.Array:
        dt = self.dtype
        temb = timestep_embedding(t, self.channels[0] * 4)
        temb = nn.Dense(self.channels[0] * 4, dtype=dt, name="temb1")(temb)
        temb = nn.Dense(self.channels[0] * 4, dtype=dt, name="temb2")(nn.silu(temb))

        h = jnp.concatenate([x, cond], axis=-1).astype(dt)
        h = nn.Conv(self.channels[0], (3, 3), padding="SAME", dtype=dt, name="stem")(h)
        skips = [h]
        for i, ch in enumerate(self.channels):
            for j in range(self.layers_per_block):
                h = ResBlock(ch, dtype=dt, name=f"down{i}_{j}")(h, temb)
                if self.attn[i]:
                    h = AttnBlock(dtype=dt, name=f"down{i}_{j}_attn")(h)
                skips.append(h)
            if i + 1 < len(self.channels):
                h = nn.Conv(ch, (3, 3), strides=(2, 2), padding="SAME",
                            dtype=dt, name=f"down{i}_pool")(h)
                skips.append(h)
        h = ResBlock(self.channels[-1], dtype=dt, name="mid1")(h, temb)
        h = AttnBlock(dtype=dt, name="mid_attn")(h)
        h = ResBlock(self.channels[-1], dtype=dt, name="mid2")(h, temb)
        for i, ch in reversed(list(enumerate(self.channels))):
            for j in range(self.layers_per_block + 1):
                h = jnp.concatenate([h, skips.pop()], axis=-1)
                h = ResBlock(ch, dtype=dt, name=f"up{i}_{j}")(h, temb)
                if self.attn[i]:
                    h = AttnBlock(dtype=dt, name=f"up{i}_{j}_attn")(h)
            if i > 0:
                n, hh, ww, c = h.shape
                h = jax.image.resize(h, (n, hh * 2, ww * 2, c), "nearest")
                h = nn.Conv(ch, (3, 3), padding="SAME", dtype=dt, name=f"up{i}_conv")(h)
        h = nn.GroupNorm(num_groups=8, dtype=dt, name="out_norm")(h)
        h = nn.silu(h)
        return nn.Conv(self.out_channels, (3, 3), padding="SAME",
                       kernel_init=nn.initializers.zeros, dtype=dt, name="out")(h)


def sample(
    unet: CondUNet, params, schedule: DDPMSchedule, cond: jax.Array, key: jax.Array
) -> jax.Array:
    """Full on-device ancestral sampling (no host hops)."""
    n, h, w, _ = cond.shape
    k0, kloop = jax.random.split(key)
    x = jax.random.normal(k0, (n, h, w, unet.out_channels))

    def body(i, carry):
        x, k = carry
        t = schedule.num_timesteps - 1 - i
        tb = jnp.full((n,), t, jnp.int32)
        eps = unet.apply({"params": params}, x, tb, cond)
        k, ks = jax.random.split(k)
        x = schedule.step(eps.astype(jnp.float32), t, x, ks)
        return (x, k)

    x, _ = jax.lax.fori_loop(0, schedule.num_timesteps, body, (x, kloop))
    return x
