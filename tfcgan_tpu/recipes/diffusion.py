"""TFC-Diff recipe (``/root/reference/TFC-Diff/prototype_condA.py``).

Training (``:143-166``): sample noise + uniform timesteps in [0, 499), form
x_t = add_noise(B, ε, t), predict ε̂ = UNet(x_t, t, A), minimize MSE(ε̂, ε).
Adam lr 1e-3, torch-default betas. No discriminator — the D side of the
shared trainer is an empty param tree and a zero loss.

Inputs here are grayscale (the reference pipeline converts to 1-channel at
128², ``:104-110``); the recipe grayscales its RGB batch on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tfcgan_tpu.config import ExperimentConfig
from tfcgan_tpu.models.diffusion import CondUNet, DDPMSchedule


def _to_gray(x: jax.Array) -> jax.Array:
    w = jnp.asarray([0.2989, 0.587, 0.114])
    return jnp.sum(x * w, axis=-1, keepdims=True)


class DiffusionRecipe:
    name = "diffusion"

    def __init__(self, cfg: ExperimentConfig):
        self.cfg = cfg
        dt = jnp.bfloat16 if cfg.train.compute_dtype == "bfloat16" else jnp.float32
        self.unet = CondUNet(out_channels=1, dtype=dt)
        self.schedule = DDPMSchedule(num_timesteps=cfg.extra.get("timesteps", 500))

    def init(self, key, batch):
        a = _to_gray(batch["A"])
        t = jnp.zeros((a.shape[0],), jnp.int32)
        params = self.unet.init(key, a, t, a)["params"]
        return {"g_params": {"unet": params}, "d_params": {}, "spectral": {},
                "frozen": {}}

    def g_loss(self, g_params, d_params, spectral, frozen, batch, rng):
        a = _to_gray(batch["A"])
        b = _to_gray(batch["B"])
        k_noise, k_t = jax.random.split(rng)
        noise = jax.random.normal(k_noise, b.shape, jnp.float32)
        # reference: randint(0, 499) — excludes the last timestep
        t = jax.random.randint(k_t, (b.shape[0],), 0, self.schedule.num_timesteps - 1)
        x_t = self.schedule.add_noise(b, noise, t)
        eps = self.unet.apply({"params": g_params["unet"]}, x_t, t, a)
        loss = jnp.mean(jnp.square(eps.astype(jnp.float32) - noise))
        return loss, ({}, {"loss_G": loss, "g_noise_mse": loss})

    def d_loss(self, d_params, spectral, aux, batch, rng):
        return jnp.zeros(()), {"loss_D": jnp.zeros(())}

    def sample(self, g_params, cond_a: jax.Array, key: jax.Array) -> jax.Array:
        from tfcgan_tpu.models.diffusion import sample

        return sample(self.unet, g_params["unet"], self.schedule, _to_gray(cond_a), key)
