"""TFC-Diff recipes (``/root/reference/TFC-Diff/``).

Variants (config ``extra["variant"]``):

- ``condA`` (default, ``prototype_condA.py:143-166``): grayscale conditional
  DDPM — x_t = add_noise(gray(B), ε, t), ε̂ = UNet(x_t, t, gray(A)),
  MSE(ε̂, ε). T=500 squaredcos schedule, Adam 1e-3.
- ``label`` (``prototype.py:37-70``): RGB DDPM conditioned on a learned class
  embedding broadcast to image planes (in = 3 + emb channels), T=1000.
- ``hybrid`` (``prototype_tfcgan.py:255-286``): the TFC-GAN U-Net generator
  and the denoiser train jointly — fake_B = G(A); LPIPS(fake_B, B) recon +
  MSE noise loss on add_noise(fake_B) (NOT detached: noise loss reaches G,
  reproducing the reference's retain_graph double backward). Both parameter
  sets sit on the G optimizer (two Adams over disjoint params ≡ one).

No discriminator — the trainer's D side is an empty tree and a zero loss.
Sampling runs fully on device (``models.diffusion.sample``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tfcgan_tpu.config import ExperimentConfig
from tfcgan_tpu.models import GeneratorUNet, LPIPS
from tfcgan_tpu.models.diffusion import CondUNet, DDPMSchedule


def _to_gray(x: jax.Array) -> jax.Array:
    w = jnp.asarray([0.2989, 0.587, 0.114])
    return jnp.sum(x * w, axis=-1, keepdims=True)


class DiffusionRecipe:
    name = "diffusion"

    def __init__(self, cfg: ExperimentConfig):
        self.cfg = cfg
        dt = jnp.bfloat16 if cfg.train.compute_dtype == "bfloat16" else jnp.float32
        self.variant = cfg.extra.get("variant", "condA")
        self.num_classes = cfg.extra.get("num_classes", 4)
        self.emb_size = cfg.extra.get("class_emb_size", 4)
        ch = 1 if self.variant == "condA" else cfg.data.channels
        default_t = 500 if self.variant == "condA" else 1000
        self.unet = CondUNet(out_channels=ch, dtype=dt)
        self.schedule = DDPMSchedule(num_timesteps=cfg.extra.get("timesteps", default_t))
        if self.variant == "hybrid":
            self.G = GeneratorUNet(out_channels=cfg.data.channels, dtype=dt)
            self.lpips = LPIPS(dtype=dt)

    def _cond(self, g_params, batch):
        if self.variant == "condA":
            return _to_gray(batch["A"])
        emb = g_params["class_emb"][batch["LAB"]]  # (N, E)
        n = emb.shape[0]
        h = batch["A"].shape[1]
        return jnp.broadcast_to(emb[:, None, None, :], (n, h, h, self.emb_size))

    def init(self, key, batch):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        # UNet params are batch- and spatial-size independent: init on a 32²
        # single-sample dummy so unjitted init never materializes the
        # full-resolution attention maps (eager init OOMs at 128²·batch 16).
        sh = min(batch["A"].shape[1], 32)
        small = lambda x: x[:1, :sh, :sh]
        t = jnp.zeros((1,), jnp.int32)
        g_params = {}
        if self.variant != "condA":
            g_params["class_emb"] = (
                jax.random.normal(k3, (self.num_classes, self.emb_size)) * 0.02
            )
        if self.variant == "condA":
            a = small(_to_gray(batch["A"]))
            g_params["unet"] = self.unet.init(k1, a, t, a)["params"]
            frozen = {}
        else:
            small_batch = {"A": small(batch["A"]), "LAB": batch["LAB"][:1]}
            cond = self._cond(g_params, small_batch)
            g_params["unet"] = self.unet.init(
                k1, small(batch["B"]), t, cond)["params"]
            frozen = {}
            if self.variant == "hybrid":
                # the pix2pix G has 6 downsamples: needs full spatial extent
                g_params["G"] = self.G.init(k2, batch["A"][:1])["params"]
                frozen = {"lpips": self.lpips.init(
                    k4, batch["A"][:1], batch["B"][:1])}
        return {"g_params": g_params, "d_params": {}, "spectral": {}, "frozen": frozen}

    def g_loss(self, g_params, d_params, spectral, frozen, batch, rng):
        k_noise, k_t, k_drop = jax.random.split(rng, 3)
        metrics = {}
        if self.variant == "condA":
            target_img = _to_gray(batch["B"])
        elif self.variant == "label":
            target_img = batch["B"]
        else:
            fake_b = self.G.apply(
                {"params": g_params["G"]}, batch["A"],
                deterministic=False, rngs={"dropout": k_drop},
            )
            target_img = fake_b  # NOT detached — noise loss trains G too
            recon = jnp.mean(self.lpips.apply(frozen["lpips"], fake_b, batch["B"]))
            metrics["g_recon"] = recon
        noise = jax.random.normal(k_noise, target_img.shape, jnp.float32)
        t = jax.random.randint(k_t, (target_img.shape[0],), 0,
                               self.schedule.num_timesteps - 1)
        x_t = self.schedule.add_noise(target_img.astype(jnp.float32), noise, t)
        cond = self._cond(g_params, batch)
        eps = self.unet.apply({"params": g_params["unet"]}, x_t, t, cond)
        loss = jnp.mean(jnp.square(eps.astype(jnp.float32) - noise))
        metrics["g_noise_mse"] = loss
        if self.variant == "hybrid":
            loss = loss + metrics["g_recon"]
        metrics["loss_G"] = loss
        return loss, ({}, metrics)

    def d_loss(self, d_params, spectral, aux, batch, rng):
        return jnp.zeros(()), {"loss_D": jnp.zeros(())}

    def sample(self, g_params, batch_or_cond, key: jax.Array) -> jax.Array:
        from tfcgan_tpu.models.diffusion import sample

        if self.variant == "condA":
            cond = _to_gray(batch_or_cond if not isinstance(batch_or_cond, dict)
                            else batch_or_cond["A"])
        else:
            cond = self._cond(g_params, batch_or_cond)
        return sample(self.unet, g_params["unet"], self.schedule, cond, key)
