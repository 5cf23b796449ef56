"""ThermalGAN two-stage recipe (``/root/reference/ThermalGAN/ThermalGAN_noAMP.py``).

Stage 1 (cVAE-GAN): fake_S = G1(A, T_Bn); losses (``:602-640``):
  loss_GE = D_VAE(fake_S -> 1) + λ_kl·KL(mu, logvar) + λ_pix·L1(fake_S, S)
            + L1(T_Bn, T(fake_S))
  where S = inverted-grayscale segmentation surrogate and D_VAE is the
  3-scale MultiDiscriminator whose own update is commented out in the
  reference (``:710-730``) — mirrored here by keeping it frozen.
Stage 2 (pix2pix): fake_B = G2(stop_grad(fake_S)); MSE GAN + λ=100 L1
  (``:760-800``), D_pix trained with 0.5·(real+fake) MSE.

G1+Encoder+G2 share the G optimizer (separate Adams over disjoint params in
the reference ≡ one Adam over the union); D_pix is the D side. KL uses the
standard VAE closed form — the reference's ``nn.KLDivLoss(mu, logvar)``
(``:72,614``) takes log of (frequently negative) logvar and NaNs; we keep the
intended term instead.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tfcgan_tpu import ops
from tfcgan_tpu.config import ExperimentConfig
from tfcgan_tpu.models import MultiDiscriminator
from tfcgan_tpu.models.discriminator import multiscale_loss
from tfcgan_tpu.models.thermalgan import (
    DiscriminatorPix,
    Encoder,
    GeneratorG1,
    GeneratorG2,
    normalized_temps,
    thermal_mask,
)
from tfcgan_tpu.ops.temperature import temperature_lut


class ThermalGANRecipe:
    name = "thermalgan"

    def __init__(self, cfg: ExperimentConfig):
        self.cfg = cfg
        dt = jnp.bfloat16 if cfg.train.compute_dtype == "bfloat16" else jnp.float32
        ch = cfg.data.channels
        # "batch" -> ThermalGAN2 (BatchNorm-eps-0.8 G1, down7 unnormalized)
        self.G1 = GeneratorG1(out_channels=ch, dtype=dt,
                              norm=cfg.extra.get("g1_norm", "instance"))
        self.E = Encoder(latent_dim=cfg.extra.get("latent_dim", 8), dtype=dt)
        self.G2 = GeneratorG2(out_channels=ch, dtype=dt)
        self.D_vae = MultiDiscriminator(dtype=dt)
        self.D_pix = DiscriminatorPix(dtype=dt)
        self.lambda_kl = cfg.extra.get("lambda_kl", 0.01)
        self.lambda_pixel_bic = cfg.extra.get("lambda_pixel", 10.0)
        self.lambda_pixel_pix = cfg.extra.get("lambda_pixel_pix", 100.0)

    def init(self, key, batch):
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        a, b = batch["A"], batch["B"]
        tbn = normalized_temps(batch["T_B"])
        return {
            "g_params": {
                "G1": self.G1.init(k1, a, tbn)["params"],
                "E": self.E.init(k2, b)["params"],
                "G2": self.G2.init(k3, a)["params"],
            },
            "d_params": {"D_pix": self.D_pix.init(k4, b, a)["params"]},
            "spectral": {},
            # D_VAE never updates in the reference -> frozen collection
            "frozen": {"D_vae": self.D_vae.init(k5, b)["params"]},
        }

    def g_loss(self, g_params, d_params, spectral, frozen, batch, rng):
        a, b = batch["A"], batch["B"]
        k1, k2 = jax.random.split(rng)
        tbn = normalized_temps(batch["T_B"])

        mu, logvar = self.E.apply({"params": g_params["E"]}, b)
        fake_s = self.G1.apply({"params": g_params["G1"]}, a, tbn)
        real_s = thermal_mask(b)
        loss_pixel_bic = jnp.mean(jnp.abs(fake_s.astype(jnp.float32) - real_s))
        mu32, lv32 = mu.astype(jnp.float32), logvar.astype(jnp.float32)
        loss_kl = 0.5 * jnp.mean(
            jnp.sum(jnp.exp(lv32) + mu32 * mu32 - 1.0 - lv32, axis=-1)
        )
        vae_outs = self.D_vae.apply({"params": frozen["D_vae"]}, fake_s)
        loss_vae_gan = multiscale_loss(vae_outs, 1.0, loss="l1")
        t_fake = normalized_temps(
            temperature_lut(fake_s, mode=self.cfg.loss.temp_quantize)
        )
        loss_latent = jnp.mean(jnp.abs(tbn - t_fake))
        loss_ge = (
            loss_vae_gan
            + self.lambda_kl * loss_kl
            + self.lambda_pixel_bic * loss_pixel_bic
            + loss_latent
        )

        # stage 2: G2 over detached fake_S
        fake_b = self.G2.apply(
            {"params": g_params["G2"]}, jax.lax.stop_gradient(fake_s),
            deterministic=False, rngs={"dropout": k1},
        )
        pred_fake = self.D_pix.apply({"params": d_params["D_pix"]}, fake_b, a)
        loss_gan_pix = ops.lsgan_loss(pred_fake, 1.0)
        loss_pixel_pix = jnp.mean(jnp.abs(fake_b.astype(jnp.float32) - b))
        loss_g2 = loss_gan_pix + self.lambda_pixel_pix * loss_pixel_pix

        total = loss_ge + loss_g2
        aux = {
            "fake_s": jax.lax.stop_gradient(fake_s),
            "fake_b": jax.lax.stop_gradient(fake_b),
        }
        metrics = {
            "loss_G": total, "g_ge": loss_ge, "g_kl": loss_kl,
            "g_pixel_bic": loss_pixel_bic, "g_latent": loss_latent,
            "g_gan_pix": loss_gan_pix, "g_pixel_pix": loss_pixel_pix,
        }
        return total, (aux, metrics)

    def d_loss(self, d_params, spectral, aux, batch, rng):
        a, b = batch["A"], batch["B"]
        pred_real = self.D_pix.apply({"params": d_params["D_pix"]}, b, a)
        pred_fake = self.D_pix.apply({"params": d_params["D_pix"]}, aux["fake_b"], a)
        loss = 0.5 * (ops.lsgan_loss(pred_real, 1.0) + ops.lsgan_loss(pred_fake, 0.0))
        return loss, {"loss_D": loss}
