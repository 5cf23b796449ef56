"""ThermalGAN two-stage recipe (``/root/reference/ThermalGAN/ThermalGAN_noAMP.py``).

Stage 1 (cVAE-GAN): fake_S = G1(A, T_Bn); losses (``:596-645``):
  loss_GE = D_VAE(fake_S -> 1) + λ_kl·KL(mu, logvar) + λ_pix·L1(fake_S, S)
            + L1(T_Bn, T(fake_S))
  where S = inverted-grayscale segmentation surrogate.
Stage 2 (pix2pix): fake_B = G2(stop_grad(fake_S)); MSE GAN + λ=100 L1
  (``:650-686``), D_pix trained with 0.5·(real+fake) MSE.

The stage-1 adversarial plumbing differs per reference variant, selected by
``extra["d_vae_mode"]``:

- ``"detached"`` (default for the named noAMP config): the 3-scale
  MultiDiscriminator's in-forward loss is rebuilt as a fresh leaf —
  ``torch.tensor(a).mean().requires_grad_()`` (``noAMP:243-256``) — which
  SEVERS the graph: loss_VAE_GAN contributes its value to loss_GE but no
  gradient, and the optimizer_D_VAE.step() at ``:632-645`` is a functional
  no-op (zero grads). Reproduced with stop_gradient + a frozen D_VAE; both
  values are still computed and logged for print-parity.
- ``"single_mse"`` (default for the ThermalGAN2/BN variant): stage-1 D is a
  *single* pix2pix PatchGAN scored with MSE and live gradients
  (``ThermalGAN2.py:210-240,618-625``); loss_D_VAE = real + fake (no 0.5,
  ``:645-698``) trains it each step. The BN variant also conditions G1 on the
  RAW temp map and compares raw temps in loss_latent (``:616,631-633`` — no
  F.normalize anywhere in its loop or vectorize_temps ``:411-420``).
- ``"multi_l1"``: the noAMP architecture with the graph-severing bug fixed
  (gradients flow, 3-scale D trains with vae_real+vae_fake) — the intended
  cVAE-GAN, selectable like the other documented bug-fix modes.

Update order per step (``:596-686``): G1+E -> D_VAE -> G2 -> D_PIX. The
G phases fold into one Adam over disjoint trees (loss_GE touches only G1+E,
loss_G2 only G2 via the detached fake_S, and the interleaved D_VAE step does
not feed G2), and the D phases into another (both use pre-update
fakes/params), so the trainer's G-then-D step reproduces the reference
trajectory exactly — verified by tests/test_parity_thermalgan.py. KL uses
the standard VAE closed form — the reference's ``nn.KLDivLoss(mu, logvar)``
(``:72,614``) takes log of (frequently negative) logvar and NaNs; we keep
the intended term instead.
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
    VAEDiscriminator2,
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
        # "batch" -> ThermalGAN2 (BatchNorm-eps-0.8 G1, down7 unnormalized,
        # raw temps, single MSE stage-1 D)
        self.bn_variant = cfg.extra.get("g1_norm", "instance") == "batch"
        self.G1 = GeneratorG1(out_channels=ch, dtype=dt,
                              norm="batch" if self.bn_variant else "instance")
        self.E = Encoder(latent_dim=cfg.extra.get("latent_dim", 8), dtype=dt)
        self.G2 = GeneratorG2(out_channels=ch, dtype=dt)
        self.d_vae_mode = cfg.extra.get(
            "d_vae_mode", "single_mse" if self.bn_variant else "detached"
        )
        if self.d_vae_mode not in ("detached", "single_mse", "multi_l1"):
            raise ValueError(f"unknown d_vae_mode {self.d_vae_mode!r}")
        if self.d_vae_mode == "single_mse":
            self.D_vae = VAEDiscriminator2(dtype=dt)
        else:
            self.D_vae = MultiDiscriminator(dtype=dt)
        self.D_pix = DiscriminatorPix(dtype=dt)
        self.lambda_kl = cfg.extra.get("lambda_kl", 0.01)
        self.lambda_pixel_bic = cfg.extra.get("lambda_pixel", 10.0)
        self.lambda_pixel_pix = cfg.extra.get("lambda_pixel_pix", 100.0)
        # trajectory-parity tests disable G2 dropout (RNG can't cross align)
        self.deterministic_g = bool(cfg.extra.get("deterministic_g", False))

    def _temps(self, t):
        """noAMP L2-normalizes the temp map along H (``:579,428``); the BN
        variant uses it raw (``ThermalGAN2.py:583,616``)."""
        return t if self.bn_variant else normalized_temps(t)

    def _vae_score(self, params, img, target):
        """Stage-1 D score vs a constant target, per-variant loss."""
        out = self.D_vae.apply({"params": params}, img)
        if self.d_vae_mode == "single_mse":
            return ops.lsgan_loss(out, target)
        return multiscale_loss(out, target, loss="l1")

    def init(self, key, batch):
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        a, b = batch["A"], batch["B"]
        tbn = self._temps(batch["T_B"])
        d_vae = self.D_vae.init(k5, b)["params"]
        state = {
            "g_params": {
                "G1": self.G1.init(k1, a, tbn)["params"],
                "E": self.E.init(k2, b)["params"],
                "G2": self.G2.init(k3, a)["params"],
            },
            "d_params": {"D_pix": self.D_pix.init(k4, b, a)["params"]},
            "spectral": {},
            "frozen": {},
        }
        # detached mode: the reference's leaf-tensor rebuild means D_VAE
        # never receives gradient — park it in the frozen collection
        key_ = "frozen" if self.d_vae_mode == "detached" else "d_params"
        state[key_]["D_vae"] = d_vae
        return state

    def g_loss(self, g_params, d_params, spectral, frozen, batch, rng):
        a, b = batch["A"], batch["B"]
        k1, k2 = jax.random.split(rng)
        tbn = self._temps(batch["T_B"])

        mu, logvar = self.E.apply({"params": g_params["E"]}, b)
        fake_s = self.G1.apply({"params": g_params["G1"]}, a, tbn)
        real_s = thermal_mask(b)
        loss_pixel_bic = jnp.mean(jnp.abs(fake_s.astype(jnp.float32) - real_s))
        mu32, lv32 = mu.astype(jnp.float32), logvar.astype(jnp.float32)
        loss_kl = 0.5 * jnp.mean(
            jnp.sum(jnp.exp(lv32) + mu32 * mu32 - 1.0 - lv32, axis=-1)
        )
        if self.d_vae_mode == "detached":
            loss_vae_gan = jax.lax.stop_gradient(
                self._vae_score(frozen["D_vae"], fake_s, 1.0)
            )
        else:
            loss_vae_gan = self._vae_score(d_params["D_vae"], fake_s, 1.0)
        t_fake = self._temps(
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
            deterministic=self.deterministic_g, rngs={"dropout": k1},
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
            "g_vae_gan": loss_vae_gan,
            "g_pixel_bic": loss_pixel_bic, "g_latent": loss_latent,
            "g_gan_pix": loss_gan_pix, "g_pixel_pix": loss_pixel_pix,
        }
        return total, (aux, metrics)

    def d_loss(self, d_params, spectral, aux, batch, rng):
        a, b = batch["A"], batch["B"]
        pred_real = self.D_pix.apply({"params": d_params["D_pix"]}, b, a)
        pred_fake = self.D_pix.apply({"params": d_params["D_pix"]}, aux["fake_b"], a)
        loss_pix = 0.5 * (
            ops.lsgan_loss(pred_real, 1.0) + ops.lsgan_loss(pred_fake, 0.0)
        )
        metrics = {"d_pix": loss_pix}
        loss = loss_pix
        if self.d_vae_mode != "detached":
            # loss_D_VAE = vae_real + vae_fake, no 0.5 (``noAMP:632-645``,
            # ``ThermalGAN2.py:645-698``); the reference's separate Adam ==
            # summing into the one D Adam (disjoint trees)
            real_s = thermal_mask(b)
            metrics["d_vae"] = self._vae_score(
                d_params["D_vae"], real_s, 1.0
            ) + self._vae_score(d_params["D_vae"], aux["fake_s"], 0.0)
            loss = loss + metrics["d_vae"]
        metrics["loss_D"] = loss
        return loss, metrics
