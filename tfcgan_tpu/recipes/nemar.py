"""NeMAR recipe (``/root/reference/nemar/models/nemar_model.py``).

netT = ResNet-9-block translator, netR = deformable (or affine) STN,
netD = basic PatchGAN on cat(A, B). Per step (``:161-288``):

    fake_B = T(A);  [reg_A, fake_RT_B] = R(A, B, apply_on=[A, fake_B])
    fake_TR_B = T(reg_A)
    loss_TR = λ_recon·L1(fake_TR_B, B) + λ_GAN·GAN(D(A, fake_TR_B), true)
    loss_RT = λ_recon·L1(fake_RT_B, B) + λ_GAN·GAN(D(A, fake_RT_B), true)
    loss = loss_TR + loss_RT + λ_smooth·reg
    loss_D = 0.5·λ_GAN·(real + fake_TR + fake_RT)

Defaults λ_GAN=1, λ_recon=100, λ_smooth=0 (``:35-42``); gan_mode lsgan.
The reference updates D *before* T/R each step, and ``backward_T_and_R``
re-runs netD on the fakes AFTER ``optimizer_D.step()`` — so the T/R gradient
sees the post-update D (``:266-288``). ``update_order = "d_first"`` makes the
trainer reproduce exactly that interleaving (verified by the lockstep
trajectory test ``tests/test_parity_nemar.py``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tfcgan_tpu import ops
from tfcgan_tpu.config import ExperimentConfig
from tfcgan_tpu.models import NLayerDiscriminator, ResNetGenerator
from tfcgan_tpu.models.stn import CNNAffineSTN, DeformableSTN


class NeMARRecipe:
    name = "nemar"
    update_order = "d_first"  # optimizer_D.step() precedes backward_T_and_R

    def __init__(self, cfg: ExperimentConfig):
        self.cfg = cfg
        dt = jnp.bfloat16 if cfg.train.compute_dtype == "bfloat16" else jnp.float32
        ch = cfg.data.channels
        # extra["resnet_blocks"] (reference --ngf era default 9) and
        # extra["fast_warp"]=False (torch-exact gather instead of the Pallas
        # dense kernel) exist for the CPU trajectory-parity tests
        blocks = int(cfg.extra.get("resnet_blocks", 9))
        fast = bool(cfg.extra.get("fast_warp", True))
        self.T = ResNetGenerator(out_channels=ch, num_blocks=blocks, dtype=dt)
        stn_type = cfg.extra.get("stn_type", "deformable")
        if stn_type == "affine":
            self.R = CNNAffineSTN(dtype=dt, fast_warp=fast)
        else:
            self.R = DeformableSTN(
                alpha=cfg.extra.get("stn_alpha", 0.0), dtype=dt, fast_warp=fast
            )
        self.D = NLayerDiscriminator(dtype=dt)
        self.lambda_gan = cfg.extra.get("lambda_GAN", 1.0)
        self.lambda_recon = cfg.extra.get("lambda_recon", 100.0)
        self.lambda_smooth = cfg.extra.get("lambda_smooth", 0.0)
        # NeMAR --multi_resolution: extra discriminators at 1/2^i scales
        # (nemar_model.py:185-196, 1 = off as upstream default)
        self.multi_resolution = cfg.extra.get("multi_resolution", 1)

    def init(self, key, batch):
        k1, k2, k3 = jax.random.split(key, 3)
        a, b = batch["A"], batch["B"]
        ab = jnp.concatenate([a, b], axis=-1)
        d_params = {"D": self.D.init(k3, ab)["params"]}
        for i in range(self.multi_resolution - 1):
            kk = jax.random.fold_in(k3, i + 1)
            sh = a.shape[1] // (2 ** (i + 1))
            small = jnp.zeros((a.shape[0], sh, sh, ab.shape[-1]), ab.dtype)
            d_params[f"D_mr{i}"] = self.D.init(kk, small)["params"]
        return {
            "g_params": {
                "T": self.T.init(k1, a)["params"],
                "R": self.R.init(k2, a, b)["params"],
            },
            "d_params": d_params,
            "spectral": {},
            "frozen": {},
        }

    def d_aux(self, g_params, batch, rng):
        """Detached fakes for the D-first phase (reference ``backward_D``
        detaches the single forward's outputs, ``nemar_model.py:217-264``)."""
        fake_tr_b, fake_rt_b, reg_a, _ = self._forward(g_params, batch)
        return {
            "fake_tr_b": jax.lax.stop_gradient(fake_tr_b),
            "fake_rt_b": jax.lax.stop_gradient(fake_rt_b),
            "reg_a": jax.lax.stop_gradient(reg_a),
        }

    def _forward(self, g_params, batch):
        a, b = batch["A"], batch["B"]
        t = lambda x: self.T.apply({"params": g_params["T"]}, x)
        fake_b = t(a)
        warped, reg = self.R.apply(
            {"params": g_params["R"]}, a, b, apply_on=[a, fake_b]
        )
        reg_a, fake_rt_b = warped
        fake_tr_b = t(reg_a)
        return fake_tr_b, fake_rt_b, reg_a, reg

    def _gan_all_scales(self, d_params, a, img, target):
        """GAN loss summed over the main D and the multi-resolution Ds
        (bilinear-downsampled inputs, nemar_model.py:185-196)."""
        total = ops.lsgan_loss(
            self.D.apply({"params": d_params["D"]},
                         jnp.concatenate([a, img], axis=-1)),
            target,
        )
        ar, ir = a, img
        for i in range(self.multi_resolution - 1):
            sh = a.shape[1] // (2 ** (i + 1))
            ar = jax.image.resize(a, (a.shape[0], sh, sh, a.shape[-1]), "bilinear")
            ir = jax.image.resize(img, (img.shape[0], sh, sh, img.shape[-1]), "bilinear")
            total = total + ops.lsgan_loss(
                self.D.apply({"params": d_params[f"D_mr{i}"]},
                             jnp.concatenate([ar, ir], axis=-1)),
                target,
            )
        return total

    def g_loss(self, g_params, d_params, spectral, frozen, batch, rng):
        a, b = batch["A"], batch["B"]
        fake_tr_b, fake_rt_b, reg_a, reg = self._forward(g_params, batch)
        l1_tr = self.lambda_recon * jnp.mean(jnp.abs(fake_tr_b.astype(jnp.float32) - b))
        l1_rt = self.lambda_recon * jnp.mean(jnp.abs(fake_rt_b.astype(jnp.float32) - b))
        gan_tr = self.lambda_gan * self._gan_all_scales(d_params, a, fake_tr_b, 1.0)
        gan_rt = self.lambda_gan * self._gan_all_scales(d_params, a, fake_rt_b, 1.0)
        smooth = self.lambda_smooth * reg
        total = l1_tr + l1_rt + gan_tr + gan_rt + smooth
        aux = {
            "fake_tr_b": jax.lax.stop_gradient(fake_tr_b),
            "fake_rt_b": jax.lax.stop_gradient(fake_rt_b),
            "reg_a": jax.lax.stop_gradient(reg_a),
        }
        metrics = {
            "loss_G": total, "g_l1_tr": l1_tr, "g_l1_rt": l1_rt,
            "g_gan_tr": gan_tr, "g_gan_rt": gan_rt, "g_smooth": smooth,
        }
        return total, (aux, metrics)

    def d_loss(self, d_params, spectral, aux, batch, rng):
        a, b = batch["A"], batch["B"]
        loss = 0.5 * self.lambda_gan * (
            self._gan_all_scales(d_params, a, b, 1.0)
            + self._gan_all_scales(d_params, a, aux["fake_tr_b"], 0.0)
            + self._gan_all_scales(d_params, a, aux["fake_rt_b"], 0.0)
        )
        return loss, {"loss_D": loss}
