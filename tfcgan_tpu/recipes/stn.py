"""VTF-STN recipe family (joint translation + registration).

Rebuild of the flagship ``TFC-STN/TFCGAN_STN21_Original_NewModel3_Official.py``
training step (SURVEY.md §3.2):

    fake_B   = G1(A)                         (:624)
    fake_A1  = G2(B)                         (:625)
    warped_B = STN(A, fake_A1; src=B)        (:628, ViT-64 localizer)
    fake_A2  = G2(warped_B)                  (:629, NOT detached — grads reach
                                              the STN through G2; load-bearing)
    loss_G = GAN1 + GAN2 + 0.01·L1(fake_A2, A)
             + LPIPS(fake_A2, A) + LPIPS(fake_B, B)
             + morph_triplet(warped_B; A, B)  (:632-655)
    loss_D = 0.5·(D1 relativistic(fake_B) + D2 relativistic(fake_A2)), each
             weighted 0.25 (:492-507)

Variants (config ``extra["variant"]``):

- "dark_visible" (``TFCGAN_STN21_Eur_DarkVisible.py``): single G2 pass
  fake_A = G2(STN(A, fake_B; src=B)) — no fake_A1 leg — patch-16 ViT,
  recon = UNWEIGHTED L1(warped_B, fake_B), + global FFT(fake_A, A), no
  morph; per-head D loss is (real+fake) with no 0.25 (``:510-526,676-731``).
- "b2a" (``TFCGAN_STN21_Original_NewModel3_B2A.py``): NewModel3 structure
  with the pair direction swapped at load (``:644-645`` — config
  ``data.direction="BtoA"``), morph replaced by global FFT(fake_A1, A)
  (``:683-697``).

G1+G2+STN share one Adam, D1+D2 the other (:560-561) — expressed here by
the g_params/d_params split.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tfcgan_tpu import ops
from tfcgan_tpu.config import ExperimentConfig
from tfcgan_tpu.models import AffineSTN, GeneratorUNet, LPIPS, PatchDiscriminator
from tfcgan_tpu.models.lpips import (
    load_lpips_params,
    resolve_lpips_weights,
    resolve_perceptual,
)
from tfcgan_tpu.models.stn import LocalizerViT, warp_src
from tfcgan_tpu.models.vit import ViT
from tfcgan_tpu.ops.perceptual import multiscale_recon
import flax.linen as nn


class _STNNet(AffineSTN):
    """AffineSTN with configurable ViT patch size (64 flagship, 16 DarkVisible).

    ``vit_depth``/``vit_dim``/``vit_heads``/``vit_mlp`` default to the
    reference's kornia ViT-Base (:150-165); the CPU trajectory-parity test
    shrinks them (the per-block math is identical at any size)."""

    patch: int = 64
    vit_depth: int = 12
    vit_dim: int = 768
    vit_heads: int = 12
    vit_mlp: int = 3072

    @nn.compact
    def theta(self, img_a, img_b):
        x = jnp.concatenate([img_a, img_b], axis=-1)
        tokens = ViT(
            patch_size=self.patch, depth=self.vit_depth, dim=self.vit_dim,
            heads=self.vit_heads, mlp_dim=self.vit_mlp,
            dtype=self.dtype, name="vit",
        )(x)
        flat = tokens.reshape(tokens.shape[0], -1)
        h = nn.Dense(1024, dtype=self.dtype, name="fc1")(flat)
        h = nn.relu(h)
        h = nn.Dense(512, dtype=self.dtype, name="fc2")(h)
        h = nn.relu(h)
        h = nn.Dense(256, dtype=self.dtype, name="fc3")(h)
        h = nn.sigmoid(h)
        from tfcgan_tpu.models.stn import IDENTITY_THETA, _dtheta_head

        dtheta = _dtheta_head(self.identity_init, self.dtype)(h)
        return (dtheta.astype(jnp.float32) + IDENTITY_THETA[None, :]).reshape(-1, 2, 3)


def morph_triplet(real_a, real_b, warped_b) -> jax.Array:
    """``morph_triplet`` (:444-459): m(x) = 1 − morphological_gradient(x) with
    the 3×3 cross; triplet(anchor=m(warped), pos=m(A), neg=m(B))."""
    m_a = 1.0 - ops.morphological_gradient(real_a)
    m_b = 1.0 - ops.morphological_gradient(real_b)
    m_w = 1.0 - ops.morphological_gradient(warped_b)
    return ops.triplet_margin_loss(m_w, m_a, m_b, axis=2)


class STNRecipe:
    name = "stn"

    def __init__(self, cfg: ExperimentConfig):
        self.cfg = cfg
        dt = jnp.bfloat16 if cfg.train.compute_dtype == "bfloat16" else jnp.float32
        self.variant = cfg.extra.get("variant", "newmodel3")
        # only the flagship carries the morph triplet; DarkVisible's loss_G
        # is adv+recon+perc+FFT (``Eur_DarkVisible.py:715``) and B2A swaps
        # morph for an FFT term (``NewModel3_B2A.py:697``)
        self.use_morph = cfg.extra.get("use_morph", self.variant == "newmodel3")
        self.use_fft = cfg.extra.get("use_fft", self.variant != "newmodel3")
        # DarkVisible quirks: recon enters UNWEIGHTED (alpha2 is defined but
        # not applied, ``:714-715``) and its per-head D loss is (real+fake)
        # with no 0.25 (``:510-526``); NewModel3/B2A quarter each head
        dv = self.variant == "dark_visible"
        self.recon_weight = 1.0 if dv else 0.01
        self.d_head_weight = 1.0 if dv else 0.25
        self.stn_condition = (
            "fake_B" if self.variant == "dark_visible" else "fake_A1"
        )
        patch = 16 if self.variant == "dark_visible" else 64
        ch = cfg.data.channels
        self.G1 = GeneratorUNet(out_channels=ch, dtype=dt)
        self.G2 = GeneratorUNet(out_channels=ch, dtype=dt)
        self.D1 = PatchDiscriminator(dtype=dt)
        self.D2 = PatchDiscriminator(dtype=dt)
        # extra["deterministic_g"] disables G dropout (trajectory-parity
        # tests; mirrors the tfcgan recipe switch); extra["fast_warp"]=False
        # selects the torch-exact gather warp over the Pallas separable one
        self.deterministic_g = bool(cfg.extra.get("deterministic_g", False))
        self.STN = _STNNet(
            dtype=dt, patch=patch,
            fast_warp=bool(cfg.extra.get("fast_warp", True)),
            # zero-init dtheta head => theta starts at exact identity; the
            # reference-style random head is measured (round 4) to start
            # out of the loss basin on some seeds and die out-of-frame
            identity_init=bool(cfg.extra.get("stn_identity_init", True)),
            vit_depth=int(cfg.extra.get("vit_depth", 12)),
            vit_dim=int(cfg.extra.get("vit_dim", 768)),
            vit_heads=int(cfg.extra.get("vit_heads", 12)),
            vit_mlp=int(cfg.extra.get("vit_mlp", 3072)),
        )
        # "lpips" (pretrained weights via cfg.loss.lpips_weights, random init
        # otherwise) or the fixed "msrecon" anchor — random-weight LPIPS is
        # measured to collapse registration (BASELINE.md round 1), so the STN
        # configs resolve "auto" to msrecon when no weights are supplied.
        self.perceptual = resolve_perceptual(cfg.loss)
        self.lpips = LPIPS(dtype=dt) if self.perceptual == "lpips" else None

    def init(self, key, batch):
        k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
        a, b = batch["A"], batch["B"]
        g1 = self.G1.init(k1, a)
        g2 = self.G2.init(k2, b)
        d1 = self.D1.init(k3, a, b)
        d2 = self.D2.init(k4, a, b)
        stn = self.STN.init(k5, a, a, b)
        frozen = {}
        if self.lpips is not None:
            lw = resolve_lpips_weights(self.cfg.loss)
            if lw:
                frozen["lpips"] = load_lpips_params(lw)
            else:
                frozen["lpips"] = self.lpips.init(k6, a, b)
        return {
            "g_params": {"G1": g1["params"], "G2": g2["params"], "STN": stn["params"]},
            "d_params": {"D1": d1["params"], "D2": d2["params"]},
            "spectral": {"D1": d1["spectral"], "D2": d2["spectral"]},
            "frozen": frozen,
        }

    def _forward(self, g_params, batch, rng):
        kg1, kg2, kg3 = jax.random.split(rng, 3)
        det = self.deterministic_g
        a, b = batch["A"], batch["B"]
        fake_b = self.G1.apply({"params": g_params["G1"]}, a,
                               deterministic=det, rngs={"dropout": kg1})
        # theta computed once (method="theta"), warp applied parameterlessly:
        # same math as STN.__call__, but theta stays visible for the step
        # metrics (a dead out-of-frame warp is invisible in the loss curves —
        # round-4 journey lesson)
        if self.variant == "dark_visible":
            # single G2 pass: fake_A = G2(STN(A, fake_B; src=B)) — there is
            # no fake_A1 = G2(B) leg in DarkVisible (``:682-687``)
            fake_a1 = None
            cond = fake_b
        else:
            fake_a1 = self.G2.apply({"params": g_params["G2"]}, b,
                                    deterministic=det, rngs={"dropout": kg2})
            cond = fake_a1
        theta = self.STN.apply({"params": g_params["STN"]}, a, cond,
                               method="theta")
        warped_b = warp_src(
            b, theta, mode=self.STN.mode, padding_mode=self.STN.padding_mode,
            fast=self.STN.fast_warp,
        )
        fake_a2 = self.G2.apply({"params": g_params["G2"]}, warped_b,
                                deterministic=det, rngs={"dropout": kg3})
        return fake_b, fake_a1, warped_b, fake_a2, theta

    @staticmethod
    def _single_pass_d() -> bool:
        """Concatenate each head's (fake, real) pair into one D forward —
        same math for a spectral-norm PatchGAN (no cross-batch coupling),
        half the D weight reads/launches. Mirrors the tfcgan recipe's knob
        (TFCGAN_SINGLE_PASS_D, trace-time, OPT-IN): measured in situ on the
        flagship fft_glo b128 step it REGRESSED 17% (BASELINE.md round 4),
        so the default everywhere is the reference's two-forward form; the
        STN trainer always advances spectral u/v once per step, so the
        cadence caveat never applies. See tools/profile_stn.py for the
        per-family measurement."""
        import os

        return os.environ.get("TFCGAN_SINGLE_PASS_D", "0") not in ("0", "false")

    def _d_apply(self, d_params, spectral, name, img, cond):
        return self.D1.apply(
            {"params": d_params[name], "spectral": spectral[name]}, img, cond
        )

    def _d_pair(self, d_params, spectral, name, first, second, cond):
        """(D(first|cond), D(second|cond)) for head ``name`` — one
        concatenated forward when ``_single_pass_d()``."""
        if self._single_pass_d():
            both = self._d_apply(
                d_params, spectral, name,
                jnp.concatenate([first, second], axis=0),
                jnp.concatenate([cond, cond], axis=0),
            )
            n = first.shape[0]
            return both[:n], both[n:]
        return (
            self._d_apply(d_params, spectral, name, first, cond),
            self._d_apply(d_params, spectral, name, second, cond),
        )

    def g_loss(self, g_params, d_params, spectral, frozen, batch, rng):
        cfg = self.cfg.loss
        a, b = batch["A"], batch["B"]
        fake_b, fake_a1, warped_b, fake_a2, theta = self._forward(g_params, batch, rng)

        # relativistic G losses (global_gen_loss :480-490)
        p1f, p1r = self._d_pair(d_params, spectral, "D1", fake_b, b, a)
        adv1 = ops.relativistic_g_loss(p1f, p1r, cfg.label_smooth)
        p2f, p2r = self._d_pair(d_params, spectral, "D2", fake_a2, a, b)
        adv2 = ops.relativistic_g_loss(p2f, p2r, cfg.label_smooth)
        adv = adv1 + adv2
        if self.variant == "dark_visible":
            # recon anchors the WARP to the G1 output, not fake_A to real_A
            # (``Eur_DarkVisible.py:690``: L1(warped_B, fake_B))
            recon = jnp.mean(
                jnp.abs(warped_b.astype(jnp.float32) - fake_b.astype(jnp.float32))
            )
        else:
            recon = jnp.mean(jnp.abs(fake_a2.astype(jnp.float32) - a))
        if self.lpips is not None:
            perc = jnp.mean(self.lpips.apply(frozen["lpips"], fake_a2, a)) + jnp.mean(
                self.lpips.apply(frozen["lpips"], fake_b, b)
            )
        else:  # fixed multi-scale anchor (same two image pairs as :637-639)
            perc = multiscale_recon(fake_a2, a) + multiscale_recon(fake_b, b)
        total = adv + self.recon_weight * recon + perc
        metrics = {"g_adv": adv, "g_recon": recon, "g_lpips": perc}
        if self.use_morph:
            morph = morph_triplet(a, b, warped_b)
            total = total + morph
            metrics["g_morph"] = morph
        if self.use_fft:
            # DarkVisible: FFT(fake_A, real_A) (``:700-704``); B2A:
            # FFT(fake_A1, real_A) (``NewModel3_B2A.py:683-687``). Both add
            # the UNhalved amp+pha sum -> fft_weight 2.0 on fft_l1_loss's
            # 0.5·(amp+pha) form (set in the stn_* configs).
            src = fake_a2 if self.variant == "dark_visible" else fake_a1
            fft, _, _ = ops.fftloss.fft_l1_loss(src, a, mode=cfg.fft_quantize)
            total = total + cfg.fft_weight * fft
            metrics["g_fft"] = fft
        metrics["loss_G"] = total
        # warp health: mean |translation| in [-1,1] grid units (>1 = content
        # pushed out of frame => zero gradient under border padding)
        metrics["theta_t"] = jnp.mean(
            jnp.abs(jax.lax.stop_gradient(theta)[:, :, 2])
        )
        aux = {
            "fake_b": jax.lax.stop_gradient(fake_b),
            "fake_a2": jax.lax.stop_gradient(fake_a2),
            "warped_b": jax.lax.stop_gradient(warped_b),
        }
        return total, (aux, metrics)

    def d_loss(self, d_params, spectral, aux, batch, rng):
        cfg = self.cfg.loss
        a, b = batch["A"], batch["B"]

        # global_disc_loss (:492-507): 0.25 per head (DarkVisible: 1.0,
        # ``Eur_DarkVisible.py:510-526``), then 0.5 overall
        p1r, p1f = self._d_pair(d_params, spectral, "D1", b, aux["fake_b"], a)
        d1 = ops.relativistic_d_loss(
            p1r, p1f, cfg.label_smooth, weight=self.d_head_weight,
        )
        p2r, p2f = self._d_pair(d_params, spectral, "D2", a, aux["fake_a2"], b)
        d2 = ops.relativistic_d_loss(
            p2r, p2f, cfg.label_smooth, weight=self.d_head_weight,
        )
        loss = 0.5 * (d1 + d2)
        return loss, {"loss_D": loss, "d1": d1, "d2": d2}
