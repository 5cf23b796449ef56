"""Whole-step lockstep trajectory parity for the ThermalGAN recipe vs a torch
replica of the reference trainer (``/root/reference/ThermalGAN/
ThermalGAN_noAMP.py:574-686``), fp32/CPU both sides, transferred init
weights, fixed batches.

Composition proven here: the two-stage step — cVAE-GAN (G1 conditioned on
the H-normalized temperature plane, closed-form KL on the Encoder, thermal
segmentation surrogate L1, temperature-LUT latent loss) then pix2pix
(G2 over the *detached* fake_S, MSE GAN + 100·L1) — with the named noAMP
config's **severed stage-1 adversarial graph**: the reference rebuilds the
MultiDiscriminator loss as a fresh leaf (``torch.tensor(a).mean()
.requires_grad_()``, ``:243-256``), so loss_VAE_GAN adds value but no
gradient and D_VAE never trains. The torch twin reproduces exactly that
(no_grad score), and the jax side must match it (d_vae_mode="detached").

Configured for lockstep: G2 dropout off, temp LUT in the differentiable
"smooth" mode (the config default; the reference's PIL round-trip is
gradient-dead and parity-tested per-term in test_ops_basic), our closed-form
KL on both sides (the reference's ``nn.KLDivLoss(mu, logvar)`` NaNs).
"""

from __future__ import annotations

import itertools

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax

from test_models import to_torch_conv, to_torch_convT

from tfcgan_tpu.config import get_experiment
from tfcgan_tpu.data.synth import synthetic_batch
from tfcgan_tpu.parallel.mesh import make_mesh, shard_batch
from tfcgan_tpu.recipes import build_recipe
from tfcgan_tpu.train.trainer import Trainer

SIZE, BATCH, STEPS = 256, 1, 4  # G2's 8 downsamples require 256^2


# ------------------------------------------------------------- torch replica
class TG1(nn.Module):
    """GeneratorG1 twin: UNet-7 over cat(A, temp plane), k3/s2 downs,
    nearest-up + k3 convs, LeakyReLU(0.01) up-activations (torch default
    slope), IN everywhere except down1."""

    def __init__(self):
        super().__init__()
        downs = [(4, 64), (64, 128), (128, 256), (256, 512), (512, 512),
                 (512, 512), (512, 512)]
        self.downs = nn.ModuleList(
            [nn.Conv2d(i, o, 3, 2, 1, bias=False) for i, o in downs]
        )
        ups = [(512, 512), (1024, 512), (1024, 512), (1024, 256), (512, 128),
               (256, 64)]
        self.ups = nn.ModuleList(
            [nn.Conv2d(i, o, 3, 1, 1, bias=False) for i, o in ups]
        )
        self.final = nn.Conv2d(128, 3, 3, 1, 1)

    def forward(self, x, t):
        h = torch.cat([x, t.unsqueeze(1)], 1)
        skips = []
        for i, conv in enumerate(self.downs):
            h = conv(h)
            if i > 0:
                h = F.instance_norm(h)
            h = F.leaky_relu(h, 0.2)
            skips.append(h)
        u = skips[-1]
        for i, conv in enumerate(self.ups):
            u = F.interpolate(u, scale_factor=2, mode="nearest")
            u = F.leaky_relu(F.instance_norm(conv(u)), 0.01)
            u = torch.cat([u, skips[-(i + 2)]], 1)
        u = F.interpolate(u, scale_factor=2, mode="nearest")
        return torch.tanh(self.final(u))


class TBasicBlock(nn.Module):
    """models/resnet.py BasicBlock twin (GroupNorm(group_size=1), eps 1e-6)."""

    def __init__(self, cin, f, stride):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, f, 3, stride, 1, bias=False)
        self.n1 = nn.GroupNorm(f, f, eps=1e-6)
        self.conv2 = nn.Conv2d(f, f, 3, 1, 1, bias=False)
        self.n2 = nn.GroupNorm(f, f, eps=1e-6)
        self.has_down = stride != 1 or cin != f
        if self.has_down:
            self.down = nn.Conv2d(cin, f, 1, stride, bias=False)
            self.dn = nn.GroupNorm(f, f, eps=1e-6)

    def forward(self, x):
        h = self.n2(self.conv2(F.relu(self.n1(self.conv1(x)))))
        if self.has_down:
            x = self.dn(self.down(x))
        return F.relu(x + h)


class TEncoder(nn.Module):
    def __init__(self, latent=8, feat_dim=1024):
        super().__init__()
        self.stem = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.stem_norm = nn.GroupNorm(64, 64, eps=1e-6)
        specs = [(64, 64, 1), (64, 64, 1), (64, 128, 2), (128, 128, 1),
                 (128, 256, 2), (256, 256, 1)]
        self.blocks = nn.ModuleList([TBasicBlock(*s) for s in specs])
        self.fc_mu = nn.Linear(feat_dim, latent)
        self.fc_logvar = nn.Linear(feat_dim, latent)

    def forward(self, x):
        h = F.max_pool2d(F.relu(self.stem_norm(self.stem(x))), 3, 2, 1)
        for b in self.blocks:
            h = b(h)
        h = F.avg_pool2d(h, 8, 8)
        # flax flattens NHWC; the fc weight transfer permutes to match, so
        # flatten NCHW natively here
        h = h.flatten(1)
        return self.fc_mu(h), self.fc_logvar(h)


class TPyramidD(nn.Module):
    def __init__(self):
        super().__init__()
        chans = [(3, 64), (64, 128), (128, 256), (256, 512)]
        self.convs = nn.ModuleList(
            [nn.Conv2d(i, o, 4, 2, 1) for i, o in chans]
        )
        self.final = nn.Conv2d(512, 1, 3, 1, 1)

    def forward(self, x):
        for i, c in enumerate(self.convs):
            x = c(x)
            if i > 0:
                x = F.instance_norm(x)
            x = F.leaky_relu(x, 0.2)
        return self.final(x)


class TMultiD(nn.Module):
    """3-scale pyramid; in-forward L1-to-target averaged over scales
    (``noAMP:217-256``) — used value-only (the reference severs its graph)."""

    def __init__(self):
        super().__init__()
        self.discs = nn.ModuleList([TPyramidD() for _ in range(3)])

    def score(self, x, target):
        terms = []
        for i, d in enumerate(self.discs):
            out = d(x)
            terms.append((out - target).abs().mean())
            if i + 1 < len(self.discs):
                x = F.avg_pool2d(x, 3, 2, 1, count_include_pad=False)
        return torch.stack(terms).mean()


class TG2(nn.Module):
    """GeneratorG2 twin: pix2pix UNet-8 (dropout off for lockstep)."""

    def __init__(self):
        super().__init__()
        downs = [(3, 64), (64, 128), (128, 256), (256, 512), (512, 512),
                 (512, 512), (512, 512), (512, 512)]
        self.downs = nn.ModuleList(
            [nn.Conv2d(i, o, 4, 2, 1, bias=False) for i, o in downs]
        )
        self.norm_down = [False, True, True, True, True, True, True, False]
        ups = [(512, 512), (1024, 512), (1024, 512), (1024, 512), (1024, 256),
               (512, 128), (256, 64)]
        self.ups = nn.ModuleList(
            [nn.ConvTranspose2d(i, o, 4, 2, 1, bias=False) for i, o in ups]
        )
        self.final = nn.Conv2d(128, 3, 4)

    def forward(self, x):
        skips = []
        h = x
        for conv, norm in zip(self.downs, self.norm_down):
            h = conv(h)
            if norm:
                h = F.instance_norm(h)
            h = F.leaky_relu(h, 0.2)
            skips.append(h)
        u = skips[-1]
        for i, conv in enumerate(self.ups):
            u = F.relu(F.instance_norm(conv(u)))
            u = torch.cat([u, skips[-(i + 2)]], 1)
        u = F.interpolate(u, scale_factor=2, mode="nearest")
        return torch.tanh(self.final(F.pad(u, (2, 1, 2, 1))))


class TDpix(nn.Module):
    def __init__(self):
        super().__init__()
        chans = [(6, 64), (64, 128), (128, 256), (256, 512)]
        self.convs = nn.ModuleList(
            [nn.Conv2d(i, o, 4, 2, 1) for i, o in chans]
        )
        self.final = nn.Conv2d(512, 1, 4, bias=False)

    def forward(self, img, cond):
        x = torch.cat([img, cond], 1)
        for i, c in enumerate(self.convs):
            x = c(x)
            if i > 0:
                x = F.instance_norm(x)
            x = F.leaky_relu(x, 0.2)
        return self.final(F.pad(x, (2, 1, 2, 1)))


# ----------------------------------------------------------- loss helpers
def t_norm_h(t):
    """ops normalized_temps: x / (||x||_2 over H + 1e-12)."""
    dim = 1 if t.dim() == 3 else 2
    return t / (t.pow(2).sum(dim, keepdim=True).sqrt() + 1e-12)


def t_thermal_mask(b):
    inv = -b.mean(1)
    n = inv / (inv.pow(2).sum(1, keepdim=True).sqrt() + 1e-12)
    return n.unsqueeze(1).expand(-1, 3, -1, -1)


def t_temp_smooth(fake_s):
    v = (fake_s[:, 0] * 0.5 + 0.5) * 255.0
    return 24.0 + v * (38.0 - 24.0) / 255.0


def t_mse(x, target):
    return F.mse_loss(x, torch.full_like(x, target))


# ------------------------------------------------------------------ transfer
def _conv(tc, p):
    tc.weight.data = to_torch_conv(p["kernel"])
    if tc.bias is not None:
        tc.bias.data = torch.from_numpy(np.asarray(p["bias"]).copy())


def _gn(g, p):
    g.weight.data = torch.from_numpy(np.asarray(p["scale"]).copy())
    g.bias.data = torch.from_numpy(np.asarray(p["bias"]).copy())


def load_g1(t: TG1, p):
    for i, conv in enumerate(t.downs):
        _conv(conv, p[f"down{i+1}"]["conv"])
    for i, conv in enumerate(t.ups):
        _conv(conv, p[f"up{i+1}"]["conv"])
    _conv(t.final, p["final"])


def load_encoder(t: TEncoder, p):
    _conv(t.stem, p["stem"])
    _gn(t.stem_norm, p["stem_norm"])
    for i, blk in enumerate(t.blocks):
        bp = p[f"block{i}"]
        _conv(blk.conv1, bp["conv1"])
        _gn(blk.n1, bp["n1"])
        _conv(blk.conv2, bp["conv2"])
        _gn(blk.n2, bp["n2"])
        if blk.has_down:
            _conv(blk.down, bp["down"])
            _gn(blk.dn, bp["dn"])
    for lin, name in ((t.fc_mu, "fc_mu"), (t.fc_logvar, "fc_logvar")):
        k = np.asarray(p[name]["kernel"])  # (H*W*C, out) flattened from NHWC
        hw = int(np.sqrt(k.shape[0] // 256))
        k4 = k.reshape(hw, hw, 256, -1).transpose(2, 0, 1, 3)  # -> CHW order
        lin.weight.data = torch.from_numpy(
            k4.reshape(-1, k.shape[-1]).T.copy()
        )
        lin.bias.data = torch.from_numpy(np.asarray(p[name]["bias"]).copy())


def load_multid(t: TMultiD, p):
    for i, d in enumerate(t.discs):
        dp = p[f"disc_{i}"]
        for j, c in enumerate(d.convs):
            _conv(c, dp[f"conv{j}"])
        _conv(d.final, dp["final"])


def load_g2(t: TG2, p):
    for i, conv in enumerate(t.downs):
        _conv(conv, p[f"down{i+1}"]["conv"])
    for i, conv in enumerate(t.ups):
        conv.weight.data = to_torch_convT(p[f"up{i+1}"]["conv"]["kernel"])
    _conv(t.final, p["final"])


def load_dpix(t: TDpix, p):
    for i, c in enumerate(t.convs):
        _conv(c, p[f"conv{i}"])
    _conv(t.final, p["final"])


# ---------------------------------------------------------------------- test
class TestThermalGANTrajectoryParity:
    def test_lockstep_detached_vae(self):
        cfg = get_experiment("thermalgan")
        cfg = cfg.replace(
            data=cfg.data.__class__(batch_size=BATCH, image_size=SIZE),
            train=cfg.train.__class__(compute_dtype="float32"),
            extra={**cfg.extra, "deterministic_g": True},
        )
        recipe = build_recipe(cfg)
        assert recipe.d_vae_mode == "detached"
        trainer = Trainer(cfg, recipe, mesh=make_mesh(1))
        batches = [
            synthetic_batch(batch_size=BATCH, image_size=SIZE, seed=s)
            for s in range(STEPS)
        ]
        state = trainer.init_state(jax.random.PRNGKey(0), batches[0])

        gp = jax.device_get(state.g_params)
        dp = jax.device_get(state.d_params)
        fz = jax.device_get(state.frozen)
        tg1, tenc, tg2 = TG1(), TEncoder(), TG2()
        load_g1(tg1, gp["G1"])
        load_encoder(tenc, gp["E"])
        load_g2(tg2, gp["G2"])
        tmd, tdp = TMultiD(), TDpix()
        load_multid(tmd, fz["D_vae"])
        load_dpix(tdp, dp["D_pix"])

        lr, betas = cfg.optim.lr, (cfg.optim.b1, cfg.optim.b2)
        opt_g = torch.optim.Adam(
            itertools.chain(tg1.parameters(), tenc.parameters(), tg2.parameters()),
            lr=lr, betas=betas,
        )
        opt_d = torch.optim.Adam(tdp.parameters(), lr=lr, betas=betas)

        step = trainer.compiled_step()
        jax_hist, torch_hist = [], []
        for batch in batches:
            state, m = step(state, shard_batch(batch, trainer.mesh))
            jax_hist.append(
                (float(m["loss_G"]), float(m["loss_D"]), float(m["g_vae_gan"]))
            )

            a = torch.from_numpy(batch["A"]).permute(0, 3, 1, 2)
            b = torch.from_numpy(batch["B"]).permute(0, 3, 1, 2)
            tbn = t_norm_h(torch.from_numpy(batch["T_B"]))
            # stage 1 (:596-628)
            mu, logvar = tenc(b)
            fake_s = tg1(a, tbn)
            real_s = t_thermal_mask(b)
            loss_pixel_bic = (fake_s - real_s).abs().mean()
            loss_kl = 0.5 * (logvar.exp() + mu * mu - 1 - logvar).sum(-1).mean()
            with torch.no_grad():  # torch.tensor(a) leaf rebuild == no grad
                loss_vae_gan = tmd.score(fake_s, 1.0)
            loss_latent = (tbn - t_norm_h(t_temp_smooth(fake_s))).abs().mean()
            loss_ge = loss_vae_gan + 0.01 * loss_kl + 10.0 * loss_pixel_bic + loss_latent
            # stage 2 (:650-666); one Adam over G1+E+G2 == the reference's
            # sequential G1/E then G2 steps (disjoint losses, detached fake_S)
            fake_b = tg2(fake_s.detach())
            loss_g2 = t_mse(tdp(fake_b, a), 1.0) + 100.0 * (fake_b - b).abs().mean()
            loss_g = loss_ge + loss_g2
            opt_g.zero_grad()
            loss_g.backward()
            opt_g.step()
            # D_VAE step is a functional no-op (severed graph); D_pix (:670-686)
            loss_d = 0.5 * (
                t_mse(tdp(b, a), 1.0) + t_mse(tdp(fake_b.detach(), a), 0.0)
            )
            opt_d.zero_grad()
            loss_d.backward()
            opt_d.step()
            torch_hist.append((loss_g.item(), loss_d.item(), loss_vae_gan.item()))

        jax_hist = np.asarray(jax_hist)
        torch_hist = np.asarray(torch_hist)
        np.testing.assert_allclose(jax_hist[0], torch_hist[0], rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(jax_hist[1:3], torch_hist[1:3], rtol=3e-2, atol=1e-3)
        assert np.all(np.isfinite(jax_hist)) and np.all(np.isfinite(torch_hist))
        np.testing.assert_allclose(jax_hist[3:], torch_hist[3:], rtol=0.8, atol=0.1)
        assert abs(jax_hist[0, 0] - jax_hist[-1, 0]) > 1e-3
