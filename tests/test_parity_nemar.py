"""Whole-step lockstep trajectory parity for the NeMAR recipe vs a torch
replica of the reference model (``/root/reference/nemar/models/
nemar_model.py:161-288``), fp32/CPU both sides, transferred init weights,
fixed batches.

What this proves that per-term tests cannot: the **D-first interleaving** —
``optimizer_D.step()`` runs before ``backward_T_and_R``, whose GAN terms
re-run netD with the *updated* parameters (:266-288; the trainer's
``update_order = "d_first"`` path) — plus the bidirectional TR/RT loss
composition through the deformable ResUnet STN (dense offset field over an
identity grid, bilinear/zeros/align_corners=False warp), the bilateral-less
TV smoothness term, and three Adams (T, R, D; T+R fused into one optax Adam
over disjoint trees, which is identical).

Configured for lockstep: 2 ResNet blocks in netT (reference default 9 —
identical per-block math), the torch-exact gather warp instead of the Pallas
dense kernel (kernel parity is bounded in test_pallas_gridsample), and
lambda_smooth=10 so the smoothness term participates (upstream default 0).
"""

from __future__ import annotations

import itertools

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax

from test_parity_cyclegan import TResNetGen, _load_conv

from tfcgan_tpu.config import get_experiment
from tfcgan_tpu.data.synth import synthetic_batch
from tfcgan_tpu.parallel.mesh import make_mesh, shard_batch
from tfcgan_tpu.recipes import build_recipe
from tfcgan_tpu.train.trainer import Trainer

SIZE, BATCH, STEPS, BLOCKS = 128, 2, 6, 2  # ResUnet has 7 pools: SIZE >= 128
LAMBDA_SMOOTH = 10.0
DOWN_NF = (32, 64, 64, 64, 64, 64, 64)
UP_NF = (64, 64, 64, 64, 64, 64, 32)


# ------------------------------------------------------------- torch replica
class TNLayerD(nn.Module):
    """pix2pix 'basic' 70x70 PatchGAN (``nemar/models/networks.py:168+``)."""

    def __init__(self):
        super().__init__()
        self.conv0 = nn.Conv2d(6, 64, 4, 2, 1)
        self.conv1 = nn.Conv2d(64, 128, 4, 2, 1)
        self.conv2 = nn.Conv2d(128, 256, 4, 2, 1)
        self.conv3 = nn.Conv2d(256, 512, 4, 1, 1)
        self.final = nn.Conv2d(512, 1, 4, 1, 1)

    def forward(self, x):
        x = F.leaky_relu(self.conv0(x), 0.2)
        for c in (self.conv1, self.conv2, self.conv3):
            x = F.leaky_relu(F.instance_norm(c(x)), 0.2)
        return self.final(x)


class TRes(nn.Module):
    def __init__(self, f):
        super().__init__()
        self.c1 = nn.Conv2d(f, f, 3, 1, 1)
        self.c2 = nn.Conv2d(f, f, 3, 1, 1)

    def forward(self, x):
        return x + self.c2(F.relu(self.c1(x)))


class TResUnetSTN(nn.Module):
    """models/stn.py DeformableSTN twin (NeMAR ``unet_stn.py:28-201``
    semantics): offset field added to the identity grid, bilinear/zeros/
    align_corners=False sampling, mean-|TV| smoothness."""

    def __init__(self):
        super().__init__()
        ins = (6,) + DOWN_NF[:-1]
        self.downs = nn.ModuleList(
            [nn.Conv2d(i, o, 3, 1, 1) for i, o in zip(ins, DOWN_NF)]
        )
        nf = DOWN_NF[-1]
        self.c1 = nn.Conv2d(nf, 2 * nf, 1)
        self.res = nn.ModuleList([TRes(2 * nf) for _ in range(3)])
        self.c2 = nn.Conv2d(2 * nf, nf, 1)
        # each up conv consumes cat(upsampled x, skip)
        up_ins = []
        x_ch = nf
        for i, o in enumerate(UP_NF):
            up_ins.append(x_ch + DOWN_NF[-(i + 1)])
            x_ch = o
        self.ups = nn.ModuleList(
            [nn.Conv2d(i, o, 3, 1, 1) for i, o in zip(up_ins, UP_NF)]
        )
        self.refine_res = TRes(UP_NF[-1])
        self.refine_conv = nn.Conv2d(UP_NF[-1], UP_NF[-1], 1)
        self.offset = nn.Conv2d(UP_NF[-1], 2, 3, 1, 1)

    def forward(self, img_a, img_b, apply_on):
        x = torch.cat([img_a, img_b], 1)
        n, _, hh, ww = x.shape
        skips = []
        for conv in self.downs:
            x = F.leaky_relu(conv(x), 0.2)
            skips.append(x)
            x = F.max_pool2d(x, 2)
        x = F.leaky_relu(self.c1(x), 0.2)
        for r in self.res:
            x = r(x)
        x = F.leaky_relu(self.c2(x), 0.2)
        for i, conv in enumerate(self.ups):
            s = skips[-(i + 1)]
            x = F.interpolate(x, size=s.shape[2:], mode="bilinear",
                              align_corners=False)
            x = F.leaky_relu(conv(torch.cat([x, s], 1)), 0.2)
        x = self.refine_res(x)
        x = F.leaky_relu(self.refine_conv(x), 0.2)
        off = self.offset(x).permute(0, 2, 3, 1)  # (N, H, W, 2), xy like grid
        identity = torch.tensor(
            [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]
        ).expand(n, 2, 3)
        grid = F.affine_grid(identity, (n, 1, hh, ww), align_corners=False) + off
        warped = [
            F.grid_sample(img, grid, mode="bilinear", padding_mode="zeros",
                          align_corners=False)
            for img in apply_on
        ]
        reg = (
            (off[:, 1:] - off[:, :-1]).abs().mean()
            + (off[:, :, 1:] - off[:, :, :-1]).abs().mean()
        )
        return warped, reg


# ------------------------------------------------------------------ transfer
def load_resnet_gen(t: TResNetGen, p: dict) -> None:
    for name in ("stem", "down0", "down1", "up0", "up1", "head"):
        _load_conv(getattr(t, name), p[name])
    for i, blk in enumerate(t.res):
        _load_conv(blk.conv1, p[f"res{i}"]["conv1"])
        _load_conv(blk.conv2, p[f"res{i}"]["conv2"])


def load_nlayer_d(t: TNLayerD, p: dict) -> None:
    for i in range(4):
        _load_conv(getattr(t, f"conv{i}"), p[f"conv{i}"])
    _load_conv(t.final, p["final"])


def load_resunet(t: TResUnetSTN, p: dict) -> None:
    for i, conv in enumerate(t.downs):
        _load_conv(conv, p[f"down{i}"])
    _load_conv(t.c1, p["c1"])
    _load_conv(t.c2, p["c2"])
    for i, blk in enumerate(t.res):
        _load_conv(blk.c1, p[f"res{i}"]["c1"])
        _load_conv(blk.c2, p[f"res{i}"]["c2"])
    for i, conv in enumerate(t.ups):
        _load_conv(conv, p[f"up{i}"])
    _load_conv(t.refine_res.c1, p["refine_res"]["c1"])
    _load_conv(t.refine_res.c2, p["refine_res"]["c2"])
    _load_conv(t.refine_conv, p["refine_conv"])
    _load_conv(t.offset, p["offset"])


def t_mse(x, target):
    return F.mse_loss(x, torch.full_like(x, target))


# ---------------------------------------------------------------------- test
class TestNeMARTrajectoryParity:
    def test_lockstep_d_first(self):
        cfg = get_experiment("nemar")
        cfg = cfg.replace(
            data=cfg.data.__class__(batch_size=BATCH, image_size=SIZE),
            train=cfg.train.__class__(compute_dtype="float32"),
            extra={
                **cfg.extra, "resnet_blocks": BLOCKS, "fast_warp": False,
                "lambda_smooth": LAMBDA_SMOOTH,
            },
        )
        recipe = build_recipe(cfg)
        assert recipe.update_order == "d_first"
        trainer = Trainer(cfg, recipe, mesh=make_mesh(1))
        batches = [
            synthetic_batch(batch_size=BATCH, image_size=SIZE, seed=s)
            for s in range(STEPS)
        ]
        state = trainer.init_state(jax.random.PRNGKey(0), batches[0])

        gp = jax.device_get(state.g_params)
        dp = jax.device_get(state.d_params)
        tt = TResNetGen(BLOCKS)
        load_resnet_gen(tt, gp["T"])
        tr = TResUnetSTN()
        load_resunet(tr, gp["R"])
        td = TNLayerD()
        load_nlayer_d(td, dp["D"])

        lr, betas = cfg.optim.lr, (cfg.optim.b1, cfg.optim.b2)
        opt_g = torch.optim.Adam(
            itertools.chain(tt.parameters(), tr.parameters()), lr=lr, betas=betas
        )
        opt_d = torch.optim.Adam(td.parameters(), lr=lr, betas=betas)

        step = trainer.compiled_step()
        jax_hist, torch_hist = [], []
        for batch in batches:
            state, m = step(state, shard_batch(batch, trainer.mesh))
            jax_hist.append((float(m["loss_G"]), float(m["loss_D"])))

            a = torch.from_numpy(batch["A"]).permute(0, 3, 1, 2)
            b = torch.from_numpy(batch["B"]).permute(0, 3, 1, 2)
            # single forward (``forward`` :161-173)
            fake_b = tt(a)
            (reg_a, fake_rt_b), reg = tr(a, b, [a, fake_b])
            fake_tr_b = tt(reg_a)
            # D phase FIRST on detached fakes (``backward_D`` :217-264)
            loss_d = 0.5 * (
                t_mse(td(torch.cat([a, b], 1)), 1.0)
                + t_mse(td(torch.cat([a, fake_tr_b], 1).detach()), 0.0)
                + t_mse(td(torch.cat([a, fake_rt_b], 1).detach()), 0.0)
            )
            opt_d.zero_grad()
            loss_d.backward()
            opt_d.step()
            # T/R phase re-runs the UPDATED D (``backward_T_and_R`` :175-215)
            loss_g = (
                100.0 * F.l1_loss(fake_tr_b, b)
                + 100.0 * F.l1_loss(fake_rt_b, b)
                + t_mse(td(torch.cat([a, fake_tr_b], 1)), 1.0)
                + t_mse(td(torch.cat([a, fake_rt_b], 1)), 1.0)
                + LAMBDA_SMOOTH * reg
            )
            opt_g.zero_grad()
            loss_g.backward()
            opt_g.step()
            torch_hist.append((loss_g.item(), loss_d.item()))

        jax_hist = np.asarray(jax_hist)
        torch_hist = np.asarray(torch_hist)
        # Step 0 proves weight transfer + composition + the D-first order (a
        # G-first trainer changes loss_G's GAN terms at O(1e-2) immediately);
        # later steps accumulate XLA-vs-ATen fp32 noise amplified by
        # lambda_recon=100.
        np.testing.assert_allclose(jax_hist[0], torch_hist[0], rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(jax_hist[1:3], torch_hist[1:3], rtol=3e-2, atol=1e-3)
        assert np.all(np.isfinite(jax_hist)) and np.all(np.isfinite(torch_hist))
        np.testing.assert_allclose(jax_hist[3:], torch_hist[3:], rtol=0.8, atol=0.1)
        assert abs(jax_hist[0, 0] - jax_hist[-1, 0]) > 1e-3
