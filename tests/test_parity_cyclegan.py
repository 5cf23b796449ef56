"""Whole-step lockstep trajectory parity for the CycleGAN recipe vs a torch
replica of the reference trainer (``/root/reference/cyclegan_og/cyclegan.py:
356-450``), fp32/CPU both sides, transferred init weights, fixed batches.

Complements test_parity_trajectory.py (FFT-GLO): this family exercises the
pieces that one doesn't — ResNet generators (reflect-pad stems, residual
blocks, nearest-upsample heads), unconditional instance-norm PatchGAN Ds,
lsgan (MSE) losses, the identity + cycle composition, the replay buffer in
its deterministic filling phase, and the reference's *three* separate Adam
optimizers (G_AB+G_BA chained; D_A and D_B each their own — which is why
``d_loss`` differentiates the SUM of the two D losses).

The replay buffer (capacity 50, ``recipes/cyclegan.py``) is pass-through
while filling; STEPS·BATCH = 24 < 50 keeps both frameworks deterministic and
in lockstep (the reference's push-or-swap RNG cannot be cross-aligned).
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax

from test_models import to_torch_conv

from tfcgan_tpu.config import get_experiment
from tfcgan_tpu.data.synth import synthetic_batch
from tfcgan_tpu.parallel.mesh import make_mesh, shard_batch
from tfcgan_tpu.recipes import build_recipe
from tfcgan_tpu.train.trainer import Trainer

SIZE, BATCH, STEPS, BLOCKS = 64, 2, 12, 3


# ------------------------------------------------------------- torch replica
class TResBlock(nn.Module):
    """``cyclegan.py:95-108``: reflect-pad 3x3 conv, IN, ReLU, again, + x."""

    def __init__(self, f):
        super().__init__()
        self.conv1 = nn.Conv2d(f, f, 3)
        self.conv2 = nn.Conv2d(f, f, 3)

    def forward(self, x):
        h = F.relu(F.instance_norm(self.conv1(F.pad(x, (1, 1, 1, 1), mode="reflect"))))
        h = F.instance_norm(self.conv2(F.pad(h, (1, 1, 1, 1), mode="reflect")))
        return x + h


class TResNetGen(nn.Module):
    """``GeneratorResNet`` (``cyclegan.py:111-159``), channels=3."""

    def __init__(self, blocks):
        super().__init__()
        self.stem = nn.Conv2d(3, 64, 7)
        self.down0 = nn.Conv2d(64, 128, 3, 2, 1)
        self.down1 = nn.Conv2d(128, 256, 3, 2, 1)
        self.res = nn.ModuleList([TResBlock(256) for _ in range(blocks)])
        self.up0 = nn.Conv2d(256, 128, 3, 1, 1)
        self.up1 = nn.Conv2d(128, 64, 3, 1, 1)
        self.head = nn.Conv2d(64, 3, 7)

    def forward(self, x):
        h = F.relu(F.instance_norm(self.stem(F.pad(x, (3,) * 4, mode="reflect"))))
        h = F.relu(F.instance_norm(self.down0(h)))
        h = F.relu(F.instance_norm(self.down1(h)))
        for r in self.res:
            h = r(h)
        h = F.relu(F.instance_norm(self.up0(F.interpolate(h, scale_factor=2))))
        h = F.relu(F.instance_norm(self.up1(F.interpolate(h, scale_factor=2))))
        return torch.tanh(self.head(F.pad(h, (3,) * 4, mode="reflect")))


class TCycleD(nn.Module):
    """``Discriminator`` (``cyclegan.py:167-196``): 4 stride-2 blocks (first
    unnormalized) + ZeroPad2d((1,0,1,0)) + Conv2d(512,1,4,padding=1) with its
    default bias."""

    def __init__(self):
        super().__init__()
        self.convs = nn.ModuleList(
            [nn.Conv2d(i, o, 4, 2, 1) for i, o in [(3, 64), (64, 128), (128, 256), (256, 512)]]
        )
        self.final = nn.Conv2d(512, 1, 4)

    def forward(self, x):
        for i, c in enumerate(self.convs):
            x = c(x)
            if i > 0:
                x = F.instance_norm(x)
            x = F.leaky_relu(x, 0.2)
        return self.final(F.pad(x, (2, 1, 2, 1)))


def _load_conv(tconv: nn.Conv2d, p: dict) -> None:
    tconv.weight.data = to_torch_conv(p["kernel"])
    tconv.bias.data = torch.from_numpy(np.asarray(p["bias"]).copy())


def build_torch_twins(state):
    g = jax.device_get(state.g_params)
    d = jax.device_get(state.d_params)
    gens, discs = [], []
    for gname in ("G_AB", "G_BA"):
        t = TResNetGen(BLOCKS)
        p = g[gname]
        for name in ("stem", "down0", "down1", "up0", "up1", "head"):
            _load_conv(getattr(t, name), p[name])
        for i, blk in enumerate(t.res):
            _load_conv(blk.conv1, p[f"res{i}"]["conv1"])
            _load_conv(blk.conv2, p[f"res{i}"]["conv2"])
        gens.append(t)
    for dname in ("D_A", "D_B"):
        t = TCycleD()
        p = d[dname]
        for i, c in enumerate(t.convs):
            _load_conv(c, p[f"conv{i}"])
        _load_conv(t.final, p["final"])
        discs.append(t)
    return (*gens, *discs)


def t_mse(x, target):
    return F.mse_loss(x, torch.full_like(x, target))


# ---------------------------------------------------------------------- test
class TestCycleGANTrajectoryParity:
    def test_lockstep(self):
        cfg = get_experiment("cyclegan")
        cfg = cfg.replace(
            data=cfg.data.__class__(batch_size=BATCH, image_size=SIZE),
            train=cfg.train.__class__(compute_dtype="float32"),
            optim=cfg.optim.__class__(),  # constant lr: 12 steps << decay start
            extra={**cfg.extra, "resnet_blocks": BLOCKS},
        )
        recipe = build_recipe(cfg)
        trainer = Trainer(cfg, recipe, mesh=make_mesh(1))
        batches = [
            synthetic_batch(batch_size=BATCH, image_size=SIZE, seed=s)
            for s in range(STEPS)
        ]
        state = trainer.init_state(jax.random.PRNGKey(0), batches[0])
        g_ab, g_ba, d_a, d_b = build_torch_twins(state)

        import itertools

        lr, betas = cfg.optim.lr, (cfg.optim.b1, cfg.optim.b2)
        opt_g = torch.optim.Adam(
            itertools.chain(g_ab.parameters(), g_ba.parameters()), lr=lr, betas=betas
        )
        opt_da = torch.optim.Adam(d_a.parameters(), lr=lr, betas=betas)
        opt_db = torch.optim.Adam(d_b.parameters(), lr=lr, betas=betas)

        step = trainer.compiled_step()
        jax_hist, torch_hist = [], []
        for batch in batches:
            state, m = step(state, shard_batch(batch, trainer.mesh))
            jax_hist.append((float(m["loss_G"]), float(m["d_A"]), float(m["d_B"])))

            a = torch.from_numpy(batch["A"]).permute(0, 3, 1, 2)
            b = torch.from_numpy(batch["B"]).permute(0, 3, 1, 2)
            # G phase (``cyclegan.py:375-411``)
            loss_id = 0.5 * (F.l1_loss(g_ba(a), a) + F.l1_loss(g_ab(b), b))
            fake_b = g_ab(a)
            fake_a = g_ba(b)
            loss_gan = 0.5 * (t_mse(d_b(fake_b), 1.0) + t_mse(d_a(fake_a), 1.0))
            loss_cyc = 0.5 * (F.l1_loss(g_ba(fake_b), a) + F.l1_loss(g_ab(fake_a), b))
            loss_g = loss_gan + 10.0 * loss_cyc + 5.0 * loss_id
            opt_g.zero_grad()
            loss_g.backward()
            opt_g.step()
            # D phases on detached fakes; buffer is filling => pass-through
            # (``cyclegan.py:415-447``)
            loss_d_a = 0.5 * (t_mse(d_a(a), 1.0) + t_mse(d_a(fake_a.detach()), 0.0))
            opt_da.zero_grad()
            loss_d_a.backward()
            opt_da.step()
            loss_d_b = 0.5 * (t_mse(d_b(b), 1.0) + t_mse(d_b(fake_b.detach()), 0.0))
            opt_db.zero_grad()
            loss_d_b.backward()
            opt_db.step()
            torch_hist.append((loss_g.item(), loss_d_a.item(), loss_d_b.item()))

        # the jax-side buffers must still be filling, or lockstep is invalid
        assert int(jax.device_get(state.extra["buf_A"]["count"])) == STEPS * BATCH

        jax_hist = np.asarray(jax_hist)
        torch_hist = np.asarray(torch_hist)
        # Step 0 is pre-update: losses must match to fp32 noise — this proves
        # the weight transfer and the loss composition exactly (measured
        # ~1e-7 rel). Steps 1-2 include optimizer updates: XLA-vs-ATen fp32
        # accumulation noise compounds faster here than in the FFT-GLO test
        # (three nets, 6 G applies/step, λ_cyc=10 amplification) — measured
        # 2e-4 rel at step 1, 8e-3 at step 2, 5.5e-2 by step 3. A *semantic*
        # mismatch (wrong detach, swapped G/D order, optimizer mis-wiring)
        # perturbs at O(1e-1) by step 1-2 and would blow the 3e-2 window.
        np.testing.assert_allclose(jax_hist[0], torch_hist[0], rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(jax_hist[1:3], torch_hist[1:3], rtol=3e-2, atol=1e-3)
        assert np.all(np.isfinite(jax_hist)) and np.all(np.isfinite(torch_hist))
        np.testing.assert_allclose(jax_hist[3:], torch_hist[3:], rtol=0.8, atol=0.1)
        assert abs(jax_hist[0, 0] - jax_hist[-1, 0]) > 1e-3
