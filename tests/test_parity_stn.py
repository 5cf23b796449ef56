"""Whole-step lockstep trajectory parity for the VTF-STN flagship recipe vs a
torch replica of the reference trainer (``/root/reference/TFC-STN/
TFCGAN_STN21_Original_NewModel3_Official.py:607-678``), fp32/CPU both sides,
transferred init weights, fixed batches.

This proves the *composition* the per-term tests cannot: the dual-generator
forward (fake_B = G1(A), fake_A1 = G2(B)), the ViT localizer -> theta =
dtheta + identity -> bicubic/border warp chain, fake_A2 = G2(warped_B) with
warped_B NOT detached (gradients reach the STN through G2 — load-bearing,
:629), the morphological-gradient triplet, one joint Adam over G1+G2+STN and
one over D1+D2 (:560-561), and the 0.25-per-D relativistic D loss (:492-507).

Differences from the reference configured for cross-framework lockstep:
dropout off (RNG streams can't be aligned; parity-tested per-layer), a
2-block/96-dim ViT instead of ViT-Base (identical per-block math, fits the
1-core CPU budget), the torch-exact gather warp instead of the Pallas
separable kernel (kernel parity is bounded in test_pallas_kernels), and the
fixed msrecon perceptual anchor in place of pretrained LPIPS (the shipping
default when no converted weights exist; the torch side replicates it).
"""

from __future__ import annotations

import itertools

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax

from test_models import TGenerator, to_torch_conv, to_torch_convT
from test_parity_trajectory import TPatchD, jax_to_torch_v

from tfcgan_tpu.config import get_experiment
from tfcgan_tpu.data.synth import synthetic_batch
from tfcgan_tpu.parallel.mesh import make_mesh, shard_batch
from tfcgan_tpu.recipes import build_recipe
from tfcgan_tpu.train.trainer import Trainer

# 128 is the smallest size torch's InstanceNorm accepts through the UNet's
# six downsamples; ViT patch 64 -> 2x2 patches + CLS = 5 tokens
SIZE, BATCH, STEPS = 128, 2, 8
VIT = dict(vit_depth=2, vit_dim=96, vit_heads=4, vit_mlp=192)
IDENTITY = torch.tensor([1.0, 0.0, 0.0, 0.0, 1.0, 0.0])


# ------------------------------------------------------------- torch replica
class TViTBlock(nn.Module):
    """Pre-LN transformer block mirroring models/vit.py (flax defaults:
    LayerNorm eps 1e-6, tanh-approximate GELU, q scaled by 1/sqrt(head_dim))."""

    def __init__(self, dim, heads, mlp):
        super().__init__()
        self.heads, self.hd = heads, dim // heads
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.wq, self.wk, self.wv, self.wo = (
            nn.Linear(dim, dim) for _ in range(4)
        )
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp1 = nn.Linear(dim, mlp)
        self.mlp2 = nn.Linear(mlp, dim)

    def forward(self, x):
        b, t, d = x.shape
        h = self.norm1(x)
        q = self.wq(h).reshape(b, t, self.heads, self.hd) / self.hd**0.5
        k = self.wk(h).reshape(b, t, self.heads, self.hd)
        v = self.wv(h).reshape(b, t, self.heads, self.hd)
        attn = torch.softmax(torch.einsum("bthd,bshd->bhts", q, k), dim=-1)
        out = torch.einsum("bhts,bshd->bthd", attn, v).reshape(b, t, d)
        x = x + self.wo(out)
        h = self.norm2(x)
        return x + self.mlp2(F.gelu(self.mlp1(h), approximate="tanh"))


class TSTN(nn.Module):
    """``Net`` (:172-232): ViT localizer -> MLP -> dtheta + identity ->
    bicubic/border/align_corners=True warp of src."""

    def __init__(self, patch, dim, depth, heads, mlp, tokens):
        super().__init__()
        self.patch_embed = nn.Conv2d(6, dim, patch, stride=patch)
        self.cls = nn.Parameter(torch.zeros(1, 1, dim))
        self.pos = nn.Parameter(torch.zeros(1, tokens, dim))
        self.blocks = nn.ModuleList(
            [TViTBlock(dim, heads, mlp) for _ in range(depth)]
        )
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.fc1 = nn.Linear(tokens * dim, 1024)
        self.fc2 = nn.Linear(1024, 512)
        self.fc3 = nn.Linear(512, 256)
        self.fc4 = nn.Linear(256, 6)

    def theta(self, img_a, img_b):
        x = torch.cat([img_a, img_b], 1)
        tok = self.patch_embed(x).flatten(2).transpose(1, 2)
        tok = torch.cat([self.cls.expand(x.shape[0], -1, -1), tok], 1) + self.pos
        for blk in self.blocks:
            tok = blk(tok)
        tok = self.norm(tok)
        h = F.relu(self.fc1(tok.flatten(1)))
        h = F.relu(self.fc2(h))
        h = torch.sigmoid(self.fc3(h))
        return (self.fc4(h) + IDENTITY[None, :]).reshape(-1, 2, 3)

    def forward(self, img_a, img_b, src):
        th = self.theta(img_a, img_b)
        grid = F.affine_grid(th, src.shape, align_corners=True)
        return F.grid_sample(
            src, grid, mode="bicubic", padding_mode="border", align_corners=True
        )


def t_morph_gradient(x):
    """ops/morphology.py semantics: 3x3-cross dilation - erosion, geodesic
    border (torch max_pool2d pads with -inf, so borders see valid pixels)."""

    def dil(z):
        v = F.max_pool2d(z, (3, 1), stride=1, padding=(1, 0))
        h = F.max_pool2d(z, (1, 3), stride=1, padding=(0, 1))
        return torch.maximum(v, h)

    return dil(x) + dil(-x)  # erosion(x) = -dilation(-x)


def t_morph_triplet(a, b, w):
    m_a = 1.0 - t_morph_gradient(a)
    m_b = 1.0 - t_morph_gradient(b)
    m_w = 1.0 - t_morph_gradient(w)
    return F.triplet_margin_loss(m_w, m_a, m_b)  # margin 1, p=2, eps=1e-6


def t_ncc(x, y, eps=1e-5):
    x = x.flatten(1) - x.flatten(1).mean(1, keepdim=True)
    y = y.flatten(1) - y.flatten(1).mean(1, keepdim=True)
    num = (x * y).mean(1)
    den = ((x * x).mean(1) * (y * y).mean(1)).sqrt()
    return num / (den + eps)


def t_msrecon(x, y, levels=4):
    """ops/perceptual.multiscale_recon replica."""
    total = torch.zeros(())
    for lv in range(levels):
        total = total + (x - y).abs().mean() + 0.5 * (1.0 - t_ncc(x, y)).mean()
        if lv + 1 < levels:
            x, y = F.avg_pool2d(x, 2), F.avg_pool2d(y, 2)
    return total


def t_bce(x, target):
    return F.binary_cross_entropy_with_logits(x, torch.full_like(x, target))


# ------------------------------------------------------------------ transfer
def _load_linear(lin: nn.Linear, p: dict) -> None:
    k = np.asarray(p["kernel"], dtype=np.float64)
    lin.weight.data = torch.from_numpy(k.reshape(k.shape[0], -1).T.copy()).float()
    lin.bias.data = torch.from_numpy(np.asarray(p["bias"]).reshape(-1).copy()).float()


def _load_attn_linear(lin: nn.Linear, p: dict, out: bool) -> None:
    # q/k/v kernels are (dim, heads, hd) and apply as x @ k.reshape(dim, dim);
    # the out kernel is (heads, hd, dim) applying as flat @ k.reshape(dim, dim)
    k = np.asarray(p["kernel"])
    w = k.reshape(-1, k.shape[-1]) if out else k.reshape(k.shape[0], -1)
    lin.weight.data = torch.from_numpy(w.T.copy()).float()
    lin.bias.data = torch.from_numpy(np.asarray(p["bias"]).reshape(-1).copy()).float()


def load_generator(t: TGenerator, p: dict) -> None:
    for i in range(1, 7):
        getattr(t, f"down{i}").conv.weight.data = to_torch_conv(
            p[f"down{i}"]["conv"]["kernel"]
        )
    for i in range(1, 6):
        getattr(t, f"up{i}").conv.weight.data = to_torch_convT(
            p[f"up{i}"]["conv"]["kernel"]
        )
    t.final_conv.weight.data = to_torch_conv(p["final_conv"]["kernel"])
    t.final_conv.bias.data = torch.from_numpy(
        np.asarray(p["final_conv"]["bias"]).copy()
    )


def load_patchd(td: TPatchD, p: dict, s: dict) -> None:
    for i, blk in enumerate(td.blocks):
        bp, bs = p[f"block{i}_conv"], s[f"block{i}_conv"]
        blk.weight.data = to_torch_conv(bp["kernel"])
        blk.bias.data = torch.from_numpy(np.asarray(bp["bias"]).copy())
        blk.u.copy_(torch.from_numpy(np.asarray(bs["u"]).copy()))
        blk.v.copy_(jax_to_torch_v(bs["v"], np.asarray(bp["kernel"]).shape))
    td.final_conv.weight.data = to_torch_conv(p["final_conv"]["kernel"])


def load_stn(t: TSTN, p: dict) -> None:
    vit = p["vit"]
    t.patch_embed.weight.data = to_torch_conv(vit["patch_embed"]["kernel"])
    t.patch_embed.bias.data = torch.from_numpy(
        np.asarray(vit["patch_embed"]["bias"]).copy()
    )
    t.cls.data = torch.from_numpy(np.asarray(vit["cls_token"]).copy())
    t.pos.data = torch.from_numpy(np.asarray(vit["pos_embed"]).copy())
    for i, blk in enumerate(t.blocks):
        bp = vit[f"block{i}"]
        for norm, name in ((blk.norm1, "norm1"), (blk.norm2, "norm2")):
            norm.weight.data = torch.from_numpy(np.asarray(bp[name]["scale"]).copy())
            norm.bias.data = torch.from_numpy(np.asarray(bp[name]["bias"]).copy())
        for lin, name in ((blk.wq, "query"), (blk.wk, "key"), (blk.wv, "value")):
            _load_attn_linear(lin, bp["attn"][name], out=False)
        _load_attn_linear(blk.wo, bp["attn"]["out"], out=True)
        _load_linear(blk.mlp1, bp["mlp1"])
        _load_linear(blk.mlp2, bp["mlp2"])
    t.norm.weight.data = torch.from_numpy(np.asarray(vit["norm"]["scale"]).copy())
    t.norm.bias.data = torch.from_numpy(np.asarray(vit["norm"]["bias"]).copy())
    for i in range(1, 5):
        _load_linear(getattr(t, f"fc{i}"), p[f"fc{i}"])


# ---------------------------------------------------------------------- test
class TestSTNTrajectoryParity:
    def test_lockstep(self):
        cfg = get_experiment("stn_newmodel3")
        cfg = cfg.replace(
            data=cfg.data.__class__(batch_size=BATCH, image_size=SIZE),
            train=cfg.train.__class__(compute_dtype="float32"),
            extra={
                **cfg.extra, "deterministic_g": True, "fast_warp": False, **VIT,
            },
        )
        recipe = build_recipe(cfg)
        assert recipe.perceptual == "msrecon"  # no converted LPIPS in-env
        trainer = Trainer(cfg, recipe, mesh=make_mesh(1))
        batches = [
            synthetic_batch(batch_size=BATCH, image_size=SIZE, seed=s)
            for s in range(STEPS)
        ]
        state = trainer.init_state(jax.random.PRNGKey(0), batches[0])

        gp = jax.device_get(state.g_params)
        dp = jax.device_get(state.d_params)
        sp = jax.device_get(state.spectral)
        tg1, tg2 = TGenerator(), TGenerator()
        load_generator(tg1, gp["G1"])
        load_generator(tg2, gp["G2"])
        td1, td2 = TPatchD(), TPatchD()
        load_patchd(td1, dp["D1"], sp["D1"])
        load_patchd(td2, dp["D2"], sp["D2"])
        tokens = (SIZE // 64) ** 2 + 1
        tstn = TSTN(64, VIT["vit_dim"], VIT["vit_depth"], VIT["vit_heads"],
                    VIT["vit_mlp"], tokens)
        load_stn(tstn, gp["STN"])

        lr, betas = cfg.optim.lr, (cfg.optim.b1, cfg.optim.b2)
        opt_g = torch.optim.Adam(
            itertools.chain(tg1.parameters(), tg2.parameters(), tstn.parameters()),
            lr=lr, betas=betas,
        )
        opt_d = torch.optim.Adam(
            itertools.chain(td1.parameters(), td2.parameters()), lr=lr, betas=betas
        )

        step = trainer.compiled_step()
        smooth = cfg.loss.label_smooth
        jax_hist, torch_hist = [], []
        for batch in batches:
            state, m = step(state, shard_batch(batch, trainer.mesh))
            jax_hist.append((float(m["loss_G"]), float(m["loss_D"])))

            a = torch.from_numpy(batch["A"]).permute(0, 3, 1, 2)
            b = torch.from_numpy(batch["B"]).permute(0, 3, 1, 2)
            for td in (td1, td2):  # one power iteration, both phases share it
                for blk in td.blocks:
                    blk.power_iteration()
            # G phase (:619-660)
            fake_b = tg1(a)
            fake_a1 = tg2(b)
            warped_b = tstn(a, fake_a1, b)
            fake_a2 = tg2(warped_b)  # NOT detached
            adv = t_bce(td1(fake_b, a) - td1(b, a).detach(), smooth) + t_bce(
                td2(fake_a2, b) - td2(a, b).detach(), smooth
            )
            recon = (fake_a2 - a).abs().mean()
            perc = t_msrecon(fake_a2, a) + t_msrecon(fake_b, b)
            morph = t_morph_triplet(a, b, warped_b)
            loss_g = adv + 0.01 * recon + perc + morph
            opt_g.zero_grad()
            loss_g.backward()
            opt_g.step()
            # D phase on detached pre-update fakes (:666-676)
            fb, fa2 = fake_b.detach(), fake_a2.detach()
            pr1, pf1 = td1(b, a), td1(fb, a)
            d1 = 0.25 * (t_bce(pr1 - pf1, smooth) + t_bce(pf1 - pr1, 0.0))
            pr2, pf2 = td2(a, b), td2(fa2, b)
            d2 = 0.25 * (t_bce(pr2 - pf2, smooth) + t_bce(pf2 - pr2, 0.0))
            loss_d = 0.5 * (d1 + d2)
            opt_d.zero_grad()
            loss_d.backward()
            opt_d.step()
            torch_hist.append((loss_g.item(), loss_d.item()))

        jax_hist = np.asarray(jax_hist)
        torch_hist = np.asarray(torch_hist)
        # Step 0 is pre-update: proves weight transfer + the full loss
        # composition (ViT math, warp, morph, msrecon, relativistic terms).
        # Later steps accumulate XLA-vs-ATen fp32 noise through three nets,
        # a bicubic warp, and Adam; a *semantic* mismatch (missing detach,
        # wrong optimizer wiring, warp convention) perturbs at O(1e-1) by
        # step 1-2.
        np.testing.assert_allclose(jax_hist[0], torch_hist[0], rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(jax_hist[1:3], torch_hist[1:3], rtol=3e-2, atol=1e-3)
        assert np.all(np.isfinite(jax_hist)) and np.all(np.isfinite(torch_hist))
        np.testing.assert_allclose(jax_hist[3:], torch_hist[3:], rtol=0.8, atol=0.1)
        # the step must actually train (not a frozen graph)
        assert abs(jax_hist[0, 0] - jax_hist[-1, 0]) > 1e-4
