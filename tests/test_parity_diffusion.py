"""TFC-Diff parity: the flax CondUNet vs a torch replica of
``diffusers.UNet2DModel`` for the reference's exact config
(``/root/reference/TFC-Diff/prototype_condA.py:59-90``:
block_out_channels=(32, 64, 64), layers_per_block=1,
down=(DownBlock2D, AttnDownBlock2D, AttnDownBlock2D),
up=(AttnUpBlock2D, AttnUpBlock2D, UpBlock2D)).

Two levels, mirroring what every GAN family already has:

1. transferred-weights forward parity (<= 1e-4) on fixed inputs — the torch
   replica is hand-built from the known UNet2DModel block definitions
   (diffusers itself is not installed; torch is);
2. per-step noise-MSE lockstep of the full ``tfc_diff`` recipe vs a torch
   replica trainer (MSE(eps_hat, eps), Adam 1e-3 — ``prototype_condA.py:
   104,143-166``), with the jax step's own PRNG draws (noise, t) recomputed
   host-side and fed to both.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from test_models import to_torch_conv

from tfcgan_tpu.models.diffusion import CondUNet, DDPMSchedule


# ------------------------------------------------------------- torch replica
class TResnetBlock2D(nn.Module):
    """diffusers ResnetBlock2D (default config, output_scale_factor=1)."""

    def __init__(self, cin, cout, temb=128, groups=32):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, cin, eps=1e-5)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.time_emb_proj = nn.Linear(temb, cout)
        self.norm2 = nn.GroupNorm(groups, cout, eps=1e-5)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        self.conv_shortcut = nn.Conv2d(cin, cout, 1) if cin != cout else None

    def forward(self, x, temb):
        h = F.silu(self.norm1(x))
        h = self.conv1(h)
        h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = F.silu(self.norm2(h))
        h = self.conv2(h)
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return x + h


class TAttention(nn.Module):
    """diffusers' deprecated-style Attention block (what Attn*Block2D builds:
    GN(32), to_q/k/v/out Linear with bias, head_dim=8, residual add)."""

    def __init__(self, channels, head_dim=8, groups=32):
        super().__init__()
        self.heads = channels // head_dim
        self.head_dim = head_dim
        self.group_norm = nn.GroupNorm(groups, channels, eps=1e-5)
        self.to_q = nn.Linear(channels, channels)
        self.to_k = nn.Linear(channels, channels)
        self.to_v = nn.Linear(channels, channels)
        self.to_out = nn.Linear(channels, channels)

    def forward(self, x):
        n, c, hh, ww = x.shape
        h = self.group_norm(x).view(n, c, hh * ww).transpose(1, 2)  # (N, T, C)
        q, k, v = self.to_q(h), self.to_k(h), self.to_v(h)
        split = lambda z: z.view(n, -1, self.heads, self.head_dim).permute(0, 2, 1, 3)
        q, k, v = split(q), split(k), split(v)
        attn = torch.softmax(q @ k.transpose(-1, -2) * self.head_dim**-0.5, dim=-1)
        out = (attn @ v).permute(0, 2, 1, 3).reshape(n, hh * ww, c)
        out = self.to_out(out)
        return out.transpose(1, 2).view(n, c, hh, ww) + x


class TUNet2D(nn.Module):
    """UNet2DModel((32, 64, 64), layers_per_block=1, Down/AttnDown/AttnDown,
    AttnUp/AttnUp/Up) — attribute names match the flax CondUNet param tree so
    weight transfer is mechanical."""

    def __init__(self, in_channels=2, out_channels=1):
        super().__init__()
        ch = (32, 64, 64)
        self.time_mlp1 = nn.Linear(ch[0], ch[0] * 4)
        self.time_mlp2 = nn.Linear(ch[0] * 4, ch[0] * 4)
        self.conv_in = nn.Conv2d(in_channels, ch[0], 3, padding=1)
        # down: in->out channel plan (32->32), (32->64 +attn), (64->64 +attn)
        self.down0_res0 = TResnetBlock2D(32, 32)
        self.down0_downsample = nn.Conv2d(32, 32, 3, stride=2, padding=1)
        self.down1_res0 = TResnetBlock2D(32, 64)
        self.down1_attn0 = TAttention(64)
        self.down1_downsample = nn.Conv2d(64, 64, 3, stride=2, padding=1)
        self.down2_res0 = TResnetBlock2D(64, 64)
        self.down2_attn0 = TAttention(64)
        self.mid_res0 = TResnetBlock2D(64, 64)
        self.mid_attn = TAttention(64)
        self.mid_res1 = TResnetBlock2D(64, 64)
        # up (reversed channels 64, 64, 32; layers_per_block+1 = 2 resnets)
        self.up0_res0 = TResnetBlock2D(64 + 64, 64)
        self.up0_attn0 = TAttention(64)
        self.up0_res1 = TResnetBlock2D(64 + 64, 64)
        self.up0_attn1 = TAttention(64)
        self.up0_upsample = nn.Conv2d(64, 64, 3, padding=1)
        self.up1_res0 = TResnetBlock2D(64 + 64, 64)
        self.up1_attn0 = TAttention(64)
        self.up1_res1 = TResnetBlock2D(64 + 32, 64)
        self.up1_attn1 = TAttention(64)
        self.up1_upsample = nn.Conv2d(64, 64, 3, padding=1)
        self.up2_res0 = TResnetBlock2D(64 + 32, 32)
        self.up2_res1 = TResnetBlock2D(32 + 32, 32)
        self.conv_norm_out = nn.GroupNorm(32, 32, eps=1e-5)
        self.conv_out = nn.Conv2d(32, out_channels, 3, padding=1)

    @staticmethod
    def _temb(t, dim=32):
        half = dim // 2
        freqs = torch.exp(
            -math.log(10000.0) * torch.arange(half, dtype=torch.float32) / half
        )
        args = t.float()[:, None] * freqs[None, :]
        return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)

    def forward(self, x, t, cond):
        temb = self.time_mlp2(F.silu(self.time_mlp1(self._temb(t))))
        h = self.conv_in(torch.cat([x, cond], dim=1))
        skips = [h]
        h = self.down0_res0(h, temb); skips.append(h)
        h = self.down0_downsample(h); skips.append(h)
        h = self.down1_attn0(self.down1_res0(h, temb)); skips.append(h)
        h = self.down1_downsample(h); skips.append(h)
        h = self.down2_attn0(self.down2_res0(h, temb)); skips.append(h)
        h = self.mid_res1(self.mid_attn(self.mid_res0(h, temb)), temb)
        h = self.up0_attn0(self.up0_res0(torch.cat([h, skips.pop()], 1), temb))
        h = self.up0_attn1(self.up0_res1(torch.cat([h, skips.pop()], 1), temb))
        h = self.up0_upsample(F.interpolate(h, scale_factor=2, mode="nearest"))
        h = self.up1_attn0(self.up1_res0(torch.cat([h, skips.pop()], 1), temb))
        h = self.up1_attn1(self.up1_res1(torch.cat([h, skips.pop()], 1), temb))
        h = self.up1_upsample(F.interpolate(h, scale_factor=2, mode="nearest"))
        h = self.up2_res0(torch.cat([h, skips.pop()], 1), temb)
        h = self.up2_res1(torch.cat([h, skips.pop()], 1), temb)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


# ------------------------------------------------------------ weight transfer
def _to_torch_dense(k):
    return torch.from_numpy(np.asarray(k).T.copy())


def transfer_params(params: dict, tmodel: nn.Module) -> None:
    """Copy the flax CondUNet param tree into the torch replica (names match)."""

    def copy_leaf(tmod, leaf):
        if "kernel" in leaf:
            k = np.asarray(leaf["kernel"])
            if k.ndim == 4:
                tmod.weight.data = to_torch_conv(k)
            else:
                tmod.weight.data = _to_torch_dense(k)
            if "bias" in leaf:
                tmod.bias.data = torch.from_numpy(np.asarray(leaf["bias"]).copy())
        elif "scale" in leaf:  # GroupNorm
            tmod.weight.data = torch.from_numpy(np.asarray(leaf["scale"]).copy())
            tmod.bias.data = torch.from_numpy(np.asarray(leaf["bias"]).copy())
        else:
            raise KeyError(f"unknown leaf keys {sorted(leaf)}")

    def rec(tmod, tree):
        if "kernel" in tree or "scale" in tree:
            copy_leaf(tmod, tree)
            return
        for name, sub in tree.items():
            rec(getattr(tmod, name), sub)

    rec(tmodel, params)


# -------------------------------------------------------------------- tests
class TestCondUNetForwardParity:
    def test_transferred_weights_forward(self):
        rng = np.random.RandomState(0)
        x = rng.randn(2, 32, 32, 1).astype(np.float32)
        cond = rng.randn(2, 32, 32, 1).astype(np.float32)
        t = np.array([3, 471], np.int64)

        unet = CondUNet(out_channels=1)
        params = unet.init(jax.random.PRNGKey(0), jnp.asarray(x),
                           jnp.asarray(t), jnp.asarray(cond))["params"]
        out_jax = np.asarray(
            unet.apply({"params": params}, jnp.asarray(x), jnp.asarray(t),
                       jnp.asarray(cond))
        )

        tm = TUNet2D()
        # identical parameter counts: the graphs must have the same shape
        n_flax = sum(np.asarray(p).size for p in jax.tree_util.tree_leaves(params))
        n_torch = sum(p.numel() for p in tm.parameters())
        assert n_flax == n_torch, (n_flax, n_torch)
        transfer_params(params, tm)
        with torch.no_grad():
            out_t = tm(
                torch.from_numpy(x).permute(0, 3, 1, 2),
                torch.from_numpy(t),
                torch.from_numpy(cond).permute(0, 3, 1, 2),
            )
        out_t = out_t.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(out_jax, out_t, rtol=1e-4, atol=1e-4)


class TestAttentionChunking:
    def test_chunked_matches_unchunked(self):
        """Query-chunked attention (the memory-bounded path used at ≥64²
        token counts) is exact: softmax rows depend only on their own query."""
        from tfcgan_tpu.models.diffusion import AttentionBlock

        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(2, 32, 32, 64).astype(np.float32))  # hw=1024
        chunked = AttentionBlock(q_chunk=256)
        full = AttentionBlock(q_chunk=4096)  # hw < q_chunk -> unchunked branch
        params = chunked.init(jax.random.PRNGKey(0), x)
        out_c = np.asarray(chunked.apply(params, x))
        out_f = np.asarray(full.apply(params, x))
        np.testing.assert_allclose(out_c, out_f, rtol=1e-6, atol=1e-6)

    def test_chunked_gradients_match(self):
        from tfcgan_tpu.models.diffusion import AttentionBlock

        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.randn(1, 32, 32, 32).astype(np.float32))
        chunked = AttentionBlock(q_chunk=128)
        full = AttentionBlock(q_chunk=4096)
        params = chunked.init(jax.random.PRNGKey(0), x)
        gc = jax.grad(lambda p: jnp.sum(chunked.apply(p, x) ** 2))(params)
        gf = jax.grad(lambda p: jnp.sum(full.apply(p, x) ** 2))(params)
        for a, b in zip(jax.tree_util.tree_leaves(gc),
                        jax.tree_util.tree_leaves(gf)):
            # same math, different accumulation order (per-chunk recompute):
            # fp32 noise only — grads are O(100), diffs observed ~1e-5
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)


class TestTFCDiffLockstep:
    def test_noise_mse_trajectory(self):
        """Per-step noise-MSE lockstep of the condA recipe vs a torch replica
        trainer: same weights, same (noise, t) draws, Adam(1e-3) both sides
        (``prototype_condA.py:104,143-166``)."""
        from tfcgan_tpu.config import get_experiment
        from tfcgan_tpu.data.synth import synthetic_batch
        from tfcgan_tpu.parallel.mesh import make_mesh, shard_batch
        from tfcgan_tpu.recipes import build_recipe
        from tfcgan_tpu.train.trainer import Trainer

        size, batch_n, steps = 32, 2, 6
        cfg = get_experiment("tfc_diff")
        cfg = cfg.replace(
            data=cfg.data.__class__(batch_size=batch_n, image_size=size),
            train=cfg.train.__class__(compute_dtype="float32"),
        )
        recipe = build_recipe(cfg)
        trainer = Trainer(cfg, recipe, mesh=make_mesh(1))
        batches = [
            synthetic_batch(batch_size=batch_n, image_size=size, seed=s)
            for s in range(steps)
        ]
        state = trainer.init_state(jax.random.PRNGKey(0), batches[0])

        tm = TUNet2D()
        transfer_params(jax.device_get(state.g_params)["unet"], tm)
        opt = torch.optim.Adam(tm.parameters(), lr=1e-3, betas=(0.9, 0.999))

        sched = DDPMSchedule(num_timesteps=500)
        ab = np.asarray(sched.alphas_cumprod())
        gray_w = np.array([0.2989, 0.587, 0.114], np.float32)
        base_rng = jax.device_get(state.rng)

        step = trainer.compiled_step()
        jax_hist, torch_hist = [], []
        for i, b in enumerate(batches):
            state, m = step(state, shard_batch(b, trainer.mesh))
            jax_hist.append(float(m["g_noise_mse"]))

            # recompute the jax step's PRNG draws host-side (trainer.py:
            # fold_in(rng, step) -> split -> g_loss splits into 3)
            g_rng, _ = jax.random.split(jax.random.fold_in(base_rng, i))
            k_noise, k_t, _ = jax.random.split(g_rng, 3)
            a_g = (b["A"] * gray_w).sum(-1, keepdims=True)
            b_g = (b["B"] * gray_w).sum(-1, keepdims=True)
            noise = np.asarray(
                jax.random.normal(k_noise, b_g.shape, jnp.float32))
            t = np.asarray(jax.random.randint(k_t, (batch_n,), 0, 499))
            abt = ab[t][:, None, None, None]
            x_t = np.sqrt(abt) * b_g + np.sqrt(1.0 - abt) * noise

            to = lambda z: torch.from_numpy(
                np.ascontiguousarray(z.astype(np.float32))).permute(0, 3, 1, 2)
            pred = tm(to(x_t), torch.from_numpy(t), to(a_g))
            loss = F.mse_loss(pred, to(noise))
            opt.zero_grad()
            loss.backward()
            opt.step()
            torch_hist.append(loss.item())

        jax_hist, torch_hist = np.asarray(jax_hist), np.asarray(torch_hist)
        np.testing.assert_allclose(jax_hist[:3], torch_hist[:3], rtol=1e-3, atol=1e-4)
        assert np.all(np.isfinite(jax_hist)) and np.all(np.isfinite(torch_hist))
        np.testing.assert_allclose(jax_hist, torch_hist, rtol=0.2, atol=0.01)
