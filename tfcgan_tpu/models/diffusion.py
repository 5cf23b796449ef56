"""Conditional DDPM (TFC-Diff rebuild).

The reference wraps ``diffusers.UNet2DModel`` (128², in=2 grayscale channels:
noisy B ⊕ condition A, out=1, layers_per_block=1, channels (32, 64, 64),
attention at the two lower resolutions) with
``DDPMScheduler(num_train_timesteps=500, beta_schedule='squaredcos_cap_v2')``
(``/root/reference/TFC-Diff/prototype_condA.py:59-90,137``). Its sampling loop
ships tensors to the CPU for every scheduler step
(``test_prototype.py:137-160``); here the whole ancestral chain runs on device
under ``lax.fori_loop``.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp


# ------------------------------------------------------------------ schedule
@dataclass(frozen=True)
class DDPMSchedule:
    """squaredcos_cap_v2 (Nichol & Dhariwal cosine) schedule, diffusers-exact."""

    num_timesteps: int = 500
    max_beta: float = 0.999

    def betas(self) -> jnp.ndarray:
        # static schedule: built host-side in float64 then cast, matching
        # diffusers' betas_for_alpha_bar (Python floats -> fp32 tensor); an
        # all-fp32 computation drifts ~1e-5 where ᾱ -> 0
        import numpy as np

        t = np.arange(self.num_timesteps + 1, dtype=np.float64) / self.num_timesteps

        def abar(x):
            return np.cos((x + 0.008) / 1.008 * math.pi / 2) ** 2

        ratio = abar(t[1:]) / abar(t[:-1])
        return jnp.asarray(np.clip(1.0 - ratio, 0.0, self.max_beta), jnp.float32)

    def alphas_cumprod(self) -> jnp.ndarray:
        # fp32 cumprod of the fp32 betas — diffusers-exact
        return jnp.cumprod(1.0 - self.betas())

    def add_noise(self, x0: jax.Array, noise: jax.Array, t: jax.Array) -> jax.Array:
        """q(x_t | x_0). t: (N,) int timesteps."""
        ab = self.alphas_cumprod()[t]
        while ab.ndim < x0.ndim:
            ab = ab[..., None]
        return jnp.sqrt(ab) * x0 + jnp.sqrt(1.0 - ab) * noise

    def step(
        self, eps_pred: jax.Array, t: jax.Array, x_t: jax.Array, key: jax.Array,
        clip_sample: bool = True,
    ) -> jax.Array:
        """One ancestral step x_t -> x_{t-1} (diffusers DDPMScheduler.step,
        variance_type='fixed_small', clip_sample=True)."""
        betas = self.betas()
        ab = self.alphas_cumprod()
        ab_t = ab[t]
        ab_prev = jnp.where(t > 0, ab[jnp.maximum(t - 1, 0)], 1.0)
        beta_t = betas[t]
        alpha_t = 1.0 - beta_t

        x0 = (x_t - jnp.sqrt(1.0 - ab_t) * eps_pred) / jnp.sqrt(ab_t)
        if clip_sample:
            x0 = jnp.clip(x0, -1.0, 1.0)
        coef_x0 = jnp.sqrt(ab_prev) * beta_t / (1.0 - ab_t)
        coef_xt = jnp.sqrt(alpha_t) * (1.0 - ab_prev) / (1.0 - ab_t)
        mean = coef_x0 * x0 + coef_xt * x_t
        var = jnp.clip(beta_t * (1.0 - ab_prev) / (1.0 - ab_t), 1e-20, None)
        noise = jax.random.normal(key, x_t.shape, x_t.dtype)
        return mean + jnp.where(t > 0, jnp.sqrt(var), 0.0) * noise


# ------------------------------------------------------------------- network
#
# Block-exact rebuild of ``diffusers.UNet2DModel`` for the reference's config
# (``prototype_condA.py:59-90``): block_out_channels=(32, 64, 64),
# layers_per_block=1, down=(DownBlock2D, AttnDownBlock2D, AttnDownBlock2D),
# up=(AttnUpBlock2D, AttnUpBlock2D, UpBlock2D), norm_num_groups=32,
# norm_eps=1e-5, attention_head_dim=8, act=silu, time embedding = sinusoidal
# Timesteps(32, flip_sin_to_cos=True, freq_shift=0) -> Linear(32,128) -> silu
# -> Linear(128,128). Verified against a torch replica of the same graph with
# transferred weights (tests/test_parity_diffusion.py).


def timestep_embedding(t: jax.Array, dim: int) -> jax.Array:
    """diffusers ``Timesteps(dim, flip_sin_to_cos=True, downscale_freq_shift=0)``:
    freqs = exp(-ln(1e4)·i/half), emb = [cos, sin] (flipped order)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class ResnetBlock2D(nn.Module):
    """diffusers ResnetBlock2D (time_embedding_norm='default', output_scale 1):
    GN(32) -> silu -> conv3x3 -> +Linear(temb)[:,None,None,:] -> GN(32) -> silu
    -> conv3x3; 1x1 conv shortcut when channels change."""

    feats: int
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb):
        dt = self.dtype
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5, dtype=dt, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.feats, (3, 3), padding="SAME", dtype=dt, name="conv1")(h)
        h = h + nn.Dense(self.feats, dtype=dt, name="time_emb_proj")(
            nn.silu(temb))[:, None, None, :]
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5, dtype=dt, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.feats, (3, 3), padding="SAME", dtype=dt, name="conv2")(h)
        if x.shape[-1] != self.feats:
            x = nn.Conv(self.feats, (1, 1), dtype=dt, name="conv_shortcut")(x)
        return x + h


def _use_flash(seq: int, head_dim: int) -> bool:
    """Flash kernel on TPU (kill switch TFCGAN_FLASH_ATTN=0); the CPU backend
    keeps the XLA chunked path so host test meshes stay torch-replica-exact.
    ``TFCGAN_FLASH_ATTN=1`` forces the kernel (interpret mode on CPU)."""
    import os

    from tfcgan_tpu.ops.pallas_kernels.flashattn import flash_attention_supported

    if not flash_attention_supported(seq, head_dim):
        return False
    env = os.environ.get("TFCGAN_FLASH_ATTN", "auto").lower()
    if env in ("auto", ""):
        return jax.default_backend() != "cpu"
    return env not in ("0", "false")


class AttentionBlock(nn.Module):
    """diffusers' deprecated-style spatial self-attention (what Attn*Block2D
    builds: GN(32) -> to_q/k/v Linear(bias) over HW tokens, head_dim=8,
    upcast softmax, to_out Linear, residual add)."""

    head_dim: int = 8
    groups: int = 32
    dtype: jnp.dtype = jnp.float32
    # max query rows whose full-key attention matrix may be live at once; at
    # 64² tokens the unchunked (N, heads, 4096, 4096) map is ~8 GiB fp32 at
    # batch 16 and OOMs the 16 GiB chip — chunking bounds the live slab to
    # (N, heads, 512, HW) and jax.checkpoint keeps the backward at the same
    # bound (attn probs recomputed per chunk, never stored for all chunks).
    q_chunk: int = 512

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        n, hh, ww, c = x.shape
        heads = c // self.head_dim
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5, dtype=dt,
                         name="group_norm")(x)
        h = h.reshape(n, hh * ww, c)
        q = nn.Dense(c, dtype=dt, name="to_q")(h)
        k = nn.Dense(c, dtype=dt, name="to_k")(h)
        v = nn.Dense(c, dtype=dt, name="to_v")(h)
        split = lambda z: z.reshape(n, -1, heads, self.head_dim).transpose(0, 2, 1, 3)
        q, k, v = split(q), split(k), split(v)

        def qblock(qc):
            # identical math to the unchunked form: softmax rows only depend
            # on their own query, so query chunking is exact, not approximate
            a = jnp.einsum("nhqd,nhkd->nhqk", qc, k) * (self.head_dim ** -0.5)
            a = jax.nn.softmax(a.astype(jnp.float32), axis=-1).astype(dt)
            return jnp.einsum("nhqk,nhkd->nhqd", a, v)

        hw = hh * ww
        if _use_flash(hw, self.head_dim):
            # Pallas flash kernel: scores stay in VMEM, fwd and bwd
            # (ops/pallas_kernels/flashattn.py). Same fp32-upcast softmax.
            from tfcgan_tpu.ops.pallas_kernels.flashattn import flash_attention

            pack = lambda z: z.transpose(0, 1, 3, 2).reshape(
                n * heads, self.head_dim, hw)
            out = flash_attention(pack(q), pack(k), pack(v),
                                  self.head_dim ** -0.5)
            out = out.reshape(n, heads, self.head_dim, hw).transpose(0, 3, 1, 2)
            out = out.reshape(n, hw, c)
            out = nn.Dense(c, dtype=dt, name="to_out")(out)
            return out.reshape(n, hh, ww, c) + x
        if hw > self.q_chunk and hw % self.q_chunk == 0:
            qs = q.reshape(n, heads, hw // self.q_chunk, self.q_chunk,
                           self.head_dim).transpose(2, 0, 1, 3, 4)
            out = jax.lax.map(jax.checkpoint(qblock), qs)
            out = out.transpose(1, 2, 0, 3, 4).reshape(n, heads, hw, self.head_dim)
        else:
            out = qblock(q)
        out = out.transpose(0, 2, 1, 3).reshape(n, hh * ww, c)
        out = nn.Dense(c, dtype=dt, name="to_out")(out)
        return out.reshape(n, hh, ww, c) + x


class CondUNet(nn.Module):
    """UNet2DModel-exact denoiser: eps = f(cat(x_noisy, cond), t).

    ``attn[i]`` selects AttnDownBlock2D at down position i; the up path uses
    the reversed flags (the reference's Attn/Attn/Up ordering). Skip plumbing
    matches UNet2DModel.forward: conv_in + every resnet(+attn) output + every
    downsampler output are pushed; each up layer concatenates one pop."""

    out_channels: int = 1
    channels: tuple[int, ...] = (32, 64, 64)
    attn: tuple[bool, ...] = (False, True, True)
    layers_per_block: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, t: jax.Array, cond: jax.Array) -> jax.Array:
        dt = self.dtype
        ch0 = self.channels[0]
        # Timesteps(ch0) sinusoid -> TimestepEmbedding MLP (ch0 -> 4·ch0)
        temb = timestep_embedding(t, ch0)
        temb = nn.Dense(ch0 * 4, dtype=dt, name="time_mlp1")(temb)
        temb = nn.Dense(ch0 * 4, dtype=dt, name="time_mlp2")(nn.silu(temb))

        h = jnp.concatenate([x, cond], axis=-1).astype(dt)
        h = nn.Conv(ch0, (3, 3), padding="SAME", dtype=dt, name="conv_in")(h)
        skips = [h]
        for i, ch in enumerate(self.channels):
            for j in range(self.layers_per_block):
                h = ResnetBlock2D(ch, dtype=dt, name=f"down{i}_res{j}")(h, temb)
                if self.attn[i]:
                    h = AttentionBlock(dtype=dt, name=f"down{i}_attn{j}")(h)
                skips.append(h)
            if i + 1 < len(self.channels):
                # Downsample2D: conv3x3 stride 2, pad 1
                h = nn.Conv(ch, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                            dtype=dt, name=f"down{i}_downsample")(h)
                skips.append(h)
        # UNetMidBlock2D: resnet, attention, resnet
        h = ResnetBlock2D(self.channels[-1], dtype=dt, name="mid_res0")(h, temb)
        h = AttentionBlock(dtype=dt, name="mid_attn")(h)
        h = ResnetBlock2D(self.channels[-1], dtype=dt, name="mid_res1")(h, temb)
        # up path: reversed channels/attn flags; layers_per_block+1 resnets
        rev = tuple(reversed(self.channels))
        rev_attn = tuple(reversed(self.attn))
        for i, ch in enumerate(rev):
            for j in range(self.layers_per_block + 1):
                h = jnp.concatenate([h, skips.pop()], axis=-1)
                h = ResnetBlock2D(ch, dtype=dt, name=f"up{i}_res{j}")(h, temb)
                if rev_attn[i]:
                    h = AttentionBlock(dtype=dt, name=f"up{i}_attn{j}")(h)
            if i + 1 < len(rev):
                # Upsample2D: nearest 2x + conv3x3
                h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
                h = nn.Conv(ch, (3, 3), padding="SAME", dtype=dt,
                            name=f"up{i}_upsample")(h)
        h = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=dt,
                         name="conv_norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(self.out_channels, (3, 3), padding="SAME", dtype=dt,
                       name="conv_out")(h)


def sample(
    unet: CondUNet, params, schedule: DDPMSchedule, cond: jax.Array, key: jax.Array
) -> jax.Array:
    """Full on-device ancestral sampling (no host hops)."""
    n, h, w, _ = cond.shape
    k0, kloop = jax.random.split(key)
    x = jax.random.normal(k0, (n, h, w, unet.out_channels))

    def body(i, carry):
        x, k = carry
        t = schedule.num_timesteps - 1 - i
        tb = jnp.full((n,), t, jnp.int32)
        eps = unet.apply({"params": params}, x, tb, cond)
        k, ks = jax.random.split(k)
        x = schedule.step(eps.astype(jnp.float32), t, x, ks)
        return (x, k)

    x, _ = jax.lax.fori_loop(0, schedule.num_timesteps, body, (x, kloop))
    return x
