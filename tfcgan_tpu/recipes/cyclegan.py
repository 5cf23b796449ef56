"""CycleGAN baseline recipe.

Rebuild of ``/root/reference/cyclegan_og/cyclegan.py``: two ResNet-9-block
generators, two 70×70-style PatchGAN discriminators (stride-2 conv blocks +
instance norm, final asym-pad conv), lsgan (MSE) adversarial loss, cycle
consistency λ=10 and identity λ=5 (:44-45, :390-405), a 50-image replay
buffer feeding the D updates (:294-295, :423 — the buffer class itself comes
from the repo's missing ``utils.py``; semantics follow the standard pix2pix
ReplayBuffer it references), and LambdaLR linear decay (:278-286).

TPU-first: the replay buffer is an on-device ring buffer carried in
``state.extra`` and updated inside the jitted step — element-wise
push-or-swap with p=0.5 exactly like the reference, vectorized with masks
instead of the per-sample Python loop.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from tfcgan_tpu import ops
from tfcgan_tpu.config import ExperimentConfig
from tfcgan_tpu.models import ResNetGenerator
from tfcgan_tpu.models.layers import TorchConv
from tfcgan_tpu.ops.norm import instance_norm

BUFFER_SIZE = 50


class CycleDiscriminator(nn.Module):
    """cyclegan_og Discriminator: 4 stride-2 conv blocks + asym-pad head."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = x.astype(self.dtype)
        for i, f in enumerate((64, 128, 256, 512)):
            x = TorchConv(f, strides=(2, 2), name=f"conv{i}", dtype=self.dtype)(x)
            if i > 0:
                x = instance_norm(x)
            x = nn.leaky_relu(x, 0.2)
        # ZeroPad2d((1,0,1,0)) + Conv2d(512, 1, 4, padding=1) — bias present
        # (torch default; unlike the TFC-GAN PatchD head, ``cyclegan.py:190``)
        return TorchConv(1, padding=((2, 1), (2, 1)), use_bias=True,
                         name="final", dtype=self.dtype)(x)


def replay_push_sample(buffer: dict, fakes: jax.Array, key: jax.Array):
    """Reference ReplayBuffer.push_and_pop, vectorized.

    Per element: while the buffer is not full, insert and return the element;
    once full, with p=0.5 return (and replace) a random stored image, else
    return the element unchanged.
    """
    data, count = buffer["data"], buffer["count"]  # (S,H,W,C), scalar int
    n = fakes.shape[0]
    k1, k2 = jax.random.split(key)
    idx_in_buf = count + jnp.arange(n)  # where each fake would land if filling
    filling = idx_in_buf < BUFFER_SIZE
    swap = jax.random.uniform(k1, (n,)) < 0.5
    rand_slots = jax.random.randint(k2, (n,), 0, BUFFER_SIZE)
    # slot each fake writes to: filling -> its fill slot; else if swap -> random
    write_slot = jnp.where(filling, jnp.clip(idx_in_buf, 0, BUFFER_SIZE - 1), rand_slots)
    do_write = filling | swap
    # returned images: stored content at the slot when swapping, else the fake
    stored = data[write_slot]
    out = jnp.where((~filling & swap)[:, None, None, None], stored, fakes)
    # scatter the fakes into the buffer where do_write
    new_vals = jnp.where(do_write[:, None, None, None], fakes, data[write_slot])
    data = data.at[write_slot].set(new_vals)
    count = jnp.minimum(count + n, BUFFER_SIZE)
    return {"data": data, "count": count}, out


class CycleGANRecipe:
    name = "cyclegan"

    def __init__(self, cfg: ExperimentConfig):
        self.cfg = cfg
        dt = jnp.bfloat16 if cfg.train.compute_dtype == "bfloat16" else jnp.float32
        ch = cfg.data.channels
        # ``opt.n_residual_blocks`` (default 9, ``cyclegan.py:34``); small
        # values keep the CPU-parity tests fast
        blocks = int(cfg.extra.get("resnet_blocks", 9))
        self.G_AB = ResNetGenerator(out_channels=ch, num_blocks=blocks, dtype=dt)
        self.G_BA = ResNetGenerator(out_channels=ch, num_blocks=blocks, dtype=dt)
        self.D_A = CycleDiscriminator(dtype=dt)
        self.D_B = CycleDiscriminator(dtype=dt)
        self.lambda_cyc = cfg.extra.get("lambda_cyc", 10.0)
        self.lambda_id = cfg.extra.get("lambda_id", 5.0)

    def init(self, key, batch):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        a, b = batch["A"], batch["B"]
        shape = (BUFFER_SIZE, *a.shape[1:])

        def empty():
            # distinct arrays per buffer — sharing one zeros array would make
            # the jitted step donate the same buffer twice
            return {"data": jnp.zeros(shape, jnp.float32),
                    "count": jnp.zeros((), jnp.int32)}

        return {
            "g_params": {
                "G_AB": self.G_AB.init(k1, a)["params"],
                "G_BA": self.G_BA.init(k2, b)["params"],
            },
            "d_params": {
                "D_A": self.D_A.init(k3, a)["params"],
                "D_B": self.D_B.init(k4, b)["params"],
            },
            "spectral": {},
            "frozen": {},
            "extra": {"buf_A": empty(), "buf_B": empty()},
        }

    def g_loss(self, g_params, d_params, spectral, frozen, batch, rng):
        a, b = batch["A"], batch["B"]
        gab = lambda x: self.G_AB.apply({"params": g_params["G_AB"]}, x)
        gba = lambda x: self.G_BA.apply({"params": g_params["G_BA"]}, x)
        da = lambda x: self.D_A.apply({"params": d_params["D_A"]}, x)
        db = lambda x: self.D_B.apply({"params": d_params["D_B"]}, x)

        fake_b = gab(a)
        fake_a = gba(b)
        # identity
        loss_id = 0.5 * (
            jnp.mean(jnp.abs(gba(a).astype(jnp.float32) - a))
            + jnp.mean(jnp.abs(gab(b).astype(jnp.float32) - b))
        )
        # lsgan adversarial
        loss_gan = 0.5 * (
            ops.lsgan_loss(db(fake_b), 1.0) + ops.lsgan_loss(da(fake_a), 1.0)
        )
        # cycle
        loss_cyc = 0.5 * (
            jnp.mean(jnp.abs(gba(fake_b).astype(jnp.float32) - a))
            + jnp.mean(jnp.abs(gab(fake_a).astype(jnp.float32) - b))
        )
        total = loss_gan + self.lambda_cyc * loss_cyc + self.lambda_id * loss_id
        aux = {
            "fake_a": jax.lax.stop_gradient(fake_a),
            "fake_b": jax.lax.stop_gradient(fake_b),
        }
        metrics = {
            "loss_G": total, "g_adv": loss_gan, "g_cycle": loss_cyc, "g_id": loss_id,
        }
        return total, (aux, metrics)

    def pre_d(self, extra, aux, rng):
        ka, kb = jax.random.split(rng)
        buf_a, fa = replay_push_sample(extra["buf_A"], aux["fake_a"], ka)
        buf_b, fb = replay_push_sample(extra["buf_B"], aux["fake_b"], kb)
        aux = dict(aux, fake_a_buf=fa, fake_b_buf=fb)
        return {"buf_A": buf_a, "buf_B": buf_b}, aux

    def d_loss(self, d_params, spectral, aux, batch, rng):
        a, b = batch["A"], batch["B"]
        da = lambda x: self.D_A.apply({"params": d_params["D_A"]}, x)
        db = lambda x: self.D_B.apply({"params": d_params["D_B"]}, x)
        loss_da = 0.5 * (
            ops.lsgan_loss(da(a), 1.0) + ops.lsgan_loss(da(aux["fake_a_buf"]), 0.0)
        )
        loss_db = 0.5 * (
            ops.lsgan_loss(db(b), 1.0) + ops.lsgan_loss(db(aux["fake_b_buf"]), 0.0)
        )
        # The reference steps D_A and D_B with *separate* Adam optimizers on
        # their own (real+fake)/2 losses (``cyclegan.py:274-276,415-447``).
        # One optax Adam over the disjoint d_params tree is identical — as
        # long as the differentiated total is the SUM, so each D sees exactly
        # its own gradient (a 0.5× would rescale Adam's eps trajectory).
        loss = loss_da + loss_db
        return loss, {"loss_D": 0.5 * loss, "d_A": loss_da, "d_B": loss_db}
