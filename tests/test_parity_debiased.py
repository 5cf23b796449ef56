"""Debiased-V7 whole-step lockstep trajectory parity vs a torch replica of
``TFC-GAN-FFT/TFCGAN_multigpu_patchFFT_debiased_V7.py:636-713``.

What this proves that the per-term tests cannot — the V7 *composition*:

- conditional G: labels (N, 3) -> Linear -> one extra input plane (``:188-203``)
- aux-D: softmax ethnicity head over the flattened (img, cond) input whose
  probs are fed to CrossEntropyLoss anyway (the double-softmax quirk,
  ``:236-247,655``)
- regional hair/eyes ResNet18s with the *converted* (BN-folded) backbone —
  frozen end-to-end in V7: their fc heads sit on optimizer_D, but loss_G's
  backward grads are zeroed by optimizer_D.zero_grad() and loss_D never
  touches them (``:560-564,683``) — while their CE still steers G through
  fake_B
- the V6/V7 patch-FFT form that SUMS the 4 per-patch L1s (``:411-413``;
  V1-V3 quarter-average) -> config fft_weight 0.002 on our merged-mean form
- loss_G = 1/2(adv + tot_ethn + 0.001 FFT), loss_D = 1/2 sum of
  (adv + label CE) over real/fake with *random* fake-label targets — the
  torch side consumes the exact same targets by replaying the jax PRNG calls
  the jitted d_loss makes (fold_in/split/randint are deterministic).

Stochastic terms configured off (patch/temp triplets, LPIPS, G dropout):
cross-framework RNG streams cannot be aligned; each is parity-tested
per-term elsewhere.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from test_models import (
    TDown,
    TGenerator,
    randomize_bn_stats,
    to_torch_conv,
    to_torch_convT,
    torch_resnet18_replica,
)
from test_parity_trajectory import TPatchD, jax_to_torch_v, t_bce_logits, t_fft_smooth

from tfcgan_tpu.config import get_experiment
from tfcgan_tpu.data.synth import synthetic_batch
from tfcgan_tpu.parallel.mesh import make_mesh, shard_batch
from tfcgan_tpu.recipes import build_recipe
from tfcgan_tpu.train.trainer import Trainer

SIZE, BATCH, STEPS = 128, 2, 12
R1 = round(100 * SIZE / 256)  # hair rows [0, R1), eyes rows [R1, 2*R1)


# ------------------------------------------------------------- torch replica
class TCondG(nn.Module):
    """Conditional GeneratorUNet (``_V7.py:159-203``), dropout off."""

    def __init__(self, h, w):
        super().__init__()
        self.h, self.w = h, w
        self.fc = nn.Linear(3, h * w)
        self.g = TGenerator(3)
        self.g.down1 = TDown(4, 64, normalize=False)

    def forward(self, x, labels):
        plane = self.fc(labels).view(labels.size(0), 1, self.h, self.w)
        return self.g(torch.cat([x, plane], 1))


class TAuxD(nn.Module):
    """Discriminator1 + aux_ethn = Linear + Softmax over the flattened input
    (``_V7.py:211-250``)."""

    def __init__(self, h, w):
        super().__init__()
        self.patch = TPatchD()
        self.aux_ethn = nn.Linear(6 * h * w, 4)

    def forward(self, img, cond):
        logits = self.patch(img, cond)
        flat = torch.cat([img, cond], 1).flatten(1)
        return logits, F.softmax(self.aux_ethn(flat), dim=1)


def t_patch_fft_sum(fake, real):
    """V6/V7 fft_loss (``_V7.py:393-416``): smooth-luma amp/phase L1 per
    2x2 patch, SUMMED over the 4 patches, then 1/2(amp + pha)."""
    s = fake.shape[-1] // 2
    amp = pha = 0.0
    for i in (0, s):
        for j in (0, s):
            af, pf = t_fft_smooth(fake[:, :, i : i + s, j : j + s])
            ar, pr = t_fft_smooth(real[:, :, i : i + s, j : j + s])
            amp = amp + (af - ar).abs().mean()
            pha = pha + (pf - pr).abs().mean()
    return 0.5 * (amp + pha)


# ------------------------------------------------------------------ transfer
def build_torch_g(g_params, h, w):
    tg = TCondG(h, w)
    lf = g_params["label_fc"]
    tg.fc.weight.data = torch.from_numpy(np.asarray(lf["kernel"]).T.copy())
    tg.fc.bias.data = torch.from_numpy(np.asarray(lf["bias"]).copy())
    u = g_params["unet"]
    for i in range(1, 7):
        getattr(tg.g, f"down{i}").conv.weight.data = to_torch_conv(
            u[f"down{i}"]["conv"]["kernel"]
        )
    for i in range(1, 6):
        getattr(tg.g, f"up{i}").conv.weight.data = to_torch_convT(
            u[f"up{i}"]["conv"]["kernel"]
        )
    tg.g.final_conv.weight.data = to_torch_conv(u["final_conv"]["kernel"])
    tg.g.final_conv.bias.data = torch.from_numpy(
        np.asarray(u["final_conv"]["bias"]).copy()
    )
    return tg


def build_torch_d(d_params, spectral, h, w):
    td = TAuxD(h, w)
    patch, spec = d_params["patch"], spectral["patch"]
    for i, blk in enumerate(td.patch.blocks):
        p, s = patch[f"block{i}_conv"], spec[f"block{i}_conv"]
        blk.weight.data = to_torch_conv(p["kernel"])
        blk.bias.data = torch.from_numpy(np.asarray(p["bias"]).copy())
        blk.u.copy_(torch.from_numpy(np.asarray(s["u"]).copy()))
        blk.v.copy_(jax_to_torch_v(s["v"], np.asarray(p["kernel"]).shape))
    td.patch.final_conv.weight.data = to_torch_conv(patch["final_conv"]["kernel"])
    # aux head: our Dense flattens NHWC (h, w, c); torch flattens NCHW
    k = np.asarray(d_params["aux_ethn"]["kernel"])  # (h*w*6, 4)
    k = k.reshape(h, w, 6, 4).transpose(3, 2, 0, 1).reshape(4, -1)
    td.aux_ethn.weight.data = torch.from_numpy(k.copy())
    td.aux_ethn.bias.data = torch.from_numpy(
        np.asarray(d_params["aux_ethn"]["bias"]).copy()
    )
    return td


def build_torch_cnn(backbone, fc_params):
    """Frozen eval-mode resnet18 trunk + the recipe's fresh fc head.

    The reference runs the frozen backbone in *train* mode (it never calls
    .eval()), i.e. batch-stat BatchNorm; our folded backbone is eval-mode
    semantics — the documented deviation (tools/convert_resnet.py). The
    torch twin mirrors our choice."""
    fc = nn.Linear(512, 4)
    fc.weight.data = torch.from_numpy(np.asarray(fc_params["kernel"]).T.copy())
    fc.bias.data = torch.from_numpy(np.asarray(fc_params["bias"]).copy())
    for p in backbone.parameters():
        p.requires_grad_(False)

    def run(x):
        return fc(backbone(x))

    return run, fc


# ---------------------------------------------------------------------- test
class TestDebiasedV7Trajectory:
    def test_12_step_lockstep(self, tmp_path):
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
        from convert_resnet import convert
        from flax import serialization

        from tfcgan_tpu.models.resnet import ResNet18

        # synthetic "torchvision" checkpoint -> converted folded backbone,
        # shared by hair and eyes CNNs (the reference loads the same
        # pretrained net twice, ``_V7.py:560``)
        torch.manual_seed(7)
        net = torch_resnet18_replica()
        randomize_bn_stats(net)
        net.eval()
        sd = {k: v.numpy() for k, v in net.state_dict().items()}
        template = ResNet18(num_classes=None, norm="folded").init(
            jax.random.PRNGKey(0), jnp.zeros((1, R1, SIZE, 3))
        )["params"]
        tree = serialization.from_state_dict(template, convert(sd))
        rn_path = tmp_path / "resnet18_folded.msgpack"
        rn_path.write_bytes(serialization.to_bytes(tree))

        import dataclasses

        cfg = get_experiment("fft_patch_debiased")  # V7
        cfg = cfg.replace(
            data=cfg.data.__class__(batch_size=BATCH, image_size=SIZE),
            train=cfg.train.__class__(compute_dtype="float32"),
            loss=dataclasses.replace(
                cfg.loss,
                patch_grid=0,  # stochastic patch-triplet negatives off
                use_temp=False,  # ColorJitter temp negatives off
                use_lpips=False,
                fft_quantize="smooth",
                resnet_weights=str(rn_path),
            ),
            extra={"deterministic_g": True},
        )
        recipe = build_recipe(cfg)
        assert recipe.axes["regional"] and not recipe.axes["cnn_train_g"]
        trainer = Trainer(cfg, recipe, mesh=make_mesh(1))

        batches = [
            synthetic_batch(BATCH, SIZE, seed=s, with_labels=True)
            for s in range(STEPS)
        ]
        state = trainer.init_state(jax.random.PRNGKey(1), batches[0])

        g_params = jax.device_get(state.g_params)["G"]
        d_params = jax.device_get(state.d_params)["D"]
        spectral = jax.device_get(state.spectral)["D"]
        frozen = jax.device_get(state.frozen)
        assert "cnn_hair" in frozen  # V7: fully frozen CNNs
        tg = build_torch_g(g_params, SIZE, SIZE)
        td = build_torch_d(d_params, spectral, SIZE, SIZE)
        cnn_hair, fc_h = build_torch_cnn(net, frozen["cnn_hair"]["fc"])
        cnn_eyes, fc_e = build_torch_cnn(net, frozen["cnn_eyes"]["fc"])

        opt_g = torch.optim.Adam(tg.parameters(), lr=2e-4, betas=(0.5, 0.999))
        # reference chains the CNN fc heads into optimizer_D (``:562-564``);
        # their grads are always None at the D step so they never move —
        # chained here too, to prove exactly that
        opt_d = torch.optim.Adam(
            list(td.parameters()) + list(fc_h.parameters()) + list(fc_e.parameters()),
            lr=2e-4, betas=(0.5, 0.999),
        )

        step = trainer.compiled_step()
        rng0 = jax.device_get(state.rng)
        fc_h0 = fc_h.weight.detach().clone()

        jax_hist, torch_hist = [], []
        for step_idx, batch in enumerate(batches):
            state, m = step(state, shard_batch(batch, trainer.mesh))
            jax_hist.append((float(m["loss_G"]), float(m["loss_D"])))

            # replay the jitted d_loss's fake-label draw (trainer rng flow:
            # fold_in(step) -> split -> d_loss splits its key 3-ways)
            step_rng = jax.random.fold_in(rng0, step_idx)
            _, d_rng = jax.random.split(step_rng)
            kg_, ke_, ka_ = jax.random.split(d_rng, 3)
            gen_ethn = torch.from_numpy(
                np.asarray(jax.random.randint(ke_, (BATCH,), 0, 4)).copy()
            ).long()

            a = torch.from_numpy(batch["A"]).permute(0, 3, 1, 2)
            b = torch.from_numpy(batch["B"]).permute(0, 3, 1, 2)
            lab3 = torch.from_numpy(batch["LAB3"].astype(np.float32))
            ethn = torch.from_numpy(batch["LAB3"][:, 1]).long()

            for blk in td.patch.blocks:  # one iteration/step, shared by phases
                blk.power_iteration()

            # ---- G phase (``_V7.py:636-676``)
            fake = tg(a, lab3)
            pred_fake, probs_f = td(fake, a)
            pred_real, _ = td(b, a)
            adv = t_bce_logits(pred_fake - pred_real.detach(), 0.9)
            reg_ce = F.cross_entropy(
                cnn_hair(fake[:, :, :R1, :]), ethn
            ) + F.cross_entropy(cnn_eyes(fake[:, :, R1 : 2 * R1, :]), ethn)
            tot_ethn = 0.5 * (reg_ce + F.cross_entropy(probs_f, ethn))
            loss_g = 0.5 * (adv + tot_ethn + 0.001 * t_patch_fft_sum(fake, b))
            opt_g.zero_grad()
            loss_g.backward()
            opt_g.step()

            # ---- D phase on the detached pre-update fake (``:682-713``)
            opt_d.zero_grad()
            fake_d = fake.detach()
            pr, probs_r = td(b, a)
            pf, probs_fd = td(fake_d, a)
            loss_d = 0.5 * (
                (t_bce_logits(pr - pf, 0.9) + F.cross_entropy(probs_r, ethn))
                + (t_bce_logits(pf - pr, 0.0) + F.cross_entropy(probs_fd, gen_ethn))
            )
            loss_d.backward()
            opt_d.step()
            torch_hist.append((loss_g.item(), loss_d.item()))

        jax_hist = np.asarray(jax_hist)
        torch_hist = np.asarray(torch_hist)
        # early window: wider than the fft_glo test's (the folded-vs-eval-BN
        # backbone difference enters at ~2e-4 relative, see
        # TestResNet18Converter), still far below any semantic mismatch
        np.testing.assert_allclose(
            jax_hist[:3], torch_hist[:3], rtol=5e-3, atol=5e-3
        )
        assert np.all(np.isfinite(jax_hist)) and np.all(np.isfinite(torch_hist))
        np.testing.assert_allclose(jax_hist[3:], torch_hist[3:], rtol=0.8, atol=0.15)
        assert abs(jax_hist[0, 0] - jax_hist[-1, 0]) > 1e-3
        # V7 semantics: the chained fc heads never moved
        assert torch.equal(fc_h.weight, fc_h0)
