"""Loss-formula parity harness: FFT-GLO loss terms vs a torch replica.

BASELINE.md's first target is "bit-matched loss terms vs the PyTorch reference
at 256² on fixed batches". Here every term of the FFT-GLO generator and
discriminator losses (``TFCGAN_multigpu_globalFFT.py:442-526``) is computed
(a) with this framework's ops in reference-parity mode ("exact" quantization)
and (b) with an independent torch reimplementation of the reference formulas
(including the ToPILImage/PIL-luma host path), on identical fixed tensors with
identical fixed random choices.
"""

import numpy as np
import torch
import torch.nn.functional as F
from PIL import Image

import jax
import jax.numpy as jnp

from tfcgan_tpu import ops
from tfcgan_tpu.recipes.tfcgan import patch_triplet_loss


def fixed_batch(n=2, size=256, seed=0):
    rng = np.random.RandomState(seed)

    def img(k):
        x = rng.randn(n, size // 8, size // 8, 3).astype(np.float32)
        return np.tanh(x.repeat(8, axis=1).repeat(8, axis=2))

    fake_b = img(0)
    real_a = img(1)
    real_b = img(2)
    # dataset-side temps: LUT over the real uint8 red channel
    red = np.round((real_b[..., 0] * 0.5 + 0.5) * 255.0)
    t_b = (24.0 + red * 14.0 / 255.0).astype(np.float32)
    neg_b = img(3)  # stand-in for the ColorJitter negative (fixed for parity)
    return fake_b, real_a, real_b, t_b, neg_b


def torch_pil_gray(x_nhwc: np.ndarray) -> np.ndarray:
    """ToPILImage + convert('L') on a [-1,1] NHWC batch, per sample."""
    out = []
    for i in range(x_nhwc.shape[0]):
        t = torch.from_numpy(x_nhwc[i]).permute(2, 0, 1)
        u8 = t.mul(255).byte().permute(1, 2, 0).numpy()
        out.append(np.array(Image.fromarray(u8, "RGB").convert("L"), np.float32))
    return np.stack(out)


def torch_pil_red(x_nhwc: np.ndarray) -> np.ndarray:
    out = []
    for i in range(x_nhwc.shape[0]):
        t = torch.from_numpy(x_nhwc[i]).permute(2, 0, 1)
        u8 = t.mul(255).byte().permute(1, 2, 0).numpy()
        out.append(u8[..., 0].astype(np.float64))
    return np.stack(out)


class TestFFTGloLossParity:
    def setup_method(self, _):
        self.fake_b, self.real_a, self.real_b, self.t_b, self.neg_b = fixed_batch()

    def test_fft_term(self):
        # reference: rfft2 over PIL gray, fftshift, L1 on amp & phase, 0.5*(sum)
        got, _, _ = ops.fftloss.fft_l1_loss(
            jnp.asarray(self.fake_b), jnp.asarray(self.real_b), mode="exact"
        )
        def comps(x):
            g = torch_pil_gray(x)
            f = np.fft.fftshift(np.fft.rfft2(g), axes=(-2, -1))
            return np.abs(f), np.arctan2(f.imag, f.real)

        af, pf = comps(self.fake_b)
        ar, pr = comps(self.real_b)
        l_amp = np.abs(af - ar).mean()
        l_pha = np.abs(pf - pr).mean()
        want = 0.5 * (l_amp + l_pha)
        assert abs(float(got) - want) / want < 1e-4

    def test_temperature_term(self):
        # reference vectorize_temps: LUT over ToPILImage uint8 red channel,
        # triplet(T(fake), T_B, T(neg)) * 10
        T = np.linspace(24, 38, 256)
        tf = T[torch_pil_red(self.fake_b).astype(np.int64)]
        tn = T[torch_pil_red(self.neg_b).astype(np.int64)]
        tl = torch.nn.TripletMarginLoss(margin=1.0, p=2)
        want = tl(
            torch.from_numpy(tf[:, None]).float(),
            torch.from_numpy(self.t_b[:, None]).double().float(),
            torch.from_numpy(tn[:, None]).float(),
        ).item() * 10.0

        t_fake = ops.temperature_lut(jnp.asarray(self.fake_b), mode="exact")
        t_neg = ops.temperature_lut(jnp.asarray(self.neg_b), mode="exact")
        got = float(
            ops.triplet_margin_loss(
                t_fake, jnp.asarray(self.t_b), t_neg, axis=-1
            ) * 10.0
        )
        assert abs(got - want) / max(want, 1e-6) < 1e-4

    def test_patch_triplet_term_fixed_negatives(self):
        # reference: per-quadrant triplet with a random whole-quadrant negative
        # (:470-477); negatives fixed to [2, 0, 3, 1] on both sides.
        neg_idx = np.array([2, 0, 3, 1])
        fp = np.asarray(ops.patchify(jnp.asarray(self.fake_b), 2))
        rp = np.asarray(ops.patchify(jnp.asarray(self.real_b), 2))
        tl = torch.nn.TripletMarginLoss(margin=1.0, p=2)
        terms = []
        for i in range(4):
            a = torch.from_numpy(fp[i]).permute(0, 3, 1, 2)
            p = torch.from_numpy(rp[i]).permute(0, 3, 1, 2)
            nn_ = torch.from_numpy(rp[neg_idx[i]]).permute(0, 3, 1, 2)
            terms.append(tl(a, p, nn_).item())
        want = 0.25 * sum(terms)

        neg = jnp.asarray(rp)[jnp.asarray(neg_idx)]
        per_patch = jax.vmap(
            lambda a, p, n: ops.triplet_margin_loss(a, p, n, axis=2)
        )(jnp.asarray(fp), jnp.asarray(rp), neg)
        got = float(jnp.mean(per_patch))
        assert abs(got - want) / want < 1e-4

    def test_adversarial_terms(self):
        rng = np.random.RandomState(9)
        pred_fake = rng.randn(2, 16, 16, 1).astype(np.float32)
        pred_real = rng.randn(2, 16, 16, 1).astype(np.float32)
        bce = torch.nn.BCEWithLogitsLoss()
        tf_, tr = torch.from_numpy(pred_fake), torch.from_numpy(pred_real)
        want_g = bce(tf_ - tr.detach(), torch.full_like(tf_, 0.9)).item()
        want_d = 0.5 * (
            bce(tr - tf_, torch.full_like(tf_, 0.9)).item()
            + bce(tf_ - tr, torch.zeros_like(tf_)).item()
        )
        got_g = float(ops.relativistic_g_loss(jnp.asarray(pred_fake), jnp.asarray(pred_real)))
        got_d = float(ops.relativistic_d_loss(jnp.asarray(pred_real), jnp.asarray(pred_fake)))
        assert abs(got_g - want_g) < 1e-6
        assert abs(got_d - want_d) < 1e-6

    def test_total_loss_composition(self):
        """loss_G = 0.5·adv + 0.5·lpips + triplet + 0.5·temp + 0.01·fft (:504).
        Composed from the individually-verified terms with lpips fixed."""
        adv, trip, temp, fft_ = 0.7, 1.4, 147.5, 2612.6
        lpips_val = 51.79
        want = 0.5 * adv + 0.5 * lpips_val + trip + 0.5 * temp + 0.01 * fft_
        from tfcgan_tpu.config import get_experiment

        lc = get_experiment("fft_glo").loss
        got = (
            lc.adv_weight * adv + lc.lpips_weight * lpips_val
            + lc.triplet_weight * trip + lc.temp_weight * temp
            + lc.fft_weight * fft_
        )
        assert abs(got - want) < 1e-9
