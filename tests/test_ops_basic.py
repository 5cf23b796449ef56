"""Golden tests for the primitive ops vs torch / PIL / numpy references."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
from PIL import Image

import jax
import jax.numpy as jnp

from tfcgan_tpu import ops


def rand(*shape, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(*shape).astype(np.float32)


class TestInstanceNorm:
    def test_matches_torch(self):
        x = rand(2, 8, 8, 5)
        got = np.asarray(ops.instance_norm(jnp.asarray(x)))
        t = torch.nn.InstanceNorm2d(5)(torch.from_numpy(x).permute(0, 3, 1, 2))
        want = t.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestBlurPool:
    @pytest.mark.parametrize("stride", [1, 2])
    def test_matches_torch_reference(self, stride):
        # Emulate antialiased_cnns.BlurPool(filt_size=4): reflect pad (1,2),
        # depthwise [1,3,3,1] outer kernel / 64, given stride.
        x = rand(2, 16, 16, 3, seed=1)
        got = np.asarray(ops.blur_pool(jnp.asarray(x), stride=stride))
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        a = torch.tensor([1.0, 3.0, 3.0, 1.0])
        k = torch.outer(a, a)
        k = (k / k.sum()).expand(3, 1, 4, 4)
        xp = F.pad(xt, (1, 2, 1, 2), mode="reflect")
        want = F.conv2d(xp, k, stride=stride, groups=3).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)

    @pytest.mark.parametrize("shape", [(2, 16, 16, 3), (1, 15, 17, 5), (1, 7, 9, 4)])
    @pytest.mark.parametrize("stride", [1, 2])
    def test_separable_matches_padded_oracle(self, shape, stride):
        # the fast path (zero-pad-in-conv + edge re-adds) vs the direct
        # materialized-reflect-pad form, values and gradients, odd sizes incl.
        from tfcgan_tpu.ops.blurpool import blur_pool_padded

        x = jnp.asarray(rand(*shape, seed=3))
        got = np.asarray(ops.blur_pool(x, stride=stride))
        want = np.asarray(blur_pool_padded(x, stride=stride))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1e-6)
        g_fast = jax.grad(lambda v: (ops.blur_pool(v, stride=stride) ** 2).sum())(x)
        g_ref = jax.grad(lambda v: (blur_pool_padded(v, stride=stride) ** 2).sum())(x)
        np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_ref), atol=1e-5)


class TestQuantize:
    def test_uint8_torch_semantics(self):
        x = np.array([-1.0, -0.5, -0.004, 0.0, 0.25, 0.5, 0.999, 1.0], np.float32)
        got = np.asarray(ops.quantize_uint8_torch(jnp.asarray(x)))
        want = torch.from_numpy(x).mul(255).byte().numpy().astype(np.float32)
        np.testing.assert_array_equal(got, want)

    def test_luma_matches_pil(self):
        rng = np.random.RandomState(3)
        rgb = rng.randint(0, 256, (16, 16, 3), dtype=np.uint8)
        want = np.array(Image.fromarray(rgb, "RGB").convert("L")).astype(np.float32)
        got = np.asarray(ops.luma_pil(jnp.asarray(rgb.astype(np.float32))))
        np.testing.assert_array_equal(got, want)

    def test_rgb_to_luma_exact_full_path(self):
        # Normalized [-1,1] image -> ToPILImage -> convert("L") torch+PIL path.
        rng = np.random.RandomState(4)
        x = rng.uniform(-1, 1, (2, 8, 8, 3)).astype(np.float32)
        got = np.asarray(ops.rgb_to_luma_uint8(jnp.asarray(x), mode="exact"))
        for n in range(2):
            t = torch.from_numpy(x[n]).permute(2, 0, 1)
            u8 = t.mul(255).byte().permute(1, 2, 0).numpy()
            want = np.array(Image.fromarray(u8, "RGB").convert("L")).astype(np.float32)
            np.testing.assert_array_equal(got[n], want)


class TestTemperature:
    def test_matches_reference_lut(self):
        # Reference: linspace(24,38,256) LUT over the uint8 red channel
        # (datasets_temp.py:14-35). searchsorted on exact keys == direct index.
        rng = np.random.RandomState(5)
        img = rng.randint(0, 256, (4, 4, 3), dtype=np.uint8)
        T = np.linspace(24, 38, num=256)
        want = T[img[:, :, 0]]
        got = np.asarray(ops.temperature_lut_uint8(jnp.asarray(img[None, :, :, 0].astype(np.float32))))[0]
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_exact_mode_matches_torch_pil_path(self):
        rng = np.random.RandomState(6)
        x = rng.uniform(-1, 1, (2, 8, 8, 3)).astype(np.float32)
        got = np.asarray(ops.temperature_lut(jnp.asarray(x), mode="exact"))
        T = np.linspace(24, 38, num=256)
        for n in range(2):
            t = torch.from_numpy(x[n]).permute(2, 0, 1)
            u8 = t.mul(255).byte().permute(1, 2, 0).numpy()  # ToPILImage RGB
            want = T[u8[:, :, 0]]
            np.testing.assert_allclose(got[n], want, rtol=1e-6)


class TestFFT:
    def test_amp_phase_matches_numpy_reference(self):
        # FFT_Components.make_components on the PIL grayscale image
        # (TFCGAN_multigpu_globalFFT.py:244-262).
        rng = np.random.RandomState(7)
        x = rng.uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32)
        amp, pha = ops.fft_amp_phase(jnp.asarray(x), mode="exact")
        amp, pha = np.asarray(amp), np.asarray(pha)
        for n in range(2):
            t = torch.from_numpy(x[n]).permute(2, 0, 1)
            u8 = t.mul(255).byte().permute(1, 2, 0).numpy()
            gray = np.array(Image.fromarray(u8, "RGB").convert("L"))
            f = np.fft.fftshift(np.fft.rfft2(gray))
            np.testing.assert_allclose(amp[n], np.abs(f), rtol=2e-5, atol=2e-2)
            np.testing.assert_allclose(
                pha[n], np.arctan2(f.imag, f.real), rtol=1e-4, atol=2e-4
            )

    def test_log_magnitude(self):
        rng = np.random.RandomState(8)
        x = rng.uniform(-1, 1, (1, 16, 16, 3)).astype(np.float32)
        got = np.asarray(ops.fft_log_magnitude(jnp.asarray(x), mode="exact"))[0]
        t = torch.from_numpy(x[0]).permute(2, 0, 1)
        u8 = t.mul(255).byte().permute(1, 2, 0).numpy()
        gray = np.array(Image.fromarray(u8, "RGB").convert("L"))
        want = np.log(np.abs(np.fft.fftshift(np.fft.fft2(gray))))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


class TestPatches:
    def test_patch16_matches_reference_slices(self):
        # make_16_patches ordering (TFCGAN_multigpu_patchFFT_16P.py:227-253).
        x = rand(2, 256, 256, 3, seed=9)
        got = np.asarray(ops.patch16(jnp.asarray(x)))
        idx = 0
        for r in range(4):
            for c in range(4):
                want = x[:, r * 64 : (r + 1) * 64, c * 64 : (c + 1) * 64, :]
                np.testing.assert_array_equal(got[idx], want)
                idx += 1

    def test_roundtrip(self):
        x = rand(2, 32, 32, 3, seed=10)
        for g in (2, 4):
            p = ops.patchify(jnp.asarray(x), g)
            back = np.asarray(ops.unpatchify(p, g))
            np.testing.assert_array_equal(back, x)


class TestTriplet:
    def test_matches_torch(self):
        a, p, n = rand(2, 3, 8, 8, seed=11), rand(2, 3, 8, 8, seed=12), rand(2, 3, 8, 8, seed=13)
        got = float(ops.triplet_margin_loss(jnp.asarray(a), jnp.asarray(p), jnp.asarray(n)))
        tl = torch.nn.TripletMarginLoss(margin=1.0, p=2)
        want = tl(torch.from_numpy(a), torch.from_numpy(p), torch.from_numpy(n)).item()
        assert abs(got - want) < 1e-5


class TestGanLosses:
    def test_bce_matches_torch(self):
        x = rand(3, 16, 16, 1, seed=14)
        got = float(ops.bce_with_logits(jnp.asarray(x), 0.9))
        want = torch.nn.BCEWithLogitsLoss()(
            torch.from_numpy(x), torch.full_like(torch.from_numpy(x), 0.9)
        ).item()
        assert abs(got - want) < 1e-6

    def test_relativistic_pair(self):
        pf = rand(2, 16, 16, 1, seed=15)
        pr = rand(2, 16, 16, 1, seed=16)
        g = float(ops.relativistic_g_loss(jnp.asarray(pf), jnp.asarray(pr)))
        tf_, tr = torch.from_numpy(pf), torch.from_numpy(pr)
        bce = torch.nn.BCEWithLogitsLoss()
        want_g = bce(tf_ - tr.detach(), torch.full_like(tf_, 0.9)).item()
        assert abs(g - want_g) < 1e-6
        d = float(ops.relativistic_d_loss(jnp.asarray(pr), jnp.asarray(pf)))
        want_d = 0.5 * (
            bce(tr - tf_, torch.full_like(tf_, 0.9)).item()
            + bce(tf_ - tr, torch.zeros_like(tf_)).item()
        )
        assert abs(d - want_d) < 1e-6


class TestMorphology:
    def test_cross_gradient_matches_naive(self):
        x = rand(2, 10, 12, 3, seed=17)

        def naive(img):  # (H, W) plane, cross kernel, geodesic border
            h, w = img.shape
            dil = np.full_like(img, -np.inf)
            ero = np.full_like(img, np.inf)
            out_d = np.empty_like(img)
            out_e = np.empty_like(img)
            for i in range(h):
                for j in range(w):
                    vals = [img[i, j]]
                    if i > 0: vals.append(img[i - 1, j])
                    if i < h - 1: vals.append(img[i + 1, j])
                    if j > 0: vals.append(img[i, j - 1])
                    if j < w - 1: vals.append(img[i, j + 1])
                    out_d[i, j] = max(vals)
                    out_e[i, j] = min(vals)
            return out_d - out_e

        got = np.asarray(ops.morphological_gradient(jnp.asarray(x)))
        for n in range(2):
            for c in range(3):
                np.testing.assert_allclose(got[n, :, :, c], naive(x[n, :, :, c]), atol=1e-6)


class TestColor:
    def test_hsv_roundtrip(self):
        rng = np.random.RandomState(18)
        x = rng.uniform(0, 1, (4, 4, 3)).astype(np.float32)
        hsv = ops.rgb_to_hsv(jnp.asarray(x))
        back = np.asarray(ops.hsv_to_rgb(hsv))
        np.testing.assert_allclose(back, x, atol=1e-5)

    def test_jitter_shape_and_range(self):
        x = jnp.asarray(rand(2, 8, 8, 3, seed=19))
        x = jnp.tanh(x)
        out = ops.color_jitter(jax.random.PRNGKey(0), x)
        assert out.shape == x.shape
        assert float(jnp.min(out)) >= -1.0 - 1e-6
        assert float(jnp.max(out)) <= 1.0 + 1e-6


class TestAugment:
    def test_flips_and_erase(self):
        from tfcgan_tpu.data.augment import random_hflip, random_vflip, random_erasing, test_time_augment

        rng = np.random.RandomState(20)
        x = jnp.asarray(rng.randn(4, 16, 16, 3).astype(np.float32))
        key = jax.random.PRNGKey(0)
        hf = np.asarray(random_hflip(key, x, p=1.0))
        np.testing.assert_array_equal(hf, np.asarray(x)[:, :, ::-1, :])
        vf = np.asarray(random_vflip(key, x, p=1.0))
        np.testing.assert_array_equal(vf, np.asarray(x)[:, ::-1, :, :])
        er = np.asarray(random_erasing(key, x, p=1.0))
        changed = (er != np.asarray(x)).reshape(4, -1).any(axis=1)
        assert changed.all()
        assert (er == 0.0).any()
        out = test_time_augment(key, {"A": x, "B": x})
        np.testing.assert_array_equal(np.asarray(out["A"]), np.asarray(out["B"]))


class TestWGAN:
    def test_gradient_penalty_unit_norm_is_zero(self):
        from tfcgan_tpu.ops.gan_losses import gradient_penalty, wgan_d_loss, wgan_g_loss

        # D(x) = sum over a unit-direction: grad norm == 1 everywhere
        w = np.zeros((4, 4, 1), np.float32)
        w[0, 0, 0] = 1.0

        def d_apply(img):
            return jnp.sum(img * jnp.asarray(w), axis=(1, 2, 3))

        rng = np.random.RandomState(21)
        real = jnp.asarray(rng.randn(3, 4, 4, 1).astype(np.float32))
        fake = jnp.asarray(rng.randn(3, 4, 4, 1).astype(np.float32))
        gp = float(gradient_penalty(d_apply, real, fake, jax.random.PRNGKey(0)))
        assert gp < 1e-8
        assert float(wgan_g_loss(jnp.ones((2, 2)))) == -1.0
        assert float(wgan_d_loss(jnp.zeros((2,)), jnp.ones((2,)))) == 1.0


class TestSaliencyMask:
    def test_matches_torch_kornia_formula(self):
        # Torch replica of kornia's documented pipeline
        # (laplacian(7) -> minmax -> gaussian_blur2d((9,9),(1.6,1.6)) -> /max)
        # built independently with F.conv2d + reflect padding.
        x = rand(2, 32, 32, 3, seed=3)
        got = np.asarray(ops.saliency_mask(jnp.asarray(x)))

        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        gray = 0.299 * xt[:, 0:1] + 0.587 * xt[:, 1:2] + 0.114 * xt[:, 2:3]
        k = torch.ones(7, 7)
        k[3, 3] = 1.0 - 49.0
        k = k / k.abs().sum()
        lap = F.conv2d(F.pad(gray, (3, 3, 3, 3), mode="reflect"), k[None, None]).abs()
        norm = (lap - lap.min()) / (lap.max() - lap.min())
        xg = torch.arange(9, dtype=torch.float32) - 4
        g = torch.exp(-xg**2 / (2 * 1.6**2))
        g = g / g.sum()
        b = F.conv2d(F.pad(norm, (4, 4, 0, 0), mode="reflect"), g[None, None, None, :])
        b = F.conv2d(F.pad(b, (0, 0, 4, 4), mode="reflect"), g[None, None, :, None])
        want = (b / b.max()).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_range_and_grad(self):
        x = jnp.asarray(rand(1, 16, 16, 3, seed=4))
        m = ops.saliency_mask(x)
        assert m.shape == (1, 16, 16, 1)
        assert float(m.min()) >= 0.0 and float(m.max()) <= 1.0 + 1e-6
        gr = jax.grad(lambda im: ops.saliency_mask(im).sum())(x)
        assert np.isfinite(np.asarray(gr)).all()


class TestDDPMSchedule:
    """Golden tests vs an independent numpy implementation of the published
    diffusers equations (DDPMScheduler, squaredcos_cap_v2, fixed_small,
    clip_sample=True) — the reference's scheduler config
    (TFC-Diff/prototype_condA.py:137)."""

    def _np_betas(self, T, max_beta=0.999):
        import math as m
        ab = lambda t: m.cos((t + 0.008) / 1.008 * m.pi / 2) ** 2
        return np.array(
            [min(1 - ab((i + 1) / T) / ab(i / T), max_beta) for i in range(T)],
            np.float32,
        )

    def test_betas_and_alphas_cumprod(self):
        from tfcgan_tpu.models.diffusion import DDPMSchedule

        sched = DDPMSchedule(num_timesteps=500)
        want = self._np_betas(500)
        np.testing.assert_allclose(np.asarray(sched.betas()), want, atol=2e-6)
        # diffusers cumprods the fp32 betas in fp32
        np.testing.assert_allclose(
            np.asarray(sched.alphas_cumprod()),
            np.cumprod((1 - want).astype(np.float32), dtype=np.float32),
            rtol=2e-5,
        )

    def test_add_noise_and_ancestral_step(self):
        from tfcgan_tpu.models.diffusion import DDPMSchedule

        T = 50
        sched = DDPMSchedule(num_timesteps=T)
        betas = self._np_betas(T).astype(np.float64)
        abar = np.cumprod(1 - betas)
        rng = np.random.RandomState(0)
        x0 = np.clip(rng.randn(2, 4, 4, 1) * 0.5, -1, 1).astype(np.float32)
        noise = rng.randn(2, 4, 4, 1).astype(np.float32)
        t = np.array([3, 17])

        got = np.asarray(sched.add_noise(jnp.asarray(x0), jnp.asarray(noise), jnp.asarray(t)))
        want = (np.sqrt(abar[t])[:, None, None, None] * x0
                + np.sqrt(1 - abar[t])[:, None, None, None] * noise)
        np.testing.assert_allclose(got, want, atol=1e-5)

        # one ancestral step at a scalar t, same key-derived gaussian
        tt = 17
        x_t = want[1:2]
        eps = rng.randn(1, 4, 4, 1).astype(np.float32)
        key = jax.random.PRNGKey(9)
        got = np.asarray(sched.step(jnp.asarray(eps), tt, jnp.asarray(x_t), key))
        z = np.asarray(jax.random.normal(key, x_t.shape, jnp.float32))
        px0 = (x_t - np.sqrt(1 - abar[tt]) * eps) / np.sqrt(abar[tt])
        px0 = np.clip(px0, -1.0, 1.0)
        c0 = np.sqrt(abar[tt - 1]) * betas[tt] / (1 - abar[tt])
        ct = np.sqrt(1 - betas[tt]) * (1 - abar[tt - 1]) / (1 - abar[tt])
        var = max(betas[tt] * (1 - abar[tt - 1]) / (1 - abar[tt]), 1e-20)
        want = c0 * px0 + ct * x_t + np.sqrt(var) * z
        np.testing.assert_allclose(got, want, atol=1e-5)

        # t=0 adds no noise
        got0 = np.asarray(sched.step(jnp.asarray(eps), 0, jnp.asarray(x_t), key))
        px0 = np.clip((x_t - np.sqrt(1 - abar[0]) * eps) / np.sqrt(abar[0]), -1, 1)
        np.testing.assert_allclose(got0, px0, atol=5e-5)


class TestMaxPool22:
    """ops.pooling.max_pool22 vs nn.max_pool (fwd bit-exact, bwd incl. ties)."""

    def _rand(self, shape, seed=0):
        x = jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)
        # quantize to force exact ties inside many 2x2 windows (and relu-like
        # zero plateaus), the case where tie-routing rules diverge
        return jnp.round(x * 2.0) / 2.0

    def test_forward_bit_exact(self):
        import flax.linen as nn
        from tfcgan_tpu.ops.pooling import max_pool22

        x = self._rand((2, 16, 12, 5))
        a = max_pool22(x)
        b = nn.max_pool(x, (2, 2), strides=(2, 2))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_backward_matches_select_and_scatter(self):
        import flax.linen as nn
        from tfcgan_tpu.ops.pooling import max_pool22

        x = self._rand((2, 8, 8, 3), seed=4)
        w = jax.random.normal(jax.random.PRNGKey(7), (2, 4, 4, 3), jnp.float32)
        g_new = jax.grad(lambda t: jnp.sum(w * max_pool22(t)))(x)
        g_ref = jax.grad(
            lambda t: jnp.sum(w * nn.max_pool(t, (2, 2), strides=(2, 2))))(x)
        np.testing.assert_array_equal(np.asarray(g_new), np.asarray(g_ref))

    def test_backward_matches_torch_at_ties(self):
        from tfcgan_tpu.ops.pooling import max_pool22

        x = self._rand((1, 6, 6, 2), seed=9)
        g_j = jax.grad(lambda t: jnp.sum(max_pool22(t) ** 2))(x)
        xt = torch.tensor(np.asarray(x).transpose(0, 3, 1, 2), requires_grad=True)
        F.max_pool2d(xt, 2).pow(2).sum().backward()
        np.testing.assert_array_equal(
            np.asarray(g_j), xt.grad.numpy().transpose(0, 2, 3, 1))

    def test_pool22_dispatch_flag(self, monkeypatch):
        """pool22 is a pure perf knob: both paths identical in fwd + grad."""
        from tfcgan_tpu.ops import pooling

        x = self._rand((2, 8, 8, 3), seed=11)
        loss = lambda t: jnp.sum(pooling.pool22(t) ** 2)  # noqa: E731
        monkeypatch.setenv("TFCGAN_ELEMENTWISE_MAXPOOL", "0")
        y0, g0 = loss(x), jax.grad(loss)(x)
        monkeypatch.setenv("TFCGAN_ELEMENTWISE_MAXPOOL", "1")
        y1, g1 = loss(x), jax.grad(loss)(x)
        np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))
        np.testing.assert_array_equal(np.asarray(g0), np.asarray(g1))
