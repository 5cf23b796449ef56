"""Model architecture parity: flax models vs torch replicas of the reference
structures, with identical weights injected on both sides."""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from tfcgan_tpu import models


# ---------------------------------------------------------------- torch blocks
class TBlurPool(nn.Module):
    """antialiased_cnns.BlurPool(filt_size=4) reimplemented for the test."""

    def __init__(self, channels, stride):
        super().__init__()
        a = torch.tensor([1.0, 3.0, 3.0, 1.0])
        k = torch.outer(a, a)
        self.register_buffer("k", (k / k.sum()).expand(channels, 1, 4, 4))
        self.stride = stride
        self.channels = channels

    def forward(self, x):
        x = F.pad(x, (1, 2, 1, 2), mode="reflect")
        return F.conv2d(x, self.k, stride=self.stride, groups=self.channels)


class TDown(nn.Module):
    def __init__(self, in_ch, out_ch, normalize=True):
        super().__init__()
        self.conv = nn.Conv2d(in_ch, out_ch, 4, 1, 1, bias=False)
        self.norm = nn.InstanceNorm2d(out_ch) if normalize else None
        self.blur = TBlurPool(out_ch, 2)

    def forward(self, x):
        x = self.conv(x)
        if self.norm is not None:
            x = self.norm(x)
        return self.blur(F.leaky_relu(x, 0.2))


class TUp(nn.Module):
    def __init__(self, in_ch, out_ch):
        super().__init__()
        self.conv = nn.ConvTranspose2d(in_ch, out_ch, 4, 2, 1, bias=False)
        self.blur = TBlurPool(out_ch, 1)
        self.norm = nn.InstanceNorm2d(out_ch)

    def forward(self, x, skip):
        x = F.relu(self.norm(self.blur(self.conv(x))))
        return torch.cat([x, skip], 1)


class TGenerator(nn.Module):
    """Reference GeneratorUNet structure (dropout off for parity)."""

    def __init__(self, ch=3):
        super().__init__()
        self.down1 = TDown(ch, 64, normalize=False)
        self.down2 = TDown(64, 128)
        self.down3 = TDown(128, 256)
        self.down4 = TDown(256, 512)
        self.down5 = TDown(512, 512, normalize=False)
        self.down6 = TDown(512, 512)
        self.up1 = TUp(512, 512)
        self.up2 = TUp(1024, 512)
        self.up3 = TUp(1024, 256)
        self.up4 = TUp(512, 128)
        self.up5 = TUp(256, 64)
        self.final_pad = nn.ZeroPad2d((1, 0, 1, 0))
        self.final_conv = nn.Conv2d(128, ch, 4, padding=1)

    def forward(self, x):
        d1 = self.down1(x)
        d2 = self.down2(d1)
        d3 = self.down3(d2)
        d4 = self.down4(d3)
        d5 = self.down5(d4)
        d6 = self.down6(d5)
        u1 = self.up1(d6, d5)
        u2 = self.up2(u1, d4)
        u3 = self.up3(u2, d3)
        u4 = self.up4(u3, d2)
        u5 = self.up5(u4, d1)
        y = F.interpolate(u5, scale_factor=2, mode="nearest")
        return torch.tanh(self.final_conv(self.final_pad(y)))


def to_torch_conv(flax_kernel):
    # (kh, kw, in, out) -> (out, in, kh, kw)
    return torch.from_numpy(np.asarray(flax_kernel).transpose(3, 2, 0, 1).copy())


def to_torch_convT(flax_kernel):
    # (kh, kw, in, out) -> (in, out, kh, kw)
    return torch.from_numpy(np.asarray(flax_kernel).transpose(2, 3, 0, 1).copy())


class TestUpsample2xConvFusion:
    @pytest.mark.parametrize("k,pad", [(4, ((2, 1), (2, 1))), (3, ((1, 1), (1, 1)))])
    def test_fused_equals_unfused(self, k, pad):
        """Upsample2xConv == upsample_nearest_2x + TorchConv(k) with the SAME
        param tree — forward and input gradient, fp32 exact to accumulation
        noise (the fusion removes the ~2 GB materialized broadcast)."""
        import jax
        import jax.numpy as jnp
        from tfcgan_tpu.models.layers import (
            TorchConv, Upsample2xConv, upsample_nearest_2x,
        )

        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(2, 9, 11, 5).astype(np.float32))
        fused = Upsample2xConv(7, kernel_size=(k, k), padding=pad)
        params = fused.init(jax.random.PRNGKey(0), x)["params"]
        unfused = TorchConv(7, kernel_size=(k, k), padding=pad)

        def f_fused(v):
            return fused.apply({"params": params}, v)

        def f_ref(v):
            return unfused.apply({"params": params}, upsample_nearest_2x(v))

        y1, y2 = f_fused(x), f_ref(x)
        assert y1.shape == y2.shape == (2, 18, 22, 7)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                                   rtol=1e-5, atol=1e-5)
        g1 = jax.grad(lambda v: jnp.sum(f_fused(v) ** 2))(x)
        g2 = jax.grad(lambda v: jnp.sum(f_ref(v) ** 2))(x)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-4, atol=1e-4)

    def test_no_bias_variant(self):
        import jax
        from tfcgan_tpu.models.layers import Upsample2xConv

        x = np.random.RandomState(1).randn(1, 8, 8, 3).astype(np.float32)
        mod = Upsample2xConv(4, kernel_size=(3, 3), padding=((1, 1), (1, 1)),
                             use_bias=False)
        params = mod.init(jax.random.PRNGKey(0), x)["params"]
        assert set(params) == {"kernel"}
        assert mod.apply({"params": params}, x).shape == (1, 16, 16, 4)


class TestLayers:
    def test_conv_transpose_matches_torch(self):
        rng = np.random.RandomState(0)
        x = rng.randn(2, 8, 8, 5).astype(np.float32)
        m = models.TorchConvTranspose(7)
        params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
        got = np.asarray(m.apply(params, jnp.asarray(x)))
        t = nn.ConvTranspose2d(5, 7, 4, 2, 1, bias=False)
        t.weight.data = to_torch_convT(params["params"]["kernel"])
        want = t(torch.from_numpy(x).permute(0, 3, 1, 2)).detach().permute(0, 2, 3, 1).numpy()
        assert got.shape == want.shape == (2, 16, 16, 7)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_spectral_norm_converges_to_sigma_and_normalizes(self):
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(2, 8, 8, 3).astype(np.float32))
        m = models.SpectralConv(6)
        variables = m.init(jax.random.PRNGKey(0), x)
        params, spectral = variables["params"], variables["spectral"]
        # run 50 power iterations
        for _ in range(50):
            _, upd = m.apply(
                {"params": params, "spectral": spectral}, x, update_stats=True,
                mutable=["spectral"],
            )
            spectral = upd["spectral"]
        k = np.asarray(params["kernel"])  # (4,4,3,6)
        w_mat = k.reshape(-1, 6).T
        sigma_true = np.linalg.svd(w_mat, compute_uv=False)[0]
        u, v = np.asarray(spectral["u"]), np.asarray(spectral["v"])
        sigma = u @ w_mat @ v
        np.testing.assert_allclose(sigma, sigma_true, rtol=1e-4)
        # forward == plain conv with kernel/sigma
        got = np.asarray(m.apply({"params": params, "spectral": spectral}, x))
        t = nn.Conv2d(3, 6, 4, 1, 1, bias=True)
        t.weight.data = to_torch_conv(k / sigma)
        t.bias.data.zero_()
        want = t(torch.from_numpy(np.asarray(x)).permute(0, 3, 1, 2)).detach().permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestGeneratorUNet:
    def test_output_shape(self):
        m = models.GeneratorUNet()
        x = jnp.zeros((1, 256, 256, 3))
        params = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(params, x)
        assert y.shape == (1, 256, 256, 3)

    def test_forward_matches_torch_replica(self):
        m = models.GeneratorUNet()
        rng = np.random.RandomState(2)
        x = rng.randn(1, 128, 128, 3).astype(np.float32)
        params = m.init(jax.random.PRNGKey(1), jnp.asarray(x))["params"]
        got = np.asarray(m.apply({"params": params}, jnp.asarray(x)))

        t = TGenerator().eval()
        for i in range(1, 7):
            blk = getattr(t, f"down{i}")
            blk.conv.weight.data = to_torch_conv(params[f"down{i}"]["conv"]["kernel"])
        for i in range(1, 6):
            blk = getattr(t, f"up{i}")
            blk.conv.weight.data = to_torch_convT(params[f"up{i}"]["conv"]["kernel"])
        t.final_conv.weight.data = to_torch_conv(params["final_conv"]["kernel"])
        t.final_conv.bias.data = torch.from_numpy(np.asarray(params["final_conv"]["bias"]))
        with torch.no_grad():
            want = t(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, want, atol=2e-4)


class TestPatchDiscriminator:
    def test_logit_map_shape(self):
        m = models.PatchDiscriminator()
        a = jnp.zeros((2, 256, 256, 3))
        variables = m.init(jax.random.PRNGKey(0), a, a)
        y = m.apply(variables, a, a)
        assert y.shape == (2, 16, 16, 1)

    def test_conditional_generator(self):
        m = models.ConditionalGeneratorUNet()
        x = jnp.zeros((2, 128, 128, 3))
        lab = jnp.zeros((2, 9))
        params = m.init(jax.random.PRNGKey(0), x, lab)
        y = m.apply(params, x, lab)
        assert y.shape == (2, 128, 128, 3)

    def test_aux_classifier(self):
        m = models.AuxClassifierDiscriminator(num_classes=4)
        a = jnp.zeros((2, 64, 64, 3))
        variables = m.init(jax.random.PRNGKey(0), a, a)
        logits, probs = m.apply(variables, a, a)
        assert logits.shape == (2, 4, 4, 1)
        assert probs.shape == (2, 4)
        np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, rtol=1e-5)


class TestMultiDiscriminator:
    def test_pyramid_shapes(self):
        m = models.MultiDiscriminator()
        x = jnp.zeros((2, 128, 128, 3))
        variables = m.init(jax.random.PRNGKey(0), x)
        outs = m.apply(variables, x)
        assert [o.shape for o in outs] == [(2, 8, 8, 1), (2, 4, 4, 1), (2, 2, 2, 1)]


class TestSTN:
    def test_affine_stn_shapes_and_identity_bias(self):
        m = models.AffineSTN()
        a = jnp.zeros((2, 256, 256, 3))
        variables = m.init(jax.random.PRNGKey(0), a, a, a)
        out = m.apply(variables, a, a, a)
        assert out.shape == (2, 256, 256, 3)

    def test_affine_stn_identity_init(self):
        """Zero-init dtheta head: theta == exact identity at init, so step 0
        starts inside the registration loss basin (round-4 journey lesson:
        the reference-style random head put tx at 0.3-0.7 at init and one
        seed died out of frame within 17 steps). identity_init=False keeps
        the reference-style random head."""
        rng = np.random.RandomState(5)
        a = jnp.asarray(np.tanh(rng.randn(1, 256, 256, 3)).astype(np.float32))
        b = jnp.asarray(np.tanh(rng.randn(1, 256, 256, 3)).astype(np.float32))
        m = models.AffineSTN()
        variables = m.init(jax.random.PRNGKey(0), a, b, b)
        theta = m.apply(variables, a, b, method="theta")
        np.testing.assert_array_equal(
            np.asarray(theta),
            np.tile(np.asarray([[1.0, 0, 0], [0, 1.0, 0]], np.float32), (1, 1, 1)),
        )
        # identity theta -> the warp is a no-op
        warped = m.apply(variables, a, b, b)
        np.testing.assert_allclose(np.asarray(warped), np.asarray(b), atol=1e-5)
        m_ref = models.AffineSTN(identity_init=False)
        v_ref = m_ref.init(jax.random.PRNGKey(0), a, b, b)
        th_ref = m_ref.apply(v_ref, a, b, method="theta")
        assert float(np.abs(np.asarray(th_ref) -
                            np.asarray(theta)).max()) > 1e-3

    def test_deformable_stn(self):
        m = models.DeformableSTN()
        a = jnp.zeros((1, 128, 128, 3))
        variables = m.init(jax.random.PRNGKey(0), a, a)
        warped, reg = m.apply(variables, a, a)
        assert warped[0].shape == (1, 128, 128, 3)
        # zero-init offset head -> identity warp -> zero smoothness reg
        assert float(reg) == 0.0

    def test_deformable_stn_identity_warp(self):
        rng = np.random.RandomState(3)
        a = jnp.asarray(rng.randn(1, 128, 128, 3).astype(np.float32))
        m = models.DeformableSTN()
        variables = m.init(jax.random.PRNGKey(0), a, a)
        warped, _ = m.apply(variables, a, a)
        np.testing.assert_allclose(np.asarray(warped[0]), np.asarray(a), atol=1e-4)


class TestLPIPS:
    def test_zero_for_identical_positive_otherwise(self):
        m = models.LPIPS()
        rng = np.random.RandomState(4)
        x = jnp.asarray(np.tanh(rng.randn(2, 64, 64, 3)).astype(np.float32))
        y = jnp.asarray(np.tanh(rng.randn(2, 64, 64, 3)).astype(np.float32))
        params = m.init(jax.random.PRNGKey(0), x, y)
        d_same = np.asarray(m.apply(params, x, x))
        d_diff = np.asarray(m.apply(params, x, y))
        np.testing.assert_allclose(d_same, 0.0, atol=1e-6)
        assert (d_diff > 0).all()

    def test_structure_matches_torch_clone(self):
        """Inject identical weights into a torch LPIPS clone and compare."""
        m = models.LPIPS()
        rng = np.random.RandomState(5)
        x = np.tanh(rng.randn(1, 32, 32, 3)).astype(np.float32)
        y = np.tanh(rng.randn(1, 32, 32, 3)).astype(np.float32)
        variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(y))
        got = float(m.apply(variables, jnp.asarray(x), jnp.asarray(y))[0])

        p = variables["params"]
        cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512]
        taps = {2, 4, 7, 10, 13}
        layers, conv_idx = [], 0
        torch_convs = {}
        for item in cfg:
            if item == "M":
                layers.append(nn.MaxPool2d(2, 2))
                continue
            conv_idx += 1
            c = nn.Conv2d(3 if conv_idx == 1 else prev, item, 3, padding=1)
            c.weight.data = to_torch_conv(p["vgg"][f"conv{conv_idx}"]["kernel"])
            c.bias.data = torch.from_numpy(np.asarray(p["vgg"][f"conv{conv_idx}"]["bias"]))
            torch_convs[conv_idx] = len(layers)
            layers.append(c)
            layers.append(nn.ReLU())
            prev = item
        seq = nn.Sequential(*layers).eval()

        def feats(img):
            out, fs, ci = img, [], 0
            for layer in seq:
                out = layer(out)
                if isinstance(layer, nn.Conv2d):
                    ci += 1
                if isinstance(layer, nn.ReLU) and ci in taps:
                    fs.append(out)
            return fs

        shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
        scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)
        xt = (torch.from_numpy(x).permute(0, 3, 1, 2) - shift) / scale
        yt = (torch.from_numpy(y).permute(0, 3, 1, 2) - shift) / scale
        with torch.no_grad():
            fx, fy = feats(xt), feats(yt)
            total = 0.0
            for i, (a, b) in enumerate(zip(fx, fy)):
                na = a / (a.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
                nb = b / (b.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
                w = torch.from_numpy(np.abs(np.asarray(p[f"lin{i}"]))).view(1, -1, 1, 1)
                total += ((na - nb).pow(2) * w).sum(1).mean().item()
        assert abs(got - total) < 5e-4 * max(1.0, abs(total))


class TestResNetGenerator:
    def test_shape(self):
        m = models.ResNetGenerator(num_blocks=2)
        x = jnp.zeros((1, 64, 64, 3))
        params = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(params, x)
        assert y.shape == (1, 64, 64, 3)


class TestTrainBatchNorm:
    def test_matches_torch_train_mode_eps_08(self):
        # ThermalGAN2.py:91 — BatchNorm2d(out, 0.8): positional 0.8 is eps
        import torch
        from tfcgan_tpu.models.thermalgan import TrainBatchNorm

        x = np.random.RandomState(0).randn(4, 6, 6, 5).astype(np.float32)
        mod = TrainBatchNorm()
        vars_ = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
        got = np.asarray(mod.apply(vars_, jnp.asarray(x)))

        t = torch.nn.BatchNorm2d(5, 0.8)
        with torch.no_grad():
            t.weight.copy_(torch.from_numpy(np.asarray(vars_["params"]["scale"])))
            t.bias.copy_(torch.from_numpy(np.asarray(vars_["params"]["bias"])))
        t.train()
        want = t(torch.from_numpy(x).permute(0, 3, 1, 2)).detach().permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_g1_batch_variant_structure(self):
        from tfcgan_tpu.models.thermalgan import GeneratorG1

        g = GeneratorG1(norm="batch")
        x = jnp.zeros((2, 128, 128, 3))
        t = jnp.zeros((2, 128, 128))
        v = g.init(jax.random.PRNGKey(0), x, t)
        p = v["params"]
        assert "bn" in p["down2"] and "bn" not in p["down1"]
        assert "bn" not in p["down7"]  # ThermalGAN2: down7 normalize=False
        assert "bn" in p["up1"]
        y = g.apply(v, x, t)
        assert y.shape == (2, 128, 128, 3)


class TestConvertLPIPS:
    def test_synthetic_state_dict_roundtrip_and_torch_parity(self):
        """Converter key mapping: build a torchvision-layout VGG16 state dict
        + an LPIPS lin checkpoint with random weights, convert, and check the
        flax LPIPS output matches a torch recomputation of the published
        formula with the same weights."""
        import sys, os
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
        from convert_lpips import convert, VGG16_CONV_IDX

        rng = np.random.RandomState(0)
        plan = [(3, 64), (64, 64), (64, 128), (128, 128), (128, 256), (256, 256),
                (256, 256), (256, 512), (512, 512), (512, 512), (512, 512),
                (512, 512), (512, 512)]
        vgg_state = {}
        for li, (cin, cout) in zip(VGG16_CONV_IDX, plan):
            vgg_state[f"features.{li}.weight"] = torch.from_numpy(
                (rng.randn(cout, cin, 3, 3) * 0.05).astype(np.float32))
            vgg_state[f"features.{li}.bias"] = torch.from_numpy(
                (rng.randn(cout) * 0.05).astype(np.float32))
        lins = [64, 128, 256, 512, 512]
        lpips_state = {
            f"lin{i}.model.1.weight": torch.from_numpy(
                np.abs(rng.randn(1, c, 1, 1)).astype(np.float32))
            for i, c in enumerate(lins)
        }
        variables = convert(vgg_state, lpips_state)

        m = models.LPIPS()
        x = np.tanh(rng.randn(1, 32, 32, 3)).astype(np.float32)
        y = np.tanh(rng.randn(1, 32, 32, 3)).astype(np.float32)
        # structure must match the module's own init exactly
        ref = m.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(y))
        ref_paths = jax.tree_util.tree_structure(ref)
        got_paths = jax.tree_util.tree_structure(
            jax.tree_util.tree_map(np.asarray, variables))
        assert ref_paths == got_paths
        got = float(m.apply(variables, jnp.asarray(x), jnp.asarray(y))[0])

        # independent torch computation of the LPIPS formula
        shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
        scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

        def vgg_feats(t):
            feats, conv_i = [], 0
            h = t
            for item in [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
                         512, 512, 512, "M", 512, 512, 512]:
                if item == "M":
                    h = F.max_pool2d(h, 2)
                    continue
                li = VGG16_CONV_IDX[conv_i]
                h = F.conv2d(h, vgg_state[f"features.{li}.weight"],
                             vgg_state[f"features.{li}.bias"], padding=1)
                h = F.relu(h)
                conv_i += 1
                if conv_i in (2, 4, 7, 10, 13):
                    feats.append(h)
            return feats

        def norm(f):
            return f / (f.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)

        tx = (torch.from_numpy(x).permute(0, 3, 1, 2) - shift) / scale
        ty = (torch.from_numpy(y).permute(0, 3, 1, 2) - shift) / scale
        want = 0.0
        with torch.no_grad():
            for i, (fa, fb) in enumerate(zip(vgg_feats(tx), vgg_feats(ty))):
                d = (norm(fa) - norm(fb)).pow(2)
                w = lpips_state[f"lin{i}.model.1.weight"].abs().view(1, -1, 1, 1)
                want += (d * w).sum(1).mean().item()
        assert got == pytest.approx(want, rel=2e-4), (got, want)


def torch_resnet18_replica():
    """torch resnet18 *feature trunk* with torchvision state_dict naming
    (torchvision itself is not installed here; the graph is resnet18's
    exactly). Forward returns the 512-d pooled features — shared by the
    converter parity test below and the debiased-family lockstep test
    (tests/test_parity_debiased.py)."""

    class Block(nn.Module):
        def __init__(self, cin, cout, stride):
            super().__init__()
            self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(cout)
            self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(cout)
            self.downsample = None
            if stride != 1 or cin != cout:
                self.downsample = nn.Sequential(
                    nn.Conv2d(cin, cout, 1, stride, bias=False),
                    nn.BatchNorm2d(cout),
                )

        def forward(self, x):
            out = F.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            idt = x if self.downsample is None else self.downsample(x)
            return F.relu(out + idt)

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.layer1 = nn.Sequential(Block(64, 64, 1), Block(64, 64, 1))
            self.layer2 = nn.Sequential(Block(64, 128, 2), Block(128, 128, 1))
            self.layer3 = nn.Sequential(Block(128, 256, 2), Block(256, 256, 1))
            self.layer4 = nn.Sequential(Block(256, 512, 2), Block(512, 512, 1))

        def forward(self, x):
            h = F.max_pool2d(F.relu(self.bn1(self.conv1(x))), 3, 2, 1)
            for l in (self.layer1, self.layer2, self.layer3, self.layer4):
                h = l(h)
            return h.mean(dim=(2, 3))

    return Net()


def randomize_bn_stats(net):
    """Non-trivial eval-mode BatchNorm statistics (so folding is exercised)."""
    for m in net.modules():
        if isinstance(m, nn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.normal_(0.0, 0.5)
                m.running_var.uniform_(0.5, 2.0)
                m.weight.normal_(1.0, 0.2)
                m.bias.normal_(0.0, 0.2)


class TestResNet18Converter:
    """tools/convert_resnet.py BN-folding parity against the replica above."""

    def test_folded_backbone_matches_torch_eval(self):
        import sys, os
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
        from convert_resnet import convert
        from flax import serialization

        torch.manual_seed(0)
        net = torch_resnet18_replica()
        randomize_bn_stats(net)
        net.eval()

        sd = {k: v.numpy() for k, v in net.state_dict().items()}
        params = convert(sd)

        from tfcgan_tpu.models.resnet import ResNet18

        rn = ResNet18(num_classes=None, norm="folded")
        template = rn.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))["params"]
        loaded = serialization.from_state_dict(template, params)

        x = np.random.RandomState(1).randn(2, 64, 64, 3).astype(np.float32)
        got = np.asarray(rn.apply({"params": loaded}, jnp.asarray(x)))
        with torch.no_grad():
            want = net(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
