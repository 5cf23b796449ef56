"""Weights-gated tests: auto-activate when converted pretrained weights exist.

This sandbox has no egress, so the real LPIPS (VGG16+lin) and torchvision
ResNet18 checkpoints cannot be fetched here (VERDICT missing #1). A user WITH
egress follows README 'Pretrained weights (turnkey drop-in)':

    python tools/convert_lpips.py --vgg vgg16-397923af.pth \
        --lpips lpips_vgg_v0.1.pth --out weights/lpips_flax.msgpack
    python tools/convert_resnet.py --ckpt resnet18-f37072fd.pth \
        --out weights/resnet18_flax.msgpack

and these tests then run automatically (pytest skips them while the files
are absent). Path resolution matches the library's own auto-discovery
(``models/lpips.default_weights_path``): the TFCGAN_*_WEIGHTS env vars, then
``<repo>/weights/``.

Converter *correctness* is already pinned without real weights:
``tests/test_models.py::TestConvertLPIPS`` converts a synthetic torch
checkpoint and matches a torch recomputation of the published LPIPS formula.
These tests add the missing end-to-end link on the real artifacts.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tfcgan_tpu.models.lpips import default_weights_path


lpips_path = default_weights_path("lpips")
resnet_path = default_weights_path("resnet")

needs_lpips = pytest.mark.skipif(
    not lpips_path, reason="converted LPIPS weights not present (no egress here)"
)
needs_resnet = pytest.mark.skipif(
    not resnet_path, reason="converted ResNet18 weights not present (no egress here)"
)


@needs_lpips
class TestPretrainedLPIPS:
    def test_loads_and_behaves_like_a_metric(self):
        from tfcgan_tpu.models import LPIPS
        from tfcgan_tpu.models.lpips import load_lpips_params

        params = load_lpips_params(lpips_path)
        m = LPIPS()
        rng = np.random.RandomState(0)
        x = jnp.asarray(np.tanh(rng.randn(2, 64, 64, 3)).astype(np.float32))
        d_same = np.asarray(m.apply(params, x, x))
        np.testing.assert_allclose(d_same, 0.0, atol=1e-5)
        # monotone in perturbation size — holds for the calibrated metric
        small = jnp.clip(x + 0.05 * rng.randn(*x.shape).astype(np.float32), -1, 1)
        large = jnp.clip(x + 0.50 * rng.randn(*x.shape).astype(np.float32), -1, 1)
        d_small = float(np.asarray(m.apply(params, x, small)).mean())
        d_large = float(np.asarray(m.apply(params, x, large)).mean())
        assert 0.0 < d_small < d_large, (d_small, d_large)

    def test_auto_activates_the_lpips_perceptual(self):
        from tfcgan_tpu.config import get_experiment
        from tfcgan_tpu.models.lpips import resolve_perceptual

        cfg = get_experiment("stn_newmodel3")
        assert resolve_perceptual(cfg.loss) == "lpips"

    def test_matches_torch_lpips_if_torch_checkpoints_present(self):
        """Full-chain parity when the RAW torch checkpoints are also around
        (TFCGAN_VGG_PTH / TFCGAN_LPIPS_PTH): converted-flax LPIPS output vs a
        torch recomputation of the published formula with the same weights."""
        import os

        vgg_pth = os.environ.get("TFCGAN_VGG_PTH", "")
        lp_pth = os.environ.get("TFCGAN_LPIPS_PTH", "")
        if not (vgg_pth and lp_pth and os.path.exists(vgg_pth) and os.path.exists(lp_pth)):
            pytest.skip("raw torch checkpoints not present")
        import sys

        import torch

        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
        from convert_lpips import VGG16_CONV_IDX  # noqa: F401

        from tfcgan_tpu.models import LPIPS
        from tfcgan_tpu.models.lpips import load_lpips_params, _SHIFT, _SCALE

        vgg_sd = torch.load(vgg_pth, map_location="cpu")
        lp_sd = torch.load(lp_pth, map_location="cpu")
        rng = np.random.RandomState(1)
        x = np.tanh(rng.randn(1, 32, 32, 3)).astype(np.float32)
        y = np.tanh(rng.randn(1, 32, 32, 3)).astype(np.float32)

        # torch recomputation (same structure as tests/test_models.py's clone)
        import torch.nn.functional as F

        def feats(t):
            h = (t - torch.tensor(_SHIFT).view(1, 3, 1, 1)) / torch.tensor(
                _SCALE
            ).view(1, 3, 1, 1)
            out = []
            conv_i = 0
            cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
                   512, 512, 512, "M", 512, 512, 512]
            li_iter = iter(VGG16_CONV_IDX)
            for item in cfg:
                if item == "M":
                    h = F.max_pool2d(h, 2)
                    continue
                li = next(li_iter)
                w = vgg_sd[f"features.{li}.weight"]
                b = vgg_sd[f"features.{li}.bias"]
                h = F.relu(F.conv2d(h, w, b, padding=1))
                conv_i += 1
                if conv_i in (2, 4, 7, 10, 13):
                    out.append(h)
            return out

        tx = torch.tensor(np.transpose(x, (0, 3, 1, 2)))
        ty = torch.tensor(np.transpose(y, (0, 3, 1, 2)))
        total = 0.0
        for i, (fa, fb) in enumerate(zip(feats(tx), feats(ty))):
            na = fa / (fa.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
            nb = fb / (fb.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
            d = (na - nb).pow(2)
            for key in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight",
                        f"lin{i}.weight"):
                if key in lp_sd:
                    w = lp_sd[key].abs().view(1, -1, 1, 1)
                    break
            total = total + (d * w).sum(1).mean((1, 2))
        want = float(total[0])

        params = load_lpips_params(lpips_path)
        got = float(np.asarray(LPIPS().apply(params, jnp.asarray(x), jnp.asarray(y)))[0])
        np.testing.assert_allclose(got, want, rtol=1e-3)


@needs_resnet
class TestPretrainedResNet18:
    def test_backbone_loads_into_folded_resnet(self):
        from tfcgan_tpu.models.resnet import ResNet18, load_resnet18_backbone

        bb = load_resnet18_backbone(resnet_path)
        m = ResNet18(num_classes=4, norm="folded")
        variables = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
        params = dict(variables["params"])
        fc = params.pop("fc")
        merged = {"params": {**params, **dict(bb), "fc": fc}}
        rng = np.random.RandomState(2)
        x = jnp.asarray(np.tanh(rng.randn(2, 64, 64, 3)).astype(np.float32))
        out = np.asarray(m.apply(merged, x))
        assert out.shape == (2, 4)
        assert np.all(np.isfinite(out))
        # pretrained (non-random) backbone: two distinct inputs must map to
        # distinct features
        assert not np.allclose(out[0], out[1])

    def test_auto_activates_folded_norm_in_debiased_recipe(self):
        from tfcgan_tpu.config import get_experiment
        from tfcgan_tpu.recipes import build_recipe

        cfg = get_experiment("fft_patch_debiased")  # the V7 config
        recipe = build_recipe(cfg)
        assert recipe.cnn_hair.norm == "folded"
