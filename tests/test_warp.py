"""Parity tests for affine_grid/grid_sample vs torch F.affine_grid/F.grid_sample."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from tfcgan_tpu.ops import warp


def _theta(n, seed=0):
    rng = np.random.RandomState(seed)
    identity = np.tile(np.array([[1.0, 0, 0], [0, 1.0, 0]], np.float32), (n, 1, 1))
    return identity + 0.2 * rng.randn(n, 2, 3).astype(np.float32)


class TestAffineGrid:
    @pytest.mark.parametrize("align", [True, False])
    def test_matches_torch(self, align):
        th = _theta(3, seed=1)
        got = np.asarray(warp.affine_grid(jnp.asarray(th), (3, 8, 10), align_corners=align))
        want = F.affine_grid(torch.from_numpy(th), (3, 1, 8, 10), align_corners=align).numpy()
        np.testing.assert_allclose(got, want, atol=1e-6)


class TestGridSample:
    @pytest.mark.parametrize("mode", ["bilinear", "nearest", "bicubic"])
    @pytest.mark.parametrize("padding", ["zeros", "border", "reflection"])
    @pytest.mark.parametrize("align", [True, False])
    def test_matches_torch(self, mode, padding, align):
        rng = np.random.RandomState(7)
        x = rng.randn(2, 9, 11, 3).astype(np.float32)
        # Grid that lands inside, near edges, and out of range.
        grid = rng.uniform(-1.4, 1.4, (2, 6, 7, 2)).astype(np.float32)
        got = np.asarray(
            warp.grid_sample(
                jnp.asarray(x), jnp.asarray(grid), mode=mode,
                padding_mode=padding, align_corners=align,
            )
        )
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        want = (
            F.grid_sample(
                xt, torch.from_numpy(grid), mode=mode,
                padding_mode=padding, align_corners=align,
            )
            .permute(0, 2, 3, 1)
            .numpy()
        )
        if mode == "nearest":
            # round-half ties can differ; compare where not on a .5 boundary
            close = np.isclose(got, want, atol=1e-5)
            assert close.mean() > 0.98
        else:
            np.testing.assert_allclose(got, want, atol=2e-5)

    def test_stn_flagship_path(self):
        # bicubic + border + align_corners=True per-sample warp
        # (TFC-STN/TFCGAN_STN21_Original_NewModel3_Official.py:226-230).
        rng = np.random.RandomState(9)
        x = rng.randn(4, 16, 16, 3).astype(np.float32)
        th = _theta(4, seed=3)
        got = np.asarray(warp.warp_affine(jnp.asarray(x), jnp.asarray(th)))
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        g = F.affine_grid(torch.from_numpy(th), (4, 3, 16, 16), align_corners=True)
        want = (
            F.grid_sample(xt, g, mode="bicubic", padding_mode="border", align_corners=True)
            .permute(0, 2, 3, 1)
            .numpy()
        )
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_gradients_flow_to_theta_and_source(self):
        x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 1).astype(np.float32))
        th = jnp.asarray(_theta(2, seed=5))

        def loss(theta, src):
            return jnp.sum(warp.warp_affine(src, theta, mode="bilinear"))

        gt, gs = jax.grad(loss, argnums=(0, 1))(th, x)
        assert float(jnp.sum(jnp.abs(gt))) > 0
        assert float(jnp.sum(jnp.abs(gs))) > 0
        assert np.all(np.isfinite(np.asarray(gt)))

    def test_grad_wrt_grid_matches_torch(self):
        rng = np.random.RandomState(11)
        x = rng.randn(1, 8, 8, 2).astype(np.float32)
        grid = rng.uniform(-0.9, 0.9, (1, 5, 5, 2)).astype(np.float32)

        def jloss(g):
            return jnp.sum(
                warp.grid_sample(jnp.asarray(x), g, mode="bilinear",
                                 padding_mode="border", align_corners=True) ** 2
            )

        jg = np.asarray(jax.grad(jloss)(jnp.asarray(grid)))
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        gt = torch.from_numpy(grid).requires_grad_(True)
        out = F.grid_sample(xt, gt, mode="bilinear", padding_mode="border", align_corners=True)
        (out ** 2).sum().backward()
        np.testing.assert_allclose(jg, gt.grad.numpy(), atol=1e-4)
