"""Pallas kernels vs their XLA reference implementations (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tfcgan_tpu import ops
from tfcgan_tpu.ops.pallas_kernels import blur_pool_pallas, resample_lanes, warp_affine_separable


class TestResampleLanes:
    @pytest.mark.parametrize("mode", ["linear", "cubic"])
    def test_identity_positions(self, mode):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(16, 128).astype(np.float32))
        pos = jnp.broadcast_to(jnp.arange(128.0), (16, 128))
        out = resample_lanes(x, pos, mode=mode, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)

    def test_linear_matches_manual(self):
        rng = np.random.RandomState(1)
        x = rng.randn(8, 64).astype(np.float32)
        pos = rng.uniform(0, 63, (8, 64)).astype(np.float32)
        out = np.asarray(resample_lanes(jnp.asarray(x), jnp.asarray(pos), "linear", interpret=True))
        i0 = np.floor(pos).astype(int)
        t = pos - i0
        ref = x[np.arange(8)[:, None], np.clip(i0, 0, 63)] * (1 - t) + \
              x[np.arange(8)[:, None], np.clip(i0 + 1, 0, 63)] * t
        np.testing.assert_allclose(out, ref, atol=1e-5)


class TestSeparableWarp:
    @pytest.mark.parametrize("mode", ["bilinear", "bicubic"])
    def test_identity_theta(self, mode):
        rng = np.random.RandomState(2)
        src = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))
        theta = jnp.tile(jnp.asarray([[1.0, 0, 0], [0, 1.0, 0]]), (2, 1, 1))
        out = warp_affine_separable(src, theta, mode=mode, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(src), atol=1e-4)

    @pytest.mark.parametrize("mode", ["bilinear", "bicubic"])
    def test_matches_gather_warp_near_identity(self, mode):
        """vs the torch-parity gather implementation, small affine, interior."""
        rng = np.random.RandomState(3)
        src = jnp.asarray(np.tanh(rng.randn(2, 64, 64, 3)).astype(np.float32))
        theta = jnp.tile(
            jnp.asarray([[0.98, 0.03, 0.01], [-0.03, 1.02, -0.02]]), (2, 1, 1)
        )
        fast = np.asarray(warp_affine_separable(src, theta, mode=mode, interpret=True))
        exact = np.asarray(ops.warp.warp_affine(src, theta, mode=mode, padding_mode="border"))
        # interior comparison. Two-pass resampling of a rotation component is
        # a (second) interpolation of interpolated values, so it is close but
        # not identical to direct 2D sampling — bounded, small error.
        m = 4
        diff = np.abs(fast[:, m:-m, m:-m] - exact[:, m:-m, m:-m])
        assert diff.max() < 6e-2, diff.max()
        assert diff.mean() < 1e-2

    @pytest.mark.parametrize(
        "th", [
            [[0.95, 0.0, 0.01], [0.0, 1.05, -0.02]],   # scale + translate
            [[1.0, 0.05, 0.0], [0.0, 1.0, 0.0]],        # shear x
            [[1.0, 0.0, 0.0], [0.05, 1.0, 0.0]],        # shear y
        ],
    )
    def test_axis_aligned_exact(self, th):
        """Scale/shear/translation have no rotation cross-term: separable
        two-pass == direct 2D sampling exactly (interior)."""
        rng = np.random.RandomState(7)
        src = jnp.asarray(np.tanh(rng.randn(1, 64, 64, 1)).astype(np.float32))
        theta = jnp.asarray([th], jnp.float32)
        fast = np.asarray(warp_affine_separable(src, theta, mode="bilinear", interpret=True))
        exact = np.asarray(ops.warp.warp_affine(src, theta, mode="bilinear", padding_mode="border"))
        m = 4
        np.testing.assert_allclose(
            fast[:, m:-m, m:-m], exact[:, m:-m, m:-m], atol=1e-4
        )

    def test_pure_translation_exact(self):
        rng = np.random.RandomState(4)
        src = jnp.asarray(rng.randn(1, 32, 32, 2).astype(np.float32))
        # translate by exactly 2 pixels right: x_s = x_d - 2 -> t1 = -4/31... use
        # normalized shift = -2 * 2/(W-1)
        sh = -2 * 2.0 / 31.0
        theta = jnp.asarray([[[1.0, 0, sh], [0, 1.0, 0]]])
        out = np.asarray(warp_affine_separable(src, theta, mode="bilinear", interpret=True))
        exact = np.asarray(ops.warp.warp_affine(src, theta, mode="bilinear", padding_mode="border"))
        np.testing.assert_allclose(out, exact, atol=1e-4)

    def test_grads_flow(self):
        src = jnp.asarray(np.random.RandomState(5).randn(1, 16, 16, 1).astype(np.float32))
        theta = jnp.asarray([[[1.0, 0.02, 0.0], [0.01, 1.0, 0.0]]])

        def loss(th, s):
            return jnp.sum(warp_affine_separable(s, th, mode="bilinear", interpret=True) ** 2)

        gt, gs = jax.grad(loss, argnums=(0, 1))(theta, src)
        assert np.isfinite(np.asarray(gt)).all() and np.abs(np.asarray(gt)).sum() > 0
        assert np.abs(np.asarray(gs)).sum() > 0


class TestWarpV2:
    """NHWC-native (stride=C) warp formulation vs the original v1 — same
    math, different data layout (the layout-copy-tax attack)."""

    def _theta(self, n, seed=3):
        r = np.random.RandomState(seed)
        ang = r.uniform(-0.1, 0.1, n)
        th = np.zeros((n, 2, 3), np.float32)
        th[:, 0, 0] = np.cos(ang) * r.uniform(0.9, 1.1, n)
        th[:, 0, 1] = -np.sin(ang)
        th[:, 1, 0] = np.sin(ang)
        th[:, 1, 1] = np.cos(ang) * r.uniform(0.9, 1.1, n)
        th[:, 0, 2] = r.uniform(-0.1, 0.1, n)
        th[:, 1, 2] = r.uniform(-0.1, 0.1, n)
        return th

    @pytest.mark.parametrize("mode", ["bilinear", "bicubic"])
    def test_v1_v2_outputs_identical(self, mode):
        from tfcgan_tpu.ops.pallas_kernels.resample import (
            _warp_separable_v1, _warp_separable_v2)

        r = np.random.RandomState(4)
        src = jnp.asarray(r.randn(2, 32, 32, 3).astype(np.float32))
        th = jnp.asarray(self._theta(2))
        kmode = "linear" if mode == "bilinear" else "cubic"
        o1 = np.asarray(_warp_separable_v1(src, th, kmode))
        o2 = np.asarray(_warp_separable_v2(src, th, kmode))
        np.testing.assert_allclose(o2, o1, atol=2e-5)

    def test_v1_v2_grads_identical(self):
        from tfcgan_tpu.ops.pallas_kernels.resample import (
            _warp_separable_v1, _warp_separable_v2)

        r = np.random.RandomState(5)
        src = jnp.asarray(r.randn(2, 16, 16, 3).astype(np.float32))
        th = jnp.asarray(self._theta(2, seed=6))
        tgt = jnp.asarray(r.randn(2, 16, 16, 3).astype(np.float32))

        def loss(fn):
            return lambda s, t: jnp.mean((fn(s, t, "cubic") - tgt) ** 2)

        g1s, g1t = jax.grad(loss(_warp_separable_v1), argnums=(0, 1))(src, th)
        g2s, g2t = jax.grad(loss(_warp_separable_v2), argnums=(0, 1))(src, th)
        np.testing.assert_allclose(np.asarray(g2s), np.asarray(g1s), atol=2e-5)
        np.testing.assert_allclose(np.asarray(g2t), np.asarray(g1t), atol=2e-4)

    @pytest.mark.parametrize("mode", ["linear", "cubic"])
    def test_strided_resample_matches_per_channel(self, mode):
        """stride=C channel-interleaved kernel == C independent stride=1
        resamples, incl. the border-mass adjoint (via grads)."""
        from tfcgan_tpu.ops.pallas_kernels.resample import resample_affine_lanes

        r = np.random.RandomState(7)
        R, W, C = 8, 32, 3
        x = r.randn(R, W, C).astype(np.float32)
        p = r.uniform(0.6, 1.5, R).astype(np.float32)
        q = r.uniform(-6, 2, R).astype(np.float32)  # runs off both edges

        def f_strided(xi):
            return resample_affine_lanes(
                xi.reshape(R, W * C), jnp.asarray(p), jnp.asarray(q),
                W, mode, True, C)

        def f_loop(xi):
            outs = [resample_affine_lanes(xi[..., c], jnp.asarray(p),
                                          jnp.asarray(q), W, mode, True)
                    for c in range(C)]
            return jnp.stack(outs, axis=-1).reshape(R, W * C)

        xj = jnp.asarray(x)
        np.testing.assert_allclose(np.asarray(f_strided(xj)),
                                   np.asarray(f_loop(xj)), atol=1e-5)
        ct = jnp.asarray(r.randn(R, W * C).astype(np.float32))
        g_s = jax.grad(lambda xi: jnp.sum(f_strided(xi) * ct))(xj)
        g_l = jax.grad(lambda xi: jnp.sum(f_loop(xi) * ct))(xj)
        np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_l), atol=1e-4)


class TestBlurPoolPallas:
    @pytest.mark.parametrize("stride", [1, 2])
    @pytest.mark.parametrize("shape", [(2, 32, 32, 16), (1, 16, 16, 64)])
    def test_matches_xla_blurpool(self, stride, shape):
        rng = np.random.RandomState(6)
        x = jnp.asarray(rng.randn(*shape).astype(np.float32))
        got = np.asarray(blur_pool_pallas(x, stride=stride, interpret=True))
        want = np.asarray(ops.blur_pool(x, stride=stride))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_bf16(self):
        rng = np.random.RandomState(7)
        x = jnp.asarray(rng.randn(1, 16, 16, 8).astype(np.float32)).astype(jnp.bfloat16)
        got = np.asarray(blur_pool_pallas(x, stride=2, interpret=True).astype(jnp.float32))
        want = np.asarray(ops.blur_pool(x, stride=2).astype(jnp.float32))
        np.testing.assert_allclose(got, want, atol=3e-2)

    @pytest.mark.parametrize("stride", [1, 2])
    @pytest.mark.parametrize("shape", [(1, 15, 17, 5), (1, 255, 9, 2),
                                       (2, 31, 31, 8), (1, 8, 8, 256)])
    def test_odd_shapes_and_exact_vjp(self, stride, shape):
        # odd H/W (every D blur input is 2^k - 1 rows) + the custom adjoint
        # must equal autodiff of the direct padded form
        from tfcgan_tpu.ops.blurpool import blur_pool_padded
        from tfcgan_tpu.ops.pallas_kernels.blurpool import blur_pool_fast

        rng = np.random.RandomState(8)
        x = jnp.asarray(rng.randn(*shape).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(blur_pool_fast(x, stride)),
            np.asarray(blur_pool_padded(x, stride=stride)), atol=1e-5)
        g_fast = jax.grad(lambda v: (blur_pool_fast(v, stride) ** 2).sum())(x)
        g_ref = jax.grad(
            lambda v: (blur_pool_padded(v, stride=stride) ** 2).sum())(x)
        np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_ref),
                                   atol=1e-4)


class TestBorderAdjointExact:
    """VERDICT round-2 #7: the border-clamped adjoint must match autodiff of
    a clamped-forward reference exactly, including warps pushing content far
    off-edge (the previously-approximate `if border:` branch)."""

    def _reference_resample(self, x, p, q, w_out, mode):
        # differentiable jnp reference with the forward's exact clip semantics;
        # jax.grad of this IS the true adjoint
        from tfcgan_tpu.ops.pallas_kernels.resample import _kernel_fns

        kfn, _, hs = _kernel_fns(mode)
        cols = jnp.arange(w_out, dtype=jnp.float32)[None, :]
        pos = p[:, None] * cols + q[:, None]
        i0 = jnp.floor(pos).astype(jnp.int32)
        t = pos - jnp.floor(pos)
        acc = jnp.zeros((x.shape[0], w_out), jnp.float32)
        for k in range(-hs + 1, hs + 1):
            ic = jnp.clip(i0 + k, 0, x.shape[1] - 1)
            acc = acc + jnp.take_along_axis(x, ic, axis=1) * kfn(t - k)
        return acc

    @pytest.mark.parametrize("mode", ["linear", "cubic"])
    @pytest.mark.parametrize("shift", [0.0, 3.7, 25.0, -25.0, 200.0])
    def test_adjoint_matches_autodiff_reference(self, mode, shift):
        from tfcgan_tpu.ops.pallas_kernels.resample import resample_affine_lanes

        rng = np.random.RandomState(0)
        rows, w = 8, 128
        x = jnp.asarray(rng.randn(rows, w).astype(np.float32))
        p = jnp.asarray(rng.uniform(0.6, 1.7, rows).astype(np.float32))
        q = jnp.asarray((rng.uniform(-2, 2, rows) + shift).astype(np.float32))
        g = jnp.asarray(rng.randn(rows, w).astype(np.float32))

        def loss_pallas(x, p, q):
            return jnp.vdot(resample_affine_lanes(x, p, q, w, mode, True), g)

        def loss_ref(x, p, q):
            return jnp.vdot(self._reference_resample(x, p, q, w, mode), g)

        fwd_p = resample_affine_lanes(x, p, q, w, mode, True)
        fwd_r = self._reference_resample(x, p, q, w, mode)
        np.testing.assert_allclose(np.asarray(fwd_p), np.asarray(fwd_r),
                                   atol=1e-4, rtol=1e-4)
        gx_p, gp_p, gq_p = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, p, q)
        gx_r, gp_r, gq_r = jax.grad(loss_ref, argnums=(0, 1, 2))(x, p, q)
        np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r),
                                   atol=2e-4, rtol=2e-4)
        np.testing.assert_allclose(np.asarray(gp_p), np.asarray(gp_r),
                                   atol=2e-3, rtol=2e-3)
        np.testing.assert_allclose(np.asarray(gq_p), np.asarray(gq_r),
                                   atol=2e-3, rtol=2e-3)

    def test_warp_edge_grads_match_torch_exact_path(self):
        """Border-heavy pure translation: separable-warp gradients vs the
        torch-exact ops.warp.grid_sample VJP (translation is the case where
        the two formulations agree exactly, isolating border handling)."""
        from tfcgan_tpu.ops.warp import affine_grid, grid_sample

        rng = np.random.RandomState(1)
        src = jnp.asarray(rng.randn(2, 32, 128, 3).astype(np.float32))
        # 0.5 in normalized coords pushes a quarter of the image off-edge
        theta = jnp.asarray(
            np.stack([np.array([[1, 0, 0.5], [0, 1, -0.4]], np.float32),
                      np.array([[1, 0, -0.6], [0, 1, 0.3]], np.float32)])
        )
        g = jnp.asarray(rng.randn(2, 32, 128, 3).astype(np.float32))

        def loss_sep(src, th):
            return jnp.vdot(warp_affine_separable(src, th, mode="bilinear"), g)

        def loss_exact(src, th):
            grid = affine_grid(th, (2, 32, 128), align_corners=True)
            return jnp.vdot(
                grid_sample(src, grid, mode="bilinear", padding_mode="border",
                            align_corners=True), g
            )

        np.testing.assert_allclose(
            np.asarray(loss_sep(src, theta)), np.asarray(loss_exact(src, theta)),
            rtol=1e-4,
        )
        gs_s, gt_s = jax.grad(loss_sep, argnums=(0, 1))(src, theta)
        gs_e, gt_e = jax.grad(loss_exact, argnums=(0, 1))(src, theta)
        np.testing.assert_allclose(np.asarray(gs_s), np.asarray(gs_e),
                                   atol=5e-4, rtol=5e-4)
        # translation grads (last column); rotation entries differ by design
        np.testing.assert_allclose(np.asarray(gt_s[:, :, 2]),
                                   np.asarray(gt_e[:, :, 2]), rtol=5e-3)
