"""Dense-flow Pallas grid_sample vs the torch-exact XLA reference.

The kernel (ops/pallas_kernels/gridsample.py) replaces XLA's pathological TPU
gather for NeMAR's deformable STN (``nemar/models/stn/unet_stn.py:164-178``).
Interpret mode on CPU; Mosaic lowering is exercised by
tools/aot_compile_check.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfcgan_tpu.ops.pallas_kernels import grid_sample_dense
from tfcgan_tpu.ops.warp import affine_grid, grid_sample


def _rand_case(seed, n=2, h=24, w=40, hg=16, wg=33, c=3, scale=1.2):
    rng = np.random.RandomState(seed)
    img = rng.randn(n, h, w, c).astype(np.float32)
    grid = rng.uniform(-scale, scale, size=(n, hg, wg, 2)).astype(np.float32)
    return jnp.asarray(img), jnp.asarray(grid)


class TestGridSampleDense:
    @pytest.mark.parametrize("padding", ["zeros", "border", "reflection"])
    @pytest.mark.parametrize("align", [False, True])
    def test_matches_reference(self, padding, align):
        img, grid = _rand_case(0)
        ref = grid_sample(img, grid, "bilinear", padding, align)
        got = grid_sample_dense(img, grid, "bilinear", padding, align,
                                interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_identity_grid_roundtrip(self):
        img, _ = _rand_case(1, h=16, w=16, c=2)
        theta = jnp.broadcast_to(
            jnp.asarray([[1.0, 0, 0], [0, 1.0, 0]]), (2, 2, 3))
        grid = affine_grid(theta, (2, 16, 16), align_corners=False)
        out = grid_sample_dense(img, grid, "bilinear", "zeros", False,
                                interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(img),
                                   rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("padding", ["zeros", "border"])
    def test_grads_match_reference(self, padding):
        img, grid = _rand_case(2, n=1, h=12, w=20, hg=10, wg=18, c=2)
        cot = jnp.asarray(
            np.random.RandomState(3).randn(1, 10, 18, 2).astype(np.float32))

        def loss(fn):
            def f(im, gr):
                return jnp.sum(fn(im, gr) * cot)
            return jax.grad(f, argnums=(0, 1))(img, grid)

        g_ref = loss(lambda im, gr: grid_sample(im, gr, "bilinear", padding, False))
        g_new = loss(lambda im, gr: grid_sample_dense(
            im, gr, "bilinear", padding, False, interpret=True))
        np.testing.assert_allclose(np.asarray(g_new[0]), np.asarray(g_ref[0]),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(g_new[1]), np.asarray(g_ref[1]),
                                   rtol=1e-4, atol=1e-4)

    def test_far_out_of_range_zeros(self):
        img, grid = _rand_case(4)
        grid = grid * 5.0  # everything way off the image
        out = grid_sample_dense(img, grid, "bilinear", "zeros", False,
                                interpret=True)
        ref = grid_sample(img, grid, "bilinear", "zeros", False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_bf16_input_roundtrips_dtype(self):
        img, grid = _rand_case(5, c=1)
        out = grid_sample_dense(img.astype(jnp.bfloat16), grid,
                                "bilinear", "zeros", False, interpret=True)
        assert out.dtype == jnp.bfloat16

    def test_cpu_backend_fallback_is_reference(self):
        # With interpret unset on the CPU backend, the public entry uses the
        # torch-exact XLA path — bit-identical to grid_sample.
        img, grid = _rand_case(6)
        out = grid_sample_dense(img, grid, "bilinear", "zeros", False)
        ref = grid_sample(img, grid, "bilinear", "zeros", False)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
