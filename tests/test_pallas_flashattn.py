"""Flash-attention kernel vs the XLA softmax reference (interpret mode).

The kernel rebuilds diffusers' upcast-softmax spatial attention
(``/root/reference/TFC-Diff/prototype_condA.py:59-90`` via AttnDown/Up
blocks) without materializing the score matrix; these tests pin it to the
straightforward XLA computation, forward and backward, and check the
module-level wiring in ``models/diffusion.AttentionBlock``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfcgan_tpu.ops.pallas_kernels.flashattn import (
    flash_attention,
    flash_attention_supported,
)


def _ref(q, k, v, scale):
    # q/k/v: (BH, D, S) — same layout the kernel takes
    s = jnp.einsum("bdq,bdk->bqk", q, k) * scale
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(v.dtype)
    return jnp.einsum("bqk,bdk->bdq", p, v)


def _rand(bh, d, s, dtype, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    mk = lambda kk: jax.random.normal(kk, (bh, d, s), jnp.float32).astype(dtype)
    return mk(ks[0]), mk(ks[1]), mk(ks[2])


class TestFlashAttention:
    @pytest.mark.parametrize("seq", [256, 512])
    def test_forward_matches_xla(self, seq):
        q, k, v = _rand(4, 8, seq, jnp.float32)
        scale = 8 ** -0.5
        out = flash_attention(q, k, v, scale, interpret=True)
        ref = _ref(q, k, v, scale)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-6)

    def test_gradients_match_xla(self):
        q, k, v = _rand(2, 8, 256, jnp.float32, seed=3)
        scale = 8 ** -0.5
        w = jax.random.normal(jax.random.PRNGKey(9), q.shape, jnp.float32)

        loss_fl = lambda q, k, v: jnp.sum(
            w * flash_attention(q, k, v, scale, interpret=True))
        loss_rf = lambda q, k, v: jnp.sum(w * _ref(q, k, v, scale))
        g_fl = jax.grad(loss_fl, argnums=(0, 1, 2))(q, k, v)
        g_rf = jax.grad(loss_rf, argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(g_fl, g_rf, "qkv"):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=3e-5, atol=3e-6,
                err_msg=f"d{name} mismatch")

    def test_wide_head_dim(self):
        # D=64 exercises the sublane dim well past the vreg height
        q, k, v = _rand(2, 64, 256, jnp.float32, seed=5)
        out = flash_attention(q, k, v, 64 ** -0.5, interpret=True)
        ref = _ref(q, k, v, 64 ** -0.5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-6)

    def test_bfloat16_inputs(self):
        q, k, v = _rand(2, 8, 256, jnp.bfloat16, seed=7)
        out = flash_attention(q, k, v, 8 ** -0.5, interpret=True)
        ref = _ref(q, k, v, 8 ** -0.5)  # fp32 softmax inside both paths
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            rtol=2e-2, atol=2e-2)

    def test_supported_predicate(self):
        assert flash_attention_supported(4096, 8)
        assert flash_attention_supported(1024, 8)
        assert not flash_attention_supported(100, 8)   # ragged seq
        assert not flash_attention_supported(128, 8)   # below one q block
        assert not flash_attention_supported(1024, 256)  # head too wide


class TestAttentionBlockFlashWiring:
    def test_module_flash_equals_xla_path(self, monkeypatch):
        from tfcgan_tpu.models.diffusion import AttentionBlock

        x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 64), jnp.float32)
        blk = AttentionBlock()
        params = blk.init(jax.random.PRNGKey(2), x)
        base = blk.apply(params, x)  # CPU default: XLA path
        monkeypatch.setenv("TFCGAN_FLASH_ATTN", "1")  # force kernel (interpret)
        flash = blk.apply(params, x)
        np.testing.assert_allclose(np.asarray(flash), np.asarray(base),
                                   rtol=2e-5, atol=2e-6)
