"""Vision Transformer encoder (the STN localizer backbone).

The reference uses ``kornia.contrib.VisionTransformer(image_size=256,
patch_size=64, in_channels=6)`` (``/root/reference/TFC-STN/
TFCGAN_STN21_Original_NewModel3_Official.py:150-165``): conv patch embedding,
CLS token, learned positional embedding, 12 pre-LN transformer blocks
(12 heads, width 768, MLP 3072), returning all 17 token embeddings.

TPU notes: attention over 17 tokens is tiny — the matmuls that matter are the
patch-embed conv and the MLPs, which XLA maps straight onto the MXU. Attention
uses jax.nn.dot_product_attention.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class TransformerBlock(nn.Module):
    dim: int
    heads: int
    mlp_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, dtype=self.dtype, name="attn"
        )(h, h)
        x = x + h
        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(self.mlp_dim, dtype=self.dtype, name="mlp1")(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim, dtype=self.dtype, name="mlp2")(h)
        return x + h


class ViT(nn.Module):
    """(N, H, W, C) -> (N, num_patches + 1, dim) token embeddings."""

    patch_size: int = 64
    dim: int = 768
    depth: int = 12
    heads: int = 12
    mlp_dim: int = 3072
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        n, h, w, _ = x.shape
        p = self.patch_size
        tokens = nn.Conv(
            self.dim, (p, p), strides=(p, p), padding="VALID",
            dtype=self.dtype, name="patch_embed",
        )(x.astype(self.dtype))
        tokens = tokens.reshape(n, -1, self.dim)
        num = tokens.shape[1]
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, self.dim), jnp.float32)
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype), (n, 1, self.dim)), tokens], axis=1
        )
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (1, num + 1, self.dim), jnp.float32
        )
        tokens = tokens + pos.astype(self.dtype)
        for i in range(self.depth):
            tokens = TransformerBlock(
                self.dim, self.heads, self.mlp_dim, dtype=self.dtype, name=f"block{i}"
            )(tokens)
        return nn.LayerNorm(dtype=self.dtype, name="norm")(tokens)
