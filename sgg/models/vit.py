"""ViT-B/16 patch-token encoder with Pallas flash-attention.

BASELINE.json:10: "ViT-B/16 encoder + transformer triple decoder with Pallas
flash-attention over patch tokens". 224px / 16 → 196 patch tokens of width
768; 12 pre-LN transformer blocks, 12 heads. Self-attention over the patch
axis routes through the blockwise flash kernel when ``use_pallas=True``
(SURVEY.md §5 "the long-sequence axis is the ViT patch axis").
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax.numpy as jnp

from sgg.kernels.flash_attention import attention_reference, flash_attention


class MultiHeadSelfAttention(nn.Module):
    """Patch self-attention; the inner (q,k,v)→o op is pluggable so the
    sequence-parallel wrappers (ring/Ulysses over a mesh axis) drop in via
    ``attn_fn`` without the module knowing about meshes."""

    num_heads: int
    use_pallas: bool = False
    attn_fn: Callable | None = None  # overrides kernel choice when set
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # [B, S, E]
        B, S, E = x.shape
        H = self.num_heads
        D = E // H
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        qkv = nn.Dense(3 * E, name="qkv", **kw)(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):  # [B, S, E] → [B, H, S, D]
            return t.reshape(B, S, H, D).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        if self.attn_fn is not None:
            attend = self.attn_fn
        else:
            attend = flash_attention if self.use_pallas else attention_reference
        o = attend(q, k, v)  # [B, H, S, D]
        o = o.transpose(0, 2, 1, 3).reshape(B, S, E)
        return nn.Dense(E, name="out", **kw)(o)


class TransformerBlock(nn.Module):
    num_heads: int
    mlp_ratio: int = 4
    use_pallas: bool = False
    attn_fn: "Callable | None" = None
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        y = nn.LayerNorm(name="ln1", **kw)(x)
        x = x + MultiHeadSelfAttention(
            self.num_heads, use_pallas=self.use_pallas, attn_fn=self.attn_fn,
            name="attn", **kw,
        )(y)
        y = nn.LayerNorm(name="ln2", **kw)(x)
        h = nn.Dense(x.shape[-1] * self.mlp_ratio, name="mlp1", **kw)(y)
        h = nn.gelu(h)
        x = x + nn.Dense(x.shape[-1], name="mlp2", **kw)(h)
        return x


class ViTB16Features(nn.Module):
    """Images [B, H, W, 3] (normalized) → patch tokens [B, (H/16)(W/16), 768]."""

    embed_dim: int = 768
    num_heads: int = 12
    num_layers: int = 12
    patch: int = 16
    mlp_ratio: int = 4
    use_pallas: bool = False
    attn_fn: "Callable | None" = None
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = nn.Conv(
            self.embed_dim, (self.patch, self.patch),
            strides=(self.patch, self.patch), padding="VALID",
            name="patch_embed", **kw,
        )(x)
        B, Hp, Wp, E = x.shape
        x = x.reshape(B, Hp * Wp, E)
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (1, Hp * Wp, E),
            self.param_dtype,
        )
        x = x + pos.astype(self.dtype)
        for i in range(self.num_layers):
            x = TransformerBlock(
                self.num_heads, self.mlp_ratio, use_pallas=self.use_pallas,
                attn_fn=self.attn_fn, name=f"block{i}", **kw,
            )(x)
        return nn.LayerNorm(name="ln_final", **kw)(x)
