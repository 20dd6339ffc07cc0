"""ViT-B/16 patch-token encoder with Pallas flash-attention.

BASELINE.json:10: "ViT-B/16 encoder + transformer triple decoder with Pallas
flash-attention over patch tokens". 224px / 16 → 196 patch tokens of width
768; 12 pre-LN transformer blocks, 12 heads. With ``use_pallas=True`` the
patch-axis self-attention goes through the measured flash/XLA auto-router
(``sgg.kernels.flash_attention.attention``): XLA at the B/16 patch length,
the blockwise flash kernel once S ≥ 512 (SURVEY.md §5 "the long-sequence
axis is the ViT patch axis").
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax.numpy as jnp

from sgg.kernels.flash_attention import attention, attention_reference


class MultiHeadSelfAttention(nn.Module):
    """Patch self-attention; the inner (q,k,v)→o op is pluggable so the
    sequence-parallel wrappers (ring/Ulysses over a mesh axis) drop in via
    ``attn_fn`` without the module knowing about meshes."""

    num_heads: int
    use_pallas: bool = False
    attn_fn: Callable | None = None  # overrides kernel choice when set
    # Pluggable projection dot (e.g. sgg.kernels.quant.int8_dot_general for
    # the PTQ inference tier); None → lax.dot_general.
    dot_general: Callable | None = None
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # [B, S, E]
        B, S, E = x.shape
        H = self.num_heads
        D = E // H
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                  dot_general=self.dot_general)
        qkv = nn.Dense(3 * E, name="qkv", **kw)(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):  # [B, S, E] → [B, H, S, D]
            return t.reshape(B, S, H, D).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        if self.attn_fn is not None:
            attend = self.attn_fn
        else:
            # 'auto' routes flash-vs-XLA by the measured S crossover
            # (flash_attention.attention docstring) — at the B/16 patch
            # length (196) that is XLA; flash takes over at S ≥ 512.
            attend = attention if self.use_pallas else attention_reference
        o = attend(q, k, v)  # [B, H, S, D]
        o = o.transpose(0, 2, 1, 3).reshape(B, S, E)
        return nn.Dense(E, name="out", **kw)(o)


class TransformerBlock(nn.Module):
    num_heads: int
    mlp_ratio: int = 4
    use_pallas: bool = False
    attn_fn: "Callable | None" = None
    # moe_experts > 0 swaps the dense MLP for a top-k MoE layer
    # (sgg.models.moe). Applied to EVERY block so the stack stays
    # homogeneous — pipeline staging stacks block params along a layer dim.
    moe_experts: int = 0
    moe_top_k: int = 2
    moe_ep_mesh: "object | None" = None  # Mesh with an 'expert' axis → EP
    # int8 PTQ hook for every projection Dense (attn qkv/out, mlp1/mlp2);
    # the MoE MLP keeps float experts (its dispatch einsums dominate).
    dot_general: "Callable | None" = None
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        y = nn.LayerNorm(name="ln1", **kw)(x)
        x = x + MultiHeadSelfAttention(
            self.num_heads, use_pallas=self.use_pallas, attn_fn=self.attn_fn,
            dot_general=self.dot_general, name="attn", **kw,
        )(y)
        y = nn.LayerNorm(name="ln2", **kw)(x)
        if self.moe_experts > 0:
            from sgg.models.moe import MoEMLP

            x = x + MoEMLP(
                num_experts=self.moe_experts, top_k=self.moe_top_k,
                mlp_ratio=self.mlp_ratio, ep_mesh=self.moe_ep_mesh,
                name="moe", **kw,
            )(y)
            return x
        dkw = dict(kw, dot_general=self.dot_general)
        h = nn.Dense(x.shape[-1] * self.mlp_ratio, name="mlp1", **dkw)(y)
        h = nn.gelu(h)
        x = x + nn.Dense(x.shape[-1], name="mlp2", **dkw)(h)
        return x


class ViTB16Features(nn.Module):
    """Images [B, H, W, 3] (normalized) → patch tokens [B, (H/16)(W/16), 768].

    Setup-style so ``embed`` / ``final`` are separately applyable (via
    ``module.apply(vars, x, method='embed')``): the pipeline-parallel path
    (sgg.dist.pipeline_parallel.pipeline_vit_features) runs embed and final
    normally and stages the shape-preserving block stack over the 'model'
    mesh axis. Param names (patch_embed, pos_embed, block{i}, ln_final)
    are identical to the original compact layout.
    """

    embed_dim: int = 768
    num_heads: int = 12
    num_layers: int = 12
    patch: int = 16
    mlp_ratio: int = 4
    use_pallas: bool = False
    attn_fn: "Callable | None" = None
    moe_experts: int = 0  # > 0: MoE MLP in every block (sgg.models.moe)
    moe_top_k: int = 2
    moe_ep_mesh: "object | None" = None  # Mesh with an 'expert' axis → EP
    # Pluggable block-projection dot — sgg.kernels.quant.int8_dot_general
    # for the PTQ inference tier. The patch-embed conv stays float: it is
    # <2% of the forward FLOPs and first-layer quantization costs the most
    # accuracy (standard PTQ practice).
    dot_general: "Callable | None" = None
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    num_patches: int = 196  # (image_size / patch)² — 224px default

    def setup(self):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.patch_embed = nn.Conv(
            self.embed_dim, (self.patch, self.patch),
            strides=(self.patch, self.patch), padding="VALID", **kw,
        )
        self.pos_embed = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (1, self.num_patches, self.embed_dim), self.param_dtype,
        )
        self.blocks = [
            TransformerBlock(
                self.num_heads, self.mlp_ratio, use_pallas=self.use_pallas,
                attn_fn=self.attn_fn, moe_experts=self.moe_experts,
                moe_top_k=self.moe_top_k, moe_ep_mesh=self.moe_ep_mesh,
                dot_general=self.dot_general, name=f"block{i}", **kw,
            )
            for i in range(self.num_layers)
        ]
        self.ln_final = nn.LayerNorm(**kw)

    def embed(self, x):
        """Images → position-encoded patch tokens (pre-blocks)."""
        x = self.patch_embed(x.astype(self.dtype))
        B, Hp, Wp, E = x.shape
        assert Hp * Wp == self.num_patches, (
            f"input yields {Hp * Wp} patches; module built for "
            f"{self.num_patches} (set num_patches=(H//patch)*(W//patch))"
        )
        x = x.reshape(B, Hp * Wp, E)
        return x + self.pos_embed.astype(self.dtype)

    def final(self, x):
        return self.ln_final(x)

    def __call__(self, x):
        x = self.embed(x)
        for blk in self.blocks:
            x = blk(x)
        return self.final(x)
