"""Encoder factory: config name → frozen backbone module.

One switch point for the backbone swaps of BASELINE.json configs 2–4.
``precomputed`` means the data pipeline already carries features (the
reference's default: VGG features extracted at preprocess time).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


_IMAGENET_MEAN = (0.485, 0.456, 0.406)
_IMAGENET_STD = (0.229, 0.224, 0.225)


def normalize_for(name: str, images_u8: jnp.ndarray) -> jnp.ndarray:
    """uint8 RGB [B,H,W,3] → the normalization each backbone was trained with."""
    if name == "vgg19":
        from sgg.models.vgg import vgg_preprocess

        return vgg_preprocess(images_u8)
    x = images_u8.astype(jnp.float32) / 255.0
    return (x - jnp.asarray(_IMAGENET_MEAN)) / jnp.asarray(_IMAGENET_STD)


def make_encoder(
    name: str,
    use_pallas: bool = False,
    dtype: jnp.dtype = jnp.float32,
    attn_fn=None,
    image_size: int | None = None,
    moe_experts: int = 0,
    moe_top_k: int = 2,
    moe_ep_mesh=None,
    quant: str = "",
    vit_dims: tuple[int, int, int] = (768, 12, 12),
) -> nn.Module | None:
    """Returns the feature-extractor module, or None for 'precomputed'.

    ``attn_fn`` (ViT only): a (q,k,v)→o override — e.g. a ring/Ulysses
    sequence-parallel wrapper from ``sgg.dist.make_sp_attention``.
    ``image_size`` (ViT only): sizes the learned pos_embed; default 224.
    ``moe_experts`` (ViT only): > 0 swaps each block's dense MLP for a
    top-k MoE layer (sgg.models.moe; EP over a mesh 'expert' axis).
    ``quant``: '' (float) or 'int8' — dynamic-PTQ inference tier
    (sgg.kernels.quant): VGG/ResNet convs and ViT block projections run
    s8×s8→s32 on the MXU (2× bf16 peak on v5e). Inference only — do not
    train through it.
    ``vit_dims`` (ViT only): (embed_dim, num_layers, num_heads) — the
    ModelConfig.vit_dims property; (768, 12, 12) is the true B/16.
    """
    if quant not in ("", "int8"):
        raise ValueError(f"unknown quant mode {quant!r} (want '' or 'int8')")
    if name == "precomputed":
        return None
    if name == "vgg19":
        from sgg.models.vgg import VGG19Features

        return VGG19Features(
            use_pallas=use_pallas, dtype=dtype,
            conv_impl="int8" if quant == "int8" else None,
        )
    if name == "resnet50":
        from sgg.models.resnet import ResNet50Features

        return ResNet50Features(
            use_pallas=use_pallas, dtype=dtype,
            conv_impl="int8" if quant == "int8" else None,
        )
    if name == "vit_b16":
        from sgg.models.vit import ViTB16Features

        dot_general = None
        if quant == "int8":
            from sgg.kernels.quant import int8_dot_general

            dot_general = int8_dot_general
        patches = ((image_size or 224) // 16) ** 2
        dim, layers, heads = vit_dims
        return ViTB16Features(
            use_pallas=use_pallas, dtype=dtype, attn_fn=attn_fn,
            num_patches=patches, moe_experts=moe_experts,
            moe_top_k=moe_top_k, moe_ep_mesh=moe_ep_mesh,
            dot_general=dot_general,
            embed_dim=dim, num_layers=layers, num_heads=heads,
        )
    raise ValueError(f"unknown encoder {name!r}")
