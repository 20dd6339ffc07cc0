"""Fused conv+ReLU / conv+BN+ReLU via im2col + the fused matmul kernel.

SURVEY.md §7 ("Pallas conv kernels … fall back strategy: im2col +
fused-matmul formulation"): on TPU the MXU wants big matmuls, so the conv is
lowered to patch extraction (an XLA data-movement op that fuses upstream)
followed by ONE Pallas fused matmul that applies bias, folded batch-norm,
and ReLU in its epilogue. This matches how XLA itself lowers convs on TPU,
but with the epilogue guaranteed fused and the accumulation dtype pinned.

Layout: NHWC activations, HWIO weights (TPU-native).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sgg.kernels.matmul import fused_matmul


def _im2col(x: jnp.ndarray, kh: int, kw: int, stride: int, padding: str):
    """[B,H,W,C] → patches [B*Ho*Wo, kh*kw*C] matching HWIO weight layout."""
    B, H, W, C = x.shape
    patches = jax.lax.conv_general_dilated_patches(
        x,
        filter_shape=(kh, kw),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # [B, Ho, Wo, C*kh*kw] with feature-major ordering (C, kh, kw)
    Ho, Wo = patches.shape[1], patches.shape[2]
    # conv_general_dilated_patches orders the feature dim as (C, kh, kw);
    # reorder to (kh, kw, C) to match a reshaped HWIO kernel.
    p = patches.reshape(B, Ho, Wo, C, kh * kw)
    p = jnp.moveaxis(p, 3, -1)  # [..., kh*kw, C]
    return p.reshape(B * Ho * Wo, kh * kw * C), (B, Ho, Wo)


def conv2d_fused(
    x: jnp.ndarray,  # [B, H, W, Cin]
    w: jnp.ndarray,  # [kh, kw, Cin, Cout] (HWIO)
    bias: jnp.ndarray | None = None,  # [Cout]
    scale: jnp.ndarray | None = None,  # [Cout] folded-BN scale
    stride: int = 1,
    padding: str = "SAME",
    relu: bool = True,
    use_pallas: bool = True,
    impl: str | None = None,
) -> jnp.ndarray:
    """relu(scale · conv(x, w) + bias), epilogue fused with the conv.

    ``impl``: 'direct' (Pallas direct conv, patches assembled in VMEM —
    stride-1 SAME only), 'pallas' (im2col + Mosaic fused matmul), 'xla'
    (lax.conv; XLA fuses the epilogue into the conv), 'int8' (dynamic PTQ,
    s8×s8→s32 on the MXU — sgg.kernels.quant), or 'auto' (derived
    from ``use_pallas`` when None). Measured on v5e bf16 at the VGG
    conv3/4/5 shapes: XLA conv ~175–190 TFLOP/s (≈96% MFU — these shapes
    are compute-bound), direct Pallas 131–153, im2col Pallas ~35 (patch
    materialization bandwidth). 'auto' therefore routes to 'xla': the XLA
    emitter is at roofline and the direct kernel's measured ceiling is
    ~0.8× it (width-alignment padding; full analysis in conv_direct.py).
    Both Mosaic kernels stay parity-tested for backends/shapes where the
    trade flips.
    """
    if impl is None:
        impl = "auto" if use_pallas else "xla"
    if impl == "auto":
        impl = "xla"
    if impl == "int8":
        from sgg.kernels.quant import conv2d_int8

        return conv2d_int8(
            x, w, bias=bias, scale=scale, stride=stride, padding=padding,
            relu=relu,
        )
    if impl in ("pallas", "direct") and w.shape[0] == 1 and w.shape[1] == 1:
        # A 1×1 conv IS a matmul (VERDICT r2 item 7): skip patch extraction
        # entirely and feed the retuned fused matmul, which matches XLA dot
        # at these K sizes. Any stride reduces to input subsampling first —
        # for k=1, SAME needs no padding and the taps sit at 0, s, 2s, …
        if stride != 1:
            x = x[:, ::stride, ::stride, :]
        B, H, W, Cin = x.shape
        y = fused_matmul(
            x.reshape(B * H * W, Cin), w.reshape(Cin, -1),
            bias=bias, scale=scale, relu=relu, out_dtype=x.dtype,
        )
        return y.reshape(B, H, W, w.shape[-1])
    if impl == "direct":
        kh_, kw_ = w.shape[0], w.shape[1]
        if stride != 1 or padding != "SAME" or kh_ % 2 == 0 or kw_ % 2 == 0:
            impl = "xla"  # outside the direct kernel's scope
        else:
            from sgg.kernels.conv_direct import conv2d_direct

            return conv2d_direct(x, w, bias=bias, scale=scale, relu=relu)
    if impl == "xla":
        return conv2d_reference(
            x, w, bias=bias, scale=scale, stride=stride, padding=padding, relu=relu
        )
    kh, kw, Cin, Cout = w.shape
    cols, (B, Ho, Wo) = _im2col(x, kh, kw, stride, padding)
    w2 = w.reshape(kh * kw * Cin, Cout)
    y = fused_matmul(cols, w2, bias=bias, scale=scale, relu=relu, out_dtype=x.dtype)
    return y.reshape(B, Ho, Wo, Cout)


def conv2d_reference(
    x, w, bias=None, scale=None, stride=1, padding="SAME", relu=True
):
    """Direct lax.conv reference for parity tests."""
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32),
        w.astype(jnp.float32),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if scale is not None:
        y = y * scale.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(x.dtype)


def fold_batchnorm(
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    mean: jnp.ndarray,
    var: jnp.ndarray,
    conv_bias: jnp.ndarray | None = None,
    eps: float = 1e-5,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fold inference-time BN into the fused epilogue's (scale, bias).

    BN(conv(x)+b) = gamma·(conv(x)+b−mean)/sqrt(var+eps) + beta
                  = scale·conv(x) + bias
    """
    inv = gamma * jax.lax.rsqrt(var + eps)
    b = beta - mean * inv
    if conv_bias is not None:
        b = b + conv_bias * inv
    return inv, b
