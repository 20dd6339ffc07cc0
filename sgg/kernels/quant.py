"""Int8 post-training-quantization tier for encoder inference.

Reference equivalent: NONE — the reference (SURVEY.md §2.1) serves float32
TF1 graphs only. This tier exists because the TPU hardware makes it nearly
free: the v5e MXU's int8 throughput is 2× its bf16 peak (394 TOPS vs
197 TFLOP/s), so a compute-bound encoder forward (ResNet-50 measured at
0.595 MFU, ViT-B/16 at 0.786 — BASELINE.md round-3 sweep) has real headroom
that no float-side tuning can reach.

Scheme: **dynamic symmetric absmax** quantization — no calibration pass, no
stored scales, works on any checkpoint:

- weights: per-output-channel scales (absmax over the contraction dims);
- activations: per-row scales for dense (absmax over the feature dim),
  per-tensor for conv;
- the matmul/conv itself runs s8×s8→s32 on the MXU
  (``preferred_element_type=int32``), dequantized in a float32 epilogue.

Quantizing the *weights* per call costs one O(params) elementwise pass per
dispatch; against a ViT-B/16 forward (~17.5 GFLOP/img × batch) that is <1%
and it keeps the API surgical — no second param pytree, no checkpoint
format change, serving and generate pick it up via ``model.quant='int8'``
or ``--quant int8``.

Entry points:
- :func:`int8_dot_general` — drop-in for ``lax.dot_general`` with the
  Dense-layer calling convention; plugs into ``flax.linen.Dense(dot_general=…)``
  (the ViT encoder threads it through every qkv/out/mlp projection).
- :func:`conv2d_int8` — quantized conv+BN+ReLU with the same fused-epilogue
  contract as ``sgg.kernels.conv.conv2d_fused`` (which dispatches here for
  ``impl='int8'``; VGG-19/ResNet-50 thread it via ``conv_impl``).

Accuracy contract (tests/unit/test_quant.py): per-region cosine similarity
vs the float path ≥ 0.99 on random-init encoders; exact shapes/dtypes
preserved. Throughput is measured on-chip by
``benchmarks/bench_kernels.py bench_int8`` — routing stays measurement-
honest like conv/attention 'auto' (this tier is opt-in, never silently on).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _absmax_scale(x: jnp.ndarray, axis) -> jnp.ndarray:
    """Symmetric absmax scale over ``axis`` (kept), floored to avoid 0/0."""
    a = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axis, keepdims=True)
    return jnp.maximum(a, 1e-12) / 127.0


def _quantize(x: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    q = jnp.round(x.astype(jnp.float32) / scale)
    return jnp.clip(q, -127, 127).astype(jnp.int8)


def int8_dot_general(lhs, rhs, dimension_numbers, precision=None,
                     preferred_element_type=None):
    """``lax.dot_general`` with both operands dynamically quantized to int8.

    Handles the Dense pattern (one contraction dim per side, no batch dims)
    — lhs rows and rhs output-channels each get their own scale, so the
    rank-1 dequant factor is exact (the int32 accumulator is scaled by
    ``row_scale × col_scale``). Any other pattern falls back to the float
    dot unchanged: correctness first, and nothing in this codebase hits it.
    """
    (lc, rc), (lb, rb) = dimension_numbers
    if lb or rb or len(lc) != 1 or len(rc) != 1:
        return lax.dot_general(
            lhs, rhs, dimension_numbers, precision=precision,
            preferred_element_type=preferred_element_type,
        )
    out_dtype = preferred_element_type or jnp.result_type(lhs.dtype, rhs.dtype)
    ls = _absmax_scale(lhs, axis=lc[0])  # [.., 1, ..] at the contraction dim
    rs = _absmax_scale(rhs, axis=rc[0])
    acc = lax.dot_general(
        _quantize(lhs, ls), _quantize(rhs, rs), dimension_numbers,
        preferred_element_type=jnp.int32,
    )
    ls_f = jnp.squeeze(ls, axis=lc[0])  # lhs free dims, in order
    rs_f = jnp.squeeze(rs, axis=rc[0])  # rhs free dims, in order
    scale = ls_f.reshape(ls_f.shape + (1,) * rs_f.ndim) * rs_f
    return (acc.astype(jnp.float32) * scale).astype(out_dtype)


def conv2d_int8(
    x: jnp.ndarray,  # [B, H, W, Cin]
    w: jnp.ndarray,  # [kh, kw, Cin, Cout] (HWIO)
    bias: jnp.ndarray | None = None,  # [Cout]
    scale: jnp.ndarray | None = None,  # [Cout] folded-BN scale
    stride: int = 1,
    padding: str = "SAME",
    relu: bool = True,
) -> jnp.ndarray:
    """relu(scale · dequant(conv_s8(x, w)) + bias), epilogue in float32.

    Activations take ONE per-tensor scale (a per-pixel scale would change
    shape under the conv's spatial reduction — per-tensor is the standard
    PTQ choice for conv stacks); weights are per-output-channel, which the
    epilogue's existing per-channel scale/bias absorbs for free. SAME
    padding pads with quantized zeros — exact, since symmetric quantization
    maps 0.0 → 0.
    """
    xs = _absmax_scale(x, axis=(0, 1, 2, 3))  # [1,1,1,1] per-tensor
    ws = _absmax_scale(w, axis=(0, 1, 2))  # [1,1,1,Cout] per out-channel
    acc = lax.conv_general_dilated(
        _quantize(x, xs), _quantize(w, ws),
        window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    deq = jnp.squeeze(xs) * jnp.squeeze(ws, axis=(0, 1, 2))  # [Cout]
    if scale is not None:
        deq = deq * scale.astype(jnp.float32)
    y = acc.astype(jnp.float32) * deq
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(x.dtype)
