"""Fused tiled matmul with bias/scale/ReLU epilogue — the MXU workhorse.

This is the engine behind the fused conv blocks (SURVEY.md §2.1: "fused
conv+ReLU and conv+BN+ReLU blocks … real Mosaic kernels"): convolutions are
lowered to im2col patches and hit this kernel, which fuses the epilogue
(bias add, folded-BN scale/shift, ReLU) into the matmul's final K step so
activations are written to HBM exactly once.

Design (pallas_guide.md):
  - grid (M/TM, N/TN, K/TK) with K innermost; f32 VMEM accumulator scratch;
  - 128-aligned tiles feeding the 128×128 MXU; inputs upcast-free (bf16 ok,
    accumulation always f32 via preferred_element_type);
  - epilogue applied once per (i,j) tile on the last K step;
  - 512×1024 output tiles: every grid step streams one a-block and one
    b-block from HBM, so the arithmetic-intensity cap is
    2·TM·TN/(TM+TN)/itemsize flops/byte — 341 flops/B at 512×1024 bf16,
    ~273 TFLOP/s against ~800 GB/s HBM. The original 256² tiles capped at
    ~102 TFLOP/s and measured exactly that (47–111 across shapes); this
    retune measures 107 TFLOP/s at [114688,768,768] (= the XLA dot) and
    200 at [8192,2048,2048] (tile sweep: 512×512 gave 85/145, 1024×1024
    regressed or failed compile). Tiles are also padding-aware — N=768
    takes tn=768 over tn=512's 1024-pad.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _matmul_kernel(a_ref, b_ref, scale_ref, bias_ref, out_ref, acc_ref, *, relu):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(
        a_ref[:], b_ref[:], preferred_element_type=jnp.float32
    )

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        y = acc_ref[:] * scale_ref[:] + bias_ref[:]
        if relu:
            y = jnp.maximum(y, 0.0)
        out_ref[:] = y.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("relu", "block_m", "block_n", "block_k", "out_dtype")
)
def fused_matmul(
    a: jnp.ndarray,  # [M, K]
    b: jnp.ndarray,  # [K, N]
    bias: jnp.ndarray | None = None,  # [N]
    scale: jnp.ndarray | None = None,  # [N] (folded BN gamma/sqrt(var))
    relu: bool = False,
    block_m: int = 512,
    block_n: int = 1024,
    block_k: int = 1024,
    out_dtype=None,
) -> jnp.ndarray:
    """relu(scale * (a @ b) + bias) in one Pallas kernel. Returns [M, N]."""
    M, K = a.shape
    K2, N = b.shape
    assert K == K2, (a.shape, b.shape)
    out_dtype = out_dtype or a.dtype

    bias = jnp.zeros((N,), jnp.float32) if bias is None else bias.astype(jnp.float32)
    scale = jnp.ones((N,), jnp.float32) if scale is None else scale.astype(jnp.float32)

    # Pad to tile multiples (static shapes; XLA folds the pads). The N tile
    # is chosen padding-aware: largest tile at minimal padding ratio, so
    # e.g. N=768 takes tn=768 (zero pad) over tn=512 (25% wasted MXU work
    # on the 1024-pad).
    def pick_tile(dim, cap, unit):
        best, best_cost = unit, None
        for t in range(unit, cap + 1, unit):
            cost = (_round_up(dim, t) / max(dim, 1), -t)
            if best_cost is None or cost < best_cost:
                best, best_cost = t, cost
        return min(best, _round_up(dim, unit))

    tm = pick_tile(M, block_m, 8)
    tn = pick_tile(N, block_n, 128)
    tk = min(block_k, _round_up(K, 128))
    Mp, Np, Kp = _round_up(M, tm), _round_up(N, tn), _round_up(K, tk)
    a_p = jnp.pad(a, ((0, Mp - M), (0, Kp - K)))
    b_p = jnp.pad(b, ((0, Kp - K), (0, Np - N)))
    bias_p = jnp.pad(bias, (0, Np - N))[None, :]
    scale_p = jnp.pad(scale, (0, Np - N))[None, :]

    grid = (Mp // tm, Np // tn, Kp // tk)
    out = pl.pallas_call(
        functools.partial(_matmul_kernel, relu=relu),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, tk), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, tn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tm, tn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), out_dtype),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Np * Kp,
            bytes_accessed=(Mp * Kp + Kp * Np + Mp * Np) * a.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(a_p, b_p, scale_p, bias_p)
    return out[:M, :N]


def fused_matmul_reference(a, b, bias=None, scale=None, relu=False, out_dtype=None):
    """jax.lax reference implementation for parity tests."""
    y = jnp.dot(a, b, preferred_element_type=jnp.float32)
    if scale is not None:
        y = y * scale.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(out_dtype or a.dtype)
