"""Pallas backward kernels for flash attention.

Standard two-kernel formulation (no S×S materialization in HBM):

  residuals: q, k, v, o, lse (from the forward), upstream grad do
  D_i = Σ_d do_i·o_i                      (precomputed, fused by XLA)
  p_ij = exp(q_i·k_j·scale − lse_i)       (recomputed blockwise in VMEM)
  dv_j = Σ_i p_ij · do_i
  ds_ij = p_ij · (do_i·v_j − D_i)
  dq_i = scale · Σ_j ds_ij · k_j          (kernel A: q-stationary)
  dk_j = scale · Σ_i ds_ij · q_i          (kernel B: kv-stationary, with dv)

Kernel A runs grid (BH, nq, nk) with the K axis innermost accumulating dq;
kernel B runs grid (BH, nk, nq) with the Q axis innermost accumulating
dk/dv. Padded keys/queries are masked via position iota against the true
sequence length. f32 accumulation throughout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, dstat_ref, dq_ref, acc_ref,
    *, scale, s_len, tk,
):
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]  # (TQ, D)
    k = k_ref[0]  # (TK, D)
    v = v_ref[0]  # (TK, D)
    do = do_ref[0].astype(jnp.float32)  # (TQ, D)
    lse = lse_ref[0]  # (TQ, 1)
    dstat = dstat_ref[0]  # (TQ, 1)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (TQ, TK)
    col = kb * tk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < s_len, s, _NEG_INF)
    p = jnp.exp(s - lse)  # (TQ, TK), rows already normalized by lse

    dp = jax.lax.dot_general(
        do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TQ, TK)
    ds = p * (dp - dstat)  # (TQ, TK)
    acc_ref[:] += jax.lax.dot(
        ds, k.astype(jnp.float32), preferred_element_type=jnp.float32
    )

    @pl.when(kb == pl.num_programs(2) - 1)
    def _():
        dq_ref[0] = (acc_ref[:] * scale).astype(dq_ref.dtype)


def _dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, dstat_ref, dk_ref, dv_ref,
    dk_acc, dv_acc, *, scale, s_len, tq, tk,
):
    kb = pl.program_id(1)
    qb = pl.program_id(2)

    @pl.when(qb == 0)
    def _():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q = q_ref[0]  # (TQ, D)
    k = k_ref[0]  # (TK, D)
    v = v_ref[0]  # (TK, D)
    do = do_ref[0].astype(jnp.float32)  # (TQ, D)
    lse = lse_ref[0]  # (TQ, 1)
    dstat = dstat_ref[0]  # (TQ, 1)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (TQ, TK)
    # Mask BOTH padded queries (rows — their lse/dstat are garbage) and
    # padded keys (columns — so dk/dv rows for the padded tail are exact
    # zeros, not garbage the caller must slice off).
    row = qb * tq + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
    col = kb * tk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where((row < s_len) & (col < s_len), s, _NEG_INF)
    p = jnp.exp(s - jnp.where(row < s_len, lse, 0.0))  # (TQ, TK)

    dv_acc[:] += jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (TK, D)
    dp = jax.lax.dot_general(
        do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TQ, TK)
    ds = p * (dp - dstat)
    dk_acc[:] += jax.lax.dot_general(
        ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TK, D)

    @pl.when(qb == pl.num_programs(2) - 1)
    def _():
        dk_ref[0] = (dk_acc[:] * scale).astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def flash_attention_bwd(
    q, k, v, o, lse, do, scale, block_q: int = 512, block_k: int = 512
):
    """dq, dk, dv for softmax(q·kᵀ·scale)·v, blockwise (no S×S in HBM)."""
    B, H, S, D = q.shape
    BH = B * H

    def flat(t):
        return t.reshape(BH, S, D)

    q3, k3, v3, o3, do3 = map(flat, (q, k, v, o, do))
    # D-statistic: rowsum(do · o) — one fused elementwise+reduce in XLA.
    dstat = jnp.sum(
        do3.astype(jnp.float32) * o3.astype(jnp.float32), axis=-1, keepdims=True
    )  # [BH, S, 1]
    lse3 = lse.reshape(BH, S, 1)

    tq = min(block_q, _round_up(S, 128))
    tk = min(block_k, _round_up(S, 128))
    Sq, Sk = _round_up(S, tq), _round_up(S, tk)

    def padq(t):
        return jnp.pad(t, ((0, 0), (0, Sq - S), (0, 0)))

    def padk(t):
        return jnp.pad(t, ((0, 0), (0, Sk - S), (0, 0)))

    q3, o3, do3, lse3, dstat = padq(q3), padq(o3), padq(do3), padq(lse3), padq(dstat)
    k3, v3 = padk(k3), padk(v3)

    qspec = pl.BlockSpec((1, tq, D), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM)
    kspec_dq = pl.BlockSpec((1, tk, D), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM)
    stat_spec = pl.BlockSpec((1, tq, 1), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, s_len=S, tk=tk),
        grid=(BH, Sq // tq, Sk // tk),
        in_specs=[qspec, kspec_dq, kspec_dq, qspec, stat_spec, stat_spec],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct((BH, Sq, D), q.dtype),
        scratch_shapes=[pltpu.VMEM((tq, D), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=5 * BH * Sq * Sk * D,
            bytes_accessed=4 * BH * Sq * D * q.dtype.itemsize,
            transcendentals=BH * Sq * Sk,
        ),
        interpret=_interpret(),
    )(q3, k3, v3, do3, lse3, dstat)

    # kv-stationary pass: grid walks q blocks innermost.
    qspec_b = pl.BlockSpec((1, tq, D), lambda b, j, i: (b, i, 0), memory_space=pltpu.VMEM)
    kspec_b = pl.BlockSpec((1, tk, D), lambda b, j, i: (b, j, 0), memory_space=pltpu.VMEM)
    stat_b = pl.BlockSpec((1, tq, 1), lambda b, j, i: (b, i, 0), memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale, s_len=S, tq=tq, tk=tk),
        grid=(BH, Sk // tk, Sq // tq),
        in_specs=[qspec_b, kspec_b, kspec_b, qspec_b, stat_b, stat_b],
        out_specs=(kspec_b, kspec_b),
        out_shape=(
            jax.ShapeDtypeStruct((BH, Sk, D), k.dtype),
            jax.ShapeDtypeStruct((BH, Sk, D), v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((tk, D), jnp.float32),
            pltpu.VMEM((tk, D), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=5 * BH * Sq * Sk * D,
            bytes_accessed=4 * BH * Sq * D * q.dtype.itemsize,
            transcendentals=BH * Sq * Sk,
        ),
        interpret=_interpret(),
    )(q3, k3, v3, do3, lse3, dstat)

    unflat_q = lambda t: t[:, :S, :].reshape(B, H, S, D)
    return unflat_q(dq), dk[:, :S, :].reshape(B, H, S, D), dv[:, :S, :].reshape(B, H, S, D)
