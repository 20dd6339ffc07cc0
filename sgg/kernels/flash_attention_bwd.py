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
dk/dv. f32 accumulation throughout.

VPU-lean like the forward (flash_attention.py — the kernels are exp/VPU
bound, every [TQ,TK] elementwise pass costs real wall time):
  - the softmax scale is folded into q on the host: the per-block
    ``s * scale`` pass disappears, and kernel B's trailing ``dk * scale``
    is absorbed for free (dk = dsᵀ·q_scaled IS scale·dsᵀ·q);
  - padded-key and padded-query masking arrive as two bias lanes appended
    to q/k — (1, col_bias) and (row_bias, 1) — so the q·kᵀ matmul itself
    lands −1e30 on masked scores; no iota/compare/select passes. lse is
    zero-padded on padded query rows, so exp(−1e30 − 0) = 0 exactly and
    dk/dv rows for the padded tail are exact zeros (same contract as
    before);
  - short sequences (single q/k block — the S=196 production ViT shape)
    batch G (batch·head) rows per program on a no-scratch path; at S=196
    the grid was otherwise 192 tiny programs per kernel.
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


def _dq_body(q, k, v, do, lse, dstat, D):
    """One (q-block, k-block) interaction → dq partial [TQ, D]."""
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (TQ, TK); bias lanes pre-mask padded keys/queries at −1e30
    p = jnp.exp(s - lse)  # rows normalized by (zero-padded) lse
    dp = jax.lax.dot_general(
        do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TQ, TK)
    ds = p * (dp - dstat)
    return jax.lax.dot(
        ds, k.astype(jnp.float32), preferred_element_type=jnp.float32
    )[:, :D]  # bias lanes contribute only beyond D


def _dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, dstat_ref, dq_ref, acc_ref,
    *, scale, n_kb, g,
):
    kb = pl.program_id(2)
    D = dq_ref.shape[-1]

    if n_kb == 1:
        for gi in range(g):
            dq = _dq_body(
                q_ref[gi], k_ref[gi], v_ref[gi],
                do_ref[gi].astype(jnp.float32), lse_ref[gi], dstat_ref[gi], D,
            )
            dq_ref[gi] = (dq * scale).astype(dq_ref.dtype)
        return

    @pl.when(kb == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += _dq_body(
        q_ref[0], k_ref[0], v_ref[0], do_ref[0].astype(jnp.float32),
        lse_ref[0], dstat_ref[0], D,
    )

    @pl.when(kb == n_kb - 1)
    def _():
        dq_ref[0] = (acc_ref[:] * scale).astype(dq_ref.dtype)


def _dkv_body(q, k, v, do, lse, dstat, D):
    """One (k-block, q-block) interaction → (dk, dv) partials [TK, D]."""
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (TQ, TK); bias lanes mask BOTH padded queries (rows — their
    # lse/dstat would otherwise leak) and padded keys (columns — so dk/dv
    # rows for the padded tail are exact zeros).
    p = jnp.exp(s - lse)
    dv = jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (TK, D)
    dp = jax.lax.dot_general(
        do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - dstat)
    dk = jax.lax.dot_general(
        ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[:, :D]  # q's bias lanes land beyond D; scale already folded into q
    return dk, dv


def _dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, dstat_ref, dk_ref, dv_ref,
    dk_acc, dv_acc, *, n_qb, g,
):
    qb = pl.program_id(2)
    D = dk_ref.shape[-1]

    if n_qb == 1:
        for gi in range(g):
            dk, dv = _dkv_body(
                q_ref[gi], k_ref[gi], v_ref[gi],
                do_ref[gi].astype(jnp.float32), lse_ref[gi], dstat_ref[gi], D,
            )
            dk_ref[gi] = dk.astype(dk_ref.dtype)
            dv_ref[gi] = dv.astype(dv_ref.dtype)
        return

    @pl.when(qb == 0)
    def _():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    dk, dv = _dkv_body(
        q_ref[0], k_ref[0], v_ref[0], do_ref[0].astype(jnp.float32),
        lse_ref[0], dstat_ref[0], D,
    )
    dk_acc[:] += dk
    dv_acc[:] += dv

    @pl.when(qb == n_qb - 1)
    def _():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def flash_attention_bwd(
    q, k, v, o, lse, do, scale, block_q: int = 512, block_k: int = 512
):
    """dq, dk, dv for softmax(q·kᵀ·scale)·v, blockwise (no S×S in HBM)."""
    B, H, S, D = q.shape
    BH = B * H

    def flat(t):
        return t.reshape(BH, S, D)

    # Scale folded into q (see module docstring). dq needs one final
    # ``* scale`` per block (it differentiates THROUGH the scaled scores),
    # which the kernel applies on the small [TQ, D] tile.
    q3 = (q * jnp.asarray(scale, q.dtype)).reshape(BH, S, D)
    k3, v3, o3, do3 = map(flat, (k, v, o, do))
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
    if Sq != S or Sk != S:
        # Two mask bias lanes (module docstring): (1, col_bias) masks
        # padded keys, (row_bias, 1) masks padded queries.
        rowb = jnp.where(jnp.arange(Sq)[None, :, None] < S, 0.0, _NEG_INF)
        colb = jnp.where(jnp.arange(Sk)[None, :, None] < S, 0.0, _NEG_INF)
        q3 = jnp.concatenate(
            [q3, jnp.ones_like(q3[..., :1]),
             jnp.broadcast_to(rowb.astype(q3.dtype), (BH, Sq, 1))], axis=-1,
        )
        k3 = jnp.concatenate(
            [k3, jnp.broadcast_to(colb.astype(k3.dtype), (BH, Sk, 1)),
             jnp.ones_like(k3[..., :1])], axis=-1,
        )
        dk_pad = _round_up(D + 2, 8)
        q3 = jnp.pad(q3, ((0, 0), (0, 0), (0, dk_pad - D - 2)))
        k3 = jnp.pad(k3, ((0, 0), (0, 0), (0, dk_pad - D - 2)))
    Dk = q3.shape[-1]

    n_qb, n_kb = Sq // tq, Sk // tk
    G = 1
    if n_qb == 1 and n_kb == 1:
        # Blocks (double-buffered) + ~3 live [tq, tk] f32 intermediates
        # (s/p, dp, ds) per unrolled head — same VMEM accounting as the
        # forward's G heuristic.
        per_head = (
            (tq * Dk + tk * Dk) + (tk + 2 * tq) * D + 2 * tq
        ) * q3.dtype.itemsize * 2 + 3 * tq * tk * 4
        for cand in (8, 4, 2):
            if BH % cand == 0 and cand * per_head <= 10 * 1024 * 1024:
                G = cand
                break

    qspec = pl.BlockSpec((G, tq, Dk), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM)
    qdspec = pl.BlockSpec((G, tq, D), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM)
    kspec_dq = pl.BlockSpec((G, tk, Dk), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM)
    kdspec_dq = pl.BlockSpec((G, tk, D), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM)
    stat_spec = pl.BlockSpec((G, tq, 1), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, n_kb=n_kb, g=G),
        grid=(BH // G, n_qb, n_kb),
        in_specs=[qspec, kspec_dq, kdspec_dq, qdspec, stat_spec, stat_spec],
        out_specs=qdspec,
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
    qspec_b = pl.BlockSpec((G, tq, Dk), lambda b, j, i: (b, i, 0), memory_space=pltpu.VMEM)
    qdspec_b = pl.BlockSpec((G, tq, D), lambda b, j, i: (b, i, 0), memory_space=pltpu.VMEM)
    kspec_b = pl.BlockSpec((G, tk, Dk), lambda b, j, i: (b, j, 0), memory_space=pltpu.VMEM)
    kdspec_b = pl.BlockSpec((G, tk, D), lambda b, j, i: (b, j, 0), memory_space=pltpu.VMEM)
    stat_b = pl.BlockSpec((G, tq, 1), lambda b, j, i: (b, i, 0), memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, n_qb=n_qb, g=G),
        grid=(BH // G, n_kb, n_qb),
        in_specs=[qspec_b, kspec_b, kdspec_b, qdspec_b, stat_b, stat_b],
        out_specs=(kdspec_b, kdspec_b),
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
