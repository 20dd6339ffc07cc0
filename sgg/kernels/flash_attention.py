"""Blockwise flash-attention Pallas kernel (online softmax).

SURVEY.md §2.1 / BASELINE.json:10: flash-attention over ViT patch tokens —
the S×S score matrix never materializes in HBM; each (batch·head, q-block)
program streams K/V blocks through VMEM, maintaining the running max /
normalizer / accumulator of the online-softmax recurrence in f32 scratch.

Forward is the Pallas kernel; backward (``custom_vjp``) is the standard
flash backward — two q-/kv-stationary Pallas kernels that recompute p
blockwise from the saved (q, k, v, o, lse), so no S×S tensor ever exists
in HBM in either direction (see flash_attention_bwd.py).
Non-TPU backends run the kernels in interpreter mode for parity tests.
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


def _fa_kernel(
    q_ref, k_ref, v_ref, o_ref, lse_ref, acc_ref, m_ref, l_ref, *, scale, s_len, tk
):
    """lse_ref is None when the caller doesn't need the statistic — the
    kernel then has a single output (keeps DCE out of correctness's way)."""
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]  # (TQ, D)
    k = k_ref[0]  # (TK, D)
    v = v_ref[0]  # (TK, D)
    s = (
        jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        * scale
    )  # (TQ, TK)
    # Mask keys beyond the true sequence length (zero-padded K/V tail).
    col = kb * tk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < s_len, s, _NEG_INF)

    m_prev = m_ref[:]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    p = jnp.exp(s - m_new)  # (TQ, TK) f32
    alpha = jnp.exp(m_prev - m_new)  # (TQ, 1)
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot(
        p, v.astype(jnp.float32), preferred_element_type=jnp.float32
    )
    m_ref[:] = m_new

    @pl.when(kb == pl.num_programs(2) - 1)
    def _():
        o_ref[0] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)
        if lse_ref is not None:
            # log-sum-exp per query row — the merge statistic for ring/
            # sequence-parallel partial combination. Stored [BH, Sq, 1] so
            # the (tq, 1) block matches the (tq, 1) scratch layout directly.
            lse_ref[0] = m_ref[:] + jnp.log(l_ref[:])


def _fa_forward(q, k, v, scale, block_q, block_k, return_lse=False):
    B, H, S, D = q.shape
    BH = B * H
    q3 = q.reshape(BH, S, D)
    k3 = k.reshape(BH, S, D)
    v3 = v.reshape(BH, S, D)

    # The lse-carrying kernel needs 128-aligned q tiles (Mosaic stalls on the
    # (tq,1) store otherwise); the plain kernel only needs sublane alignment.
    tq = min(block_q, _round_up(S, 128 if return_lse else 8))
    tk = min(block_k, _round_up(S, 128))
    Sq = _round_up(S, tq)
    Sk = _round_up(S, tk)
    q3 = jnp.pad(q3, ((0, 0), (0, Sq - S), (0, 0)))
    k3 = jnp.pad(k3, ((0, 0), (0, Sk - S), (0, 0)))
    v3 = jnp.pad(v3, ((0, 0), (0, Sk - S), (0, 0)))

    grid = (BH, Sq // tq, Sk // tk)
    qspec = pl.BlockSpec((1, tq, D), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM)
    if return_lse:
        kernel = functools.partial(_fa_kernel, scale=scale, s_len=S, tk=tk)
    else:

        def kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref):
            _fa_kernel(
                q_ref, k_ref, v_ref, o_ref, None, acc_ref, m_ref, l_ref,
                scale=scale, s_len=S, tk=tk,
            )
    result = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            qspec,
            pl.BlockSpec((1, tk, D), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, D), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            qspec,
            pl.BlockSpec((1, tq, 1), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
        ) if return_lse else qspec,
        out_shape=(
            jax.ShapeDtypeStruct((BH, Sq, D), q.dtype),
            jax.ShapeDtypeStruct((BH, Sq, 1), jnp.float32),
        ) if return_lse else jax.ShapeDtypeStruct((BH, Sq, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((tq, D), jnp.float32),
            pltpu.VMEM((tq, 1), jnp.float32),
            pltpu.VMEM((tq, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * BH * Sq * Sk * D,
            bytes_accessed=3 * BH * Sq * D * q.dtype.itemsize,
            transcendentals=BH * Sq * Sk,
        ),
        interpret=_interpret(),
    )(q3, k3, v3)
    if return_lse:
        out, lse = result
        o = out[:, :S, :].reshape(B, H, S, D)
        return o, lse[:, :S, 0].reshape(B, H, S)
    return result[:, :S, :].reshape(B, H, S, D)


def attention_reference(q, k, v, scale=None):
    """Unfused reference: softmax(q·kᵀ·scale)·v in f32 (parity target)."""
    D = q.shape[-1]
    scale = (D**-0.5) if scale is None else scale
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32))
    p = jax.nn.softmax(s * scale, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32)).astype(q.dtype)


def flash_attention_with_lse(
    q, k, v, scale=None, block_q: int = 1024, block_k: int = 1024
):
    """Forward flash attention also returning per-row log-sum-exp [B,H,S] —
    the statistic ring attention needs to merge partial results across
    sequence shards."""
    D = q.shape[-1]
    return _fa_forward(
        q, k, v, (D**-0.5) if scale is None else scale, block_q, block_k,
        return_lse=True,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_attention(
    q: jnp.ndarray,  # [B, H, S, D]
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float | None = None,
    block_q: int = 1024,
    block_k: int = 1024,
) -> jnp.ndarray:
    """Memory-efficient attention: O(S) HBM traffic per query block.

    Default 1024-blocks from an on-chip sweep at [8,12,S,64] bf16 on v5e:
    133.6 TFLOP/s at S=1024 and 66.7 at S=2048 vs ~14.7 for unfused XLA
    attention (9.2×/4.5×); 128-blocks ran at 4 TFLOP/s — the online-softmax
    recurrence between K blocks is the overhead, so maximize block size
    within VMEM (the tq×tk f32 score tile is the budget: 1024² = 4 MB).
    Blocks clamp to the padded sequence for short S."""
    D = q.shape[-1]
    return _fa_forward(q, k, v, (D**-0.5) if scale is None else scale, block_q, block_k)


def _fa_fwd(q, k, v, scale, block_q, block_k):
    D = q.shape[-1]
    s = (D**-0.5) if scale is None else scale
    out, lse = _fa_forward(q, k, v, s, block_q, block_k, return_lse=True)
    return out, (q, k, v, out, lse)


def _fa_bwd(scale, block_q, block_k, res, g):
    q, k, v, o, lse = res
    from sgg.kernels.flash_attention_bwd import flash_attention_bwd

    D = q.shape[-1]
    s = (D**-0.5) if scale is None else scale
    # Backward holds ~4 live (tq, tk) f32 tiles (s, p, dp, ds) in VMEM, so
    # its blocks cap at 512 regardless of the forward's 1024 defaults.
    return flash_attention_bwd(
        q, k, v, o, lse, g, s, min(block_q, 512), min(block_k, 512)
    )


flash_attention.defvjp(_fa_fwd, _fa_bwd)
