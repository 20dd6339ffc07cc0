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
    q_ref, k_ref, v_ref, o_ref, lse_ref, acc_ref, m_ref, l_ref, *, n_kb, g=1,
):
    """lse_ref is None when the caller doesn't need the statistic — the
    kernel then has a single output (keeps DCE out of correctness's way).

    VPU-lean by measurement: this kernel is exp/VPU-bound, not MXU-bound —
    at [8,12,1024,64] bf16 the D=64 and (same-flops) D=128 shapes take the
    SAME wall time (58 vs 118 TFLOP/s), so every full [TQ,TK] elementwise
    pass costs as much as the matmul MACs it shadows. Hence: the softmax
    scale is folded into q by the host wrapper (saves an [S,S] multiply
    pass per block); key-tail masking arrives as a bias lane appended to
    q/k so the matmul itself applies it (saves iota + where passes); and
    the single-k-block case (the norm for patch-length sequences with
    1024-wide blocks) skips the running-max rescale of acc/l entirely.
    This is also the measured verdict on head-packing (round-1 VERDICT #9):
    packing two D=64 heads per 128-lane tile would only speed up matmuls
    the kernel doesn't wait on — the XLA-level 2× penalty of K=64
    contractions (66 vs 140 TFLOP/s) does not apply inside this kernel's
    wall time, so the VPU passes above were the real headroom.
    """
    kb = pl.program_id(2)

    if n_kb == 1:
        # Single k-block: plain softmax, no cross-block recurrence state.
        # Short sequences batch g (batch·head) rows per program — at
        # S=196 the grid is otherwise 192 programs of one tiny [256,256]
        # attention each, and program switching dominates wall time.
        for gi in range(g):
            q = q_ref[gi]
            s = jax.lax.dot_general(
                q, k_ref[gi], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m_new = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp(s - m_new)
            l = jnp.sum(p, axis=1, keepdims=True)
            o_ref[gi] = (
                jax.lax.dot(p, v_ref[gi].astype(jnp.float32),
                            preferred_element_type=jnp.float32) / l
            ).astype(o_ref.dtype)
            if lse_ref is not None:
                lse_ref[gi] = m_new + jnp.log(l)
        return

    q = q_ref[0]  # (TQ, Dk), pre-scaled; Dk carries the mask bias lane
    k = k_ref[0]  # (TK, Dk)
    v = v_ref[0]  # (TK, D)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (TQ, TK); padded-key columns arrive pre-masked at −1e30 via the
    # bias lane the host wrapper appended — no iota/where pass here.

    @pl.when(kb == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

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
    # Fold the softmax scale into q here: one [S, D] multiply instead of a
    # full [S, S] pass per score block inside the (VPU-bound) kernel.
    q3 = (q * jnp.asarray(scale, q.dtype)).reshape(BH, S, D)
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
    if Sk != S:
        # Key-tail masking as a BIAS LANE instead of an iota+where pass:
        # append a ones column to q and a 0 / −1e30 column to k, so the
        # q·kᵀ matmul itself adds −1e30 to every padded-key score. The
        # extra MACs ride free (the kernel is VPU-bound — measured: D=64
        # and D=128 take identical wall time), while the mask's ~3 VPU
        # passes over [TQ, TK] disappear.
        q3 = jnp.concatenate([q3, jnp.ones_like(q3[..., :1])], axis=-1)
        col = jnp.arange(Sk)[None, :, None]
        bias = jnp.where(col < S, 0.0, -1e30).astype(k3.dtype)
        k3 = jnp.concatenate([k3, jnp.broadcast_to(bias, (BH, Sk, 1))], axis=-1)
        dk = _round_up(D + 1, 128)
        q3 = jnp.pad(q3, ((0, 0), (0, 0), (0, dk - D - 1)))
        k3 = jnp.pad(k3, ((0, 0), (0, 0), (0, dk - D - 1)))

    # Heads-per-program batching: only on the single-k-block path (no
    # per-head recurrence scratch), when it divides BH, and within a VMEM
    # budget (blocks are double-buffered; G=8 at S=1024 blows the 16 MB
    # scoped limit — measured compile OOM at 29.4 MB).
    G = 1
    if Sk // tk == 1 and Sq // tq == 1:
        Dk_ = q3.shape[-1]
        # Per-head budget counts the double-buffered blocks AND ~2 live
        # [tq, tk] f32 intermediates (s, p) — the compiler does not fully
        # reuse them across the unrolled head loop (measured: G=2 at
        # S=1024 with the lse output compiles to 20.45 MB scoped VMEM).
        per_head = (
            (tq * Dk_ + tk * Dk_ + tk * D + tq * D) * q3.dtype.itemsize * 2
            + 2 * tq * tk * 4
        )
        for cand in (8, 4, 2):
            if BH % cand == 0 and cand * per_head <= 10 * 1024 * 1024:
                G = cand
                break
    grid = (BH // G, Sq // tq, Sk // tk)
    body = functools.partial(_fa_kernel, n_kb=Sk // tk, g=G)
    Dk = q3.shape[-1]  # D, or D+1 (+pad) when the mask bias lane is present
    ospec = pl.BlockSpec((G, tq, D), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM)
    if return_lse:
        kernel = body
    else:

        def kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref):
            body(q_ref, k_ref, v_ref, o_ref, None, acc_ref, m_ref, l_ref)
    result = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((G, tq, Dk), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, tk, Dk), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, tk, D), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            ospec,
            pl.BlockSpec((G, tq, 1), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
        ) if return_lse else ospec,
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


def attention(q, k, v, scale=None, impl: str = "auto"):
    """Routed attention: ``impl`` = 'flash' | 'xla' | 'auto'.

    'auto' routes BY MEASUREMENT, like conv2d_fused's 'auto' (conv.py):
    on v5e bf16 at [B,H,S,64] the flash kernel wins 74.0 vs 15.3 TFLOP/s
    at S=1024 but LOSES 20.1 vs 52.5 at S=196 (BASELINE.md round-3 kernel
    sweep) — at short S the whole score matrix fits one fused XLA kernel
    and the online-softmax recurrence is pure overhead. Crossover is
    between 196 and 1024; 512 splits it (block sizes clamp to S anyway,
    so ≥512 keeps at least one full 512-row tile per program).
    """
    if impl == "auto":
        impl = "flash" if q.shape[2] >= 512 else "xla"
    if impl == "flash":
        return flash_attention(q, k, v, scale)
    return attention_reference(q, k, v, scale)
