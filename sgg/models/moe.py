"""Mixture-of-Experts MLP with expert parallelism (SURVEY.md §2.2 EP row).

Upgrades the reserved 'expert' mesh-axis hook (`sgg/dist/mesh.py EXPERT_AXIS`)
to a working tier: a top-k-routed MoE feed-forward layer that replaces the
dense MLP inside ViT transformer blocks, plus a shard_map expert-parallel
execution path (`sgg/dist/expert_parallel.py`) that exchanges token groups
with ONE tiled all_to_all per direction over the 'expert' axis.

TPU-first design (GShard/Switch dispatch, not a port of any CUDA MoE):
  - Routing is DENSE einsum algebra over static shapes — a [G, S, E, C]
    combine tensor built from one-hots, no sorting, no dynamic shapes, so
    the whole layer stays jit/MXU friendly.
  - Capacity C = ceil(top_k · S · capacity_factor / E) bounds per-expert
    work statically; overflow tokens are dropped by the keep mask exactly
    like the public GShard formulation.
  - The functional core (:func:`moe_forward`) takes params explicitly so the
    expert-parallel shard_map wrapper can split it around the all_to_all
    without flax module plumbing; :class:`MoEMLP` is the thin module face.

The reference has no MoE (its generator is a single-path LSTM); this exists
because EP is one of SURVEY §2.2's first-class parallelism strategies and
the framework's decoders/encoders are the natural host.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class MoEDims(NamedTuple):
    num_experts: int
    top_k: int
    capacity: int


def moe_capacity(
    num_experts: int, top_k: int, seq_len: int, capacity_factor: float
) -> int:
    """Static per-expert per-group slot count."""
    return max(1, math.ceil(top_k * seq_len * capacity_factor / num_experts))


def moe_routing(
    router_logits: jnp.ndarray,  # [G, S, E] (any float dtype)
    top_k: int,
    capacity: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Router logits → (combine [G, S, E, C] f32, aux_loss scalar f32).

    Iterative top-k (argmax, mask, repeat — no sort), gates renormalized over
    the kept experts, GShard-style positional capacity: tokens claim expert
    slots in sequence order, k=0 choices before k=1, droppped beyond C.
    ``dispatch`` is just ``combine > 0``; callers derive it.

    aux_loss is the Switch load-balance term E · Σ_e f_e · P_e with f_e the
    fraction of tokens whose TOP-1 choice is e and P_e the mean router
    probability — minimized (=1) by a uniform router.
    """
    G, S, E = router_logits.shape
    probs = jax.nn.softmax(router_logits.astype(jnp.float32), axis=-1)

    masks, gates = [], []
    p = probs
    for _ in range(top_k):
        idx = jnp.argmax(p, axis=-1)
        oh = jax.nn.one_hot(idx, E, dtype=jnp.float32)  # [G, S, E]
        masks.append(oh)
        gates.append((probs * oh).sum(-1))  # gate from ORIGINAL probs
        p = p * (1.0 - oh)

    denom = jnp.maximum(sum(gates), 1e-9)
    combine = jnp.zeros((G, S, E, capacity), jnp.float32)
    used = jnp.zeros((G, E), jnp.float32)  # kept slots so far per expert
    for oh, gate in zip(masks, gates):
        # Position each token would take inside its expert's buffer.
        pos = jnp.cumsum(oh, axis=1) - oh + used[:, None, :]
        keep = oh * (pos < capacity)
        slot = jax.nn.one_hot((pos * keep).astype(jnp.int32), capacity)
        combine = combine + (gate / denom)[..., None, None] * (
            keep[..., None] * slot
        )
        used = used + keep.sum(axis=1)

    f = masks[0].mean(axis=(0, 1))  # top-1 token fraction per expert
    P = probs.mean(axis=(0, 1))
    aux = E * jnp.sum(f * P)
    return combine, aux


def moe_expert_ffn(
    wi: jnp.ndarray,  # [E, M, H]
    wo: jnp.ndarray,  # [E, H, M]
    xe: jnp.ndarray,  # [E, G, C, M] dispatched tokens
) -> jnp.ndarray:
    """Per-expert GELU MLP over dispatched token buffers (batched einsum —
    one [E·G·C, M]×[M, H] contraction per expert on the MXU)."""
    h = jax.nn.gelu(jnp.einsum("egcm,emh->egch", xe, wi))
    return jnp.einsum("egch,ehm->egcm", h, wo)


def moe_forward(
    params: dict,
    x: jnp.ndarray,  # [G, S, M]
    top_k: int,
    capacity: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Single-device (or GSPMD) MoE layer: returns (y [G, S, M], aux_loss).

    ``params``: ``router`` [M, E], ``wi`` [E, M, H], ``wo`` [E, H, M].
    The expert-parallel variant (`sgg.dist.expert_parallel.moe_forward_ep`)
    computes exactly this function, exchanging the dispatched buffers over
    the 'expert' mesh axis; a parity test pins the two together.
    """
    dtype = x.dtype
    logits = jnp.einsum("gsm,me->gse", x.astype(jnp.float32),
                        params["router"].astype(jnp.float32))
    combine, aux = moe_routing(logits, top_k, capacity)
    dispatch = (combine > 0).astype(dtype)
    xe = jnp.einsum("gsec,gsm->egcm", dispatch, x)
    ye = moe_expert_ffn(params["wi"].astype(dtype),
                        params["wo"].astype(dtype), xe)
    y = jnp.einsum("gsec,egcm->gsm", combine.astype(dtype), ye)
    return y.astype(dtype), aux


class MoEMLP(nn.Module):
    """Drop-in MoE replacement for a transformer block's dense MLP.

    Sows the load-balance loss into the ``"moe"`` collection
    (``mutable=["moe"]`` at apply time to collect; inference can ignore it).

    ``ep_mesh``: a Mesh with an 'expert' axis routes the layer through the
    shard_map expert-parallel path (`sgg.dist.expert_parallel`) — experts
    sharded over the axis, tokens exchanged with one tiled all_to_all per
    direction. Params enter the shard_map as globals, so the same
    checkpoint works with or without EP.
    """

    num_experts: int
    top_k: int = 2
    capacity_factor: float = 1.25
    mlp_ratio: int = 4
    ep_mesh: jax.sharding.Mesh | None = None
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [G, S, M]
        G, S, M = x.shape
        H = M * self.mlp_ratio
        params = {
            "router": self.param(
                "router", nn.initializers.normal(0.02),
                (M, self.num_experts), self.param_dtype,
            ),
            "wi": self.param(
                "wi", nn.initializers.he_normal(),
                (self.num_experts, M, H), self.param_dtype,
            ),
            "wo": self.param(
                "wo", nn.initializers.he_normal(),
                (self.num_experts, H, M), self.param_dtype,
            ),
        }
        cap = moe_capacity(
            self.num_experts, self.top_k, S, self.capacity_factor
        )
        p = jax.tree.map(lambda w: w.astype(self.dtype), params)
        if self.ep_mesh is not None:
            from sgg.dist.expert_parallel import moe_forward_ep

            y, aux = moe_forward_ep(
                p, x.astype(self.dtype), self.ep_mesh, self.top_k, cap
            )
        else:
            y, aux = moe_forward(p, x.astype(self.dtype), self.top_k, cap)
        self.sow("moe", "aux_loss", aux)
        return y
