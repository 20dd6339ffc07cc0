"""Sequence-parallel attention: ring (context-parallel) and Ulysses modes.

SURVEY.md §2.2 SP/CP/Ulysses rows and §5 "Long-context": the long-sequence
axis here is the ViT *patch* axis. Two TPU-native modes over one mesh axis:

  - **Ring / context parallel**: each device keeps its Q shard resident and
    rotates K/V shards around the ring with ``ppermute`` (ICI
    neighbor-to-neighbor). Partial attention per hop comes from the Pallas
    flash kernel with its log-sum-exp; partials merge with the online-softmax
    rule, so the math equals full attention exactly.
  - **Ulysses**: two ``all_to_all``s re-slice sequence↔heads so every device
    runs FULL-sequence flash attention on a head subset. Cheaper collectives
    for moderate sequence lengths; requires heads % axis_size == 0.

Both are plain functions over the LOCAL shard, to be wrapped in
``shard_map`` (see :func:`make_sp_attention`). Ring is forward-only
(inference / frozen encoders); Ulysses is fully differentiable (all_to_all
is linear and the flash kernel has a VJP).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from sgg.kernels.flash_attention import flash_attention, flash_attention_with_lse


def _merge(o1, lse1, o2, lse2):
    """Combine two attention partials via the online-softmax rule."""
    lse = jnp.logaddexp(lse1, lse2)  # [B,H,S]
    w1 = jnp.exp(lse1 - lse)[..., None]
    w2 = jnp.exp(lse2 - lse)[..., None]
    return o1.astype(jnp.float32) * w1 + o2.astype(jnp.float32) * w2, lse


def ring_flash_attention(
    q: jnp.ndarray,  # local [B, H, S_local, D]
    k: jnp.ndarray,
    v: jnp.ndarray,
    axis_name: str,
    scale: float | None = None,
) -> jnp.ndarray:
    """Exact attention over the full (sharded) sequence; K/V ride the ring."""
    n = jax.lax.axis_size(axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]

    o, lse = flash_attention_with_lse(q, k, v, scale)
    o = o.astype(jnp.float32)
    k_cur, v_cur = k, v
    for _ in range(n - 1):  # n is static (mesh shape) → unrolled
        k_cur = jax.lax.ppermute(k_cur, axis_name, perm)
        v_cur = jax.lax.ppermute(v_cur, axis_name, perm)
        o_i, lse_i = flash_attention_with_lse(q, k_cur, v_cur, scale)
        o, lse = _merge(o, lse, o_i, lse_i)
    return o.astype(q.dtype)


def ulysses_attention(
    q: jnp.ndarray,  # local [B, H, S_local, D]
    k: jnp.ndarray,
    v: jnp.ndarray,
    axis_name: str,
    scale: float | None = None,
) -> jnp.ndarray:
    """Heads↔sequence all-to-all, full-sequence flash per device, inverse."""
    n = jax.lax.axis_size(axis_name)
    H = q.shape[1]
    if H % n:
        raise ValueError(f"ulysses needs heads ({H}) divisible by axis size ({n})")

    def to_seq(t):  # [B, H, S/n, D] → [B, H/n, S, D]
        return jax.lax.all_to_all(t, axis_name, split_axis=1, concat_axis=2, tiled=True)

    def to_heads(t):  # inverse
        return jax.lax.all_to_all(t, axis_name, split_axis=2, concat_axis=1, tiled=True)

    o = flash_attention(to_seq(q), to_seq(k), to_seq(v), scale)
    return to_heads(o)


def make_sp_attention(
    mesh: Mesh, mode: str = "ring", seq_axis: str = "data", scale: float | None = None
):
    """shard_map-wrapped sequence-parallel attention on global [B,H,S,D] arrays
    with S sharded over ``seq_axis``."""
    fn = {"ring": ring_flash_attention, "ulysses": ulysses_attention}[mode]
    spec = P(None, None, seq_axis, None)
    return jax.shard_map(
        partial(fn, axis_name=seq_axis, scale=scale),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
