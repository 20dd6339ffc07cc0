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
``shard_map`` (see :func:`make_sp_attention`). Both are differentiable:
Ulysses via the flash kernel's VJP (all_to_all is linear); ring via a
custom VJP that runs a second, reverse ring — each hop computes that
kv-shard's (dq, dk, dv) partials with the Pallas flash-backward kernels
against the GLOBAL log-sum-exp, and the (k, v, dk, dv) bundle rotates so
every shard accumulates contributions from every device and arrives home
after n hops (a ring-reduce of gradients).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from sgg.kernels.flash_attention import flash_attention, flash_attention_with_lse
from sgg.kernels.flash_attention_bwd import flash_attention_bwd


def _merge(o1, lse1, o2, lse2):
    """Combine two attention partials via the online-softmax rule."""
    lse = jnp.logaddexp(lse1, lse2)  # [B,H,S]
    w1 = jnp.exp(lse1 - lse)[..., None]
    w2 = jnp.exp(lse2 - lse)[..., None]
    return o1.astype(jnp.float32) * w1 + o2.astype(jnp.float32) * w2, lse


def _ring_forward(q, k, v, axis_name, scale):
    """Returns (o, global lse). K/V ride the ring; partials merge online."""
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
    return o, lse


def ring_flash_attention(
    q: jnp.ndarray,  # local [B, H, S_local, D]
    k: jnp.ndarray,
    v: jnp.ndarray,
    axis_name: str,
    scale: float | None = None,
) -> jnp.ndarray:
    """Exact attention over the full (sharded) sequence, differentiable."""
    D = q.shape[-1]
    s = (D**-0.5) if scale is None else scale
    return _ring_fa(q, k, v, axis_name, s)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _ring_fa(q, k, v, axis_name, scale):
    o, _ = _ring_forward(q, k, v, axis_name, scale)
    return o.astype(q.dtype)


def _ring_fa_fwd(q, k, v, axis_name, scale):
    o, lse = _ring_forward(q, k, v, axis_name, scale)
    o = o.astype(q.dtype)
    return o, (q, k, v, o, lse)


def _ring_fa_bwd(axis_name, scale, res, g):
    """Reverse ring: per hop, this device computes the visiting kv-shard's
    (dq, dk, dv) partials against the GLOBAL lse (so per-hop p values are
    exact global softmax terms and partials sum linearly); (k, v, dk, dv)
    rotate together, so after n hops each shard is home carrying gradient
    contributions from every device."""
    q, k, v, o, lse = res
    n = jax.lax.axis_size(axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]

    dq = jnp.zeros(q.shape, jnp.float32)
    k_cur, v_cur = k, v
    dk_cur = jnp.zeros(k.shape, jnp.float32)
    dv_cur = jnp.zeros(v.shape, jnp.float32)
    for step in range(n):
        dq_i, dk_i, dv_i = flash_attention_bwd(
            q, k_cur, v_cur, o, lse, g, scale
        )
        dq = dq + dq_i.astype(jnp.float32)
        dk_cur = dk_cur + dk_i.astype(jnp.float32)
        dv_cur = dv_cur + dv_i.astype(jnp.float32)
        if n > 1:
            # Rotate the kv bundle (with its accumulated grads) every
            # iteration: after n total rotations it is back home.
            k_cur = jax.lax.ppermute(k_cur, axis_name, perm)
            v_cur = jax.lax.ppermute(v_cur, axis_name, perm)
            dk_cur = jax.lax.ppermute(dk_cur, axis_name, perm)
            dv_cur = jax.lax.ppermute(dv_cur, axis_name, perm)
    return dq.astype(q.dtype), dk_cur.astype(k.dtype), dv_cur.astype(v.dtype)


_ring_fa.defvjp(_ring_fa_fwd, _ring_fa_bwd)


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
