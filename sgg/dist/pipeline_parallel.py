"""Pipeline parallelism: GPipe-style microbatch pipeline over a mesh axis.

SURVEY.md §2.2 PP row (optional tier): stages live on consecutive devices of
one mesh axis; activations hop stage→stage over ICI with ``ppermute`` while
every stage works on a different microbatch — the classic skewed schedule
(fill, steady state, drain). Written with shard_map + static Python loop
(n_micro + n_stages − 1 ticks, unrolled at trace time: compiler-friendly,
no dynamic shapes).

The stage body must be shape-preserving (layer-block pipelines — the usual
case). Params are stacked [n_stages, …] and sharded over the axis so each
device holds exactly its stage's slice.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def _pipeline_local(
    params,  # local stage params [1, ...] (sharded stack)
    x,  # microbatches [n_micro, mb, ...] (replicated)
    *,
    stage_fn: Callable,
    axis_name: str,
):
    n_stages = jax.lax.axis_size(axis_name)
    stage = jax.lax.axis_index(axis_name)
    n_micro = x.shape[0]
    local_params = jax.tree.map(lambda p: p[0], params)

    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]
    carry = jnp.zeros_like(x[0])  # activation arriving from the left
    out = jnp.zeros_like(x)

    for t in range(n_micro + n_stages - 1):  # static unroll
        # Stage 0 injects microbatch t (while it exists); others use carry.
        mb_idx = min(t, n_micro - 1)
        inp = jnp.where(stage == 0, x[mb_idx], carry)
        y = stage_fn(local_params, inp)
        # Last stage banks microbatch (t - n_stages + 1) when it emerges.
        done_idx = t - (n_stages - 1)
        if done_idx >= 0:
            valid = stage == n_stages - 1
            out = jax.lax.cond(
                valid,
                lambda o: jax.lax.dynamic_update_slice_in_dim(
                    o, y[None], done_idx, axis=0
                ),
                lambda o: o,
                out,
            )
        carry = jax.lax.ppermute(y, axis_name, perm)
    # Only the last stage holds real outputs; broadcast them to all stages.
    out = jnp.where(stage == n_stages - 1, out, jnp.zeros_like(out))
    return jax.lax.psum(out, axis_name)


def pipeline_apply(
    stage_fn: Callable,
    stacked_params,
    x: jnp.ndarray,
    mesh: Mesh,
    axis_name: str = "model",
    num_microbatches: int | None = None,
):
    """Run ``y = stage_{n-1}(…stage_0(x))`` pipelined over ``axis_name``.

    Args:
      stage_fn: (stage_params, activation [mb, …]) → activation [mb, …].
      stacked_params: pytree with leading stage axis [n_stages, …].
      x: full batch [B, …]; split into ``num_microbatches`` (default: one
        per stage) along dim 0.
    """
    n_stages = mesh.shape[axis_name]
    n_micro = num_microbatches or n_stages
    B = x.shape[0]
    if B % n_micro:
        raise ValueError(f"batch {B} not divisible into {n_micro} microbatches")
    xm = x.reshape(n_micro, B // n_micro, *x.shape[1:])

    fn = jax.shard_map(
        partial(_pipeline_local, stage_fn=stage_fn, axis_name=axis_name),
        mesh=mesh,
        in_specs=(P(axis_name), P()),
        out_specs=P(),
        check_vma=False,
    )
    out = fn(stacked_params, xm)
    return out.reshape(B, *x.shape[1:])
