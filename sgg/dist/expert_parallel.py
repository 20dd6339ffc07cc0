"""Expert parallelism: MoE layer execution over the 'expert' mesh axis.

SURVEY.md §2.2 EP row, upgraded from the reserved axis hook to a working
tier. Layout is the standard GShard one, TPU-native:

  - tokens    : sharded over ('data', 'expert') jointly — the expert axis
                doubles as extra data parallelism outside the MoE layer, so
                no device ever holds redundant tokens;
  - experts   : wi/wo sharded over 'expert' (dim 0 = expert index);
  - router    : replicated (it is tiny: [M, E]).

Each device routes its local token groups, builds the dispatched buffers
[E, G_local, C, M], and ONE tiled ``lax.all_to_all`` over 'expert' per
direction exchanges token groups with the devices that own each expert —
the collectives ride ICI, and the per-device expert GEMMs stay MXU-shaped
(static capacity C). This is explicit shard_map, not GSPMD propagation, for
the same reason as the pipeline stage slicing (NOTES.md): replicated→sharded
boundaries inside GSPMD lower to 2-party all-to-all storms; here the
exchange is exactly two collectives by construction.

Parity: `moe_forward_ep` == `sgg.models.moe.moe_forward` on the gathered
batch (tests/dist/test_expert_parallel.py pins it).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from sgg.dist.mesh import DATA_AXIS, EXPERT_AXIS
from sgg.models.moe import moe_expert_ffn, moe_routing


def _moe_local(params, x, *, top_k, capacity, axis):
    """Per-device body: route local tokens, exchange over 'expert', run the
    local expert shard, exchange back, combine. x: [G_l, S, M]."""
    dtype = x.dtype
    logits = jnp.einsum(
        "gsm,me->gse", x.astype(jnp.float32),
        params["router"].astype(jnp.float32),
    )
    combine, aux = moe_routing(logits, top_k, capacity)
    dispatch = (combine > 0).astype(dtype)
    xe = jnp.einsum("gsec,gsm->egcm", dispatch, x)  # [E, G_l, C, M]

    # Exchange: each device keeps its expert slice of every peer's tokens.
    # tiled=True: [E, G_l, C, M] → [E/n_e, G_l·n_e, C, M].
    xg = lax.all_to_all(xe, axis, split_axis=0, concat_axis=1, tiled=True)
    yg = moe_expert_ffn(
        params["wi"].astype(dtype), params["wo"].astype(dtype), xg
    )
    # Inverse exchange: route expert outputs back to the token owners.
    ye = lax.all_to_all(yg, axis, split_axis=1, concat_axis=0, tiled=True)

    y = jnp.einsum("gsec,egcm->gsm", combine.astype(dtype), ye)
    # Load-balance loss as the global mean (replicated on return).
    aux = lax.pmean(lax.pmean(aux, axis), DATA_AXIS)
    return y.astype(dtype), aux


def moe_forward_ep(
    params: dict,
    x: jnp.ndarray,  # [G, S, M] global batch
    mesh: Mesh,
    top_k: int,
    capacity: int,
    expert_axis: str = EXPERT_AXIS,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Expert-parallel MoE forward over a mesh with a '{expert}' axis.

    ``params['wi']/['wo']`` enter with expert dim 0 divisible by the axis
    size; tokens are sharded over ('data', 'expert'). Returns (y, aux_loss)
    with y sharded like x and aux replicated. Differentiable — shard_map
    transposes the all_to_alls in the backward pass.
    """
    n_e = mesh.shape[expert_axis]
    if params["wi"].shape[0] % n_e:
        raise ValueError(
            f"num_experts {params['wi'].shape[0]} not divisible by "
            f"'{expert_axis}' axis size {n_e}"
        )
    tok = P((DATA_AXIS, expert_axis), None, None)
    pspecs = {
        "router": P(),
        "wi": P(expert_axis, None, None),
        "wo": P(expert_axis, None, None),
    }
    fn = shard_map(
        partial(
            _moe_local, top_k=top_k, capacity=capacity, axis=expert_axis,
        ),
        mesh=mesh,
        in_specs=(pspecs, tok),
        out_specs=(tok, P()),
    )
    return fn(params, x)
