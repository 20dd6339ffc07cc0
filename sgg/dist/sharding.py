"""Parameter/state sharding rules: TP and FSDP as PartitionSpec trees.

SURVEY.md §2.2: TP shards the decoder's vocabulary projection and embedding
over the 'model' axis (the dimensions that grow with vocab size [B:9]);
FSDP/ZeRO shards every large parameter (and its Adam moments) over the
'data' axis. Both are expressed as NamedSharding trees handed to ``jit`` —
XLA's GSPMD partitioner inserts the all-gathers/reduce-scatters, laid out
over ICI (SURVEY.md §2.3).

The rules are path-based over the WHOLE ``GANTrainState`` pytree: optimizer
moments live under paths ending with the same param path (…/mu/vocab_proj/
kernel), so one rule shards params and their Adam state consistently —
that's what makes the FSDP mode actually ZeRO-style.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sgg.dist.mesh import DATA_AXIS, EXPERT_AXIS, MODEL_AXIS

# Parameter-name suffixes that carry a vocabulary dimension → TP targets.
_TP_VOCAB_ROWS = ("token_embedding",)  # [V, E] — shard dim 0
_TP_VOCAB_COLS = ("vocab_proj",)  # kernel [E, V] — shard dim 1; bias [V] dim 0


def _path_names(path) -> list[str]:
    out = []
    for k in path:
        if hasattr(k, "key"):
            out.append(str(k.key))
        elif hasattr(k, "name"):
            out.append(str(k.name))
        elif hasattr(k, "idx"):
            out.append(str(k.idx))
    return out


def _tp_spec(names: list[str], shape: tuple[int, ...], mesh: Mesh) -> P | None:
    n_model = mesh.shape[MODEL_AXIS]
    if n_model <= 1:
        return None
    joined = "/".join(names)
    for key in _TP_VOCAB_ROWS:
        if key in joined and len(shape) >= 1 and shape[0] % n_model == 0:
            return P(MODEL_AXIS, *([None] * (len(shape) - 1)))
    for key in _TP_VOCAB_COLS:
        if key in joined:
            if len(shape) == 2 and shape[1] % n_model == 0:
                return P(None, MODEL_AXIS)
            if len(shape) == 1 and shape[0] % n_model == 0:
                return P(MODEL_AXIS)
    return None


def _ep_spec(names: list[str], shape: tuple[int, ...], mesh: Mesh) -> P | None:
    """Expert-parallel storage: MoE expert tensors (wi/wo [E, ..] and their
    Adam moments — same path suffix) shard dim 0 over 'expert', matching the
    shard_map in_specs of sgg.dist.expert_parallel so EP needs no gather.
    The router stays replicated (it is tiny and every device routes)."""
    if EXPERT_AXIS not in mesh.axis_names:
        return None
    n_e = mesh.shape[EXPERT_AXIS]
    if n_e <= 1 or "moe" not in names:
        return None
    if names[-1] in ("wi", "wo") and shape and shape[0] % n_e == 0:
        return P(EXPERT_AXIS, *([None] * (len(shape) - 1)))
    return None


def _fsdp_spec(shape: tuple[int, ...], mesh: Mesh, min_size: int) -> P | None:
    n_data = mesh.shape[DATA_AXIS]
    if n_data <= 1 or int(np.prod(shape)) < min_size:
        return None
    # Shard the largest divisible dimension over 'data'.
    order = sorted(range(len(shape)), key=lambda i: -shape[i])
    for dim in order:
        if shape[dim] % n_data == 0 and shape[dim] >= n_data:
            spec = [None] * len(shape)
            spec[dim] = DATA_AXIS
            return P(*spec)
    return None


def state_sharding(
    abstract_state: Any,
    mesh: Mesh,
    tp: bool = False,
    fsdp: bool = False,
    fsdp_min_size: int = 2**16,
) -> Any:
    """NamedSharding tree for a GANTrainState (params + optimizer moments).

    Precedence: TP rule (vocab dims over 'model'), then FSDP (largest dim
    over 'data'), else replicated. Scalars always replicated.
    """

    def rule(path, leaf):
        shape = tuple(leaf.shape)
        names = _path_names(path)
        # EP first: expert tensors live on the 'expert' axis whenever the
        # mesh has one (storage matches sgg.dist.expert_parallel's compute
        # sharding), independent of the tp/fsdp switches.
        spec = _ep_spec(names, shape, mesh)
        if spec is None and tp:
            spec = _tp_spec(names, shape, mesh)
        if spec is None and fsdp and names and names[0] != "step":
            spec = _fsdp_spec(shape, mesh, fsdp_min_size)
        return NamedSharding(mesh, spec if spec is not None else P())

    return jax.tree_util.tree_map_with_path(rule, abstract_state)


def place_state(state: Any, shardings: Any) -> Any:
    """Place the state according to a sharding tree.

    Multi-process: every host holds the full value (states are built
    host-replicated), so ``make_array_from_callback`` slices each host's
    addressable shards out of it — ``device_put`` onto non-addressable
    shardings is illegal.
    """
    from sgg.dist.multihost import place_leaf

    return jax.tree.map(place_leaf, state, shardings)
