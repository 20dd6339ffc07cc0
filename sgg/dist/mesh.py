"""Mesh construction and canonical sharding rules.

One place (SURVEY.md §2.3) defining the ``('data', 'model')`` mesh and the
NamedShardings the rest of the framework uses:

  - batches   → P(None, 'data')   (leading axis is the n_critic sub-batch dim)
  - params    → replicated (DP) or sharded ('model') for TP/FSDP modes
  - metrics   → replicated scalars
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
# Sequence axis for DP×SP×PP composition: when MeshSpec.seq > 1 the mesh
# grows a third 'seq' axis between 'data' and 'model', the ring/Ulysses
# attention shards the ViT patch axis over it, and the pipeline keeps its
# stages on 'model' — the two no longer contend for one axis (round-2
# weak #4).
SEQ_AXIS = "seq"
# Expert-parallel hook (SURVEY.md §2.2 EP row): no MoE in scope, but the
# axis name is reserved so an expert dimension can be added to MeshSpec and
# sharding rules without touching call sites.
EXPERT_AXIS = "expert"


@dataclass(frozen=True)
class MeshSpec:
    data: int = -1  # -1 = all devices not used by other axes
    model: int = 1
    # >1 adds a 'seq' axis between 'data' and 'model' so ring/Ulysses SP
    # and the GPipe pipeline compose on one mesh instead of contending for
    # the single 'model' axis.
    seq: int = 1


def make_mesh(spec: MeshSpec | None = None, devices=None) -> Mesh:
    """Build a ('data'[, 'seq'], 'model') mesh over the available devices.

    ``jax.make_mesh`` picks a device order that keeps the trailing ('model')
    axis on physically adjacent chips, so TP collectives ride the fastest ICI
    links and DP gradients the rest. With ``spec.seq > 1`` the mesh is three
    dimensional; existing 2-axis consumers are unaffected because the axis
    only exists when asked for.
    """
    spec = spec or MeshSpec()
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    model = max(1, spec.model)
    seq = max(1, spec.seq)
    if spec.data > 0:
        # Explicit sizes may select a sub-mesh (first data*seq*model devices).
        data = spec.data
        if data * seq * model > n:
            raise ValueError(
                f"mesh {data}x{seq}x{model} needs more than {n} devices"
            )
        devices = devices[: data * seq * model]
    else:
        if n % (seq * model):
            raise ValueError(
                f"seq*model axes {seq}*{model} do not divide device count {n}"
            )
        data = n // (seq * model)
    # Auto axis types → GSPMD propagation: the partitioner infers internal
    # shardings and inserts collectives from the in/out NamedShardings alone,
    # so model code stays mesh-agnostic. (This JAX defaults to Explicit axes,
    # which instead demand per-op out_sharding annotations.)
    if seq > 1:
        shape, names = (data, seq, model), (DATA_AXIS, SEQ_AXIS, MODEL_AXIS)
    else:
        shape, names = (data, model), (DATA_AXIS, MODEL_AXIS)
    auto = (jax.sharding.AxisType.Auto,) * len(shape)
    return jax.make_mesh(shape, names, axis_types=auto, devices=devices)


def batch_sharding(mesh: Mesh, leading_stacked: bool = True) -> NamedSharding:
    """Sharding for train batches: batch dim over 'data'.

    With ``leading_stacked`` the arrays are [n_sub, B, ...] (the fused-step
    super-batch) and B is dim 1; otherwise B is dim 0.
    """
    spec = P(None, DATA_AXIS) if leading_stacked else P(DATA_AXIS)
    return NamedSharding(mesh, spec)


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    """Per-device batch for a global batch sharded over the 'data' axis."""
    n_data = mesh.shape[DATA_AXIS]
    if global_batch % n_data:
        raise ValueError(f"global batch {global_batch} not divisible by {n_data}")
    return global_batch // n_data
