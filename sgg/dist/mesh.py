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
# Expert-parallel hook (SURVEY.md §2.2 EP row): no MoE in scope, but the
# axis name is reserved so an expert dimension can be added to MeshSpec and
# sharding rules without touching call sites.
EXPERT_AXIS = "expert"


@dataclass(frozen=True)
class MeshSpec:
    data: int = -1  # -1 = all devices not used by other axes
    model: int = 1


def make_mesh(spec: MeshSpec | None = None, devices=None) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices.

    ``jax.make_mesh`` picks a device order that keeps the trailing ('model')
    axis on physically adjacent chips, so TP collectives ride the fastest ICI
    links and DP gradients the rest.
    """
    spec = spec or MeshSpec()
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    model = max(1, spec.model)
    if spec.data > 0:
        # Explicit sizes may select a sub-mesh (first data*model devices).
        data = spec.data
        if data * model > n:
            raise ValueError(f"mesh {data}x{model} needs more than {n} devices")
        devices = devices[: data * model]
    else:
        if n % model:
            raise ValueError(
                f"model axis {model} does not divide device count {n}"
            )
        data = n // model
    # Auto axis types → GSPMD propagation: the partitioner infers internal
    # shardings and inserts collectives from the in/out NamedShardings alone,
    # so model code stays mesh-agnostic. (This JAX defaults to Explicit axes,
    # which instead demand per-op out_sharding annotations.)
    auto = (jax.sharding.AxisType.Auto,) * 2
    return jax.make_mesh(
        (data, model), (DATA_AXIS, MODEL_AXIS), axis_types=auto, devices=devices
    )


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
