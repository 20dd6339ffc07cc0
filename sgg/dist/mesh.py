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
# Expert-parallel axis (SURVEY.md §2.2 EP row): reserved as a hook in
# rounds 1–2, now a real tier — `MeshSpec.expert > 1` grows the axis and
# `sgg.dist.expert_parallel.moe_forward_ep` runs MoE layers over it with
# tokens sharded over ('data', 'expert') jointly (GShard layout).
EXPERT_AXIS = "expert"


@dataclass(frozen=True)
class MeshSpec:
    data: int = -1  # -1 = all devices not used by other axes
    model: int = 1
    # >1 adds a 'seq' axis between 'data' and 'model' so ring/Ulysses SP
    # and the GPipe pipeline compose on one mesh instead of contending for
    # the single 'model' axis.
    seq: int = 1
    # >1 adds an 'expert' axis (between 'seq' and 'model') for MoE layers;
    # outside MoE layers it acts as extra data parallelism.
    expert: int = 1


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
    expert = max(1, getattr(spec, "expert", 1))
    fixed = seq * expert * model
    if spec.data > 0:
        # Explicit sizes may select a sub-mesh (first data*fixed devices).
        data = spec.data
        if data * fixed > n:
            raise ValueError(
                f"mesh {data}x{seq}x{expert}x{model} needs more than "
                f"{n} devices"
            )
        devices = devices[: data * fixed]
    else:
        if n % fixed:
            raise ValueError(
                f"seq*expert*model axes {seq}*{expert}*{model} do not "
                f"divide device count {n}"
            )
        data = n // fixed
    # Auto axis types → GSPMD propagation: the partitioner infers internal
    # shardings and inserts collectives from the in/out NamedShardings alone,
    # so model code stays mesh-agnostic. (This JAX defaults to Explicit axes,
    # which instead demand per-op out_sharding annotations.) The optional
    # axes only exist when asked for, so 2-axis consumers are unaffected.
    shape, names = [data], [DATA_AXIS]
    if seq > 1:
        shape.append(seq), names.append(SEQ_AXIS)
    if expert > 1:
        shape.append(expert), names.append(EXPERT_AXIS)
    shape.append(model), names.append(MODEL_AXIS)
    auto = (jax.sharding.AxisType.Auto,) * len(shape)
    return jax.make_mesh(
        tuple(shape), tuple(names), axis_types=auto, devices=devices
    )


def mesh_from_config(mesh_cfg, devices=None) -> Mesh:
    """Build the mesh a config's ``mesh`` section describes (the train
    CLI's path — keeps every axis knob, including 'expert', reachable from
    `--set mesh.<axis>=N` instead of only from code)."""
    return make_mesh(
        MeshSpec(
            data=mesh_cfg.data, model=mesh_cfg.model, seq=mesh_cfg.seq,
            expert=getattr(mesh_cfg, "expert", 1),
        ),
        devices=devices,
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
