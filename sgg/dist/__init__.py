"""sgg.dist — device meshes, sharding rules, collectives, multi-host init.

The TPU-native communication layer (SURVEY.md §2.2–§2.3): the reference has
no distributed backend at all; here every parallelism strategy is expressed
as a mesh axis + sharding rule, and XLA compiles the collectives (psum /
all_gather / reduce_scatter / ppermute / all_to_all) over ICI and DCN.
"""

from sgg.dist.mesh import (
    MeshSpec,
    make_mesh,
    mesh_from_config,
    batch_sharding,
    replicated_sharding,
    local_batch_size,
)
from sgg.dist.multihost import (
    host_local_to_global,
    initialize_multihost,
    process_shard_info,
)
from sgg.dist.sharding import place_state, state_sharding
from sgg.dist.sequence_parallel import (
    make_sp_attention,
    ring_flash_attention,
    ulysses_attention,
)

__all__ = [
    "place_state",
    "state_sharding",
    "make_sp_attention",
    "ring_flash_attention",
    "ulysses_attention",
    "MeshSpec",
    "make_mesh",
    "mesh_from_config",
    "batch_sharding",
    "replicated_sharding",
    "local_batch_size",
    "initialize_multihost",
    "process_shard_info",
    "host_local_to_global",
]
