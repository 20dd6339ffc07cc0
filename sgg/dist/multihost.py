"""Multi-host initialization and per-process data sharding.

SURVEY.md §2.3: ``jax.distributed.initialize`` + process-indexed data
sharding for multi-host (v4-32 config, BASELINE.json:11). The data loader
calls ``process_shard_info()`` so every host reads a disjoint, covering slice
of the dataset; the mesh spans all hosts' devices and XLA routes gradient
psums over ICI within a slice and DCN across slices.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import jax


def initialize_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize JAX's distributed runtime if running multi-process.

    No-ops when single-process (the common local / single-chip case), so CLIs
    can call it unconditionally. Args fall back to the standard env vars
    (JAX_COORDINATOR_ADDRESS etc.) or cluster auto-detection.
    """
    already = jax.process_count() > 1
    if already:
        return
    explicit = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if explicit or os.environ.get("JAX_NUM_PROCESSES"):
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


@dataclass(frozen=True)
class ProcessShard:
    index: int
    count: int


def process_shard_info() -> ProcessShard:
    return ProcessShard(index=jax.process_index(), count=jax.process_count())


def place_leaf(x, sharding):
    """Place one array onto a (possibly non-addressable) sharding.

    Multi-process JAX forbids ``device_put`` onto non-addressable shardings;
    the supported path is ``make_array_from_process_local_data``. Typed PRNG
    keys are placed via their underlying uint32 data (they reject
    np.asarray) and re-wrapped.
    """
    import numpy as np

    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    dt = getattr(x, "dtype", None)
    if dt is not None and jax.dtypes.issubdtype(dt, jax.dtypes.prng_key):
        data = np.asarray(jax.random.key_data(x))
        g = jax.make_array_from_process_local_data(sharding, data)
        return jax.random.wrap_key_data(g, impl=jax.random.key_impl(x))
    return jax.make_array_from_process_local_data(sharding, np.asarray(x))


def host_local_to_global(tree, sharding):
    """Assemble global arrays (one shared sharding) from per-process data:
    each process contributes its local shard — or the full value, for
    replicated shardings."""
    return jax.tree.map(lambda x: place_leaf(x, sharding), tree)
