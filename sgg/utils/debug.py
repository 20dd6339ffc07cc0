"""Numerics debugging and invariant checks (SURVEY.md §5 "race detection/
sanitizers" row): the rebuild's sanitizers are jit-time NaN propagation
checks plus chex shape/dtype assertions on the data contract — there is no
shared mutable state to race on by construction (pure functions under jit).
"""

from __future__ import annotations

import chex
import jax
import numpy as np


def enable_nan_checks() -> None:
    """Fail fast on any NaN produced under jit (CI / --debug-nans)."""
    jax.config.update("jax_debug_nans", True)


def assert_super_batch(batch: dict, n_critic: int, batch_size: int) -> None:
    """Validate the fused-step super-batch contract before compiling on it."""
    n_sub = n_critic + 1
    data_key = "features" if "features" in batch else "images"
    chex.assert_rank(batch[data_key], 4 if data_key == "features" else 5)
    chex.assert_rank(batch["triples"], 3)
    chex.assert_axis_dimension(batch[data_key], 0, n_sub)
    chex.assert_axis_dimension(batch["triples"], 0, n_sub)
    chex.assert_axis_dimension(batch[data_key], 1, batch_size)
    chex.assert_axis_dimension(batch["triples"], 2, 3)
    chex.assert_type(batch["triples"], np.int32)
    if data_key == "images":
        chex.assert_type(batch[data_key], np.uint8)


def host_rss_gb() -> float:
    """Current process resident set size in GB (0.0 if unreadable).

    Observability for the host-RSS watchdog (config.py host_rss_exit_gb):
    this machine's relay PJRT client retains host staging for every
    host→device transfer, so long runs with ongoing uploads grow RSS
    without bound.
    """
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return int(line.split()[1]) / 1e6
    except OSError:
        pass
    return 0.0
