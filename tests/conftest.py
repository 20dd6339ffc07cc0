"""Test harness config: run all tests on 8 virtual CPU devices.

Per SURVEY.md §4 ("Distributed without a cluster"): setting
``--xla_force_host_platform_device_count=8`` gives 8 fake CPU devices so all
mesh/sharding/psum tests run single-process.

Platform selection: this machine's sitecustomize imports jax at interpreter
start to register the axon TPU PJRT plugin, so jax has already captured
``JAX_PLATFORMS=axon`` from the environment before conftest runs. Setting the
env var here is too late — mutate ``jax.config`` instead (backends are not
initialized yet at collection time, so this is safe and effective).
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (must come after XLA_FLAGS is set)

jax.config.update("jax_platforms", "cpu")

# Make the repo root importable regardless of how pytest is invoked.
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)
