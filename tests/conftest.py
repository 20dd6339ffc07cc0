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
# Also export the env var: jax itself has already captured the environment
# (sitecustomize imports jax first — hence the config.update above), but
# sgg.utils.axon.ensure_live_terminal keys off JAX_PLATFORMS to decide
# whether to probe relay terminals. Without this, every CLI-driving test
# probes the LIVE TPU relay from a CPU test run — burning minutes per probe
# and racing any real training job for terminal claims (observed round 3:
# a test pinned the shared /tmp terminal cache to the spare 8112 group
# while a pipeline was mid-run).
os.environ["JAX_PLATFORMS"] = "cpu"

# Make the repo root importable regardless of how pytest is invoked.
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)
