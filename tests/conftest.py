"""Test harness config: run all tests on 8 virtual CPU devices.

Per SURVEY.md §4 ("Distributed without a cluster"): setting
``--xla_force_host_platform_device_count=8`` gives 8 fake CPU devices so all
mesh/sharding/psum tests run single-process. Must run before JAX initializes
its backends, hence module-level in conftest.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Make the repo root importable regardless of how pytest is invoked.
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)
