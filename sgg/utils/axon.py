"""Axon relay terminal failover.

This machine reaches its TPU through a loopback relay that exposes FOUR
terminal port-groups (8082/8092/8102/8112 + siblings). A terminal can wedge
hard — e.g. a deadlocked on-device kernel leaves the chip spinning and every
subsequent client init hangs at device enumeration (observed in round 3: the
pre-fix conv_direct odd-n_bi deadlock took the default terminal down for the
whole session). The PJRT client has no failover of its own: with
``PALLAS_AXON_POOL_IPS=127.0.0.1`` it always dials the first group.

:func:`ensure_live_terminal` probes the groups with a tiny subprocess
(``jax.devices()`` + one op) and pins the first LIVE one via
``PALLAS_AXON_POOL_IPS`` — call it BEFORE anything initializes the jax
backend. No-op on non-axon platforms and when probing is impossible.
"""

from __future__ import annotations

import os
import subprocess
import sys

_GROUPS = (None, "127.0.0.1:8092", "127.0.0.1:8102", "127.0.0.1:8112")
_CACHE = "/tmp/sgg_axon_terminal.json"
_PROBE = (
    "import jax, jax.numpy as jnp;"
    "assert jax.devices();"
    "print(float(jnp.ones((8,8)).sum()))"
)


def _probe(pool_ips: str | None, timeout: float) -> bool:
    env = os.environ.copy()
    # The machine exports JAX_PLATFORMS=axon, but in sessions where the relay
    # plugin registers its platform as 'tpu' that env var makes EVERY jax
    # backend init raise — which made this probe report all four terminal
    # groups dead while the chip was fine. Auto-select finds the chip under
    # either registration (plugin priority outranks cpu).
    env.pop("JAX_PLATFORMS", None)
    if pool_ips is not None:
        env["PALLAS_AXON_POOL_IPS"] = pool_ips
    try:
        r = subprocess.run(
            [sys.executable, "-c", _PROBE],
            env=env, timeout=timeout, capture_output=True,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False
    except Exception:
        return False


def ensure_live_terminal(timeout: float = 150.0, verbose: bool = True) -> str | None:
    """Pin PALLAS_AXON_POOL_IPS to a responsive terminal group.

    Returns the pinned value (None = default worked). Uses a cache file so
    repeated CLI invocations in one session skip re-probing; a cached entry
    is re-verified (cheap when live, and a wedged terminal invalidates it).
    """
    if os.environ.get("JAX_PLATFORMS", "axon") != "axon":
        return None

    candidates = list(_GROUPS)
    try:
        import json

        with open(_CACHE) as f:
            cached = json.load(f)["pool_ips"]
        if cached in candidates:
            candidates.remove(cached)
            candidates.insert(0, cached)
    except Exception:
        pass

    for pool_ips in candidates:
        if _probe(pool_ips, timeout):
            if pool_ips is not None:
                os.environ["PALLAS_AXON_POOL_IPS"] = pool_ips
                if verbose:
                    print(
                        f"[sgg.axon] default terminal unresponsive; pinned "
                        f"PALLAS_AXON_POOL_IPS={pool_ips}",
                        file=sys.stderr, flush=True,
                    )
            try:
                import json

                with open(_CACHE, "w") as f:
                    json.dump({"pool_ips": pool_ips}, f)
            except Exception:
                pass
            return pool_ips
    if verbose:
        print(
            "[sgg.axon] no responsive terminal group found; proceeding with "
            "default (may hang)",
            file=sys.stderr, flush=True,
        )
    return None
