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


def ensure_axon_registered(
    retries: int = 3, delay: float = 30.0, verbose: bool = True
) -> bool:
    """Heal a swallowed relay-plugin registration.

    This machine's sitecustomize registers the relay PJRT plugin at
    interpreter start and deliberately SWALLOWS failures (so a wedged
    terminal can't take down every python process). A process whose import
    raced such a failure has no 'axon' backend factory, and every later
    backend use dies with "Backend 'axon' is not in the list of known
    backends: ['cpu', 'tpu']" — observed in round 3 killing a training run
    at its first device_put, minutes after a clean-looking startup.
    Registration is an ordinary python call, so re-attempt it in-process
    with backoff. Returns True when the factory exists.
    """
    import jax  # noqa: F401  (factories dict exists after jax import)
    from jax._src import xla_bridge as xb

    if "axon" in xb._backend_factories:
        return True
    import time
    import uuid

    for i in range(retries):
        try:
            try:
                from axon.register import register
            except ModuleNotFoundError:
                # The plugin lives in /root/.axon_site, normally reached via
                # PYTHONPATH. A launcher that OVERWRITES PYTHONPATH (instead
                # of appending) silently drops it — observed killing a whole
                # pipeline launch in round 3. Re-add the known location.
                sys.path.append("/root/.axon_site")
                from axon.register import register

            register(
                None,
                f"{os.environ.get('PALLAS_AXON_TPU_GEN', 'v5e')}:1x1x1",
                so_path="/opt/axon/libaxon_pjrt.so",
                session_id=str(uuid.uuid4()),
                remote_compile=(
                    os.environ.get("PALLAS_AXON_REMOTE_COMPILE") == "1"
                ),
            )
        except Exception as e:
            if verbose:
                print(
                    f"[sgg.axon] plugin re-register {i + 1}/{retries} "
                    f"failed: {type(e).__name__}: {e}",
                    file=sys.stderr, flush=True,
                )
            if "axon" not in xb._backend_factories and i + 1 < retries:
                time.sleep(delay)
            continue
        if "axon" in xb._backend_factories:
            if verbose:
                print(
                    "[sgg.axon] relay plugin re-registered in-process",
                    file=sys.stderr, flush=True,
                )
            return True
    return "axon" in xb._backend_factories


def _probe(pool_ips: str | None, timeout: float) -> bool:
    env = os.environ.copy()
    if "/root/.axon_site" not in env.get("PYTHONPATH", ""):
        env["PYTHONPATH"] = (
            env.get("PYTHONPATH", "") + os.pathsep + "/root/.axon_site"
        ).lstrip(os.pathsep)
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
