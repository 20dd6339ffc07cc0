"""Benchmark timing utilities.

This machine reaches its TPU through a relay with ~30 ms of fixed
dispatch+readback overhead per host round-trip, and queueing many separate
async dispatches stalls badly — so naive "loop and block" timing measures
the tunnel, not the chip. Method used here instead:

  1. run the op chained inside ONE jit via ``lax.scan`` (single dispatch,
     scalar readback);
  2. time two different iteration counts and report the MARGINAL cost
     ``(t(n2) − t(n1)) / (n2 − n1)``, which cancels the fixed overhead.
"""

from __future__ import annotations

import json
import os
import time
from functools import partial

import jax
import jax.numpy as jnp

_env_platform = os.environ.get("JAX_PLATFORMS")
if _env_platform:
    # On this machine JAX_PLATFORMS from the ENVIRONMENT does not take
    # effect (sitecustomize imports jax first; NOTES.md) — so the
    # documented `JAX_PLATFORMS=cpu python benchmarks/...` invocation
    # silently initialized the RELAY backend and, once, collided with the
    # measurement pipeline's terminal claim and wedged its extract stage
    # (session 13). Honor the env var for real via jax.config before any
    # backend initialization.
    jax.config.update("jax_platforms", _env_platform)
if _env_platform == "axon":
    # sitecustomize can swallow a failed relay-plugin registration, leaving
    # no 'axon' factory and a crash at first device use — re-register
    # in-process (sgg/utils/axon.py has the full pathology).
    try:
        from sgg.utils.axon import ensure_axon_registered

        ensure_axon_registered(verbose=False)
    except Exception:
        pass


def time_marginal_scan(fn, init, n1: int = 4, n2: int = 24) -> float:
    """Marginal seconds/iteration of ``out = fn(out)`` scanned inside jit.

    ``fn`` must map a pytree to a pytree of the same structure/shape.
    """

    @partial(jax.jit, static_argnames="iters")
    def run(carry, iters):
        out, _ = jax.lax.scan(lambda c, _: (fn(c), ()), carry, None, length=iters)
        leaves = jax.tree.leaves(out)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)

    float(run(init, n1))  # compile both programs
    float(run(init, n2))

    def t(iters):
        t0 = time.perf_counter()
        float(run(init, iters))
        return time.perf_counter() - t0

    t_1, t_2 = t(n1), t(n2)
    return max((t_2 - t_1) / (n2 - n1), 1e-12)


def time_marginal_scan_io(fn, init, n1: int = 4, n2: int = 24) -> float:
    """Marginal seconds/iteration for a SHAPE-CHANGING ``fn`` (Cin≠Cout,
    strided convs, ...): the scan carries the INPUT and re-derives it as
    ``x * (1 + eps·mean(fn(x)))`` so each iteration serially depends on the
    previous op's output (no DCE, no pipelining across iterations) while the
    extra work is one elementwise pass — negligible next to a matmul/conv.
    eps=1e-30 keeps the carry numerically identical (1 + 1e-30 rounds to 1
    in every float dtype used here) without being a foldable constant."""

    def wrap(c):
        y = fn(c)
        scale = 1 + 1e-30 * jnp.mean(y.astype(jnp.float32))
        return c * scale.astype(c.dtype)

    return time_marginal_scan(wrap, init, n1=n1, n2=n2)


def emit(metric: str, value: float, unit: str, **extra) -> None:
    print(json.dumps({"metric": metric, "value": round(value, 3), "unit": unit, **extra}))
