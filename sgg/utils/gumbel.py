"""Discrete-token credit assignment: Gumbel-softmax / straight-through.

The reference keeps the critic differentiable w.r.t. the generator by feeding
it a *soft* distribution over vocabulary tokens instead of sampled ids
(SURVEY.md §2.1 #4, §7 hard part #1). We provide the standard estimators:

  - ``gumbel_softmax(..., hard=False)`` — relaxed sample on the simplex
    (Jang et al. 2017); what the critic consumes during training.
  - ``hard=True`` — straight-through: forward pass is the exact one-hot
    argmax, backward pass flows through the relaxed sample.

Everything is shape-static and branch-free — safe under jit/scan.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-20


def sample_gumbel(rng: jax.Array, shape, dtype=jnp.float32) -> jnp.ndarray:
    u = jax.random.uniform(rng, shape, dtype=dtype, minval=_EPS, maxval=1.0)
    return -jnp.log(-jnp.log(u))


def gumbel_softmax(
    rng: jax.Array,
    logits: jnp.ndarray,
    tau: float | jnp.ndarray = 1.0,
    hard: bool = False,
    axis: int = -1,
) -> jnp.ndarray:
    """Differentiable sample from Categorical(softmax(logits)).

    Returns a point on the simplex (soft) or a one-hot with straight-through
    gradients (hard). ``tau`` may be a traced scalar (annealing schedules).
    """
    g = sample_gumbel(rng, logits.shape, logits.dtype)
    y_soft = jax.nn.softmax((logits + g) / tau, axis=axis)
    if not hard:
        return y_soft
    idx = jnp.argmax(y_soft, axis=axis)
    y_hard = jax.nn.one_hot(idx, logits.shape[axis], dtype=logits.dtype, axis=axis)
    # Straight-through: forward = y_hard, backward = d y_soft.
    return y_soft + jax.lax.stop_gradient(y_hard - y_soft)
