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


def top_k_top_p_filter(
    logits: jnp.ndarray, top_k: int = 0, top_p=None
) -> jnp.ndarray:
    """Top-k / nucleus (top-p) logit filtering for sampling.

    Convention (matches the common HF implementation): the filter applies
    to the TEMPERED logits — pass ``logits / temp`` in; k first, then p.
      - ``top_k`` (static int > 0): keep the k highest-logit tokens per row.
      - ``top_p`` (scalar, may be traced, in (0, 1]): keep the smallest set
        of tokens whose cumulative probability reaches p. The
        highest-probability token always survives (its cumulative-before
        mass is 0), so the distribution can never become empty.
    Filtered tokens get -1e9 — the same convention the vocab step mask
    uses, so already-masked tokens stay masked. Shape-static and traced-
    value-friendly: presence of each filter is a compile-time branch, the
    p VALUE is an ordinary operand.
    """
    neg = jnp.asarray(-1e9, logits.dtype)
    if top_k:
        kth = jnp.sort(logits, axis=-1)[..., -int(top_k), None]
        logits = jnp.where(logits >= kth, logits, neg)
    if top_p is not None:
        sorted_desc = -jnp.sort(-logits, axis=-1)
        probs = jax.nn.softmax(sorted_desc, axis=-1)
        cum_before = jnp.cumsum(probs, axis=-1) - probs
        keep = cum_before < jnp.asarray(top_p, logits.dtype)
        thresh = jnp.min(
            jnp.where(keep, sorted_desc, jnp.asarray(jnp.inf, logits.dtype)),
            axis=-1, keepdims=True,
        )
        logits = jnp.where(logits >= thresh, logits, neg)
    return logits


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
