"""WGAN-GP objective over (image features, triple) pairs.

Reference capability (SURVEY.md §2.1 #6):
  L_D = E[D(fake)] − E[D(real)] + λ·E[(‖∇_x̂ D(x̂)‖₂ − 1)²],  λ = 10
  L_G = −E[D(fake)]
with x̂ interpolated between real one-hot triples and fake soft triples —
both live on the vocabulary simplex, so the straight line between them stays
in the critic's natural input domain (SURVEY.md §7 hard part #1).

The gradient penalty is grad-of-grad; everything here stays a pure function
so it composes with jit/scan/shard_map in the fused step.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

CriticApply = Callable[..., jnp.ndarray]  # (d_params, feats, triple) -> [B]


def gradient_penalty(
    critic_apply: CriticApply,
    d_params,
    feats: jnp.ndarray,
    real: jnp.ndarray,
    fake: jnp.ndarray,
    rng: jax.Array,
) -> jnp.ndarray:
    """E[(‖∇_x̂ D(feats, x̂)‖₂ − 1)²] with x̂ = ε·real + (1−ε)·fake, ε~U[0,1]."""
    B = real.shape[0]
    eps = jax.random.uniform(rng, (B, 1, 1), dtype=real.dtype)
    x_hat = eps * real + (1.0 - eps) * fake

    def score_sum(x):
        return critic_apply(d_params, feats, x).sum()

    grads = jax.grad(score_sum)(x_hat)  # [B, 3, V]
    norms = jnp.sqrt(jnp.sum(grads.astype(jnp.float32) ** 2, axis=(1, 2)) + 1e-12)
    return jnp.mean((norms - 1.0) ** 2)


def critic_loss(
    critic_apply: CriticApply,
    d_params,
    feats: jnp.ndarray,
    real: jnp.ndarray,  # one-hot [B, 3, V]
    fake: jnp.ndarray,  # soft    [B, 3, V] (already stop-gradiented by caller)
    rng: jax.Array,
    gp_lambda: float = 10.0,
    drift: float = 0.0,
) -> tuple[jnp.ndarray, dict]:
    real_score = critic_apply(d_params, feats, real)
    fake_score = critic_apply(d_params, feats, fake)
    gp = gradient_penalty(critic_apply, d_params, feats, real, fake, rng)
    w_dist = real_score.mean() - fake_score.mean()
    loss = -w_dist + gp_lambda * gp
    if drift:
        loss = loss + drift * jnp.mean(real_score**2)
    aux = {
        "d_loss": loss,
        "w_dist": w_dist,
        "gp": gp,
        "real_score": real_score.mean(),
        "fake_score": fake_score.mean(),
    }
    return loss, aux


def generator_loss(
    critic_apply: CriticApply,
    d_params,
    feats: jnp.ndarray,
    fake: jnp.ndarray,
) -> tuple[jnp.ndarray, dict]:
    fake_score = critic_apply(d_params, feats, fake)
    loss = -fake_score.mean()
    return loss, {"g_loss": loss, "g_fake_score": fake_score.mean()}


def reinforce_generator_loss(
    critic_apply: CriticApply,
    d_params,
    feats: jnp.ndarray,
    fake: jnp.ndarray,  # one-hot [B, 3, V], already detached by the sampler
    log_prob: jnp.ndarray,  # float32[B], Σₜ log πₜ(tokenₜ) — carries ∇θ
    logits: jnp.ndarray | None = None,  # [B, 3, V] for the entropy bonus
    entropy_coef: float = 0.0,
) -> tuple[jnp.ndarray, dict]:
    """Score-function generator objective (SURVEY.md §7 hard part #1).

    ∇θ E[D(x)] = E[(D(x) − b)·∇θ log πθ(x)] with x an exact categorical
    sample and b a leave-one-out batch baseline (mean of the OTHER rewards,
    so the estimator stays unbiased: b_i ⟂ x_i). The critic score is the
    reward and is fully detached — no gradient flows through the critic
    input, which is what distinguishes this from the Gumbel pathwise
    estimator. Optional entropy bonus −coef·E[H(πₜ)] slows early collapse
    onto a few triples.
    """
    reward = jax.lax.stop_gradient(
        critic_apply(d_params, feats, fake).astype(jnp.float32)
    )
    B = reward.shape[0]
    if B > 1:
        baseline = (reward.sum() - reward) / (B - 1)
    else:
        baseline = jnp.zeros_like(reward)
    adv = reward - baseline
    loss = -(adv * log_prob.astype(jnp.float32)).mean()
    aux = {
        # g_loss keeps the pathwise path's meaning (−E[D(fake)]) so curves
        # stay comparable across estimators; the surrogate is its own key.
        "g_loss": -reward.mean(),
        "g_fake_score": reward.mean(),
        "rl_surrogate": loss,
        "rl_adv_std": adv.std(),
        "rl_log_prob": log_prob.mean(),
    }
    if entropy_coef and logits is not None:
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        # Masked-out vocab entries sit at ~−1e9: p underflows to exactly 0
        # and 0·lp contributes nothing, so no explicit mask is needed.
        ent = -(jnp.exp(lp) * lp).sum(-1).mean()
        loss = loss - entropy_coef * ent
        aux["rl_entropy"] = ent
        aux["rl_surrogate"] = loss
    return loss, aux
