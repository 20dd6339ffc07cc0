"""Unit tests for sgg.models (SURVEY.md §4: attention sums to 1, generator
output shapes [B,3,V], critic scalar, gradient flow through discrete tokens).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgg.models import (
    AdditiveAttention,
    AttentionLSTMGenerator,
    TF1LSTMCell,
    TripleCritic,
)
from sgg.utils.gumbel import gumbel_softmax

B, R, F, V = 4, 9, 32, 24


@pytest.fixture(scope="module")
def feats():
    return jnp.asarray(np.random.RandomState(0).randn(B, R, F), jnp.float32)


def test_tf1_lstm_matches_manual_ijfo():
    """Cell must reproduce TF1 i,j,f,o semantics given a known kernel."""
    hidden, inp = 3, 2
    cell = TF1LSTMCell(hidden=hidden, forget_bias=1.0)
    x = jnp.ones((1, inp))
    carry = (jnp.zeros((1, hidden)), jnp.zeros((1, hidden)))
    params = cell.init(jax.random.key(0), carry, x)
    kernel = np.asarray(params["params"]["kernel"])
    bias = np.asarray(params["params"]["bias"])

    (c, h), out = cell.apply(params, carry, x)

    concat = np.concatenate([np.ones((1, inp)), np.zeros((1, hidden))], -1)
    gates = concat @ kernel + bias
    i, j, f, o = np.split(gates, 4, axis=-1)
    sig = lambda a: 1 / (1 + np.exp(-a))
    c_ref = 0 * sig(f + 1.0) + sig(i) * np.tanh(j)
    h_ref = np.tanh(c_ref) * sig(o)
    np.testing.assert_allclose(np.asarray(c), c_ref, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(h), h_ref, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out), h_ref, rtol=1e-5)


def test_attention_weights_sum_to_one(feats):
    attn = AdditiveAttention(attn_dim=16)
    h = jnp.ones((B, 8))
    variables = attn.init(jax.random.key(0), feats, h)
    proj = attn.apply(variables, feats, method=attn.project_features)
    ctx, alpha = attn.apply(variables, feats, h, proj)
    # hoisted-projection path must equal the direct path
    ctx2, alpha2 = attn.apply(variables, feats, h)
    np.testing.assert_allclose(np.asarray(ctx), np.asarray(ctx2), rtol=1e-6)
    assert ctx.shape == (B, F) and alpha.shape == (B, R)
    np.testing.assert_allclose(np.asarray(alpha.sum(-1)), np.ones(B), rtol=1e-5)
    assert (np.asarray(alpha) >= 0).all()


def test_gumbel_softmax_soft_and_hard():
    rng = jax.random.key(1)
    logits = jnp.asarray(np.random.randn(B, V), jnp.float32)
    soft = gumbel_softmax(rng, logits, tau=0.5, hard=False)
    np.testing.assert_allclose(np.asarray(soft.sum(-1)), np.ones(B), rtol=1e-5)
    hard = gumbel_softmax(rng, logits, tau=0.5, hard=True)
    h = np.asarray(hard)
    assert ((h == 0) | (h == 1)).all() and (h.sum(-1) == 1).all()
    # straight-through keeps gradients alive
    g = jax.grad(lambda l: gumbel_softmax(rng, l, 0.5, hard=True).sum())(logits)
    assert np.abs(np.asarray(g)).sum() > 0


def _gen_and_params(feats, **kw):
    gen = AttentionLSTMGenerator(
        vocab_size=V, hidden=32, embed_dim=16, attn_dim=16, noise_dim=8, **kw
    )
    z = jnp.zeros((B, 8))
    params = gen.init(jax.random.key(0), feats, z, jax.random.key(1))
    return gen, params, z


def test_generator_shapes_and_simplex(feats):
    gen, params, z = _gen_and_params(feats)
    out = gen.apply(params, feats, z, jax.random.key(2), tau=1.0)
    assert out["soft"].shape == (B, 3, V)
    assert out["logits"].shape == (B, 3, V)
    assert out["attention"].shape == (B, 3, R)
    assert out["tokens"].shape == (B, 3)
    np.testing.assert_allclose(
        np.asarray(out["soft"].sum(-1)), np.ones((B, 3)), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["attention"].sum(-1)), np.ones((B, 3)), rtol=1e-5
    )


def test_generator_step_mask_respected(feats):
    gen, params, z = _gen_and_params(feats)
    mask = np.zeros((3, V), bool)
    mask[0, 2:10] = True  # subjects from {2..9}
    mask[1, 10:14] = True  # predicates from {10..13}
    mask[2, 2:10] = True
    out = gen.apply(
        params, feats, z, jax.random.key(3), tau=1.0, hard=True,
        step_mask=jnp.asarray(mask),
    )
    toks = np.asarray(out["tokens"])
    assert ((toks[:, 0] >= 2) & (toks[:, 0] < 10)).all()
    assert ((toks[:, 1] >= 10) & (toks[:, 1] < 14)).all()
    assert ((toks[:, 2] >= 2) & (toks[:, 2] < 10)).all()


def test_generator_noise_changes_samples(feats):
    gen, params, _ = _gen_and_params(feats)
    z1 = jnp.asarray(np.random.RandomState(1).randn(B, 8), jnp.float32)
    z2 = jnp.asarray(np.random.RandomState(2).randn(B, 8), jnp.float32)
    o1 = gen.apply(params, feats, z1, jax.random.key(0), tau=1.0)
    o2 = gen.apply(params, feats, z2, jax.random.key(0), tau=1.0)
    assert not np.allclose(np.asarray(o1["logits"]), np.asarray(o2["logits"]))


def test_critic_scalar_and_soft_vs_onehot(feats):
    critic = TripleCritic(vocab_size=V, embed_dim=16, hidden=32, attn_dim=16)
    onehot = jax.nn.one_hot(jnp.asarray([[2, 5, 7]] * B), V)
    params = critic.init(jax.random.key(0), feats, onehot)
    s = critic.apply(params, feats, onehot)
    assert s.shape == (B,) and s.dtype == jnp.float32
    soft = jnp.full((B, 3, V), 1.0 / V)
    s2 = critic.apply(params, feats, soft)
    assert s2.shape == (B,)
    assert not np.allclose(np.asarray(s), np.asarray(s2))


def test_gradient_flows_generator_through_critic(feats):
    """End-to-end ∂(critic score)/∂(generator params) must be nonzero —
    the discrete-token credit-assignment requirement (SURVEY.md §7 #1)."""
    gen, g_params, z = _gen_and_params(feats)
    critic = TripleCritic(vocab_size=V, embed_dim=16, hidden=32, attn_dim=16)
    fake = gen.apply(g_params, feats, z, jax.random.key(2), tau=1.0)["soft"]
    d_params = critic.init(jax.random.key(1), feats, fake)

    def g_loss(gp):
        out = gen.apply(gp, feats, z, jax.random.key(2), tau=1.0)
        return -critic.apply(d_params, feats, out["soft"]).mean()

    grads = jax.grad(g_loss)(g_params)
    total = sum(
        float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads)
    )
    assert total > 0, "no gradient reached the generator parameters"


def test_generator_detach_sample_mode(feats):
    """REINFORCE sampling mode: exact one-hot tokens, correct log_prob,
    and NO gradient through the sampled one-hots (only through log_prob)."""
    gen, params, _ = _gen_and_params(feats)
    z = jnp.asarray(np.random.RandomState(3).randn(B, 8), jnp.float32)
    out = gen.apply(params, feats, z, jax.random.key(4), detach_sample=True)

    s = np.asarray(out["soft"])
    assert ((s == 0) | (s == 1)).all() and (s.sum(-1) == 1).all()
    np.testing.assert_array_equal(
        np.asarray(out["tokens"]), s.argmax(-1)
    )
    # log_prob == Σₜ log_softmax(logits)[token] recomputed from the outputs.
    lp = np.asarray(
        jnp.take_along_axis(
            jax.nn.log_softmax(out["logits"].astype(jnp.float32), -1),
            out["tokens"][..., None], axis=-1,
        )[..., 0].sum(-1)
    )
    np.testing.assert_allclose(np.asarray(out["log_prob"]), lp, rtol=1e-5)
    assert (lp <= 0).all() and np.isfinite(lp).all()

    # The one-hot sample is fully detached …
    g_soft = jax.grad(
        lambda p: (gen.apply(p, feats, z, jax.random.key(4),
                             detach_sample=True)["soft"] ** 2).sum()
    )(params)
    assert all(float(jnp.abs(g).sum()) == 0 for g in jax.tree.leaves(g_soft))
    # … while log_prob carries gradients to every parameter path.
    g_lp = jax.grad(
        lambda p: gen.apply(p, feats, z, jax.random.key(4),
                            detach_sample=True)["log_prob"].sum()
    )(params)
    assert sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(g_lp)) > 0


def test_transformer_detach_sample_mode(feats):
    from sgg.models.transformer import TransformerTripleGenerator

    gen = TransformerTripleGenerator(
        vocab_size=V, hidden=32, embed_dim=16, noise_dim=8,
        num_heads=4, num_layers=1,
    )
    z = jnp.asarray(np.random.RandomState(5).randn(B, 8), jnp.float32)
    params = gen.init(jax.random.key(0), feats, z, jax.random.key(1))
    out = gen.apply(params, feats, z, jax.random.key(6), detach_sample=True)
    s = np.asarray(out["soft"])
    assert ((s == 0) | (s == 1)).all() and (s.sum(-1) == 1).all()
    lp = np.asarray(
        jnp.take_along_axis(
            jax.nn.log_softmax(out["logits"].astype(jnp.float32), -1),
            out["tokens"][..., None], axis=-1,
        )[..., 0].sum(-1)
    )
    np.testing.assert_allclose(np.asarray(out["log_prob"]), lp, rtol=1e-5)


def test_generator_forced_decode_conditions_later_steps(feats):
    """forced_tokens clamps the clamped steps' outputs exactly, and —
    because the LSTM decode is autoregressive — changing the forced
    subject genuinely changes the predicate step's logits."""
    gen = AttentionLSTMGenerator(vocab_size=V, hidden=16, embed_dim=8,
                                 attn_dim=8, noise_dim=4)
    z = jnp.zeros((B, 4))
    params = gen.init(jax.random.key(0), feats, z, jax.random.key(1))

    def run(subj):
        forced = jnp.stack(
            [jnp.full((B,), subj, jnp.int32),
             jnp.zeros((B,), jnp.int32),
             jnp.full((B,), 7, jnp.int32)], axis=1)
        return gen.apply(params, feats, z, jax.random.key(1),
                         forced_tokens=forced, forced_steps=(0, 2))

    out_a, out_b = run(3), run(5)
    np.testing.assert_array_equal(np.asarray(out_a["tokens"][:, 0]), 3)
    np.testing.assert_array_equal(np.asarray(out_b["tokens"][:, 0]), 5)
    np.testing.assert_array_equal(np.asarray(out_a["tokens"][:, 2]), 7)
    # one-hot feedback of a different subject must move step-1 logits
    d = np.abs(np.asarray(out_a["logits"][:, 1] - out_b["logits"][:, 1])).max()
    assert d > 1e-6
    # step-0 logits are computed BEFORE the clamp — identical across runs
    np.testing.assert_allclose(
        np.asarray(out_a["logits"][:, 0]), np.asarray(out_b["logits"][:, 0])
    )


def test_transformer_forced_decode_is_marginal(feats):
    """Slot decoder: the clamp replaces clamped slots' outputs but CANNOT
    condition the predicate slot (non-autoregressive) — documented."""
    from sgg.models.transformer import TransformerTripleGenerator

    gen = TransformerTripleGenerator(vocab_size=V, hidden=16, embed_dim=8,
                                     noise_dim=4, num_heads=2, num_layers=1)
    z = jnp.zeros((B, 4))
    params = gen.init(jax.random.key(0), feats, z, jax.random.key(1))

    def run(subj):
        forced = jnp.stack(
            [jnp.full((B,), subj, jnp.int32),
             jnp.zeros((B,), jnp.int32),
             jnp.full((B,), 7, jnp.int32)], axis=1)
        return gen.apply(params, feats, z, jax.random.key(1),
                         forced_tokens=forced, forced_steps=(0, 2))

    out_a, out_b = run(3), run(5)
    np.testing.assert_array_equal(np.asarray(out_a["tokens"][:, 0]), 3)
    np.testing.assert_array_equal(np.asarray(out_a["tokens"][:, 2]), 7)
    # soft output at clamped slots is the exact one-hot
    np.testing.assert_allclose(
        np.asarray(out_a["soft"][:, 0, 3]), 1.0, rtol=1e-6)
    # predicate logits are independent of the clamp (marginal)
    np.testing.assert_allclose(
        np.asarray(out_a["logits"][:, 1]), np.asarray(out_b["logits"][:, 1])
    )
