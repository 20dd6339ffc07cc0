"""Checkpoint-converter tests: golden decode parity on converted weights.

SURVEY.md §4 "Golden/parity": load reference-format weights, run one forward
pass, compare token argmaxes; fixed-seed end-to-end decode goldens.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgg.convert import DEFAULT_GENERATOR_MAPPING, convert_from_arrays
from sgg.models import AttentionLSTMGenerator

B, R, F, V, H, E, A, Z = 3, 9, 16, 24, 32, 16, 16, 8


@pytest.fixture(scope="module")
def gen_and_init():
    gen = AttentionLSTMGenerator(
        vocab_size=V, hidden=H, embed_dim=E, attn_dim=A, noise_dim=Z
    )
    feats = jnp.zeros((B, R, F))
    z = jnp.zeros((B, Z))
    params = gen.init(jax.random.key(0), feats, z, jax.random.key(1))
    return gen, params


def _fake_tf_vars(params):
    """Emit the target params under reference-style TF1 variable names."""
    p = params["params"]
    r = np.random.RandomState(7)
    rnd = lambda a: (r.randn(*np.shape(a)) * 0.1).astype(np.float32)
    return {
        "generator/embedding/weights": rnd(p["token_embedding"]),
        "generator/init_c/weights": rnd(p["init_c"]["kernel"]),
        "generator/init_c/biases": rnd(p["init_c"]["bias"]),
        "generator/init_h/weights": rnd(p["init_h"]["kernel"]),
        "generator/init_h/biases": rnd(p["init_h"]["bias"]),
        "generator/rnn/basic_lstm_cell/kernel": rnd(p["TF1LSTMCell_0"]["kernel"]),
        "generator/rnn/basic_lstm_cell/bias": rnd(p["TF1LSTMCell_0"]["bias"]),
        "generator/attention/feat_proj/weights": rnd(
            p["AdditiveAttention_0"]["feat_proj"]["kernel"]
        ),
        "generator/attention/state_proj/weights": rnd(
            p["AdditiveAttention_0"]["state_proj"]["kernel"]
        ),
        "generator/attention/state_proj/biases": rnd(
            p["AdditiveAttention_0"]["state_proj"]["bias"]
        ),
        "generator/attention/score/weights": rnd(
            p["AdditiveAttention_0"]["score"]["kernel"]
        ),
        "generator/deep_out/weights": rnd(p["deep_out"]["kernel"]),
        "generator/deep_out/biases": rnd(p["deep_out"]["bias"]),
        "generator/logits/weights": rnd(p["vocab_proj"]["kernel"]),
        "generator/logits/biases": rnd(p["vocab_proj"]["bias"]),
    }


def test_convert_places_all_generator_params(gen_and_init):
    gen, params = gen_and_init
    tf_vars = _fake_tf_vars(params)
    new_p, unmatched = convert_from_arrays(tf_vars, params["params"])
    assert unmatched == []
    # every mapped leaf now equals the reference array
    assert np.allclose(
        np.asarray(new_p["token_embedding"]),
        tf_vars["generator/embedding/weights"],
    )
    assert np.allclose(
        np.asarray(new_p["TF1LSTMCell_0"]["kernel"]),
        tf_vars["generator/rnn/basic_lstm_cell/kernel"],
    )
    # and a forward pass runs on the converted tree
    feats = jnp.asarray(np.random.RandomState(0).randn(B, R, F), jnp.float32)
    out = gen.apply({"params": new_p}, feats, jnp.zeros((B, Z)), jax.random.key(2))
    assert out["tokens"].shape == (B, 3)


def test_convert_shape_mismatch_raises(gen_and_init):
    _, params = gen_and_init
    tf_vars = _fake_tf_vars(params)
    tf_vars["generator/embedding/weights"] = np.zeros((V, E + 1), np.float32)
    with pytest.raises(ValueError, match="shape mismatch"):
        convert_from_arrays(tf_vars, params["params"])


def test_convert_missing_var_strict(gen_and_init):
    _, params = gen_and_init
    tf_vars = _fake_tf_vars(params)
    del tf_vars["generator/deep_out/weights"]
    with pytest.raises(ValueError, match="unmatched"):
        convert_from_arrays(tf_vars, params["params"])
    _, unmatched = convert_from_arrays(tf_vars, params["params"], strict=False)
    assert unmatched == ["deep_out/kernel"]


def _fake_tf_critic_vars(p):
    """TripleCritic params under expected reference-style TF1 names."""
    r = np.random.RandomState(11)
    rnd = lambda a: (r.randn(*np.shape(a)) * 0.1).astype(np.float32)
    out = {
        "discriminator/embedding/weights": rnd(p["token_embedding"]),
        "discriminator/query_proj/weights": rnd(p["query_proj"]["kernel"]),
        "discriminator/query_proj/biases": rnd(p["query_proj"]["bias"]),
        "discriminator/key_proj/weights": rnd(p["key_proj"]["kernel"]),
        "discriminator/score/weights": rnd(p["score"]["kernel"]),
        "discriminator/head/weights": rnd(p["head"]["kernel"]),
        "discriminator/head/biases": rnd(p["head"]["bias"]),
    }
    for i in range(3):
        out[f"discriminator/trunk_{i}/weights"] = rnd(p[f"trunk_{i}"]["kernel"])
        out[f"discriminator/trunk_{i}/biases"] = rnd(p[f"trunk_{i}"]["bias"])
        out[f"discriminator/ln_{i}/gamma"] = rnd(p[f"ln_{i}"]["scale"])
        out[f"discriminator/ln_{i}/beta"] = rnd(p[f"ln_{i}"]["bias"])
    return out


@pytest.fixture(scope="module")
def critic_and_init():
    from sgg.models import TripleCritic

    critic = TripleCritic(vocab_size=V, embed_dim=E, hidden=H, attn_dim=A)
    feats = jnp.zeros((B, R, F))
    triple = jnp.full((B, 3, V), 1.0 / V)
    params = critic.init(jax.random.key(0), feats, triple)
    return critic, params


def test_convert_places_all_discriminator_params(critic_and_init):
    from sgg.convert import DEFAULT_DISCRIMINATOR_MAPPING, DISCRIMINATOR_EXCLUDE

    critic, params = critic_and_init
    tf_vars = _fake_tf_critic_vars(params["params"])
    new_p, unmatched = convert_from_arrays(
        tf_vars, params["params"], mapping=DEFAULT_DISCRIMINATOR_MAPPING,
        exclude=DISCRIMINATOR_EXCLUDE,
    )
    assert unmatched == []
    assert np.allclose(
        np.asarray(new_p["trunk_1"]["kernel"]),
        tf_vars["discriminator/trunk_1/weights"],
    )
    assert np.allclose(
        np.asarray(new_p["ln_2"]["scale"]), tf_vars["discriminator/ln_2/gamma"]
    )
    feats = jnp.asarray(np.random.RandomState(0).randn(B, R, F), jnp.float32)
    score = critic.apply({"params": new_p}, feats, jnp.full((B, 3, V), 1.0 / V))
    assert score.shape == (B,)


def test_combined_namespace_no_cross_matching(gen_and_init, critic_and_init):
    """One Saver checkpoint holds G and D vars; each conversion must scope
    itself — 'discriminator/embedding' must not feed the generator's
    embedding (or trip the ambiguity check)."""
    from sgg.convert import (
        DEFAULT_DISCRIMINATOR_MAPPING,
        DISCRIMINATOR_EXCLUDE,
        GENERATOR_EXCLUDE,
    )

    _, g_init = gen_and_init
    _, d_init = critic_and_init
    both = {**_fake_tf_vars(g_init), **_fake_tf_critic_vars(d_init["params"])}
    g_p, g_un = convert_from_arrays(
        both, g_init["params"], exclude=GENERATOR_EXCLUDE
    )
    d_p, d_un = convert_from_arrays(
        both, d_init["params"], mapping=DEFAULT_DISCRIMINATOR_MAPPING,
        exclude=DISCRIMINATOR_EXCLUDE,
    )
    assert g_un == [] and d_un == []
    assert np.allclose(
        np.asarray(g_p["token_embedding"]), both["generator/embedding/weights"]
    )
    assert np.allclose(
        np.asarray(d_p["token_embedding"]),
        both["discriminator/embedding/weights"],
    )


def test_match_report(gen_and_init, critic_and_init):
    from sgg.convert import (
        DEFAULT_DISCRIMINATOR_MAPPING,
        DEFAULT_GENERATOR_MAPPING,
        DISCRIMINATOR_EXCLUDE,
        GENERATOR_EXCLUDE,
        match_report,
    )

    _, g_init = gen_and_init
    _, d_init = critic_and_init
    both = {**_fake_tf_vars(g_init), **_fake_tf_critic_vars(d_init["params"])}
    both["global_step"] = np.int64(7)  # Saver always writes bookkeeping vars
    rep = match_report(
        both,
        {
            "generator": (g_init["params"], DEFAULT_GENERATOR_MAPPING,
                          GENERATOR_EXCLUDE),
            "discriminator": (d_init["params"], DEFAULT_DISCRIMINATOR_MAPPING,
                              DISCRIMINATOR_EXCLUDE),
        },
    )
    assert not rep["unmatched_params"] and not rep["ambiguous"]
    assert rep["unused_vars"] == ["global_step"]
    assert len(rep["matched"]) == len(both) - 1


def test_vgg_npy_golden_layout():
    """machrisaa .npy key layout ('convN_M' → [kernel(3,3,in,out), bias]) →
    VGG19Features params, verified value-for-value and by a forward pass."""
    from sgg.models.vgg import _CFG, VGG19Features, load_npy_weights

    r = np.random.RandomState(5)
    raw, in_ch = {}, 3
    for block, n_convs, ch in _CFG:
        for i in range(1, n_convs + 1):
            raw[f"conv{block}_{i}"] = [
                r.randn(3, 3, in_ch, ch).astype(np.float32) * 0.05,
                r.randn(ch).astype(np.float32) * 0.01,
            ]
            in_ch = ch
    variables = load_npy_weights(raw)
    assert np.allclose(
        np.asarray(variables["params"]["conv3_2/kernel"]), raw["conv3_2"][0]
    )
    assert np.allclose(
        np.asarray(variables["params"]["conv5_4/bias"]), raw["conv5_4"][1]
    )
    model = VGG19Features()
    img = jnp.asarray(r.randn(1, 32, 32, 3), jnp.float32)
    feats = model.apply(variables, img)
    assert feats.shape == (1, 4, 512)  # stride 16: 32px → 2×2 regions
    assert np.isfinite(np.asarray(feats)).all()


def test_fixed_seed_decode_golden(gen_and_init):
    """Bit-stability regression: same params + seed ⇒ same tokens, always.

    Guards the decode path against silent numeric/semantic drift — the
    in-repo stand-in for reference bit-comparability until the reference
    mount appears (SURVEY.md §7 hard part #6)."""
    gen, params = gen_and_init
    feats = jnp.asarray(np.random.RandomState(3).randn(B, R, F), jnp.float32)
    z = jnp.asarray(np.random.RandomState(4).randn(B, Z), jnp.float32)
    out1 = gen.apply(params, feats, z, jax.random.key(9), tau=0.5, hard=True)
    out2 = gen.apply(params, feats, z, jax.random.key(9), tau=0.5, hard=True)
    np.testing.assert_array_equal(np.asarray(out1["tokens"]), np.asarray(out2["tokens"]))
    jit_out = jax.jit(
        lambda p, f, z, k: gen.apply(p, f, z, k, tau=0.5, hard=True)["tokens"]
    )(params, feats, z, jax.random.key(9))
    np.testing.assert_array_equal(np.asarray(out1["tokens"]), np.asarray(jit_out))
