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
