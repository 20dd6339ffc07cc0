"""Read a real TF1 Saver checkpoint through the converter (SURVEY.md §4
"Golden/parity": load reference weights, run one forward pass)."""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")


def test_tf1_saver_checkpoint_roundtrip(tmp_path):
    """Write a name-based v1 checkpoint, read it back, convert, forward."""
    import jax
    import jax.numpy as jnp

    from sgg.convert import convert_from_arrays, read_tf_checkpoint
    from sgg.models import AttentionLSTMGenerator

    V, H, E, A, Z, R, F, B = 24, 32, 16, 16, 8, 9, 16, 2
    gen = AttentionLSTMGenerator(
        vocab_size=V, hidden=H, embed_dim=E, attn_dim=A, noise_dim=Z
    )
    params = gen.init(
        jax.random.key(0), jnp.zeros((B, R, F)), jnp.zeros((B, Z)), jax.random.key(1)
    )
    p = params["params"]

    r = np.random.RandomState(3)
    ref_vars = {
        "generator/embedding/weights": r.randn(V, E).astype(np.float32) * 0.1,
        "generator/init_c/weights": r.randn(F, H).astype(np.float32) * 0.1,
        "generator/init_c/biases": r.randn(H).astype(np.float32) * 0.1,
        "generator/init_h/weights": r.randn(F, H).astype(np.float32) * 0.1,
        "generator/init_h/biases": r.randn(H).astype(np.float32) * 0.1,
        "generator/rnn/basic_lstm_cell/kernel": r.randn(
            *p["TF1LSTMCell_0"]["kernel"].shape
        ).astype(np.float32) * 0.1,
        "generator/rnn/basic_lstm_cell/bias": r.randn(4 * H).astype(np.float32) * 0.1,
        "generator/attention/feat_proj/weights": r.randn(F, A).astype(np.float32) * 0.1,
        "generator/attention/state_proj/weights": r.randn(H, A).astype(np.float32) * 0.1,
        "generator/attention/state_proj/biases": r.randn(A).astype(np.float32) * 0.1,
        "generator/attention/score/weights": r.randn(A, 1).astype(np.float32) * 0.1,
        "generator/deep_out/weights": r.randn(H + F, E).astype(np.float32) * 0.1,
        "generator/deep_out/biases": r.randn(E).astype(np.float32) * 0.1,
        "generator/logits/weights": r.randn(E, V).astype(np.float32) * 0.1,
        "generator/logits/biases": r.randn(V).astype(np.float32) * 0.1,
    }

    # Write with the v1 name-based Saver (the reference's checkpoint format).
    tf.compat.v1.reset_default_graph()
    with tf.compat.v1.Session() as sess:
        for name, arr in ref_vars.items():
            tf.compat.v1.get_variable(name, initializer=arr)
        sess.run(tf.compat.v1.global_variables_initializer())
        saver = tf.compat.v1.train.Saver()
        ckpt_prefix = str(tmp_path / "model.ckpt")
        saver.save(sess, ckpt_prefix)

    loaded = read_tf_checkpoint(ckpt_prefix)
    assert set(loaded) == set(ref_vars)
    for k in ref_vars:
        np.testing.assert_array_equal(loaded[k], ref_vars[k])

    new_p, unmatched = convert_from_arrays(loaded, p)
    assert unmatched == []
    np.testing.assert_array_equal(
        np.asarray(new_p["TF1LSTMCell_0"]["kernel"]),
        ref_vars["generator/rnn/basic_lstm_cell/kernel"],
    )
    feats = jnp.asarray(np.random.RandomState(0).randn(B, R, F), jnp.float32)
    out = gen.apply(
        {"params": new_p}, feats, jnp.zeros((B, Z)), jax.random.key(2), hard=True
    )
    assert out["tokens"].shape == (B, 3)
