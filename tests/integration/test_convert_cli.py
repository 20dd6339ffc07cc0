"""convert CLI: reference npz + vocab → workdir that generate can consume."""

import json

import numpy as np
import pytest

from sgg.cli import convert as cli_convert
from sgg.cli import generate as cli_generate


def test_convert_then_generate(tmp_path):
    import jax

    from sgg.config import get_config
    from sgg.data.vocab import Vocab
    from sgg.train.state import create_train_state

    vocab = Vocab.build(
        {c: 10 - i for i, c in enumerate("abcdefgh")}, {"on": 5, "near": 4}
    )
    vocab.save(str(tmp_path / "vocab.json"))

    cfg = get_config("smoke")
    cfg.model.vocab_size = len(vocab)
    p = create_train_state(cfg, jax.random.key(0)).g_params
    r = np.random.RandomState(11)
    rnd = lambda a: (r.randn(*np.shape(a)) * 0.1).astype(np.float32)
    np.savez(
        str(tmp_path / "ref.npz"),
        **{
            "generator/embedding/weights": rnd(p["token_embedding"]),
            "generator/init_c/weights": rnd(p["init_c"]["kernel"]),
            "generator/init_c/biases": rnd(p["init_c"]["bias"]),
            "generator/init_h/weights": rnd(p["init_h"]["kernel"]),
            "generator/init_h/biases": rnd(p["init_h"]["bias"]),
            "generator/rnn/basic_lstm_cell/kernel": rnd(p["TF1LSTMCell_0"]["kernel"]),
            "generator/rnn/basic_lstm_cell/bias": rnd(p["TF1LSTMCell_0"]["bias"]),
            "generator/attention/feat_proj/weights": rnd(
                p["AdditiveAttention_0"]["feat_proj"]["kernel"]),
            "generator/attention/state_proj/weights": rnd(
                p["AdditiveAttention_0"]["state_proj"]["kernel"]),
            "generator/attention/state_proj/biases": rnd(
                p["AdditiveAttention_0"]["state_proj"]["bias"]),
            "generator/attention/score/weights": rnd(
                p["AdditiveAttention_0"]["score"]["kernel"]),
            "generator/deep_out/weights": rnd(p["deep_out"]["kernel"]),
            "generator/deep_out/biases": rnd(p["deep_out"]["bias"]),
            "generator/logits/weights": rnd(p["vocab_proj"]["kernel"]),
            "generator/logits/biases": rnd(p["vocab_proj"]["bias"]),
        },
    )

    wd = str(tmp_path / "converted")
    rc = cli_convert.main(
        ["--config", "smoke", "--workdir", wd,
         "--npz", str(tmp_path / "ref.npz"),
         "--vocab", str(tmp_path / "vocab.json")]
    )
    assert rc == 0

    out = str(tmp_path / "graphs.json")
    rc = cli_generate.main(
        ["--workdir", wd, "--out", out, "--num-samples", "4",
         "--num-images", "4", "--batch-size", "4"]
    )
    assert rc == 0
    d = json.load(open(out))
    assert len(d["scene_graphs"]) == 4
    # decoded tokens come from the converted vocab
    t = d["scene_graphs"][0]["triples"][0]
    assert t["subject"] in vocab.tokens and t["predicate"] in vocab.tokens


def test_convert_requires_source(tmp_path, capsys):
    with pytest.raises(SystemExit):
        cli_convert.main(["--workdir", str(tmp_path), "--vocab", "x.json"])


def _full_ref_npz(tmp_path):
    """G+D reference-style npz for a smoke-config state."""
    import jax

    from sgg.config import get_config
    from sgg.data.vocab import Vocab
    from sgg.train.state import create_train_state

    vocab = Vocab.build(
        {c: 10 - i for i, c in enumerate("abcdefgh")}, {"on": 5, "near": 4}
    )
    vocab.save(str(tmp_path / "vocab.json"))
    cfg = get_config("smoke")
    cfg.model.vocab_size = len(vocab)
    st = create_train_state(cfg, jax.random.key(0))
    g, d = st.g_params, st.d_params
    r = np.random.RandomState(3)
    rnd = lambda a: (r.randn(*np.shape(a)) * 0.1).astype(np.float32)
    vars_ = {
        "generator/embedding/weights": rnd(g["token_embedding"]),
        "generator/init_c/weights": rnd(g["init_c"]["kernel"]),
        "generator/init_c/biases": rnd(g["init_c"]["bias"]),
        "generator/init_h/weights": rnd(g["init_h"]["kernel"]),
        "generator/init_h/biases": rnd(g["init_h"]["bias"]),
        "generator/rnn/basic_lstm_cell/kernel": rnd(g["TF1LSTMCell_0"]["kernel"]),
        "generator/rnn/basic_lstm_cell/bias": rnd(g["TF1LSTMCell_0"]["bias"]),
        "generator/attention/feat_proj/weights": rnd(
            g["AdditiveAttention_0"]["feat_proj"]["kernel"]),
        "generator/attention/state_proj/weights": rnd(
            g["AdditiveAttention_0"]["state_proj"]["kernel"]),
        "generator/attention/state_proj/biases": rnd(
            g["AdditiveAttention_0"]["state_proj"]["bias"]),
        "generator/attention/score/weights": rnd(
            g["AdditiveAttention_0"]["score"]["kernel"]),
        "generator/deep_out/weights": rnd(g["deep_out"]["kernel"]),
        "generator/deep_out/biases": rnd(g["deep_out"]["bias"]),
        "generator/logits/weights": rnd(g["vocab_proj"]["kernel"]),
        "generator/logits/biases": rnd(g["vocab_proj"]["bias"]),
        "discriminator/embedding/weights": rnd(d["token_embedding"]),
        "discriminator/query_proj/weights": rnd(d["query_proj"]["kernel"]),
        "discriminator/query_proj/biases": rnd(d["query_proj"]["bias"]),
        "discriminator/key_proj/weights": rnd(d["key_proj"]["kernel"]),
        "discriminator/score/weights": rnd(d["score"]["kernel"]),
        "discriminator/head/weights": rnd(d["head"]["kernel"]),
        "discriminator/head/biases": rnd(d["head"]["bias"]),
        "global_step": np.int64(123),
    }
    for i in range(3):
        vars_[f"discriminator/trunk_{i}/weights"] = rnd(d[f"trunk_{i}"]["kernel"])
        vars_[f"discriminator/trunk_{i}/biases"] = rnd(d[f"trunk_{i}"]["bias"])
        vars_[f"discriminator/ln_{i}/gamma"] = rnd(d[f"ln_{i}"]["scale"])
        vars_[f"discriminator/ln_{i}/beta"] = rnd(d[f"ln_{i}"]["bias"])
    np.savez(str(tmp_path / "ref_full.npz"), **vars_)
    return vars_


def test_convert_dry_run_match_report(tmp_path, capsys):
    vars_ = _full_ref_npz(tmp_path)
    rc = cli_convert.main(
        ["--config", "smoke", "--dry-run",
         "--npz", str(tmp_path / "ref_full.npz"),
         "--vocab", str(tmp_path / "vocab.json")]
    )
    out = capsys.readouterr().out
    assert rc == 0  # everything matched → clean report
    assert "dry run:" in out
    assert f"{len(vars_) - 1} matched" in out  # all but global_step
    assert "unused    global_step" in out
    assert "UNMATCHED" not in out and "AMBIGUOUS" not in out


def test_convert_full_gan_then_restore(tmp_path):
    """G+D conversion writes a workdir whose checkpoint restores both nets
    with the reference arrays in place."""
    import jax

    vars_ = _full_ref_npz(tmp_path)
    wd = str(tmp_path / "converted_full")
    rc = cli_convert.main(
        ["--config", "smoke", "--workdir", wd,
         "--npz", str(tmp_path / "ref_full.npz"),
         "--vocab", str(tmp_path / "vocab.json")]
    )
    assert rc == 0

    from sgg.train.checkpoint import CheckpointManager, load_workdir
    from sgg.train.state import create_train_state

    cfg, vocab = load_workdir(wd)
    cfg.model.vocab_size = len(vocab)
    st = create_train_state(cfg, jax.random.key(5))
    restored = CheckpointManager(wd, cfg).restore(st)
    np.testing.assert_allclose(
        np.asarray(restored.g_params["token_embedding"]),
        vars_["generator/embedding/weights"],
    )
    np.testing.assert_allclose(
        np.asarray(restored.d_params["trunk_0"]["kernel"]),
        vars_["discriminator/trunk_0/weights"],
    )
