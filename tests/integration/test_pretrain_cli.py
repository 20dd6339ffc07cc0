"""CLI chain: synth corpus → pretrain → preprocess --encoder-ckpt → shards.

The offline stand-in for the reference's pretrained-VGG path
(SURVEY.md §2.1 #2; VERDICT r2 item 1)."""

import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    from sgg.data.synthetic import write_synthetic_vg_corpus

    info = write_synthetic_vg_corpus(
        str(d), num_images=20, seed=1, max_rels=4,
        vocab_objects=None, vocab_predicates=None, width=96, height=96,
        log_every=0,
    )
    assert info["num_images"] == 20
    return d


def test_pretrain_then_preprocess(corpus, tmp_path_factory, capsys):
    from sgg.cli import preprocess as cli_preprocess
    from sgg.cli import pretrain as cli_pretrain

    enc_dir = tmp_path_factory.mktemp("enc")
    rc = cli_pretrain.main([
        "--vg-dir", str(corpus), "--image-dir", os.path.join(str(corpus), "images"),
        "--out-dir", str(enc_dir), "--steps", "6", "--batch-size", "4",
        "--image-size", "32", "--dtype", "float32", "--log-every", "3",
    ])
    assert rc == 0
    assert (enc_dir / "encoder_params.npz").exists()
    meta = json.load(open(enc_dir / "pretrain_meta.json"))
    assert meta["encoder"] == "vgg19" and meta["image_size"] == 32

    out_dir = tmp_path_factory.mktemp("shards")
    rc = cli_preprocess.main([
        "--out-dir", str(out_dir), "--vg-dir", str(corpus),
        "--image-dir", os.path.join(str(corpus), "images"),
        "--encoder", "vgg19", "--encoder-ckpt", str(enc_dir),
        "--min-count", "1", "--batch-size", "4", "--test-fraction", "0.2",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "encoder weights ←" in out
    from sgg.data.shards import read_feature_shard

    shard = read_feature_shard(str(out_dir / "shard-00000-of-00001.npz"))
    # 32px through VGG → 2×2 conv5 grid = 4 regions of 512
    assert shard["features"].shape[1:] == (4, 512)
    assert np.isfinite(shard["features"]).all()


def test_pretrain_spatial_auto_on_grounded(tmp_path_factory, capsys):
    """On a grounded corpus (boxes in the JSON) --spatial auto switches the
    per-cell owner task on and reports cell accuracy end-to-end."""
    from sgg.cli import pretrain as cli_pretrain
    from sgg.data.synthetic import write_synthetic_vg_corpus

    d = tmp_path_factory.mktemp("gcorpus")
    write_synthetic_vg_corpus(
        str(d), num_images=20, seed=2, max_rels=4,
        vocab_objects=None, vocab_predicates=None, width=96, height=96,
        log_every=0, grounded=True,
    )
    enc_dir = tmp_path_factory.mktemp("genc")
    rc = cli_pretrain.main([
        "--vg-dir", str(d), "--image-dir", os.path.join(str(d), "images"),
        "--out-dir", str(enc_dir), "--steps", "6", "--batch-size", "4",
        "--image-size", "32", "--dtype", "float32", "--log-every", "3",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "spatial task ON" in out
    assert "cell_acc=" in out
    meta = json.load(open(enc_dir / "pretrain_meta.json"))
    assert meta["spatial"] is True
    assert "cell_acc" in meta["held_out"]
