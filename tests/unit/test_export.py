"""AOT export tier (sgg/export.py): artifact round-trip contracts.

The bar is bit-identity: the exported StableHLO program must reproduce the
live sampler's tokens exactly (same rng plumbing, same dtype flow), and the
artifact must be consumable with jax + numpy only — meta carries the vocab.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgg.config import get_config
from sgg.data.vocab import Vocab
from sgg.eval.sampler import make_sampler
from sgg.export import (
    decode_tokens,
    export_sampler,
    load_artifact,
    save_artifact,
)
from sgg.train.state import make_models


@pytest.fixture(scope="module")
def setup():
    cfg = get_config("smoke")
    tokens = ["<pad>", "<unk>"] + [f"obj{i}" for i in range(12)] + [
        f"pred{i}" for i in range(6)
    ]
    vocab = Vocab(
        tokens=tokens,
        is_object=[False, False] + [True] * 12 + [False] * 6,
        is_predicate=[False, False] + [False] * 12 + [True] * 6,
    )
    cfg.model.vocab_size = len(vocab)
    cfg.data.regions, cfg.data.feat_dim = 9, 24
    gen, _ = make_models(cfg)
    r = np.random.RandomState(0)
    feats = jnp.asarray(r.randn(4, 9, 24), jnp.float32)
    z = jnp.asarray(r.randn(4, cfg.model.noise_dim), jnp.float32)
    g_params = gen.init(jax.random.key(0), feats, z, jax.random.key(1))["params"]
    return cfg, vocab, g_params, feats


def test_artifact_roundtrip_bit_identical(setup, tmp_path):
    cfg, vocab, g_params, feats = setup
    exported, flat, meta = export_sampler(
        cfg, vocab, g_params, batch_size=4, num_samples=3,
        platforms=("cpu",),
    )
    path = str(tmp_path / "model.sgx")
    save_artifact(path, exported, flat, meta)

    call, meta2 = load_artifact(path)
    key = jax.random.key(7)
    got = np.asarray(call(np.asarray(feats),
                          np.asarray(jax.random.key_data(key))))
    live = make_sampler(cfg, step_mask=vocab.step_mask(), num_samples=3)
    want = np.asarray(live(g_params, feats, key))
    np.testing.assert_array_equal(got, want)
    assert got.shape == (4, 3, 3) and got.dtype == np.int32


def test_artifact_meta_is_self_contained(setup, tmp_path):
    cfg, vocab, g_params, feats = setup
    exported, flat, meta = export_sampler(
        cfg, vocab, g_params, batch_size=2, num_samples=2, platforms=("cpu",),
    )
    path = str(tmp_path / "m.sgx")
    save_artifact(path, exported, flat, meta)
    # meta survives json round-trip inside the npz and carries the vocab
    z = np.load(path, allow_pickle=False)
    m = json.loads(str(z["meta"]))
    assert m["vocab_tokens"] == list(vocab.tokens)
    assert m["batch_size"] == 2 and m["num_samples"] == 2
    # token decode without any sgg vocab object
    call, meta2 = load_artifact(path)
    toks = call(np.zeros((2, 9, 24), np.float32),
                np.asarray(jax.random.key_data(jax.random.key(0))))
    triples = decode_tokens(toks, meta2)
    assert len(triples) == 2 and len(triples[0]) == 2
    assert all(isinstance(t, str) for t in triples[0][0])


def test_polymorphic_batch_artifact(setup, tmp_path):
    """batch_size=0 → a shape-polymorphic program callable at any batch."""
    cfg, vocab, g_params, feats = setup
    exported, flat, meta = export_sampler(
        cfg, vocab, g_params, batch_size=0, num_samples=3, platforms=("cpu",),
    )
    path = str(tmp_path / "poly.sgx")
    save_artifact(path, exported, flat, meta)
    call, meta2 = load_artifact(path)
    assert meta2["batch_size"] == 0
    kd = np.asarray(jax.random.key_data(jax.random.key(7)))
    live = make_sampler(cfg, step_mask=vocab.step_mask(), num_samples=3)
    for n in (1, 4):
        f = np.asarray(feats)[:n]
        got = np.asarray(call(f, kd))
        want = np.asarray(live(g_params, jnp.asarray(f), jax.random.key(7)))
        np.testing.assert_array_equal(got, want)
        assert got.shape == (n, 3, 3)


@pytest.mark.parametrize("quant", ["", "int8"])
def test_pixels_artifact_matches_live_pipeline(setup, tmp_path, quant):
    """Images-in artifact: the baked (optionally int8) backbone + sampler
    reproduce the live encode→sample path token-for-token."""
    from sgg.models.encoders import make_encoder, normalize_for

    cfg, vocab, g_params, _ = setup
    cfg = get_config("smoke")
    cfg.model.vocab_size = len(vocab)
    cfg.model.encoder = "vgg19"
    cfg.data.image_size = 32
    cfg.data.regions, cfg.data.feat_dim = 4, 512
    gen, _ = make_models(cfg)
    r = np.random.RandomState(1)
    imgs = r.randint(0, 256, (2, 32, 32, 3)).astype(np.uint8)
    enc = make_encoder("vgg19", quant=quant)
    enc_params = enc.init(jax.random.key(2),
                          normalize_for("vgg19", jnp.asarray(imgs)))
    feats = enc.apply(enc_params, normalize_for("vgg19", jnp.asarray(imgs)))
    z = jnp.asarray(r.randn(2, cfg.model.noise_dim), jnp.float32)
    gp = gen.init(jax.random.key(0), feats, z, jax.random.key(1))["params"]

    exported, flat, meta = export_sampler(
        cfg, vocab, gp, enc_params=enc_params, quant=quant,
        batch_size=2, num_samples=3, platforms=("cpu",),
    )
    path = str(tmp_path / f"pix{quant}.sgx")
    save_artifact(path, exported, flat, meta)
    call, meta2 = load_artifact(path)
    assert meta2["input"] == "images" and meta2["quant"] == quant
    key = jax.random.key(5)
    got = np.asarray(call(imgs, np.asarray(jax.random.key_data(key))))
    live = make_sampler(cfg, step_mask=vocab.step_mask(), num_samples=3)
    want = np.asarray(live(gp, feats, key))
    np.testing.assert_array_equal(got, want)


def test_step_mask_respected_in_artifact(setup, tmp_path):
    """The vocab legality mask is baked into the exported program: subjects/
    objects decode to object tokens, predicates to predicate tokens."""
    cfg, vocab, g_params, feats = setup
    exported, flat, meta = export_sampler(
        cfg, vocab, g_params, batch_size=4, num_samples=8, platforms=("cpu",),
    )
    path = str(tmp_path / "masked.sgx")
    save_artifact(path, exported, flat, meta)
    call, meta2 = load_artifact(path)
    toks = np.asarray(call(np.asarray(feats),
                           np.asarray(jax.random.key_data(jax.random.key(3)))))
    flat_toks = toks.reshape(-1, 3)
    assert all(meta2["vocab_is_object"][s] for s in flat_toks[:, 0])
    assert all(meta2["vocab_is_predicate"][p] for p in flat_toks[:, 1])
    assert all(meta2["vocab_is_object"][o] for o in flat_toks[:, 2])
