"""Encoder + transformer-decoder tests (shapes, weight loading, interface parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgg.models import (
    ResNet50Features,
    TransformerTripleGenerator,
    ViTB16Features,
    VGG19Features,
    load_npy_weights,
    make_encoder,
    vgg_preprocess,
)


def test_vgg_preprocess_bgr_mean():
    img = jnp.ones((1, 2, 2, 3)) * jnp.asarray([10.0, 20.0, 30.0])
    out = np.asarray(vgg_preprocess(img))
    # channel order flipped to BGR, then mean-subtracted
    np.testing.assert_allclose(out[0, 0, 0], [30 - 103.939, 20 - 116.779, 10 - 123.68])


def test_vgg19_shapes_and_npy_roundtrip():
    model = VGG19Features()
    x = jnp.zeros((2, 32, 32, 3))
    params = model.init(jax.random.key(0), x)
    out = model.apply(params, x)
    assert out.shape == (2, 4, 512)  # 32/16 = 2 → 2·2 regions

    # machrisaa-style dict load: keys map 1:1 onto module params
    raw = {
        name: [np.asarray(p[f"{name}/kernel"]), np.asarray(p[f"{name}/bias"])]
        for p in [params["params"]]
        for name in {k.rsplit("/", 1)[0] for k in p}
    }
    loaded = load_npy_weights(raw)
    out2 = model.apply(loaded, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), rtol=1e-6)


def test_resnet50_shapes():
    model = ResNet50Features()
    x = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.key(0), x)
    out = model.apply(params, x)
    assert out.shape == (1, 4, 2048)  # 64/32 = 2 → 2·2 regions
    n_params = sum(p.size for p in jax.tree.leaves(params))
    # ResNet-50 has ~25.5M params; BN stats add ~4×53k more
    assert 23e6 < n_params < 28e6


def test_vit_b16_shapes_small():
    model = ViTB16Features(embed_dim=64, num_heads=4, num_layers=2, num_patches=16)
    x = jnp.zeros((2, 64, 64, 3))
    params = model.init(jax.random.key(0), x)
    out = model.apply(params, x)
    assert out.shape == (2, 16, 64)  # (64/16)² = 16 patch tokens


def test_encoder_factory():
    assert make_encoder("precomputed") is None
    assert isinstance(make_encoder("vgg19"), VGG19Features)
    assert isinstance(make_encoder("resnet50"), ResNet50Features)
    assert isinstance(make_encoder("vit_b16"), ViTB16Features)
    with pytest.raises(ValueError):
        make_encoder("alexnet")


B, R, F, V = 4, 9, 32, 24


def test_transformer_generator_interface_parity():
    """Must expose the exact same call/return contract as the LSTM decoder."""
    gen = TransformerTripleGenerator(
        vocab_size=V, hidden=32, embed_dim=16, noise_dim=8,
        num_heads=4, num_layers=2,
    )
    feats = jnp.asarray(np.random.RandomState(0).randn(B, R, F), jnp.float32)
    z = jnp.zeros((B, 8))
    params = gen.init(jax.random.key(0), feats, z, jax.random.key(1))

    mask = np.zeros((3, V), bool)
    mask[0, 2:10] = mask[2, 2:10] = True
    mask[1, 10:14] = True
    out = gen.apply(
        params, feats, z, jax.random.key(2), tau=1.0, hard=True,
        step_mask=jnp.asarray(mask),
    )
    assert out["soft"].shape == (B, 3, V)
    assert out["logits"].shape == (B, 3, V)
    assert out["attention"].shape == (B, 3, R)
    assert out["tokens"].shape == (B, 3)
    np.testing.assert_allclose(
        np.asarray(out["attention"].sum(-1)), np.ones((B, 3)), rtol=1e-4
    )
    toks = np.asarray(out["tokens"])
    assert ((toks[:, 0] >= 2) & (toks[:, 0] < 10)).all()
    assert ((toks[:, 1] >= 10) & (toks[:, 1] < 14)).all()

    # gradient flow through gumbel to params
    def loss(p):
        o = gen.apply(p, feats, z, jax.random.key(2), tau=1.0)
        return (o["soft"] ** 2).sum()

    g = jax.grad(loss)(params)
    assert sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(g)) > 0


def test_transformer_decoder_in_fused_step():
    """decoder='transformer' drops into the fused train step unchanged."""
    from sgg.config import get_config
    from sgg.train.state import create_train_state
    from sgg.train.step import make_train_step

    cfg = get_config("smoke")
    cfg.model.decoder = "transformer"
    cfg.model.vocab_size = V
    cfg.model.num_heads = 4
    cfg.model.num_layers = 2
    cfg.data.regions, cfg.data.feat_dim = R, F
    cfg.train.batch_size, cfg.train.n_critic = B, 2

    state = create_train_state(cfg, jax.random.key(0))
    step = make_train_step(cfg, donate=False)
    r = np.random.RandomState(0)
    batch = {
        "features": jnp.asarray(r.randn(3, B, R, F), jnp.float32),
        "triples": jnp.asarray(r.randint(2, V, (3, B, 3)), jnp.int32),
    }
    new_state, metrics = step(state, batch)
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["d_loss"]))
    assert np.isfinite(float(metrics["g_loss"]))
