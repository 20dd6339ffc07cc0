"""End-to-end (on-device features) training path [B:8]: uint8 images enter
the fused step, the frozen backbone runs inside it, GAN updates follow.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgg.config import get_config
from sgg.data import make_train_iterator
from sgg.data.images import ArrayImageTripleDataset
from sgg.train.state import create_train_state
from sgg.train.step import make_train_step

V = 26


def _cfg(encoder, regions, feat_dim, image_size=32):
    cfg = get_config("smoke")
    cfg.model.encoder = encoder
    cfg.model.vocab_size = V
    cfg.data.regions, cfg.data.feat_dim = regions, feat_dim
    cfg.data.image_size = image_size
    cfg.train.batch_size = 2
    cfg.train.n_critic = 1
    return cfg


@pytest.mark.parametrize(
    "encoder,regions,feat_dim",
    [("vgg19", 4, 512), ("vit_b16", 4, 768), ("resnet50", 1, 2048)],
)
def test_fused_step_with_on_device_encoder(encoder, regions, feat_dim):
    cfg = _cfg(encoder, regions, feat_dim)
    if encoder == "vit_b16":
        cfg.model.num_heads = 4  # keep tiny; full ViT-B is too slow for CI
    state = create_train_state(cfg, jax.random.key(0))
    assert state.enc_params is not None
    step = make_train_step(cfg, donate=False)

    r = np.random.RandomState(0)
    n_sub = cfg.train.n_critic + 1
    batch = {
        "images": jnp.asarray(
            r.randint(0, 256, (n_sub, 2, 32, 32, 3)), jnp.uint8
        ),
        "triples": jnp.asarray(r.randint(2, V, (n_sub, 2, 3)), jnp.int32),
    }
    new_state, metrics = step(state, batch)
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["d_loss"]))
    # frozen backbone untouched
    for a, b in zip(
        jax.tree.leaves(state.enc_params), jax.tree.leaves(new_state.enc_params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_full_vit_transformer_config_in_fused_step():
    """The [B:10] combination end-to-end: ViT encoder + transformer decoder
    (+ flash-attention kernels when on TPU) inside one fused update."""
    cfg = _cfg("vit_b16", 4, 768)
    cfg.model.decoder = "transformer"
    cfg.model.num_heads = 4
    cfg.model.num_layers = 2
    state = create_train_state(cfg, jax.random.key(0))
    step = make_train_step(cfg, donate=False)
    r = np.random.RandomState(3)
    batch = {
        "images": jnp.asarray(r.randint(0, 256, (2, 2, 32, 32, 3)), jnp.uint8),
        "triples": jnp.asarray(r.randint(2, V, (2, 2, 3)), jnp.int32),
    }
    new_state, metrics = step(state, batch)
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["d_loss"]))
    assert np.isfinite(float(metrics["g_loss"]))


def test_image_iterator_feeds_fused_step():
    cfg = _cfg("vgg19", 4, 512)
    r = np.random.RandomState(1)
    ds = ArrayImageTripleDataset(
        images=r.randint(0, 256, (16, 32, 32, 3), dtype=np.uint8),
        triples=[r.randint(2, V, (3, 3)).astype(np.int32) for _ in range(16)],
    )
    it = make_train_iterator(
        ds, cfg.train.batch_size, cfg.train.n_critic, seed=0,
        process_index=0, process_count=1, device_put=False, prefetch=0,
    )
    b = next(it)
    assert b["images"].shape == (2, 2, 32, 32, 3)
    assert b["images"].dtype == np.uint8
    state = create_train_state(cfg, jax.random.key(0))
    step = make_train_step(cfg, donate=False)
    _, metrics = step(state, b)
    assert np.isfinite(float(metrics["g_loss"]))
