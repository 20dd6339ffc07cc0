"""Sequence-parallel ViT attention inside the fused GSPMD train step."""

import jax
import jax.numpy as jnp
import numpy as np

from sgg.config import get_config
from sgg.dist import MeshSpec, make_mesh, place_state
from sgg.train.state import create_train_state
from sgg.train.step import make_train_step_gspmd

V = 26


def test_gspmd_step_with_ulysses_vit():
    cfg = get_config("smoke")
    cfg.model.encoder = "vit_b16"
    cfg.model.sp_mode = "ulysses"
    cfg.model.vocab_size = V
    cfg.model.num_heads = 4
    # Tiny ViT (vit_dims): the Ulysses all_to_all + sharding being pinned
    # are dimension-independent; B/16 dims only buy CPU compile time.
    cfg.model.vit_dim, cfg.model.vit_layers, cfg.model.vit_heads = 128, 2, 4
    cfg.data.regions, cfg.data.feat_dim = 4, 128
    cfg.data.image_size = 32
    cfg.train.batch_size = 4
    cfg.train.n_critic = 1
    cfg.mesh.model = 2

    mesh = make_mesh(MeshSpec(data=4, model=2))
    step, state_sh = make_train_step_gspmd(cfg, mesh, tp=False, donate=False)
    state = place_state(create_train_state(cfg, jax.random.key(0)), state_sh)

    r = np.random.RandomState(0)
    batch = {
        "images": jnp.asarray(r.randint(0, 256, (2, 4, 32, 32, 3)), jnp.uint8),
        "triples": jnp.asarray(r.randint(2, V, (2, 4, 3)), jnp.int32),
    }
    new_state, metrics = step(state, batch)
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["d_loss"]))
    assert np.isfinite(float(metrics["g_loss"]))
