"""DP×SP×PP composition on a 3-axis ('data','seq','model') mesh.

Round-2 weak #4: SP and PP used to be mutually exclusive because both
consumed the single 'model' axis. With MeshSpec.seq > 1 the pipeline keeps
its stages on 'model' while the blocks' attention rings over 'seq' inside
the pipeline's shard_map — these tests pin that the composed path is
numerically the plain forward/step, and that the 2-axis combination still
raises with actionable guidance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgg.dist import MeshSpec, make_mesh


def _mesh3(data=2, seq=2, model=2):
    return make_mesh(
        MeshSpec(data=data, seq=seq, model=model),
        devices=jax.devices()[: data * seq * model],
    )


def test_mesh_spec_seq_axis():
    mesh = _mesh3()
    assert mesh.axis_names == ("data", "seq", "model")
    assert dict(mesh.shape) == {"data": 2, "seq": 2, "model": 2}
    # seq=1 keeps the 2-axis layout for existing consumers
    mesh2 = make_mesh(MeshSpec(data=2, model=2), devices=jax.devices()[:4])
    assert mesh2.axis_names == ("data", "model")


@pytest.mark.parametrize("sp_mode", ["ring", "ulysses"])
def test_pipeline_vit_seq_sharded_matches_sequential(sp_mode):
    from sgg.dist.pipeline_parallel import pipeline_vit_features
    from sgg.models.vit import ViTB16Features

    m = ViTB16Features(
        embed_dim=32, num_heads=4, num_layers=4, num_patches=4, patch=16
    )
    x = jnp.asarray(np.random.RandomState(0).rand(8, 32, 32, 3), jnp.float32)
    v = m.init(jax.random.key(0), x)
    want = m.apply(v, x)

    mesh = _mesh3()
    got = pipeline_vit_features(
        m, v, x, mesh, num_microbatches=4, batch_axis="data",
        seq_axis="seq", sp_mode=sp_mode,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def _tiny_vit_cfg(sp_mode="", pp=0, seq=1):
    from sgg.config import Config

    cfg = Config()
    cfg.model.encoder = "vit_b16"
    cfg.model.decoder = "lstm"
    cfg.model.vocab_size = 64
    cfg.model.hidden = 32
    cfg.model.embed_dim = 16
    cfg.model.attn_dim = 16
    cfg.model.noise_dim = 8
    cfg.model.critic_hidden = 32
    cfg.model.sp_mode = sp_mode
    cfg.model.pp_microbatches = pp
    # Tiny ViT: stage slicing / ring hops / batch sharding are
    # dimension-independent; full B/16 dims dominated this file's compile
    # time (11 min at round 3's worst before the collective-hygiene fix).
    cfg.model.vit_dim, cfg.model.vit_layers, cfg.model.vit_heads = 128, 2, 4
    cfg.mesh.seq = seq
    cfg.data.image_size = 32
    cfg.data.regions = 4
    cfg.data.feat_dim = 128
    cfg.train.n_critic = 2
    cfg.train.batch_size = 8
    return cfg


def test_train_step_dp_sp_pp_matches_plain():
    """The fully composed step (DP over 'data', ring-SP over 'seq', GPipe
    over 'model') produces the same first-step losses as the plain
    single-path step — the composition changes the schedule, not the math."""
    from sgg.dist.sharding import place_state
    from sgg.train.state import create_train_state
    from sgg.train.step import make_train_step_gspmd

    r = np.random.RandomState(0)
    images = jnp.asarray(r.randint(0, 255, (3, 8, 32, 32, 3)), jnp.uint8)
    triples = jnp.asarray(r.randint(0, 64, (3, 8, 3)), jnp.int32)

    losses = {}
    for name, cfg, mesh in [
        ("plain", _tiny_vit_cfg(), _mesh3(data=2, seq=1, model=1)),
        (
            "dp_sp_pp",
            _tiny_vit_cfg(sp_mode="ring", pp=4, seq=2),
            _mesh3(data=2, seq=2, model=2),
        ),
    ]:
        state = create_train_state(cfg, jax.random.key(1))
        step, state_sh = make_train_step_gspmd(cfg, mesh, donate=False)
        state = place_state(state, state_sh)
        _, metrics = step(state, {"images": images, "triples": triples})
        d = float(metrics["d_loss"])
        assert np.isfinite(d)
        losses[name] = d
    np.testing.assert_allclose(losses["dp_sp_pp"], losses["plain"], rtol=1e-4)


def test_sp_pp_without_seq_axis_still_raises():
    from sgg.train.step import make_step_fn

    cfg = _tiny_vit_cfg(sp_mode="ring", pp=4, seq=1)
    mesh = make_mesh(MeshSpec(data=2, model=2), devices=jax.devices()[:4])
    with pytest.raises(ValueError, match="seq"):
        make_step_fn(cfg, axis_name=None, sp_mesh=mesh)
