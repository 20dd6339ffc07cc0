"""TP + FSDP sharding tests on the 8-fake-device mesh (SURVEY.md §2.2/§4).

The GSPMD path is semantics-preserving: the step body computes on global
arrays, so TP/FSDP runs must match the unsharded single-device step exactly
(same batch, same RNG — no per-shard fold_in on this path).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from sgg.config import get_config
from sgg.dist import MeshSpec, make_mesh, place_state, state_sharding
from sgg.train.state import create_train_state
from sgg.train.step import make_train_step, make_train_step_gspmd

B, R, F, V = 16, 9, 16, 24


@pytest.fixture(scope="module")
def cfg():
    c = get_config("smoke")
    c.model.vocab_size = V
    c.data.regions, c.data.feat_dim = R, F
    c.train.batch_size, c.train.n_critic = B, 2
    return c


@pytest.fixture(scope="module")
def batch(cfg):
    r = np.random.RandomState(0)
    n_sub = cfg.train.n_critic + 1
    return {
        "features": jnp.asarray(r.randn(n_sub, B, R, F), jnp.float32),
        "triples": jnp.asarray(r.randint(2, V, (n_sub, B, 3)), jnp.int32),
    }


def _leaf_by_path(tree, *frags):
    found = []

    def visit(path, leaf):
        s = "/".join(str(getattr(k, "key", getattr(k, "name", ""))) for k in path)
        if all(f in s for f in frags):
            found.append((s, leaf))

    jax.tree_util.tree_map_with_path(visit, tree)
    return found


def test_tp_rules_shard_vocab_dims(cfg):
    mesh = make_mesh(MeshSpec(data=4, model=2))
    abstract = jax.eval_shape(lambda k: create_train_state(cfg, k), jax.random.key(0))
    sh = state_sharding(abstract, mesh, tp=True)
    emb = _leaf_by_path(sh, "g_params", "token_embedding")
    assert emb and emb[0][1].spec == P("model", None)
    vp_kernel = _leaf_by_path(sh, "g_params", "vocab_proj", "kernel")
    assert vp_kernel and vp_kernel[0][1].spec == P(None, "model")
    # Adam moments follow the same rule (ZeRO-consistent)
    mu_emb = _leaf_by_path(sh, "g_opt_state", "mu", "token_embedding")
    assert mu_emb and mu_emb[0][1].spec == P("model", None)
    # non-vocab params stay replicated in pure-TP mode
    lstm = _leaf_by_path(sh, "g_params", "TF1LSTMCell_0", "kernel")
    assert lstm and lstm[0][1].spec == P()


def test_fsdp_rules_shard_large_params(cfg):
    mesh = make_mesh(MeshSpec(data=8, model=1))
    abstract = jax.eval_shape(lambda k: create_train_state(cfg, k), jax.random.key(0))
    sh = state_sharding(abstract, mesh, fsdp=True, fsdp_min_size=64)
    lstm = _leaf_by_path(sh, "g_params", "TF1LSTMCell_0", "kernel")
    # kernel [in+H, 4H] = [56, 128]: dim 1 (128) divisible by 8
    assert lstm and lstm[0][1].spec == P(None, "data")
    mu = _leaf_by_path(sh, "g_opt_state", "mu", "TF1LSTMCell_0", "kernel")
    assert mu and mu[0][1].spec == P(None, "data")
    step_leaf = _leaf_by_path(sh, "step")
    assert step_leaf and step_leaf[0][1].spec == P()


@pytest.mark.parametrize("tp,fsdp,mesh_spec", [
    (True, False, MeshSpec(data=4, model=2)),
    (False, True, MeshSpec(data=8, model=1)),
    (True, True, MeshSpec(data=4, model=2)),
])
def test_gspmd_step_matches_single_device(cfg, batch, tp, fsdp, mesh_spec):
    state0 = create_train_state(cfg, jax.random.key(0))
    single = make_train_step(cfg, donate=False)
    s1, m1 = single(state0, batch)

    mesh = make_mesh(mesh_spec)
    step, state_sh = make_train_step_gspmd(
        cfg, mesh, tp=tp, fsdp=fsdp, donate=False
    )
    state_p = place_state(state0, state_sh)
    s2, m2 = step(state_p, batch)

    np.testing.assert_allclose(float(m1["d_loss"]), float(m2["d_loss"]), rtol=1e-4)
    np.testing.assert_allclose(float(m1["g_loss"]), float(m2["g_loss"]), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(s1.g_params), jax.tree.leaves(s2.g_params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )
