"""Data-parallel inference sampler on the 8-fake-device CPU mesh.

The multi-chip serving path (``make_dp_sampler``, used by ``sgg.serve`` and
the generate machinery when given a mesh) must produce BIT-IDENTICAL tokens
to the single-device sampler: every decoded row is independent, the batch is
sharded over 'data', params are replicated, and JAX's partitionable
counter-based PRNG makes per-position noise sharding-invariant.
"""

import jax
import numpy as np
import pytest

from sgg.config import get_config
from sgg.dist import MeshSpec, make_mesh
from sgg.eval import make_dp_sampler, make_sampler
from sgg.train.state import create_train_state

B, R, F, V, K = 16, 9, 16, 24, 6


@pytest.fixture(scope="module")
def cfg():
    c = get_config("smoke")
    c.model.vocab_size = V
    c.data.regions = R
    c.data.feat_dim = F
    return c


@pytest.fixture(scope="module")
def setup(cfg):
    state = create_train_state(cfg, jax.random.key(0))
    feats = np.random.RandomState(0).randn(B, R, F).astype(np.float32)
    rng = jax.random.key(7)
    return state.g_params, feats, rng


def test_dp_sampler_matches_single_device(cfg, setup):
    g_params, feats, rng = setup
    mesh = make_mesh(MeshSpec(data=-1, model=1))
    single = make_sampler(cfg, num_samples=K)
    dp = make_dp_sampler(cfg, mesh, num_samples=K)
    t_single = np.asarray(single(g_params, feats, rng))
    t_dp = np.asarray(dp(g_params, feats, rng))
    assert t_dp.shape == (B, K, 3)
    np.testing.assert_array_equal(t_dp, t_single)


def test_dp_sampler_with_logp_matches_single_device(cfg, setup):
    """The DP serving path's with_logp mode: TOKENS match the single-device
    with_logp sampler bit for bit (the serving contract). The logp
    side-channel is allowed 1-ulp float32 slack: since temperature became a
    traced operand, logits32 has two consumers (log_softmax and the
    tempered sampling path), and the GSPMD-partitioned program fuses that
    pair differently from the single-device one — reduction order inside
    log_softmax shifts by an ulp (observed: ≤1.1e-7 rel on 13/96
    elements)."""
    g_params, feats, rng = setup
    mesh = make_mesh(MeshSpec(data=-1, model=1))
    single = make_sampler(cfg, num_samples=K, with_logp=True)
    dp = make_dp_sampler(cfg, mesh, num_samples=K, with_logp=True)
    t_s, lp_s = (np.asarray(x) for x in single(g_params, feats, rng))
    t_d, lp_d = (np.asarray(x) for x in dp(g_params, feats, rng))
    assert t_d.shape == (B, K, 3) and lp_d.shape == (B, K)
    np.testing.assert_array_equal(t_d, t_s)
    np.testing.assert_allclose(lp_d, lp_s, rtol=3e-7, atol=0)


def test_dp_sampler_output_sharded_over_data(cfg, setup):
    g_params, feats, rng = setup
    mesh = make_mesh(MeshSpec(data=4, model=1))
    dp = make_dp_sampler(cfg, mesh, num_samples=K)
    out = dp(g_params, feats, rng)
    # Tokens come back sharded over 'data' — 4 distinct device shards.
    assert len({s.device for s in out.addressable_shards}) == 4


def test_serve_engine_with_mesh():
    """The serving engine accepts a mesh and pads/strips as usual."""
    import copy

    from sgg.data.vocab import Vocab
    from sgg.serve import InferenceEngine

    vocab = Vocab.build({f"o{i}": 2 for i in range(12)},
                        {f"p{i}": 2 for i in range(8)})
    c = copy.deepcopy(get_config("smoke"))
    c.model.vocab_size = len(vocab)
    c.data.regions, c.data.feat_dim = R, F
    state = create_train_state(c, jax.random.key(0))

    mesh = make_mesh(MeshSpec(data=8, model=1))
    eng = InferenceEngine(c, vocab, state, batch_size=8, num_samples=4,
                          mesh=mesh)
    graphs = eng.generate(np.random.RandomState(1)
                          .randn(3, R, F).astype(np.float32))
    assert len(graphs) == 3
    for g in graphs:
        assert sum(t["count"] for t in g["triples"]) == 4
    with pytest.raises(ValueError, match="divisible"):
        InferenceEngine(c, vocab, state, batch_size=6, num_samples=4,
                        mesh=mesh)
