"""Fused-decode sampler parity: make_fused_sampler == make_sampler tokens.

The kernel itself is parity-tested against the flax generator
(test_fused_decode.py); this asserts the SAMPLER wrapper reproduces the
XLA sampler's exact rng plumbing (key fan-out, z draw, per-step gumbel
splits), so `--decode fused` on generate/evaluate is a pure speed choice.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgg.config import get_config
from sgg.eval.sampler import (
    make_fused_sampler,
    make_indexed_sampler,
    make_sampler,
)
from sgg.train.state import make_models


@pytest.fixture(scope="module")
def setup():
    cfg = get_config("smoke")
    cfg.model.vocab_size = 40
    gen, _ = make_models(cfg)
    r = np.random.RandomState(0)
    B, R, F = 6, 9, 24
    feats = jnp.asarray(r.randn(B, R, F), jnp.float32)
    z = jnp.asarray(r.randn(B, cfg.model.noise_dim), jnp.float32)
    gvars = gen.init(jax.random.key(0), feats, z, jax.random.key(1))
    return cfg, gvars["params"], feats


def test_fused_sampler_matches_xla(setup):
    cfg, g_params, feats = setup
    rng = jax.random.key(7)
    ref = make_sampler(cfg, num_samples=3)(g_params, feats, rng)
    got = make_fused_sampler(cfg, num_samples=3)(g_params, feats, rng)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_fused_sampler_step_mask(setup):
    """Legality mask goes through step_mask_bias identically."""
    cfg, g_params, feats = setup
    V = cfg.model.vocab_size
    mask = np.zeros((3, V), bool)
    mask[0, : V // 2] = True   # subjects from the low half
    mask[1, V // 2 :] = True   # predicates from the high half
    mask[2, : V // 2] = True
    rng = jax.random.key(3)
    ref = make_sampler(cfg, step_mask=mask, num_samples=2)(
        g_params, feats, rng
    )
    got = make_fused_sampler(cfg, step_mask=mask, num_samples=2)(
        g_params, feats, rng
    )
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
    toks = np.asarray(got).reshape(-1, 3)
    assert (toks[:, 0] < V // 2).all()
    assert (toks[:, 1] >= V // 2).all()
    assert (toks[:, 2] < V // 2).all()


def test_fused_indexed_sampler(setup):
    cfg, g_params, feats = setup
    rng = jax.random.key(11)
    idx = jnp.asarray([4, 1, 5, 0], jnp.int32)
    ref = make_indexed_sampler(cfg, num_samples=2)(g_params, feats, idx, rng)
    got = make_fused_sampler(cfg, num_samples=2, indexed=True)(
        g_params, feats, idx, rng
    )
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
