"""Fused decode kernel parity (VERDICT r2 item 2): Pallas program ==
explicit-noise reference == AttentionLSTMGenerator.apply."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sgg.kernels.fused_decode import (
    decode_gumbel_noise,
    decode_params_from_generator,
    decode_reference,
    fused_decode,
    step_mask_bias,
)
from sgg.models.generator import AttentionLSTMGenerator


@pytest.fixture(scope="module")
def setup():
    V, F, H, E, A, Z, B, R = 32, 16, 16, 8, 8, 4, 6, 9
    gen = AttentionLSTMGenerator(
        vocab_size=V, hidden=H, embed_dim=E, attn_dim=A, noise_dim=Z
    )
    r = np.random.RandomState(0)
    feats = jnp.asarray(r.randn(B, R, F), jnp.float32)
    z = jnp.asarray(r.randn(B, Z), jnp.float32)
    gvars = gen.init(jax.random.key(0), feats, z, jax.random.key(1))
    params = decode_params_from_generator(gvars["params"])
    return gen, gvars, params, feats, z, V, B


@pytest.mark.parametrize("hard", [False, True])
def test_reference_matches_generator(setup, hard):
    """decode_reference with decode_gumbel_noise reproduces the flax
    generator bit-for-bit (same rng split sequence)."""
    gen, gvars, params, feats, z, V, B = setup
    rng = jax.random.key(42)
    out = gen.apply(gvars, feats, z, rng, tau=0.7, hard=hard)
    g = decode_gumbel_noise(rng, B, V)
    ref = decode_reference(params, feats, z, g, tau=0.7, hard=hard)
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(out["soft"]), rtol=1e-6, atol=1e-6
    )


@pytest.mark.parametrize("hard", [False, True])
def test_kernel_matches_reference(setup, hard):
    gen, gvars, params, feats, z, V, B = setup
    g = decode_gumbel_noise(jax.random.key(3), B, V)
    ref = decode_reference(params, feats, z, g, tau=1.0, hard=hard)
    got = fused_decode(params, feats, z, g, tau=1.0, hard=hard, block_b=4)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_kernel_with_step_mask(setup):
    """Type-legality masking: subject/object draw objects, predicate draws
    predicates — the kernel's additive mask matches the generator's where()."""
    gen, gvars, params, feats, z, V, B = setup
    mask = np.zeros((3, V), bool)
    mask[0, 2:20] = mask[2, 2:20] = True
    mask[1, 20:] = True
    rng = jax.random.key(9)
    out = gen.apply(
        gvars, feats, z, rng, tau=1.0, hard=True, step_mask=jnp.asarray(mask)
    )
    g = decode_gumbel_noise(rng, B, V)
    got = fused_decode(
        params, feats, z, g, tau=1.0, hard=True,
        mask_bias=step_mask_bias(mask), block_b=8,
    )
    toks = np.argmax(np.asarray(got), axis=-1)
    np.testing.assert_array_equal(toks, np.asarray(out["tokens"]))
    assert (toks[:, 0] < 20).all() and (toks[:, 1] >= 20).all()


def test_kernel_batch_padding(setup):
    """B not divisible by block_b pads and un-pads correctly."""
    gen, gvars, params, feats, z, V, B = setup
    g = decode_gumbel_noise(jax.random.key(5), B, V)
    a = fused_decode(params, feats, z, g, hard=True, block_b=4)
    b = fused_decode(params, feats, z, g, hard=True, block_b=6)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
