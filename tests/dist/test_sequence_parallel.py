"""Ring / Ulysses sequence-parallel attention vs full attention (SURVEY.md §7
hard part #5: online-softmax accumulation across ppermute hops)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from sgg.dist import MeshSpec, make_mesh
from sgg.dist.sequence_parallel import make_sp_attention
from sgg.kernels.flash_attention import attention_reference, flash_attention_with_lse

B, H, S, D = 2, 8, 128, 32


@pytest.fixture(scope="module")
def qkv():
    r = np.random.RandomState(0)
    return tuple(
        jnp.asarray(r.randn(B, H, S, D), jnp.float32) for _ in range(3)
    )


def test_lse_output_correct(qkv):
    q, k, v = qkv
    o, lse = flash_attention_with_lse(q, k, v, None, 64, 64)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (D**-0.5)
    want_lse = jax.scipy.special.logsumexp(s, axis=-1)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(want_lse), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(o), np.asarray(attention_reference(q, k, v)), rtol=2e-4, atol=2e-4
    )


@pytest.mark.parametrize("mode", ["ring", "ulysses"])
def test_sp_attention_matches_full(qkv, mode):
    q, k, v = qkv
    mesh = make_mesh(MeshSpec(data=8, model=1))
    sp = make_sp_attention(mesh, mode=mode, seq_axis="data")
    spec = NamedSharding(mesh, P(None, None, "data", None))
    qs, ks, vs = (jax.device_put(t, spec) for t in (q, k, v))
    got = sp(qs, ks, vs)
    want = attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-3)
    # output stays sequence-sharded
    assert got.sharding.spec == P(None, None, "data", None)


def test_ring_is_differentiable(qkv):
    """Ring-reduce backward: grads match full-attention autodiff."""
    q, k, v = qkv
    mesh = make_mesh(MeshSpec(data=4, model=1), devices=jax.devices()[:4])
    sp = make_sp_attention(mesh, mode="ring", seq_axis="data")

    def loss(q, k, v):
        return (sp(q, k, v) ** 2).sum()

    def loss_ref(q, k, v):
        return (attention_reference(q, k, v) ** 2).sum()

    g1 = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3)


def test_ulysses_is_differentiable(qkv):
    q, k, v = qkv
    mesh = make_mesh(MeshSpec(data=4, model=1), devices=jax.devices()[:4])
    sp = make_sp_attention(mesh, mode="ulysses", seq_axis="data")

    def loss(q, k, v):
        return (sp(q, k, v) ** 2).sum()

    def loss_ref(q, k, v):
        return (attention_reference(q, k, v) ** 2).sum()

    g1 = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3)


def test_ulysses_head_divisibility_error(qkv):
    q, k, v = qkv
    mesh = make_mesh(MeshSpec(data=8, model=1))
    q3 = q[:, :6]  # 6 heads not divisible by 8
    sp = make_sp_attention(mesh, mode="ulysses", seq_axis="data")
    with pytest.raises(ValueError, match="divisible"):
        sp(q3, k[:, :6], v[:, :6])
