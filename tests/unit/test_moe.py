"""MoE layer (SURVEY §2.2 EP row): routing algebra, capacity semantics,
dense-equivalence, and the flax module face."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sgg.models.moe import (
    MoEMLP,
    moe_capacity,
    moe_expert_ffn,
    moe_forward,
    moe_routing,
)


def _params(rng, M=16, H=32, E=4):
    return {
        "router": rng.randn(M, E).astype(np.float32) * 0.1,
        "wi": rng.randn(E, M, H).astype(np.float32) * 0.1,
        "wo": rng.randn(E, H, M).astype(np.float32) * 0.1,
    }


def test_routing_invariants():
    rng = np.random.RandomState(0)
    G, S, E, k = 3, 12, 4, 2
    cap = moe_capacity(E, k, S, 1.25)
    logits = jnp.asarray(rng.randn(G, S, E), jnp.float32)
    combine, aux = moe_routing(logits, k, cap)
    c = np.asarray(combine)
    assert c.shape == (G, S, E, cap)
    # Each token's gates sum to 1 when nothing is dropped, ≤ 1 always.
    tok = c.sum(axis=(2, 3))
    assert (tok <= 1.0 + 1e-5).all()
    # Each expert slot (g, e, cslot) is claimed by at most one token.
    slot = (c > 0).sum(axis=1)
    assert (slot <= 1).all()
    # Per-expert kept tokens never exceed capacity.
    per_e = (c > 0).sum(axis=(1, 3))
    assert (per_e <= cap).all()
    assert np.isfinite(float(aux)) and float(aux) > 0


def test_routing_capacity_drops():
    """All tokens prefer expert 0; capacity 2 keeps exactly the first two
    (sequence-order priority) and drops the rest."""
    G, S, E = 1, 6, 3
    logits = jnp.full((G, S, E), -10.0).at[:, :, 0].set(10.0)
    combine, _ = moe_routing(logits, 1, 2)
    c = np.asarray(combine)
    kept = c[0, :, 0, :].sum(axis=1) > 0
    assert kept.tolist() == [True, True, False, False, False, False]


def test_dense_equivalence_full_topk():
    """top_k = E with ample capacity = densely-gated mixture: y must equal
    softmax(router)-weighted sum of every expert's MLP output."""
    rng = np.random.RandomState(1)
    M, H, E, G, S = 8, 16, 3, 2, 5
    p = _params(rng, M, H, E)
    x = rng.randn(G, S, M).astype(np.float32)
    cap = S  # every token fits in every expert
    y, _ = moe_forward(
        jax.tree.map(jnp.asarray, p), jnp.asarray(x), top_k=E, capacity=cap
    )
    probs = jax.nn.softmax(x @ p["router"], axis=-1)  # [G,S,E]
    want = np.zeros_like(x)
    for e in range(E):
        he = np.asarray(jax.nn.gelu(jnp.asarray(x @ p["wi"][e])))
        want += np.asarray(probs)[:, :, e : e + 1] * (he @ p["wo"][e])
    np.testing.assert_allclose(np.asarray(y), want, rtol=2e-4, atol=2e-5)


def test_moe_grads_flow():
    rng = np.random.RandomState(2)
    p = jax.tree.map(jnp.asarray, _params(rng))
    x = jnp.asarray(rng.randn(2, 6, 16), jnp.float32)
    cap = moe_capacity(4, 2, 6, 1.25)

    def loss(p):
        y, aux = moe_forward(p, x, top_k=2, capacity=cap)
        return (y**2).mean() + 0.01 * aux

    g = jax.grad(loss)(p)
    for k, v in g.items():
        assert np.isfinite(np.asarray(v)).all(), k
        assert float(jnp.abs(v).max()) > 0, k


def test_moe_mlp_module_and_aux():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 6, 16), jnp.float32)
    m = MoEMLP(num_experts=4, top_k=2, mlp_ratio=2)
    variables = m.init(jax.random.key(0), x)
    y, aux_col = m.apply(variables, x, mutable=["moe"])
    assert y.shape == x.shape
    leaves = jax.tree.leaves(aux_col)
    assert len(leaves) >= 1  # one sown aux scalar (flax may wrap in a tuple)
    aux = sum(float(v) for v in leaves) / len(leaves)
    assert np.isfinite(aux) and aux > 0
    assert np.isfinite(np.asarray(y)).all()


def test_moe_vit_pretrain_step():
    """A MoE-ViT encoder trains through the pretrain step: the sown
    load-balance losses are collected into the loss and grads reach the
    router and expert tensors."""
    import optax

    from sgg.train.pretrain import make_pretrain_state, make_pretrain_step

    rng = np.random.RandomState(4)
    imgs = jnp.asarray(rng.randint(0, 255, (8, 32, 32, 3)), jnp.uint8)
    labels = jnp.asarray((rng.rand(8, 12) > 0.7).astype(np.float32))
    model, params, opt_state, tx = make_pretrain_state(
        "vit_b16", 12, image_size=32, dtype=jnp.float32, seed=0,
        moe_experts=2, vit_dims=(128, 2, 4),  # routing is dims-independent
    )
    step = make_pretrain_step(model, tx, batch_size=4, seed=0)
    p0_router = np.asarray(
        jax.tree.leaves(
            {k: v for k, v in params["encoder"]["block0"]["moe"].items()
             if k == "router"}
        )[0]
    ).copy()
    for i in range(2):
        params, opt_state, m = step(params, opt_state, imgs, labels, 8, i)
    assert np.isfinite(float(m["loss"]))
    p1_router = np.asarray(params["encoder"]["block0"]["moe"]["router"])
    assert np.abs(p1_router - p0_router).max() > 0  # router actually trains
