"""Trainable-encoder backward tier (VERDICT r2 item 8): when an encoder is
being TRAINED (the pretrain step), gradients must match an all-XLA reference
step for every kernel routing. Documents which paths carry gradients:
  - convs: XLA route always (auto routing; conv_direct is forward-only)
  - ViT attention: Pallas flash fwd+bwd when use_pallas=True
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sgg.train.pretrain import PresenceModel


def _grads(encoder_name, use_pallas, imgs, labels, seed=0):
    import optax

    model = PresenceModel(
        encoder_name=encoder_name, num_classes=labels.shape[-1],
        use_pallas=use_pallas, dtype=jnp.float32, image_size=imgs.shape[1],
        # 2 layers at width 256 keeps the PRODUCTION head_dim (256/4 = 64,
        # same as B/16's 768/12) so the flash fwd+bwd tiling under test is
        # unchanged, without 12 full-width layers of CPU grad compile.
        vit_dims=(256, 2, 4),
    )
    params = model.init(jax.random.key(seed), imgs[:1])["params"]

    def loss(p):
        logits = model.apply({"params": p}, imgs)["presence"]
        return optax.sigmoid_binary_cross_entropy(logits, labels).mean()

    return params, jax.grad(loss)(params)


@pytest.mark.parametrize("encoder", ["vit_b16", "vgg19"])
def test_trainable_encoder_grad_parity(encoder):
    """grad(loss) with Pallas routing == grad(loss) all-XLA. For vgg19 the
    conv paths route to XLA either way (measured routing), so this pins
    that equality; for vit_b16 it exercises the flash fwd+bwd kernels
    inside a full trainable-encoder step."""
    r = np.random.RandomState(0)
    imgs = jnp.asarray(r.randint(0, 255, (2, 32, 32, 3)), jnp.uint8)
    labels = jnp.asarray((r.rand(2, 16) > 0.8).astype(np.float32))
    p_x, g_xla = _grads(encoder, False, imgs, labels)
    p_p, g_pal = _grads(encoder, True, imgs, labels)
    # identical init (same seed) — parity is meaningful
    for a, b in zip(jax.tree.leaves(p_x), jax.tree.leaves(p_p)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    flat_x = jax.tree_util.tree_flatten_with_path(g_xla)[0]
    flat_p = jax.tree.leaves(g_pal)
    assert len(flat_x) == len(flat_p)
    for (path, a), b in zip(flat_x, flat_p):
        scale = max(1e-6, float(np.abs(np.asarray(a)).max()))
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=5e-4 * scale,
            err_msg=jax.tree_util.keystr(path),
        )
