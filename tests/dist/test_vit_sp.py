"""ViT encoder with sequence-parallel attention plugged in via attn_fn."""

import jax
import jax.numpy as jnp
import numpy as np

from sgg.dist import MeshSpec, make_mesh, make_sp_attention
from sgg.models import make_encoder


def test_vit_with_ulysses_matches_default():
    mesh = make_mesh(MeshSpec(data=4, model=1), devices=jax.devices()[:4])
    sp = make_sp_attention(mesh, mode="ulysses", seq_axis="data")

    from sgg.models import ViTB16Features

    base = ViTB16Features(embed_dim=64, num_heads=4, num_layers=2, num_patches=16)
    sp_vit = ViTB16Features(embed_dim=64, num_heads=4, num_layers=2, attn_fn=sp, num_patches=16)

    x = jnp.asarray(np.random.RandomState(0).randn(2, 64, 64, 3), jnp.float32)
    params = base.init(jax.random.key(0), x)
    want = base.apply(params, x)
    got = jax.jit(lambda p, x: sp_vit.apply(p, x))(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-3)
