"""Pipeline-parallel correctness: pipelined stages == sequential stack."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgg.dist import MeshSpec, make_mesh
from sgg.dist.pipeline_parallel import pipeline_apply


def _stage_fn(params, x):
    return jnp.tanh(x @ params["w"] + params["b"])


@pytest.mark.parametrize("n_stages,n_micro", [(4, 4), (4, 8), (2, 2)])
def test_pipeline_matches_sequential(n_stages, n_micro):
    D, B = 16, 16
    r = np.random.RandomState(0)
    stacked = {
        "w": jnp.asarray(r.randn(n_stages, D, D) * 0.5, jnp.float32),
        "b": jnp.asarray(r.randn(n_stages, D) * 0.1, jnp.float32),
    }
    x = jnp.asarray(r.randn(B, D), jnp.float32)

    want = x
    for s in range(n_stages):
        want = _stage_fn({"w": stacked["w"][s], "b": stacked["b"][s]}, want)

    mesh = make_mesh(
        MeshSpec(data=1, model=n_stages), devices=jax.devices()[:n_stages]
    )
    got = pipeline_apply(
        _stage_fn, stacked, x, mesh, axis_name="model",
        num_microbatches=n_micro,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_pipeline_bad_microbatch_count():
    mesh = make_mesh(MeshSpec(data=1, model=2), devices=jax.devices()[:2])
    stacked = {"w": jnp.zeros((2, 4, 4)), "b": jnp.zeros((2, 4))}
    with pytest.raises(ValueError, match="divisible"):
        pipeline_apply(_stage_fn, stacked, jnp.zeros((5, 4)), mesh,
                       axis_name="model", num_microbatches=2)
