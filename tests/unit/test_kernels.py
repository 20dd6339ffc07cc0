"""Pallas kernel parity tests vs jax.lax references (SURVEY.md §4).

On CPU the kernels run in Pallas interpreter mode — the same kernel code
path that compiles via Mosaic on TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgg.kernels import conv2d_fused, flash_attention, fold_batchnorm, fused_matmul
from sgg.kernels.conv import conv2d_reference
from sgg.kernels.flash_attention import attention_reference
from sgg.kernels.matmul import fused_matmul_reference


@pytest.mark.parametrize("m,k,n", [(64, 32, 48), (200, 300, 130), (8, 512, 128)])
def test_fused_matmul_parity(m, k, n):
    r = np.random.RandomState(0)
    a = jnp.asarray(r.randn(m, k), jnp.float32)
    b = jnp.asarray(r.randn(k, n), jnp.float32)
    bias = jnp.asarray(r.randn(n), jnp.float32)
    scale = jnp.asarray(r.rand(n) + 0.5, jnp.float32)
    got = fused_matmul(a, b, bias=bias, scale=scale, relu=True)
    want = fused_matmul_reference(a, b, bias=bias, scale=scale, relu=True)
    # rtol accounts for f32 accumulation-order differences at K=300+
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_fused_matmul_no_epilogue():
    r = np.random.RandomState(1)
    a = jnp.asarray(r.randn(33, 65), jnp.float32)
    b = jnp.asarray(r.randn(65, 17), jnp.float32)
    got = fused_matmul(a, b)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(a @ b), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize(
    "shape,kern,stride,padding",
    [
        ((2, 16, 16, 8), 3, 1, "SAME"),
        ((2, 15, 15, 4), 3, 2, "SAME"),
        ((1, 14, 14, 8), 1, 1, "SAME"),
        ((2, 16, 16, 3), 3, 1, "VALID"),
        ((1, 17, 13, 5), 5, 2, "VALID"),
    ],
)
def test_conv2d_fused_parity(shape, kern, stride, padding):
    r = np.random.RandomState(0)
    x = jnp.asarray(r.randn(*shape), jnp.float32)
    w = jnp.asarray(r.randn(kern, kern, shape[-1], 16) * 0.1, jnp.float32)
    bias = jnp.asarray(r.randn(16), jnp.float32)
    got = conv2d_fused(x, w, bias=bias, stride=stride, padding=padding,
                       relu=True, impl="pallas")
    want = conv2d_reference(x, w, bias=bias, stride=stride, padding=padding, relu=True)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_conv_bn_relu_folding():
    r = np.random.RandomState(2)
    x = jnp.asarray(r.randn(2, 8, 8, 4), jnp.float32)
    w = jnp.asarray(r.randn(3, 3, 4, 8) * 0.2, jnp.float32)
    gamma = jnp.asarray(r.rand(8) + 0.5, jnp.float32)
    beta = jnp.asarray(r.randn(8), jnp.float32)
    mean = jnp.asarray(r.randn(8), jnp.float32)
    var = jnp.asarray(r.rand(8) + 0.1, jnp.float32)

    scale, bias = fold_batchnorm(gamma, beta, mean, var)
    got = conv2d_fused(x, w, bias=bias, scale=scale, relu=True, impl="pallas")

    y = conv2d_reference(x, w, bias=None, relu=False)
    want = jnp.maximum(
        gamma * (y - mean) * jax.lax.rsqrt(var + 1e-5) + beta, 0.0
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize(
    "b,h,s,d", [(1, 2, 64, 32), (2, 4, 196, 64), (1, 1, 100, 32)]
)
def test_flash_attention_parity(b, h, s, d):
    r = np.random.RandomState(0)
    q = jnp.asarray(r.randn(b, h, s, d), jnp.float32)
    k = jnp.asarray(r.randn(b, h, s, d), jnp.float32)
    v = jnp.asarray(r.randn(b, h, s, d), jnp.float32)
    got = flash_attention(q, k, v, None, 64, 64)
    want = attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_flash_attention_gradients_match_reference():
    r = np.random.RandomState(1)
    b, h, s, d = 1, 2, 48, 16
    q = jnp.asarray(r.randn(b, h, s, d), jnp.float32)
    k = jnp.asarray(r.randn(b, h, s, d), jnp.float32)
    v = jnp.asarray(r.randn(b, h, s, d), jnp.float32)

    def loss_flash(q, k, v):
        return (flash_attention(q, k, v, None, 32, 32) ** 2).sum()

    def loss_ref(q, k, v):
        return (attention_reference(q, k, v) ** 2).sum()

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("b,h,s,d", [(1, 2, 100, 32), (2, 2, 256, 64)])
def test_flash_backward_kernels_match_reference(b, h, s, d):
    """Pallas dq/dk/dv kernels vs autodiff through the unfused reference,
    including ragged (padded) sequence lengths."""
    r = np.random.RandomState(7)
    q = jnp.asarray(r.randn(b, h, s, d), jnp.float32)
    k = jnp.asarray(r.randn(b, h, s, d), jnp.float32)
    v = jnp.asarray(r.randn(b, h, s, d), jnp.float32)
    do = jnp.asarray(r.randn(b, h, s, d), jnp.float32)

    from sgg.kernels.flash_attention import flash_attention_with_lse
    from sgg.kernels.flash_attention_bwd import flash_attention_bwd

    o, lse = flash_attention_with_lse(q, k, v, None, 128, 128)
    dq, dk, dv = flash_attention_bwd(q, k, v, o, lse, do, d**-0.5, 128, 128)

    _, vjp = jax.vjp(lambda q, k, v: attention_reference(q, k, v), q, k, v)
    dq_r, dk_r, dv_r = vjp(do)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_r), rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_r), rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_r), rtol=1e-3, atol=2e-3)


@pytest.mark.parametrize(
    "shape,cout,kern,dtype,fold",
    [
        ((2, 14, 14, 512), 512, 3, jnp.bfloat16, False),
        ((3, 8, 8, 64), 128, 3, jnp.float32, False),
        ((1, 28, 28, 128), 256, 3, jnp.bfloat16, True),
        ((2, 7, 7, 96), 64, 5, jnp.float32, False),
        ((5, 13, 9, 40), 70, 3, jnp.float32, True),
    ],
)
def test_conv2d_direct_parity(shape, cout, kern, dtype, fold):
    """Direct (patches-in-VMEM) kernel vs lax reference, both kh-fold modes,
    across unaligned B/H/W/C, both dtypes, and a 5x5 kernel."""
    from sgg.kernels.conv_direct import conv2d_direct

    r = np.random.RandomState(0)
    x = jnp.asarray(r.randn(*shape) * 0.5, dtype)
    w = jnp.asarray(r.randn(kern, kern, shape[-1], cout) * 0.05, dtype)
    bias = jnp.asarray(r.randn(cout), jnp.float32)
    scale = jnp.asarray(1.0 + 0.1 * r.randn(cout), jnp.float32)
    got = conv2d_direct(x, w, bias=bias, scale=scale, relu=True, fold_kh=fold)
    want = conv2d_reference(x, w, bias=bias, scale=scale, relu=True)
    assert got.shape == want.shape
    g = np.asarray(got, np.float32)
    t = np.asarray(want, np.float32)
    tol = 3e-3 * max(1e-6, np.abs(t).max()) if dtype == jnp.bfloat16 else 1e-4
    np.testing.assert_allclose(g, t, rtol=0, atol=tol)


def test_conv_direct_impl_dispatch():
    """impl='direct' routes stride-1 SAME through the direct kernel and
    falls back to XLA outside its scope (strided)."""
    r = np.random.RandomState(5)
    x = jnp.asarray(r.randn(2, 12, 12, 16), jnp.float32)
    w = jnp.asarray(r.randn(3, 3, 16, 32) * 0.1, jnp.float32)
    bias = jnp.asarray(r.randn(32), jnp.float32)
    got = conv2d_fused(x, w, bias=bias, relu=True, impl="direct")
    want = conv2d_reference(x, w, bias=bias, relu=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)
    got2 = conv2d_fused(x, w, bias=bias, stride=2, relu=True, impl="direct")
    want2 = conv2d_reference(x, w, bias=bias, stride=2, relu=True)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2), rtol=1e-4, atol=1e-4)


def test_conv_auto_routing_matches_pallas():
    """'auto' (currently the XLA path) and the forced Mosaic path agree."""
    r = np.random.RandomState(3)
    x = jnp.asarray(r.randn(2, 8, 8, 16), jnp.float32)
    w = jnp.asarray(r.randn(3, 3, 16, 32) * 0.1, jnp.float32)
    bias = jnp.asarray(r.randn(32), jnp.float32)
    auto = conv2d_fused(x, w, bias=bias, relu=True)  # impl derived = auto
    forced = conv2d_fused(x, w, bias=bias, relu=True, impl="pallas")
    np.testing.assert_allclose(np.asarray(auto), np.asarray(forced), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("stride,impl", [(1, "pallas"), (2, "pallas"), (2, "direct")])
def test_conv_1x1_matmul_route(stride, impl):
    """1x1 convs route through the fused matmul (no im2col) for any stride,
    matching the lax reference — including ResNet's stride-2 downsample
    projections (VERDICT r2 item 7)."""
    r = np.random.RandomState(11)
    x = jnp.asarray(r.randn(2, 14, 14, 64), jnp.float32)
    w = jnp.asarray(r.randn(1, 1, 64, 96) * 0.1, jnp.float32)
    bias = jnp.asarray(r.randn(96), jnp.float32)
    scale = jnp.asarray(1.0 + 0.1 * r.randn(96), jnp.float32)
    got = conv2d_fused(x, w, bias=bias, scale=scale, stride=stride,
                       relu=True, impl=impl)
    want = conv2d_reference(x, w, bias=bias, scale=scale, stride=stride,
                            relu=True)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_attention_auto_routing():
    """attention(impl='auto') routes by the measured S crossover (XLA below
    512, flash at/above) and both routes match the reference numerically."""
    from sgg.kernels import attention

    r = np.random.RandomState(12)
    for s in (196, 512):
        q = jnp.asarray(r.randn(1, 2, s, 32), jnp.float32)
        k = jnp.asarray(r.randn(1, 2, s, 32), jnp.float32)
        v = jnp.asarray(r.randn(1, 2, s, 32), jnp.float32)
        got = attention(q, k, v, impl="auto")
        want = attention_reference(q, k, v)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
        )
    # Routing is observable through the jaxpr: flash lowers to a Pallas
    # call, the XLA route to plain einsum/softmax ops.
    short = str(jax.make_jaxpr(lambda a, b, c: attention(a, b, c))(q[:, :, :196], k[:, :, :196], v[:, :, :196]))
    long = str(jax.make_jaxpr(lambda a, b, c: attention(a, b, c))(q, k, v))
    assert "pallas_call" not in short
    assert "pallas_call" in long
