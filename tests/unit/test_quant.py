"""Int8 PTQ tier (sgg.kernels.quant): accuracy + wiring contracts.

Accuracy bars are cosine-similarity based: dynamic symmetric absmax int8
keeps per-vector direction to ~1e-3, which is what downstream attention
pooling consumes. Exact-parity is impossible by construction (that's the
point of quantization), so the tests pin the contract instead:
cos ≥ 0.99 per region vector, plus jaxpr-level proof that the s8 dot/conv
is actually emitted (the wiring can't silently fall back to float).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgg.kernels.quant import conv2d_int8, int8_dot_general
from sgg.kernels.conv import conv2d_fused, conv2d_reference


def _cos(a, b, axis=-1):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    num = (a * b).sum(axis=axis)
    den = np.linalg.norm(a, axis=axis) * np.linalg.norm(b, axis=axis) + 1e-12
    return num / den


def test_int8_dot_general_dense_pattern():
    r = np.random.RandomState(0)
    x = jnp.asarray(r.randn(17, 96), jnp.float32)
    w = jnp.asarray(r.randn(96, 64) * 0.1, jnp.float32)
    dn = (((1,), (0,)), ((), ()))  # nn.Dense convention
    got = int8_dot_general(x, w, dn)
    want = jax.lax.dot_general(x, w, dn)
    assert got.dtype == want.dtype and got.shape == want.shape
    assert _cos(got, want).min() > 0.999


def test_int8_dot_general_3d_lhs():
    # Dense over [B, S, E] inputs: lhs keeps two free dims.
    r = np.random.RandomState(1)
    x = jnp.asarray(r.randn(4, 9, 32), jnp.float32)
    w = jnp.asarray(r.randn(32, 16), jnp.float32)
    dn = (((2,), (0,)), ((), ()))
    got = int8_dot_general(x, w, dn)
    want = jax.lax.dot_general(x, w, dn)
    assert got.shape == want.shape
    assert _cos(got, want).min() > 0.999


def test_int8_dot_general_falls_back_on_batch_dims():
    # Batched matmul (attention logits shape) → float fallback, exact.
    r = np.random.RandomState(2)
    a = jnp.asarray(r.randn(2, 5, 7), jnp.float32)
    b = jnp.asarray(r.randn(2, 7, 3), jnp.float32)
    dn = (((2,), (1,)), ((0,), (0,)))
    got = int8_dot_general(a, b, dn)
    want = jax.lax.dot_general(a, b, dn)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("stride,relu", [(1, True), (2, False)])
def test_conv2d_int8_parity(stride, relu):
    r = np.random.RandomState(3)
    x = jnp.asarray(r.randn(2, 14, 14, 32), jnp.float32)
    w = jnp.asarray(r.randn(3, 3, 32, 48) * 0.1, jnp.float32)
    bias = jnp.asarray(r.randn(48) * 0.01, jnp.float32)
    scale = jnp.asarray(r.rand(48) + 0.5, jnp.float32)
    got = conv2d_int8(x, w, bias=bias, scale=scale, stride=stride, relu=relu)
    want = conv2d_reference(x, w, bias=bias, scale=scale, stride=stride,
                            relu=relu)
    assert got.shape == want.shape and got.dtype == want.dtype
    # per-pixel channel-vector direction
    c = _cos(got.reshape(-1, 48), want.reshape(-1, 48))
    assert np.median(c) > 0.99


def test_conv2d_fused_routes_int8():
    r = np.random.RandomState(4)
    x = jnp.asarray(r.randn(1, 8, 8, 16), jnp.float32)
    w = jnp.asarray(r.randn(3, 3, 16, 8), jnp.float32)
    jaxpr = str(jax.make_jaxpr(
        lambda a, b: conv2d_fused(a, b, impl="int8"))(x, w))
    assert "i8[" in jaxpr and "conv_general_dilated" in jaxpr


def test_vit_quant_encoder_close_to_float():
    from sgg.models.encoders import make_encoder

    enc_f = make_encoder("vit_b16")
    enc_q = make_encoder("vit_b16", quant="int8")
    # Tiny ViT via dataclasses.replace-like reconstruction to keep the test
    # fast: 2 layers, width 64 (the factory builds B/16; rebuild small).
    from sgg.models.vit import ViTB16Features
    from sgg.kernels.quant import int8_dot_general

    small = dict(embed_dim=64, num_heads=4, num_layers=2, num_patches=196)
    enc_f = ViTB16Features(**small)
    enc_q = ViTB16Features(**small, dot_general=int8_dot_general)
    r = np.random.RandomState(5)
    x = jnp.asarray(r.randn(2, 224, 224, 3) * 0.5, jnp.float32)
    params = enc_f.init(jax.random.key(0), x)
    yf = enc_f.apply(params, x)  # [B, 196, 64]
    yq = enc_q.apply(params, x)  # same params — quantization is dynamic
    c = _cos(np.asarray(yf).reshape(-1, 64), np.asarray(yq).reshape(-1, 64))
    assert np.median(c) > 0.99
    # and the quantized path really emits an s8 dot
    jaxpr = str(jax.make_jaxpr(lambda p, a: enc_q.apply(p, a))(params, x))
    assert "i8[" in jaxpr


def test_vgg_quant_encoder_close_to_float():
    from sgg.models.vgg import VGG19Features

    enc_f = VGG19Features()
    enc_q = VGG19Features(conv_impl="int8")
    r = np.random.RandomState(6)
    x = jnp.asarray(r.randn(1, 64, 64, 3) * 20.0, jnp.float32)  # 4×4 regions
    params = enc_f.init(jax.random.key(0), x)
    yf = np.asarray(enc_f.apply(params, x))
    yq = np.asarray(enc_q.apply(params, x))
    assert yf.shape == yq.shape
    # 16 stacked quantized convs: direction holds, magnitudes drift — pin
    # the direction of each region vector.
    c = _cos(yf.reshape(-1, 512), yq.reshape(-1, 512))
    assert np.median(c) > 0.98


def test_make_encoder_rejects_unknown_quant():
    from sgg.models.encoders import make_encoder

    with pytest.raises(ValueError):
        make_encoder("vit_b16", quant="fp4")
