"""ResNet-50 feature extractor with fused conv+BN+ReLU blocks.

BASELINE.json:9: "ResNet-50 backbone swap with Pallas-fused conv+BN+ReLU
blocks and larger triple vocabulary". Like the VGG backbone this is a frozen
feature extractor (inference BN), so batch-norm folds exactly into the conv
epilogue: every conv+BN+ReLU triple is ONE fused Pallas matmul.

Output: conv5 feature map — 7×7×2048 at 224px → [B, 49, 2048] regions
(cfg ``resnet50``: data.regions=49, data.feat_dim=2048).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from sgg.kernels.conv import conv2d_fused, fold_batchnorm

# Stage layout of ResNet-50: (blocks, mid_channels) per stage.
_STAGES = [(3, 64), (4, 128), (6, 256), (3, 512)]


class _ConvBN(nn.Module):
    """conv → (folded) BN → optional ReLU, as one fused kernel call."""

    features: int
    kernel: int
    stride: int = 1
    relu: bool = True
    use_pallas: bool = False
    conv_impl: str | None = None  # 'int8' → dynamic-PTQ conv (kernels/quant)
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "kernel",
            nn.initializers.he_normal(),
            (self.kernel, self.kernel, x.shape[-1], self.features),
            self.param_dtype,
        ).astype(self.dtype)
        gamma = self.param("bn_scale", nn.initializers.ones, (self.features,),
                           self.param_dtype)
        beta = self.param("bn_bias", nn.initializers.zeros, (self.features,),
                          self.param_dtype)
        mean = self.param("bn_mean", nn.initializers.zeros, (self.features,),
                          self.param_dtype)
        var = self.param("bn_var", nn.initializers.ones, (self.features,),
                         self.param_dtype)
        scale, bias = fold_batchnorm(gamma, beta, mean, var)
        return conv2d_fused(
            x, w, bias=bias, scale=scale, stride=self.stride, padding="SAME",
            relu=self.relu, use_pallas=self.use_pallas, impl=self.conv_impl,
        )


class _Bottleneck(nn.Module):
    mid: int
    stride: int = 1
    project: bool = False
    use_pallas: bool = False
    conv_impl: str | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kw = dict(use_pallas=self.use_pallas, conv_impl=self.conv_impl,
                  dtype=self.dtype)
        residual = x
        y = _ConvBN(self.mid, 1, name="conv1", **kw)(x)
        y = _ConvBN(self.mid, 3, stride=self.stride, name="conv2", **kw)(y)
        y = _ConvBN(self.mid * 4, 1, relu=False, name="conv3", **kw)(y)
        if self.project:
            residual = _ConvBN(
                self.mid * 4, 1, stride=self.stride, relu=False,
                name="proj", **kw,
            )(x)
        return nn.relu(y + residual)


class ResNet50Features(nn.Module):
    """Images [B, H, W, 3] (normalized) → [B, H/32·W/32, 2048] regions."""

    use_pallas: bool = False
    conv_impl: str | None = None  # 'int8' → dynamic-PTQ convs (kernels/quant)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        x = _ConvBN(64, 7, stride=2, name="stem", use_pallas=self.use_pallas,
                    conv_impl=self.conv_impl, dtype=self.dtype)(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        for s, (blocks, mid) in enumerate(_STAGES, start=1):
            for b in range(blocks):
                x = _Bottleneck(
                    mid,
                    stride=2 if (b == 0 and s > 1) else 1,
                    project=(b == 0),
                    name=f"stage{s}_block{b}",
                    use_pallas=self.use_pallas,
                    conv_impl=self.conv_impl,
                    dtype=self.dtype,
                )(x)
        B, H, W, C = x.shape
        return x.reshape(B, H * W, C)
