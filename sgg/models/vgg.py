"""VGG-19 convolutional feature extractor.

Reference capability (SURVEY.md §2.1 #2): pretrained VGG-19 (machrisaa
``.npy`` weight-dict format) runs images to the conv5 feature map
(14×14×512 at 224px → 196 spatial regions), which the triple decoder
attends over. The backbone is a frozen feature extractor, as in the
reference — no gradients flow into it.

TPU redesign: NHWC + HWIO layouts, bf16-friendly, and every conv+ReLU pair
executes as ONE fused Pallas matmul (im2col formulation) when
``use_pallas=True`` (BASELINE.json:5 "Pallas-fused conv+ReLU blocks");
otherwise the same math runs through lax.conv for parity.

Param names mirror the reference weight dict (``conv1_1`` … ``conv5_4``) so
checkpoint conversion is key-for-key (SURVEY.md §7 hard part #3).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from sgg.kernels.conv import conv2d_fused

# (block, convs-in-block, channels) — VGG-19 configuration "E".
_CFG = [(1, 2, 64), (2, 2, 128), (3, 4, 256), (4, 4, 512), (5, 4, 512)]

# Mean pixel (BGR order) used by the reference preprocessing.
VGG_BGR_MEAN = np.array([103.939, 116.779, 123.68], np.float32)


def vgg_preprocess(images_rgb: jnp.ndarray) -> jnp.ndarray:
    """[B,H,W,3] RGB uint8/float [0,255] → BGR, mean-subtracted float32."""
    x = images_rgb.astype(jnp.float32)[..., ::-1]  # RGB → BGR
    return x - jnp.asarray(VGG_BGR_MEAN)


class VGG19Features(nn.Module):
    """Images [B, H, W, 3] (preprocessed) → conv5_4 features [B, H/16·W/16, 512]."""

    use_pallas: bool = False
    # None → derive from use_pallas; 'int8' → dynamic-PTQ convs
    # (sgg.kernels.quant; v5e MXU int8 = 2× bf16 peak).
    conv_impl: str | None = None
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x.astype(self.dtype)
        for block, n_convs, ch in _CFG:
            for i in range(1, n_convs + 1):
                name = f"conv{block}_{i}"
                w = self.param(
                    f"{name}/kernel",
                    nn.initializers.he_normal(),
                    (3, 3, x.shape[-1], ch),
                    self.param_dtype,
                ).astype(self.dtype)
                b = self.param(
                    f"{name}/bias", nn.initializers.zeros, (ch,), self.param_dtype
                )
                x = conv2d_fused(
                    x, w, bias=b, stride=1, padding="SAME", relu=True,
                    use_pallas=self.use_pallas, impl=self.conv_impl,
                )
            if block < 5:
                # Pools 1–4 run; conv5 output stays at stride 16 (14×14@224).
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        B, H, W, C = x.shape
        return x.reshape(B, H * W, C)


def load_npy_weights(path_or_dict) -> dict:
    """machrisaa-style ``{'conv1_1': [kernel(3,3,in,out), bias(out)], …}`` →
    flax param dict for :class:`VGG19Features`."""
    if isinstance(path_or_dict, str):
        raw = np.load(path_or_dict, allow_pickle=True, encoding="latin1").item()
    else:
        raw = path_or_dict
    params = {}
    for block, n_convs, _ in _CFG:
        for i in range(1, n_convs + 1):
            name = f"conv{block}_{i}"
            kernel, bias = raw[name]
            params[f"{name}/kernel"] = jnp.asarray(kernel, jnp.float32)
            params[f"{name}/bias"] = jnp.asarray(bias, jnp.float32)
    return {"params": params}
