"""sgg.kernels — hand-written Pallas TPU kernels for the hot ops.

SURVEY.md §2.1 ("TPU-native equivalents"): the native-kernel tier replacing
the reference's TF C++/cuDNN library calls. Real Mosaic kernels — fused
matmul+bias+activation (the im2col conv engine), fused conv+ReLU /
conv+BN+ReLU blocks, and blockwise flash-attention — with jax.lax reference
implementations used for parity tests and as the non-TPU fallback.

All kernels run in interpreter mode automatically on non-TPU backends, so
the same code path is testable on CPU.
"""

from sgg.kernels.matmul import fused_matmul
from sgg.kernels.conv import conv2d_fused, fold_batchnorm
from sgg.kernels.flash_attention import attention, flash_attention

__all__ = [
    "attention",
    "fused_matmul",
    "conv2d_fused",
    "fold_batchnorm",
    "flash_attention",
]
