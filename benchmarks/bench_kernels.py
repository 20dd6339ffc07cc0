"""Kernel microbenchmarks: Pallas vs XLA reference, JSON lines out.

  python benchmarks/bench_kernels.py            # real TPU via default platform
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.common import emit, time_marginal_scan
from sgg.kernels import conv2d_fused, flash_attention
from sgg.kernels.conv import conv2d_reference
from sgg.kernels.flash_attention import attention_reference


def bench_flash(B=8, H=12, S=1024, D=64, dtype=jnp.bfloat16):
    r = np.random.RandomState(0)
    q = jnp.asarray(r.randn(B, H, S, D), dtype)
    k = jnp.asarray(r.randn(B, H, S, D), dtype)
    v = jnp.asarray(r.randn(B, H, S, D), dtype)
    flops = 4 * B * H * S * S * D

    t_flash = time_marginal_scan(lambda c: flash_attention(c, k, v), q)
    t_ref = time_marginal_scan(lambda c: attention_reference(c, k, v), q)
    emit("flash_attention_tflops", flops / t_flash / 1e12, "TFLOP/s",
         shape=f"{B}x{H}x{S}x{D}", xla_ref_tflops=round(flops / t_ref / 1e12, 3))


def bench_conv(B=32, HW=56, C=64, K=3, dtype=jnp.bfloat16):
    r = np.random.RandomState(0)
    x = jnp.asarray(r.randn(B, HW, HW, C), dtype)
    w = jnp.asarray(r.randn(K, K, C, C) * 0.05, dtype)
    bias = jnp.asarray(r.randn(C), jnp.float32)
    flops = 2 * B * HW * HW * K * K * C * C

    t_fused = time_marginal_scan(
        lambda c: conv2d_fused(c, w, bias=bias, relu=True, impl="pallas"), x
    )
    t_ref = time_marginal_scan(
        lambda c: conv2d_reference(c, w, bias=bias, relu=True), x
    )
    emit("fused_conv_relu_tflops", flops / t_fused / 1e12, "TFLOP/s",
         shape=f"{B}x{HW}x{HW}x{C}", xla_ref_tflops=round(flops / t_ref / 1e12, 3))


if __name__ == "__main__":
    print(f"# backend={jax.default_backend()}", file=sys.stderr)
    bench_flash()
    bench_conv()
