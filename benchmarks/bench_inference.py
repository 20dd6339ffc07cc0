"""Inference benchmark: triples/sec for scene-graph sampling (BASELINE.json:2).

  python benchmarks/bench_inference.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.common import emit
from sgg.config import get_config
from sgg.eval import make_sampler
from sgg.train.state import create_train_state

BATCH, REGIONS, FEAT, VOCAB, K = 64, 196, 512, 1024, 50


def main(iters: int = 200) -> None:
    cfg = get_config("vg1k")
    cfg.model.vocab_size = VOCAB
    cfg.data.regions, cfg.data.feat_dim = REGIONS, FEAT
    if jax.default_backend() != "cpu":
        cfg.model.compute_dtype = "bfloat16"

    state = create_train_state(cfg, jax.random.key(0))
    sampler = make_sampler(cfg, num_samples=K)
    r = np.random.RandomState(0)
    feats = jnp.asarray(r.randn(BATCH, REGIONS, FEAT), cfg.model.dtype)

    from functools import partial

    # In-jit scan + marginal timing (see benchmarks/common.py for why).
    @partial(jax.jit, static_argnames="n")
    def run(rng, n):
        def body(c, _):
            c, sub = jax.random.split(c)
            toks = sampler(state.g_params, feats, sub)
            return c, jnp.sum(toks)

        _, sums = jax.lax.scan(body, rng, None, length=n)
        return sums[-1]

    rng = jax.random.key(1)
    n1, n2 = 2, 2 + iters
    int(run(rng, n1))
    int(run(rng, n2))

    def t(n):
        t0 = time.perf_counter()
        int(run(rng, n))
        return time.perf_counter() - t0

    per_call = max((t(n2) - t(n1)) / (n2 - n1), 1e-12)
    emit("inference_triples_per_sec", BATCH * K / per_call, "triples/sec",
         batch=BATCH, samples_per_image=K)


def bench_encoder_quant(name: str = "vit_b16", batch: int = 16,
                        iters: int = 60) -> None:
    """End-to-end encoder forward, float vs dynamic-int8 PTQ
    (sgg.kernels.quant) — the serving tier's pixels→features stage."""
    from functools import partial

    from sgg.models.encoders import make_encoder

    dtype = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
    r = np.random.RandomState(0)
    x = jnp.asarray(r.randn(batch, 224, 224, 3) * 0.5, dtype)
    enc_f = make_encoder(name, dtype=dtype)
    enc_q = make_encoder(name, dtype=dtype, quant="int8")
    params = jax.tree.map(jnp.asarray, enc_f.init(jax.random.key(0), x))

    def timed(enc):
        # params MUST be a jit argument: closed-over they become program
        # constants, and this machine's relay remote-compile rejects the
        # ~172 MB ViT-B/16 constant blob with HTTP 413 (observed session 12).
        @partial(jax.jit, static_argnames="n")
        def run(p, c, n):
            def body(carry, _):
                y = enc.apply(p, carry)
                d = jnp.mean(y.astype(jnp.float32)) * 1e-6
                return (carry.astype(jnp.float32) + d).astype(dtype), ()

            out, _ = jax.lax.scan(body, c, None, length=n)
            return jnp.sum(out.astype(jnp.float32))

        n1, n2 = 2, 2 + iters
        float(run(params, x, n1))
        float(run(params, x, n2))

        def t(n):
            t0 = time.perf_counter()
            float(run(params, x, n))
            return time.perf_counter() - t0

        return max((t(n2) - t(n1)) / (n2 - n1), 1e-12)

    t_f, t_q = timed(enc_f), timed(enc_q)
    emit(f"{name}_int8_img_per_sec", batch / t_q, "img/s",
         float_img_per_sec=round(batch / t_f, 1),
         speedup=round(t_f / t_q, 3))


if __name__ == "__main__":
    print(f"# backend={jax.default_backend()}", file=sys.stderr)
    main()
    if "--quant" in sys.argv:
        bench_encoder_quant("vit_b16")
        bench_encoder_quant("resnet50")
