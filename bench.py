"""Benchmark harness — headline metric for the driver.

Measures GAN train images/sec/chip (BASELINE.json:2) on the vg1k-equivalent
config ([B:7]: 196×512 precomputed features, batch 32, n_critic 5) using the
fused WGAN-GP train step, on whatever platform JAX selects (the real TPU
chip under the driver).

Prints the headline JSON line first:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
then (default invocation only) one JSON line per end-to-end encoder config
(resnet50, vit_b16) with tflops/mfu — the configs where the framework's
compute efficiency actually shows (the vg1k headline is latency-bound at
~0.23 MFU by measurement; the encoder steps reach ~0.6/~0.79 MFU,
BASELINE.md round-3 sweep). ``--no-encoder-sweep`` restores the single
line.

``vs_baseline`` is measured against the reference-equivalent config run on
CPU (BASELINE.md: the reference publishes no numbers, so the rebuild must
measure its own CPU denominator). The CPU number is measured once in a
subprocess and cached in ``.bench_cpu_baseline.json``.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
CPU_CACHE = os.path.join(REPO, ".bench_cpu_baseline.json")

# vg1k-equivalent benchmark shapes [B:7]
REGIONS, FEAT_DIM, VOCAB = 196, 512, 1024
BATCH, N_CRITIC = 32, 5


def measure(steps: int, warmup: int, platform: str | None, batch_size: int = BATCH,
            vocab: int = VOCAB, config: str = "vg1k"):
    """Marginal sec/fused-step via an in-jit scan over the step body.

    The TPU here sits behind a relay with ~30ms fixed dispatch+readback
    overhead, so the honest method is: scan N steps inside ONE jit (single
    dispatch, scalar readback) and difference two iteration counts to cancel
    the constant term. ``steps``/``warmup`` double as the two scan lengths.
    """
    import jax

    if platform:
        jax.config.update("jax_platforms", platform)
    elif os.environ.get("JAX_PLATFORMS") == "axon":
        # sitecustomize can swallow a failed relay-plugin registration,
        # leaving no 'axon' factory and a crash at first device use —
        # re-register in-process (sgg/utils/axon.py has the pathology).
        from sgg.utils.axon import ensure_axon_registered

        ensure_axon_registered()
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sgg.config import get_config
    from sgg.train.state import create_train_state
    from sgg.train.step import make_step_fn

    cfg = get_config(config)
    if config == "vg1k":
        cfg.model.vocab_size = vocab
        cfg.data.regions, cfg.data.feat_dim = REGIONS, FEAT_DIM
    cfg.train.batch_size, cfg.train.n_critic = batch_size, N_CRITIC
    if jax.default_backend() != "cpu":
        cfg.model.compute_dtype = "bfloat16"
    else:
        # Interpret-mode Pallas on CPU is orders slower than XLA and is not
        # what a CPU baseline should measure.
        cfg.model.use_pallas = False

    n_sub = N_CRITIC + 1
    r = np.random.RandomState(0)
    if cfg.model.encoder == "precomputed":
        data = {
            "features": jnp.asarray(
                r.randn(n_sub, batch_size, cfg.data.regions, cfg.data.feat_dim),
                cfg.model.dtype,
            )
        }
    else:
        # End-to-end configs: uint8 images in, frozen backbone inside the
        # fused step (VERDICT r2 weak #2 — MFU for the encoder configs).
        S = cfg.data.image_size
        data = {
            "images": jnp.asarray(
                r.randint(0, 255, (n_sub, batch_size, S, S, 3)), jnp.uint8
            )
        }
    batch = {
        **data,
        "triples": jnp.asarray(
            r.randint(2, cfg.model.vocab_size, (n_sub, batch_size, 3)),
            jnp.int32,
        ),
    }
    state = create_train_state(cfg, jax.random.key(0))
    fn = make_step_fn(cfg)

    # batch is a jit ARGUMENT: closing over it would bake ~100s of MB into
    # the program as a constant (oversized for remote-compile transports).
    @functools.partial(jax.jit, static_argnames="iters")
    def run(state, batch, iters):
        def body(s, _):
            s2, metrics = fn(s, batch)
            return s2, metrics["d_loss"]

        _, losses = jax.lax.scan(body, state, None, length=iters)
        return losses[-1]

    n1, n2 = max(1, warmup), max(2, steps)
    float(run(state, batch, n1))  # compile both scan lengths
    float(run(state, batch, n2))

    # FLOPs per fused step from XLA's own cost model on a single-step
    # program (the scanned program reports body flops once, independent of
    # trip count, so differencing scan lengths yields zero).
    def step_flops():
        try:
            ca = jax.jit(fn).lower(state, batch).compile().cost_analysis()
            return float(ca["flops"]) if ca and "flops" in ca else None
        except Exception as e:  # pragma: no cover - backend-dependent
            print(f"[bench] cost_analysis unavailable: {e!r}", file=sys.stderr)
            return None

    flops_per_step = step_flops()

    # Tunnel dispatch jitter is tens of ms → use a wide n2−n1 gap and
    # min-of-repeats so the difference is dominated by real device compute.
    repeats = 3 if jax.default_backend() != "cpu" else 1

    def t(iters):
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(run(state, batch, iters))
            best = min(best, time.perf_counter() - t0)
        return best

    per_step = max((t(n2) - t(n1)) / (n2 - n1), 1e-12)
    ips = batch_size * n_sub / per_step
    tflops = flops_per_step / per_step / 1e12 if flops_per_step else None
    mfu = None
    peak = _peak_tflops(jax.devices()[0].device_kind)
    if tflops is not None and peak is not None:
        mfu = tflops / peak
    return ips / max(1, jax.local_device_count()), per_step, tflops, mfu


# bf16 peak TFLOP/s per chip, by device kind (public TPU specs).
_PEAKS = {
    "TPU v4": 275.0,
    "TPU v5 lite": 197.0,
    "TPU v5e": 197.0,
    "TPU v5p": 459.0,
    "TPU v6 lite": 918.0,
    "TPU v6e": 918.0,
}


def _peak_tflops(device_kind: str) -> float | None:
    for k, v in _PEAKS.items():
        if device_kind.startswith(k):
            return v
    return None


def _load_cpu_cache() -> dict:
    """Per-config CPU denominators. Legacy single-entry files (round 1-4
    stored only the vg1k number at the top level) are upgraded in place."""
    if not os.path.exists(CPU_CACHE):
        return {}
    with open(CPU_CACHE) as f:
        data = json.load(f)
    if "images_per_sec_per_chip" in data:  # legacy layout
        data = {"vg1k": data}
    return data


def cpu_baseline(config: str = "vg1k", refresh: bool = False,
                 measure_if_missing: bool = True) -> float | None:
    cache = _load_cpu_cache()
    if not refresh and config in cache:
        return cache[config]["images_per_sec_per_chip"]
    if not measure_if_missing:
        # Under the driver the encoder-sweep denominators must come from the
        # committed cache — an end-to-end CPU measurement mid-bench would
        # stall the run for many minutes (VERDICT r4 weak #5 protocol:
        # measure once offline, commit the cache).
        return None
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--cpu-baseline",
         "--config", config],
        capture_output=True, text=True, cwd=REPO, timeout=3600,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    if out.returncode != 0:
        raise RuntimeError(f"cpu baseline failed:\n{out.stderr[-2000:]}")
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)["images_per_sec_per_chip"]


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=64,
                   help="long scan length (marginal timing upper point)")
    p.add_argument("--warmup", type=int, default=4,
                   help="short scan length (marginal timing lower point)")
    p.add_argument("--batch", type=int, default=BATCH,
                   help="per-chip batch size (baseline config uses 32)")
    p.add_argument("--vocab", type=int, default=VOCAB,
                   help="vocab size (8192 = resnet50-config shapes)")
    p.add_argument("--config", default="vg1k",
                   help="named config to benchmark (vg1k headline; resnet50/"
                        "vit_b16 run the end-to-end encoder step with MFU)")
    p.add_argument("--cpu-baseline", action="store_true",
                   help="measure the CPU denominator and write the cache file")
    p.add_argument("--refresh-baseline", action="store_true")
    p.add_argument("--no-encoder-sweep", action="store_true",
                   help="suppress the trailing resnet50/vit_b16 MFU lines")
    args = p.parse_args(argv)

    if not args.cpu_baseline:
        # A wedged relay terminal would hang the driver's bench run at
        # backend init; pin a live terminal group first (sgg/utils/axon.py).
        try:
            from sgg.utils.axon import ensure_live_terminal

            ensure_live_terminal()
        except Exception:
            pass

    if args.cpu_baseline:
        # End-to-end encoder configs are ~2 orders costlier per step on this
        # 1-core CPU than the precomputed-feature vg1k config; smoke scale
        # (batch 8, one marginal step) with the same marginal-timing method
        # is the r1 extrapolation protocol. img/s on CPU is throughput-bound,
        # not batch-bound, so the denominator transfers to batch 32.
        enc = args.config != "vg1k"
        ips, sec, _, _ = measure(
            steps=2 if enc else 3, warmup=1, platform="cpu",
            batch_size=8 if enc else args.batch, config=args.config,
        )
        cache = _load_cpu_cache()
        cache[args.config] = {"images_per_sec_per_chip": ips,
                              "sec_per_step": sec}
        with open(CPU_CACHE, "w") as f:
            json.dump(cache, f)
        print(json.dumps(cache[args.config]))
        return 0

    ips, sec, tflops, mfu = measure(
        steps=args.steps, warmup=args.warmup, platform=None,
        batch_size=args.batch, vocab=args.vocab, config=args.config,
    )
    vs = None
    try:
        base = cpu_baseline(config=args.config, refresh=args.refresh_baseline,
                            measure_if_missing=args.config == "vg1k")
        vs = ips / base if base else None
    except Exception as e:
        print(f"[bench] cpu baseline unavailable: {e}", file=sys.stderr)
    metric = "gan_train_images_per_sec_per_chip"
    if args.config != "vg1k":
        metric = f"gan_train_images_per_sec_per_chip[{args.config}]"
    out = {
        "metric": metric,
        "value": round(ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(vs, 2) if vs is not None else None,
    }
    if tflops is not None:
        out["tflops_per_sec"] = round(tflops, 2)
    if mfu is not None:
        out["mfu"] = round(mfu, 4)
    print(json.dumps(out), flush=True)

    # End-to-end encoder configs: the framework's peak-efficiency numbers
    # (VERDICT r3 item 7 — without these the driver's record of this
    # framework is its most latency-bound config). Failures here must not
    # cost the already-printed headline.
    if args.config == "vg1k" and not args.no_encoder_sweep:
        for enc_cfg in ("resnet50", "vit_b16"):
            try:
                ips_e, _, tflops_e, mfu_e = measure(
                    steps=16, warmup=2, platform=None, config=enc_cfg,
                )
                base_e = cpu_baseline(config=enc_cfg, measure_if_missing=False)
                line = {
                    "metric": f"gan_train_images_per_sec_per_chip[{enc_cfg}]",
                    "value": round(ips_e, 2),
                    "unit": "images/sec/chip",
                    "vs_baseline": round(ips_e / base_e, 2) if base_e else None,
                }
                if tflops_e is not None:
                    line["tflops_per_sec"] = round(tflops_e, 2)
                if mfu_e is not None:
                    line["mfu"] = round(mfu_e, 4)
                print(json.dumps(line), flush=True)
            except Exception as e:  # pragma: no cover - device-dependent
                print(f"[bench] {enc_cfg} sweep failed: {e!r}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.path.insert(0, REPO)
    sys.exit(main())
