"""``serve`` entry point — dynamic-batching scene-graph inference server.

The deployment surface on top of a trained workdir (the reference has no
serving path at all — SURVEY.md §3.3 stops at an offline script):

  python -m sgg.cli.serve --workdir /runs/vg1k --port 8500

  curl -s localhost:8500/healthz
  curl -s -X POST localhost:8500/v1/generate \
      -d '{"features": [[[0.1, ...], ...]]}'

Compiles the fixed-batch sampler BEFORE binding the port (first remote
compile through the relay is 20–40 s; no request should pay it), then
serves until SIGTERM/SIGINT, draining in-flight batches on shutdown.
"""

from __future__ import annotations

import argparse
import signal
import sys
import threading

from sgg.cli.common import add_platform_arg, apply_platform


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--workdir", default=None, help="trained run directory")
    p.add_argument("--artifact", default=None,
                   help="serve an AOT .sgx artifact (sgg.cli.export) instead "
                        "of a workdir — no checkpoint or model code needed; "
                        "batch/samples/temperature are baked into it")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8500)
    p.add_argument("--batch-size", type=int, default=32,
                   help="compiled device batch; requests pad/coalesce to it")
    p.add_argument("--max-wait-ms", type=float, default=5.0,
                   help="max batching delay after the first queued item")
    p.add_argument("--num-samples", type=int, default=50,
                   help="noise draws per image")
    p.add_argument("--temperature", type=float, default=None,
                   help="sampling temperature: tokens ~ softmax(logits / T) "
                        "(default 1.0)")
    p.add_argument("--top-p", type=float, default=None,
                   help="nucleus sampling: keep the smallest token set with "
                        "cumulative probability >= p per decode step "
                        "(engine-wide; --workdir engines only)")
    p.add_argument("--top-k", type=int, default=0,
                   help="top-k sampling: keep only the k most likely tokens "
                        "per decode step (0 = off; --workdir engines only)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--dp", type=int, default=0,
                   help="shard each batch over this many chips "
                        "(0 = single device; batch-size must divide)")
    p.add_argument("--quant", default=None, choices=["none", "int8"],
                   help="encoder PTQ mode (overrides cfg.model.quant): int8 "
                        "runs the backbone s8×s8→s32 on the MXU")
    p.add_argument("--avg-last", type=int, default=0, metavar="N",
                   help="serve the tail-average (offline SWA) of the last N "
                        "retained checkpoints' generator weights; composes "
                        "with --ema (see sgg.cli.evaluate --avg-last)")
    p.add_argument("--ema", action="store_true",
                   help="serve the EMA generator weights (requires a run "
                        "trained with train.ema_decay > 0)")
    p.add_argument("--rank", default=None,
                   choices=["freq", "freq_logp", "logp"],
                   help="triple confidence order in responses: sample "
                        "frequency, log-prob tiebreak, or pure model "
                        "probability mass (sgg.eval.rank_triples). Default: "
                        "logp with --workdir — measured +11%% R@50 / +27%% "
                        "zsR@50 over freq at identical samples (BASELINE.md "
                        "round-5 sweep 1) — and freq with --artifact "
                        "(exported programs emit tokens, not log-probs)")
    add_platform_arg(p)
    args = p.parse_args(argv)
    apply_platform(args)

    from sgg.serve import (
        ArtifactEngine,
        DynamicBatcher,
        InferenceEngine,
        make_http_server,
    )

    if bool(args.workdir) == bool(args.artifact):
        print("[sgg.serve] pass exactly one of --workdir / --artifact",
              file=sys.stderr)
        return 2
    if args.rank is None:
        # Measured serving default (round-5 sweep 1): logp ranking is free
        # quality when weights are available; artifacts can't emit log-probs.
        args.rank = "freq" if args.artifact else "logp"
    if args.artifact:
        if args.dp:
            print("[sgg.serve] --dp needs --workdir (artifacts are compiled "
                  "single-device programs)", file=sys.stderr)
            return 2
        if args.rank != "freq":
            print("[sgg.serve] --rank freq_logp/logp needs --workdir "
                  "(exported programs emit tokens, not log-probs)",
                  file=sys.stderr)
            return 2
        if args.top_k or args.top_p is not None:
            print("[sgg.serve] --top-k/--top-p need --workdir (exported "
                  "programs bake their sampling distribution)",
                  file=sys.stderr)
            return 2
        if args.ema or args.avg_last:
            print("[sgg.serve] --ema/--avg-last need --workdir (artifacts "
                  "bake their weights at export time; re-export with "
                  "sgg.cli.export --ema/--avg-last instead)",
                  file=sys.stderr)
            return 2
        engine = ArtifactEngine(args.artifact, seed=args.seed,
                                batch_size=args.batch_size)
    else:
        mesh = None
        if args.dp:
            from sgg.dist.mesh import MeshSpec, make_mesh

            mesh = make_mesh(MeshSpec(data=args.dp))
        engine = InferenceEngine.from_workdir(
            args.workdir, batch_size=args.batch_size,
            num_samples=args.num_samples, temperature=args.temperature,
            seed=args.seed, mesh=mesh, quant=args.quant, ema=args.ema,
            rank=args.rank, top_k=args.top_k or 0, top_p=args.top_p,
            avg_last=args.avg_last,
        )
    print(f"[sgg.serve] restored step {engine.step}; compiling batch "
          f"{engine.batch_size} × {engine.feature_shape} sampler…",
          flush=True)
    dt = engine.warmup()
    batcher = DynamicBatcher(engine, max_wait_ms=args.max_wait_ms)
    server = make_http_server(batcher, host=args.host, port=args.port)

    stop = threading.Event()

    def _term(signum, frame):
        print(f"[sgg.serve] signal {signum}: draining and shutting down",
              flush=True)
        stop.set()
        threading.Thread(target=server.shutdown, daemon=True).start()

    signal.signal(signal.SIGTERM, _term)
    signal.signal(signal.SIGINT, _term)

    print(f"[sgg.serve] ready on http://{args.host}:{args.port} "
          f"(warmup {dt:.1f}s)", flush=True)
    try:
        server.serve_forever()
    finally:
        batcher.close()
        server.server_close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
