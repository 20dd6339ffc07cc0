"""Serving benchmark: end-to-end latency/throughput of the HTTP server.

Unlike the kernel benches (marginal in-jit scan — benchmarks/common.py),
serving SLOs are exactly the host-visible wall clock: JSON parse + dynamic
batching + device dispatch + readback + aggregation. So this measures wall
time through a real in-process `sgg.serve` stack at vg1k shapes
(random-init params — serving cost does not depend on trained weights):

  1. warmup (one-time compile),
  2. sequential single-image request latency (p50/p95),
  3. concurrent single-image requests (C client threads) — the dynamic
     batcher should coalesce them, so req/s >> 1/latency,
  4. bulk requests (64 images each) — img/s ceiling.

  python benchmarks/bench_serve.py            # current default backend
  JAX_PLATFORMS=cpu python benchmarks/bench_serve.py --clients 8
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from benchmarks.common import emit

REGIONS, FEAT, VOCAB = 196, 512, 1024


def _post(url: str, payload: dict) -> dict:
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    with urllib.request.urlopen(req, timeout=300) as r:
        return json.loads(r.read())


def _post_bin(url: str, arr: np.ndarray) -> dict:
    from sgg.serve import encode_binary_request

    req = urllib.request.Request(
        url, data=encode_binary_request(arr),
        headers={"Content-Type": "application/octet-stream"}, method="POST",
    )
    with urllib.request.urlopen(req, timeout=300) as r:
        return json.loads(r.read())


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--num-samples", type=int, default=50)
    p.add_argument("--clients", type=int, default=16)
    p.add_argument("--requests-per-client", type=int, default=20)
    p.add_argument("--seq-requests", type=int, default=50)
    p.add_argument("--bulk-requests", type=int, default=10)
    p.add_argument("--max-wait-ms", type=float, default=5.0)
    args = p.parse_args()

    from sgg.config import get_config
    from sgg.data.vocab import Vocab
    from sgg.serve import DynamicBatcher, InferenceEngine, make_http_server
    from sgg.train.state import create_train_state

    cfg = get_config("vg1k")
    cfg.model.vocab_size = VOCAB
    cfg.data.regions, cfg.data.feat_dim = REGIONS, FEAT
    if jax.default_backend() != "cpu":
        cfg.model.compute_dtype = "bfloat16"
    vocab = Vocab.build({f"obj{i}": 2 for i in range(700)},
                        {f"pred{i}": 2 for i in range(VOCAB - 702)})
    cfg.model.vocab_size = len(vocab)
    state = create_train_state(cfg, jax.random.key(0))

    engine = InferenceEngine(cfg, vocab, state, batch_size=args.batch_size,
                             num_samples=args.num_samples)
    t_warm = engine.warmup()
    emit("serve_warmup", t_warm, "s", batch_size=args.batch_size)

    batcher = DynamicBatcher(engine, max_wait_ms=args.max_wait_ms)
    server = make_http_server(batcher, port=0)
    url = f"http://127.0.0.1:{server.server_address[1]}/v1/generate"
    threading.Thread(target=server.serve_forever, daemon=True).start()

    rng = np.random.RandomState(0)
    one = rng.randn(1, REGIONS, FEAT).astype(np.float32).tolist()

    # 2) sequential single-image latency
    lats = []
    for _ in range(args.seq_requests):
        t0 = time.perf_counter()
        _post(url, {"features": one})
        lats.append((time.perf_counter() - t0) * 1e3)
    lats.sort()
    emit("serve_latency_p50", lats[len(lats) // 2], "ms",
         p95=round(lats[int(0.95 * len(lats)) - 1], 2),
         num_samples=args.num_samples)

    # 3) concurrent single-image requests → batcher coalescing
    n_total = args.clients * args.requests_per_client
    done = threading.Barrier(args.clients + 1)

    def client():
        for _ in range(args.requests_per_client):
            _post(url, {"features": one})
        done.wait()

    before = batcher.stats.snapshot(engine.batch_size)
    t0 = time.perf_counter()
    for _ in range(args.clients):
        threading.Thread(target=client, daemon=True).start()
    done.wait()
    dt = time.perf_counter() - t0
    after = batcher.stats.snapshot(engine.batch_size)
    n_batches = after["batches"] - before["batches"]
    emit("serve_concurrent_throughput", n_total / dt, "req/s",
         clients=args.clients,
         avg_batch_fill=round(n_total / max(n_batches, 1), 2))

    # 4) bulk throughput ceiling
    bulk = rng.randn(args.batch_size * 2, REGIONS, FEAT).astype(
        np.float32).tolist()
    _post(url, {"features": bulk})  # steady-state
    t0 = time.perf_counter()
    for _ in range(args.bulk_requests):
        _post(url, {"features": bulk})
    dt = time.perf_counter() - t0
    emit("serve_bulk_throughput",
         args.bulk_requests * args.batch_size * 2 / dt, "img/s",
         imgs_per_request=args.batch_size * 2)

    # 5) binary protocol (application/octet-stream): same SLOs without the
    # JSON text tax (one image ≈ 2.1 MB of JSON vs 392 KB f32 / 196 KB f16
    # raw — BASELINE.md "Serving-tier SLOs" for why this dominates here).
    one_f16 = np.asarray(one, np.float16)  # [1,R,F]
    lats = []
    for _ in range(args.seq_requests):
        t0 = time.perf_counter()
        _post_bin(url, one_f16)
        lats.append((time.perf_counter() - t0) * 1e3)
    lats.sort()
    emit("serve_latency_p50_binary", lats[len(lats) // 2], "ms",
         p95=round(lats[int(0.95 * len(lats)) - 1], 2), wire="f16")

    bulk_f16 = np.asarray(bulk, np.float16)
    _post_bin(url, bulk_f16)  # steady-state
    t0 = time.perf_counter()
    for _ in range(args.bulk_requests):
        _post_bin(url, bulk_f16)
    dt = time.perf_counter() - t0
    emit("serve_bulk_throughput_binary",
         args.bulk_requests * args.batch_size * 2 / dt, "img/s",
         imgs_per_request=args.batch_size * 2, wire="f16")

    # concurrent binary: coalescing without the JSON parse serializing
    # every request on the single host core
    done2 = threading.Barrier(args.clients + 1)

    def client_bin():
        for _ in range(args.requests_per_client):
            _post_bin(url, one_f16)
        done2.wait()

    before = batcher.stats.snapshot(engine.batch_size)
    t0 = time.perf_counter()
    for _ in range(args.clients):
        threading.Thread(target=client_bin, daemon=True).start()
    done2.wait()
    dt = time.perf_counter() - t0
    after = batcher.stats.snapshot(engine.batch_size)
    n_batches = after["batches"] - before["batches"]
    emit("serve_concurrent_throughput_binary", n_total / dt, "req/s",
         clients=args.clients,
         avg_batch_fill=round(n_total / max(n_batches, 1), 2), wire="f16")

    server.shutdown()
    server.server_close()
    batcher.close()


if __name__ == "__main__":
    main()
