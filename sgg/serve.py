"""Inference serving tier: dynamic-batching scene-graph server.

Reference equivalent: NONE — the reference (SURVEY.md §3.3) ships only an
offline batch-generation script. This module is the deployment surface the
rebuild adds on top of the same sampler the `generate` CLI uses, designed
around how a TPU actually serves:

- **One compiled program serves every request size.** The sampler is jitted
  once at a fixed ``batch_size``; requests are padded up to it (XLA static
  shapes — no shape-driven retraces, ever). Padding work is wasted MXU
  cycles, but a retrace costs 20–40 s through this relay's remote compile —
  the trade is not close.
- **Warmup at startup, not on the first request.** ``InferenceEngine.warmup``
  drives one padded batch through the jit before the server accepts traffic,
  so request #1 pays milliseconds, not the first-compile cliff.
- **Dynamic micro-batching.** Concurrent requests coalesce into one device
  dispatch (up to ``batch_size`` images, or ``max_wait_ms`` after the first
  queued item, whichever first). Through a relay-attached TPU each dispatch
  costs ~30 ms round-trip regardless of batch fill (BASELINE.md), so
  batching concurrent single-image requests is nearly free throughput.
- **stdlib-only front end** (``http.server.ThreadingHTTPServer``): no server
  framework dependency to gate on this offline machine.

Endpoints (JSON over HTTP):
  POST /v1/generate   {"features": [[[...]]]}  → {"scene_graphs": [...]}
                      or {"images": [[[[u8]]]]} / {"paths": [...]} on
                      encoder configs (pixels in, graphs out).
  GET  /healthz       {"ok": true, "step": N, ...}
  GET  /stats         batching/latency counters (JSON).
  GET  /metrics       the same counters in Prometheus text exposition.

Binary request path (``Content-Type: application/octet-stream``): one image
as JSON text is ~2.1 MB of floats to parse — measured session 12, the JSON
protocol (not the engine) set every serving SLO on this 1-core host
(BASELINE.md "Serving-tier SLOs"). The binary format is a 12-byte header —
magic ``SGGB``, version u8, kind u8 (0=f32 features, 1=f16 features,
2=u8 images), 2 pad bytes, count u32 LE — followed by the raw C-order
little-endian array bytes; the parse is a zero-copy ``np.frombuffer``.
Shapes are implied by the engine config ([n,R,F] features / [n,S,S,3]
images), so the header stays fixed-size. Responses remain JSON (graphs are
small). ``encode_binary_request`` is the client-side packer.

Usage: ``python -m sgg.cli.serve --workdir /runs/vg1k --port 8500``.
"""

from __future__ import annotations

import json
import queue
import struct
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import jax
import jax.numpy as jnp
import numpy as np

from sgg.eval import assemble_scene_graphs, make_sampler
from sgg.train.checkpoint import CheckpointManager, load_workdir
from sgg.train.state import create_train_state


BINARY_MAGIC = b"SGGB"
BINARY_VERSION = 1
# kind byte → (request mode, wire dtype)
_BINARY_KINDS = {
    0: ("features", np.float32),
    1: ("features", np.float16),
    2: ("images", np.uint8),
}


def encode_binary_request(arr: np.ndarray) -> bytes:
    """Client-side packer for the octet-stream request format.

    float32/float16 [n,R,F] feature blocks and uint8 [n,S,S,3] image blocks
    are accepted; the kind byte is inferred from dtype+rank. The server
    validates the trailing dims against its own config (the header carries
    only the count — fixed 12 bytes, no shape negotiation).
    """
    arr = np.ascontiguousarray(arr)
    for kind, (mode, dtype) in _BINARY_KINDS.items():
        ndim = 3 if mode == "features" else 4
        if arr.dtype == dtype and arr.ndim == ndim:
            header = (BINARY_MAGIC + bytes([BINARY_VERSION, kind, 0, 0])
                      + struct.pack("<I", arr.shape[0]))
            return header + arr.tobytes()
    raise ValueError(
        f"no binary kind for dtype={arr.dtype} ndim={arr.ndim}; supported: "
        "float32/float16 [n,R,F] features, uint8 [n,S,S,3] images"
    )


def parse_binary_request(body: bytes, engine) -> tuple[str, np.ndarray]:
    """Server-side parse: bytes → ('features'|'images', array). Zero-copy
    (``np.frombuffer`` over the request body). Raises ValueError on any
    malformed input — the HTTP handler maps that to a 400."""
    if len(body) < 12 or body[:4] != BINARY_MAGIC:
        raise ValueError("bad binary request: missing SGGB magic")
    version, kind = body[4], body[5]
    if version != BINARY_VERSION:
        raise ValueError(f"unsupported binary version {version}")
    if kind not in _BINARY_KINDS:
        raise ValueError(f"unknown binary kind {kind}")
    mode, dtype = _BINARY_KINDS[kind]
    (n,) = struct.unpack("<I", body[8:12])
    if mode == "features":
        r, f = engine.feature_shape
        shape = (n, r, f)
    else:
        s = engine.cfg.data.image_size
        shape = (n, s, s, 3)
    expect = int(np.prod(shape)) * np.dtype(dtype).itemsize
    if len(body) - 12 != expect:
        raise ValueError(
            f"binary payload is {len(body) - 12} bytes; {mode} x{n} at the "
            f"server's shape {shape[1:]} needs {expect}"
        )
    return mode, np.frombuffer(body, dtype, offset=12).reshape(shape)


@dataclass
class ServeStats:
    """Cheap counters + a latency ring buffer (lock-guarded)."""

    requests: int = 0
    items: int = 0
    batches: int = 0
    batch_fill_sum: int = 0
    errors: int = 0
    _lat_ms: list = field(default_factory=list)
    _lock: threading.Lock = field(default_factory=threading.Lock)

    def record_batch(self, fill: int, latency_s: float) -> None:
        with self._lock:
            self.batches += 1
            self.batch_fill_sum += fill
            self._lat_ms.append(latency_s * 1e3)
            if len(self._lat_ms) > 1024:  # ring buffer, O(1) memory
                self._lat_ms = self._lat_ms[-512:]

    def snapshot(self, batch_size: int) -> dict:
        with self._lock:
            lats = sorted(self._lat_ms)
            pct = lambda p: (  # noqa: E731 — tiny local helper
                lats[min(len(lats) - 1, int(p * len(lats)))] if lats else 0.0
            )
            return {
                "requests": self.requests,
                "items": self.items,
                "batches": self.batches,
                "errors": self.errors,
                "avg_batch_fill": (
                    self.batch_fill_sum / self.batches if self.batches else 0.0
                ),
                "batch_size": batch_size,
                "batch_latency_ms": {
                    "p50": round(pct(0.50), 2),
                    "p95": round(pct(0.95), 2),
                    "p99": round(pct(0.99), 2),
                },
            }


class InferenceEngine:
    """Fixed-batch compiled sampler over a trained workdir.

    Thread-safe: the device dispatch and the rng-state update are guarded by
    one lock (callers — the batcher, tests — may be many threads, but the
    single relay-attached chip serializes dispatches anyway).
    """

    def __init__(self, cfg, vocab, state, *, batch_size: int = 32,
                 num_samples: int = 50, temperature: float | None = None,
                 seed: int = 0, mesh=None, quant: str | None = None,
                 ema: bool = False, rank: str = "freq",
                 top_k: int = 0, top_p: float | None = None):
        if quant is not None:  # CLI override of cfg.model.quant
            cfg.model.quant = "" if quant == "none" else quant
        self.cfg = cfg
        self.vocab = vocab
        self.batch_size = int(batch_size)
        self.num_samples = int(num_samples)
        self.rank = rank
        # Temperature is a traced operand of the compiled sampler (scalar
        # or per-row float32[B]) — so requests may override it, and the
        # batcher may mix temperatures in ONE dispatch, all on a single
        # compiled program. ``temperature`` here is just the default.
        self._default_temp = 1.0 if temperature is None else float(temperature)
        self.supports_request_temperature = True
        self._with_logp = rank != "freq"
        self.step = int(state.step)
        g_params = state.g_params
        if ema:
            if state.g_ema is None:
                raise ValueError(
                    "ema=True but the checkpoint has no EMA weights "
                    "(train with train.ema_decay > 0)"
                )
            g_params = state.g_ema
        # Commit params to device ONCE. A numpy pytree handed to a jitted fn
        # re-uploads per call on this machine (NOTES.md: 80 MB/batch dragged
        # extraction 50→6 img/s); orbax may restore to host arrays.
        self._g_params = jax.tree.map(jnp.asarray, g_params)
        if mesh is not None:
            # Multi-chip serving: shard the padded batch over 'data'
            # (bit-identical tokens to the single-device sampler — every
            # decoded row is independent, so there are no collectives).
            from sgg.dist.mesh import DATA_AXIS
            from sgg.eval.sampler import make_dp_sampler

            n_data = mesh.shape[DATA_AXIS]
            if self.batch_size % n_data:
                raise ValueError(
                    f"batch_size {self.batch_size} not divisible by the "
                    f"mesh's data axis ({n_data})"
                )
            self._sampler = make_dp_sampler(
                cfg, mesh, step_mask=vocab.step_mask(),
                num_samples=self.num_samples, tau=temperature,
                with_logp=self._with_logp, top_k=top_k, top_p=top_p,
            )
        else:
            self._sampler = make_sampler(
                cfg, step_mask=vocab.step_mask(),
                num_samples=self.num_samples, tau=temperature,
                with_logp=self._with_logp, top_k=top_k, top_p=top_p,
            )
        self._rng = jax.random.key(seed)
        self._lock = threading.Lock()
        self._encode = None
        self._enc_params = None
        if cfg.model.encoder != "precomputed":
            from sgg.models.encoders import make_encoder, normalize_for

            enc = make_encoder(
                cfg.model.encoder, dtype=cfg.model.dtype,
                image_size=cfg.data.image_size,
                moe_experts=cfg.model.moe_experts,
                moe_top_k=cfg.model.moe_top_k,
                quant=cfg.model.quant,
                vit_dims=cfg.model.vit_dims,
            )
            self._enc_params = jax.tree.map(jnp.asarray, state.enc_params)

            @jax.jit
            def encode(params, images_u8):
                return enc.apply(params, normalize_for(cfg.model.encoder,
                                                       images_u8))

            self._encode = encode

    @classmethod
    def from_workdir(
        cls, workdir: str, avg_last: int = 0, **kw
    ) -> "InferenceEngine":
        """``avg_last`` > 1 serves the offline-SWA tail average of the last
        N retained checkpoints' generator weights (composes with ema=True;
        see ``CheckpointManager.restore_averaged``)."""
        cfg, vocab = load_workdir(workdir)
        cfg.model.vocab_size = len(vocab)
        state = create_train_state(cfg, jax.random.key(0))
        mgr = CheckpointManager(workdir, cfg)
        if avg_last > 1:
            restored = mgr.restore_averaged(state, avg_last)
        else:
            restored = mgr.restore(state)
        if restored is None:
            raise FileNotFoundError(f"no checkpoint in {workdir}")
        return cls(cfg, vocab, restored, **kw)

    @property
    def feature_shape(self) -> tuple[int, int]:
        return (self.cfg.data.regions, self.cfg.data.feat_dim)

    def warmup(self) -> float:
        """Compile the padded-batch program(s); returns wall seconds."""
        t0 = time.perf_counter()
        r, f = self.feature_shape
        feats = np.zeros((self.batch_size, r, f), np.float32)
        if self._encode is not None:
            s = self.cfg.data.image_size
            imgs = jnp.zeros((self.batch_size, s, s, 3), jnp.uint8)
            jax.block_until_ready(self._encode(self._enc_params, imgs))
        self._sample_tokens(feats)
        return time.perf_counter() - t0

    # ------------------------------------------------------------- internals
    def _sample_tokens(
        self, feats: np.ndarray, temps: np.ndarray | None = None
    ) -> tuple[np.ndarray, np.ndarray | None]:
        """float[n,R,F] (+ optional float[n] per-row temperatures) →
        (int32[n,K,3], float32[n,K] logp | None); pads/chunks to the
        compiled batch. The temperature vector is ALWAYS passed — [B]-shaped,
        default-filled — so there is exactly one compiled program."""
        n = feats.shape[0]
        B = self.batch_size
        if temps is None:
            temps = np.full(n, self._default_temp, np.float32)
        else:
            temps = np.asarray(temps, np.float32)
            if temps.shape != (n,):
                raise ValueError(f"temps must be float[{n}], got {temps.shape}")
        out, out_lp = [], []
        for lo in range(0, n, B):
            chunk = feats[lo:lo + B]
            tvec = temps[lo:lo + B]
            pad = B - chunk.shape[0]
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)]
                )
                tvec = np.concatenate(
                    [tvec, np.full(pad, self._default_temp, np.float32)]
                )
            with self._lock:
                self._rng, sub = jax.random.split(self._rng)
                fut = self._sampler(
                    self._g_params, jnp.asarray(chunk, self.cfg.model.dtype),
                    sub, tvec,
                )
            # sync point outside the lock is fine: the results are already
            # concrete device futures.
            if self._with_logp:
                tokens, lp = (np.asarray(x) for x in fut)
                out_lp.append(lp[: B - pad])
            else:
                tokens = np.asarray(fut)
            out.append(tokens[: B - pad])
        tokens = np.concatenate(out) if len(out) > 1 else out[0]
        if not self._with_logp:
            return tokens, None
        return tokens, np.concatenate(out_lp) if len(out_lp) > 1 else out_lp[0]

    def encode_images(self, images_u8: np.ndarray) -> np.ndarray:
        if self._encode is None:
            raise ValueError(
                "this run used precomputed features; POST 'features' instead"
            )
        n = images_u8.shape[0]
        B = self.batch_size
        out = []
        for lo in range(0, n, B):
            chunk = images_u8[lo:lo + B]
            pad = B - chunk.shape[0]
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)]
                )
            feats = self._encode(self._enc_params, jnp.asarray(chunk))
            out.append(np.asarray(feats, np.float32)[: B - pad])
        return np.concatenate(out) if len(out) > 1 else out[0]

    # ------------------------------------------------------------- public
    def generate(self, feats: np.ndarray,
                 temps: np.ndarray | None = None) -> list[dict]:
        """float[n,R,F] → n scene-graph dicts (triples in ``rank`` order).
        ``temps`` float[n]: optional per-row sampling temperatures (None =
        the engine default) — same compiled program either way."""
        feats = np.asarray(feats, np.float32)
        if feats.ndim != 3 or feats.shape[1:] != self.feature_shape:
            raise ValueError(
                f"expected features [n, {self.feature_shape[0]}, "
                f"{self.feature_shape[1]}], got {feats.shape}"
            )
        tokens, logp = self._sample_tokens(feats, temps)
        graphs, _ = assemble_scene_graphs(
            tokens, self.vocab, np.arange(len(tokens)),
            logp=logp, rank=self.rank,
        )
        for g in graphs:
            g.pop("image_id", None)
        return graphs

    def generate_from_images(self, images_u8: np.ndarray,
                             temps: np.ndarray | None = None) -> list[dict]:
        return self.generate(
            self.encode_images(np.asarray(images_u8, np.uint8)), temps
        )


class ArtifactEngine:
    """InferenceEngine duck-type backed by an AOT artifact (sgg.export).

    The serving host needs the .sgx file and nothing else — no workdir, no
    orbax checkpoint, no model code; batch size, sample count, temperature
    and (for pixels-in artifacts) the whole backbone are baked into the
    exported StableHLO program. Features-in artifacts serve ``features``
    requests; pixels-in artifacts serve ``images``/``paths`` requests —
    each raises a clear error for the other mode (the program's input
    signature is fixed at export).
    """

    def __init__(self, path: str, *, seed: int = 0,
                 batch_size: int | None = None):
        from sgg.config import get_config
        from sgg.data.vocab import Vocab
        from sgg.export import load_artifact

        self._call, meta = load_artifact(path)
        self.meta = meta
        self.vocab = Vocab(
            tokens=list(meta["vocab_tokens"]),
            is_object=list(meta["vocab_is_object"]),
            is_predicate=list(meta["vocab_is_predicate"]),
        )
        cfg = get_config("smoke")
        cfg.model.vocab_size = len(self.vocab)
        cfg.model.encoder = meta.get("encoder") or "precomputed"
        cfg.model.compute_dtype = meta["feats_dtype"]
        cfg.data.regions = meta["regions"]
        cfg.data.feat_dim = meta["feat_dim"]
        cfg.data.image_size = meta.get("image_size") or 224
        self.cfg = cfg
        # Shape-polymorphic artifacts (exported --batch-size 0) accept any
        # batch, but each distinct size is a fresh XLA compile — so the
        # server still pads to ONE size, chosen here.
        self.batch_size = int(meta["batch_size"]) or int(batch_size or 32)
        self.num_samples = int(meta["num_samples"])
        self.step = int(meta.get("step", -1))
        self._images_in = meta["input"] == "images"
        self._rng = jax.random.key(seed)
        self._lock = threading.Lock()
        # The exported StableHLO program bakes its sampling temperature at
        # export time; per-request overrides are impossible by design.
        self.supports_request_temperature = False

    @property
    def feature_shape(self) -> tuple[int, int]:
        return (self.cfg.data.regions, self.cfg.data.feat_dim)

    def warmup(self) -> float:
        t0 = time.perf_counter()
        if self._images_in:
            s = self.cfg.data.image_size
            x = np.zeros((self.batch_size, s, s, 3), np.uint8)
        else:
            r, f = self.feature_shape
            x = np.zeros((self.batch_size, r, f), np.float32)
        np.asarray(self._dispatch(x))
        return time.perf_counter() - t0

    def _dispatch(self, x: np.ndarray) -> np.ndarray:
        """One padded/chunked pass through the exported program."""
        n = x.shape[0]
        B = self.batch_size
        out = []
        for lo in range(0, n, B):
            chunk = x[lo:lo + B]
            pad = B - chunk.shape[0]
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)]
                )
            if not self._images_in:
                chunk = jnp.asarray(chunk, self.cfg.model.dtype)
            with self._lock:
                self._rng, sub = jax.random.split(self._rng)
                fut = self._call(chunk, jax.random.key_data(sub))
            out.append(np.asarray(fut)[: B - pad])
        return np.concatenate(out) if len(out) > 1 else out[0]

    def _graphs(self, tokens: np.ndarray) -> list[dict]:
        graphs, _ = assemble_scene_graphs(
            tokens, self.vocab, np.arange(len(tokens))
        )
        for g in graphs:
            g.pop("image_id", None)
        return graphs

    def generate(self, feats: np.ndarray,
                 temps: np.ndarray | None = None) -> list[dict]:
        if temps is not None:
            raise ValueError(
                "this artifact bakes its sampling temperature at export "
                "time; per-request 'temperature' is not supported"
            )
        if self._images_in:
            raise ValueError(
                "this artifact takes images (pixels-in export); POST "
                "'images' or 'paths' instead of 'features'"
            )
        feats = np.asarray(feats, np.float32)
        if feats.ndim != 3 or feats.shape[1:] != self.feature_shape:
            raise ValueError(
                f"expected features [n, {self.feature_shape[0]}, "
                f"{self.feature_shape[1]}], got {feats.shape}"
            )
        return self._graphs(self._dispatch(feats))

    def generate_from_images(self, images_u8: np.ndarray,
                             temps: np.ndarray | None = None) -> list[dict]:
        if temps is not None:
            raise ValueError(
                "this artifact bakes its sampling temperature at export "
                "time; per-request 'temperature' is not supported"
            )
        if not self._images_in:
            raise ValueError(
                "this artifact takes precomputed features; POST 'features'"
            )
        imgs = np.asarray(images_u8, np.uint8)
        s = self.cfg.data.image_size
        if imgs.ndim != 4 or imgs.shape[1:] != (s, s, 3):
            raise ValueError(f"expected images [n, {s}, {s}, 3], "
                             f"got {imgs.shape}")
        return self._graphs(self._dispatch(imgs))


class DynamicBatcher:
    """Coalesce concurrent requests into full device batches.

    Items (single images' features) from any number of requests are packed
    into one dispatch of up to ``engine.batch_size``; a batch launches when
    full or ``max_wait_ms`` after its first item arrived. With one client the
    added latency is bounded by ``max_wait_ms``; under load batches fill and
    the wait never triggers.
    """

    def __init__(self, engine: InferenceEngine, *, max_wait_ms: float = 5.0,
                 stats: ServeStats | None = None):
        self.engine = engine
        self.max_wait = max_wait_ms / 1e3
        self.stats = stats or ServeStats()
        self._q: queue.Queue = queue.Queue()
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._loop, daemon=True,
                                        name="sgg-batcher")
        self._worker.start()

    def close(self) -> None:
        self._stop.set()
        self._q.put(None)  # wake the worker
        self._worker.join(timeout=5)

    def submit(self, feats: np.ndarray, timeout: float | None = 60.0,
               temperature: float | None = None) -> list[dict]:
        """Blocking: float[n,R,F] → n scene graphs (may span batches).

        ``temperature`` overrides the engine's sampling temperature for
        THIS request only. Items with different temperatures still
        coalesce into one dispatch — temperature is a per-row traced
        operand of the engine's single compiled program."""
        feats = np.asarray(feats, np.float32)
        if feats.ndim != 3 or feats.shape[1:] != self.engine.feature_shape:
            raise ValueError(
                f"expected features [n, {self.engine.feature_shape[0]}, "
                f"{self.engine.feature_shape[1]}], got {feats.shape}"
            )
        if temperature is not None:
            if not getattr(self.engine, "supports_request_temperature", False):
                raise ValueError(
                    "this engine bakes its sampling temperature; "
                    "per-request 'temperature' is not supported"
                )
            temperature = float(temperature)
            if not temperature > 0:
                raise ValueError("temperature must be > 0")
        futs = []
        for i in range(feats.shape[0]):
            f: Future = Future()
            self._q.put((feats[i], temperature, f))
            futs.append(f)
        with self.stats._lock:
            self.stats.requests += 1
            self.stats.items += len(futs)
        return [f.result(timeout=timeout) for f in futs]

    def _loop(self) -> None:
        B = self.engine.batch_size
        while not self._stop.is_set():
            try:
                first = self._q.get(timeout=0.2)
            except queue.Empty:
                continue
            if first is None:
                continue
            batch = [first]
            deadline = time.monotonic() + self.max_wait
            while len(batch) < B:
                left = deadline - time.monotonic()
                if left <= 0:
                    break
                try:
                    item = self._q.get(timeout=left)
                except queue.Empty:
                    break
                if item is None:
                    break
                batch.append(item)
            feats = np.stack([b[0] for b in batch])
            # Default-only batches pass temps=None so the artifact engine
            # (which rejects overrides) keeps working behind the batcher.
            temps = None
            if any(b[1] is not None for b in batch):
                temps = np.asarray(
                    [b[1] if b[1] is not None else
                     self.engine._default_temp for b in batch], np.float32,
                )
            t0 = time.perf_counter()
            try:
                graphs = self.engine.generate(feats, temps)
            except Exception as e:  # noqa: BLE001 — propagate to callers
                with self.stats._lock:
                    self.stats.errors += 1
                for _, _, f in batch:
                    if not f.done():
                        f.set_exception(e)
                continue
            self.stats.record_batch(len(batch), time.perf_counter() - t0)
            for (_, _, f), g in zip(batch, graphs):
                f.set_result(g)


def make_http_server(batcher: DynamicBatcher, host: str = "127.0.0.1",
                     port: int = 8500,
                     max_body_bytes: int = 512 << 20) -> ThreadingHTTPServer:
    """Build (not start) the HTTP front end; ``.serve_forever()`` to run.

    ``max_body_bytes`` bounds request bodies (default 512 MB — a full
    binary batch of 1024 f32 feature rows is ~400 MB); oversized requests
    get 413 without the body ever being read into memory."""
    engine, stats = batcher.engine, batcher.stats

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, *a):  # quiet: stats replace access logs
            pass

        def _send(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _send_text(self, code: int, text: str,
                       ctype: str = "text/plain; version=0.0.4") -> None:
            body = text.encode()
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, {
                    "ok": True, "step": engine.step,
                    "encoder": engine.cfg.model.encoder,
                    "vocab_size": len(engine.vocab),
                    "num_samples": engine.num_samples,
                })
            elif self.path == "/stats":
                self._send(200, stats.snapshot(engine.batch_size))
            elif self.path == "/metrics":
                # Prometheus text exposition of the same counters /stats
                # serves as JSON — so the standard scrape stack works
                # against this server with zero glue.
                s = stats.snapshot(engine.batch_size)
                lines = [
                    "# HELP sgg_requests_total HTTP generate requests.",
                    "# TYPE sgg_requests_total counter",
                    f"sgg_requests_total {s['requests']}",
                    "# HELP sgg_items_total Images submitted for decoding.",
                    "# TYPE sgg_items_total counter",
                    f"sgg_items_total {s['items']}",
                    "# HELP sgg_batches_total Device dispatches.",
                    "# TYPE sgg_batches_total counter",
                    f"sgg_batches_total {s['batches']}",
                    "# HELP sgg_errors_total Failed batch dispatches.",
                    "# TYPE sgg_errors_total counter",
                    f"sgg_errors_total {s['errors']}",
                    "# HELP sgg_batch_fill_avg Mean items per dispatch.",
                    "# TYPE sgg_batch_fill_avg gauge",
                    f"sgg_batch_fill_avg {s['avg_batch_fill']:.4f}",
                    "# HELP sgg_batch_size Compiled device batch size.",
                    "# TYPE sgg_batch_size gauge",
                    f"sgg_batch_size {s['batch_size']}",
                    "# HELP sgg_batch_latency_ms Device batch latency.",
                    "# TYPE sgg_batch_latency_ms summary",
                ] + [
                    f'sgg_batch_latency_ms{{quantile="{q}"}} '
                    f"{s['batch_latency_ms'][p]}"
                    for q, p in (("0.5", "p50"), ("0.95", "p95"),
                                 ("0.99", "p99"))
                ]
                self._send_text(200, "\n".join(lines) + "\n")
            else:
                self._send(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/v1/generate":
                self._send(404, {"error": "unknown path"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                if n > max_body_bytes:
                    self._send(413, {
                        "error": f"request body {n} bytes exceeds the "
                                 f"server cap ({max_body_bytes}); split "
                                 "the request"
                    })
                    return
                body = self.rfile.read(n)
                ctype = self.headers.get("Content-Type", "")
                if ctype.startswith("application/octet-stream"):
                    mode, arr = parse_binary_request(body, engine)
                    t0 = time.perf_counter()
                    if mode == "features":
                        graphs = batcher.submit(arr)
                    else:
                        graphs = engine.generate_from_images(arr)
                    self._send(200, {
                        "scene_graphs": graphs,
                        "latency_ms": round(
                            (time.perf_counter() - t0) * 1e3, 2),
                    })
                    return
                req = json.loads(body)
                # Optional per-request sampling temperature (tokens ~
                # softmax(logits / T)); traced operand, so no recompile.
                temp = req.get("temperature")
                temp = None if temp is None else float(temp)

                def img_temps(n):
                    if temp is None:
                        return None
                    if not getattr(engine, "supports_request_temperature",
                                   False):
                        raise ValueError(
                            "this engine bakes its sampling temperature; "
                            "per-request 'temperature' is not supported"
                        )
                    return np.full(n, temp, np.float32)

                if "features" in req:
                    feats = np.asarray(req["features"], np.float32)
                    t0 = time.perf_counter()
                    graphs = batcher.submit(feats, temperature=temp)
                elif "images" in req:
                    imgs = np.asarray(req["images"], np.uint8)
                    t0 = time.perf_counter()
                    graphs = engine.generate_from_images(
                        imgs, img_temps(imgs.shape[0]))
                elif "paths" in req:
                    from sgg.data.extract import load_batch

                    imgs = load_batch(list(req["paths"]),
                                      engine.cfg.data.image_size)
                    t0 = time.perf_counter()
                    graphs = engine.generate_from_images(
                        imgs, img_temps(imgs.shape[0]))
                else:
                    self._send(400, {"error":
                                     "need 'features', 'images' or 'paths'"})
                    return
            except (ValueError, KeyError, json.JSONDecodeError) as e:
                self._send(400, {"error": str(e)})
                return
            self._send(200, {
                "scene_graphs": graphs,
                "latency_ms": round((time.perf_counter() - t0) * 1e3, 2),
            })

    return ThreadingHTTPServer((host, port), Handler)
