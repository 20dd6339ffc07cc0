"""Host-sharded batching iterator with device prefetch.

TPU-native replacement for the reference's Python-thread FIFOQueue runner
(SURVEY.md §2.1 #3, §3.2): instead of threads feeding a TF queue that the
train graph dequeues from, a background thread assembles *super-batches* for
the fused train step (``n_critic`` critic sub-batches + 1 generator sub-batch
— one device dispatch per whole GAN step) and ``jax.device_put``s them ahead
of time so the next batch is already in HBM when the step completes.

Multi-host sharding (SURVEY.md §2.2 DP row): each process samples only from
its ``process_index``-th slice of the image set; with a ``Sharding`` passed,
``device_put`` lays the global batch out over the mesh's 'data' axis.
"""

from __future__ import annotations

import queue
import threading
import time
from dataclasses import dataclass
from typing import Iterator

import numpy as np

import jax


@dataclass
class TripleDataset:
    """In-memory (features, triples) pairs with ragged triples per image.

    features : float[N, R, F]
    triples  : list of int32[n_i, 3] (or a dense int32[N, T, 3])
    """

    features: np.ndarray
    triples: list[np.ndarray] | np.ndarray
    # Optional per-triple sampling weights (list of float[n_i], normalized
    # per image) — set via set_predicate_balance(); None = uniform.
    triple_weights: list | None = None

    def __post_init__(self):
        if isinstance(self.triples, np.ndarray) and self.triples.ndim == 3:
            self.triples = [t for t in self.triples]
        assert len(self.triples) == self.features.shape[0]

    def set_predicate_balance(self, alpha: float) -> "TripleDataset":
        """Weight each image's triples ∝ global-predicate-frequency^(−alpha).

        The standard SGG resampling lever for the long predicate tail:
        uniform triple choice (alpha = 0) trains predicates in proportion to
        their corpus frequency, so low-support predicates (measured: 'inside'
        recall@100 0.02 vs 'near' 0.39, BASELINE.md pipeline-v3 table) see
        few positive updates. alpha = 1 makes every predicate equally likely
        per draw *within an image's own triples*; intermediate alpha trades
        head-predicate recall for tail mR@k. Affects training sampling only —
        evaluation always scores the full ground truth.
        """
        from sgg.data.images import compute_triple_weights

        self.triple_weights = compute_triple_weights(self.triples, alpha)
        return self

    def __len__(self) -> int:
        return self.features.shape[0]

    @classmethod
    def from_shards(cls, shard_paths: list[str]) -> "TripleDataset":
        from sgg.data.shards import read_feature_shard

        feats, triples = [], []
        for p in shard_paths:
            d = read_feature_shard(p)
            n = d["features"].shape[0]
            per_image: list[list] = [[] for _ in range(n)]
            for row in d["triples"]:
                per_image[int(row[0])].append(row[1:4])
            keep = [i for i in range(n) if per_image[i]]
            feats.append(d["features"][keep])
            triples.extend(
                np.asarray(per_image[i], dtype=np.int32) for i in keep
            )
        return cls(features=np.concatenate(feats, axis=0), triples=triples)

    def process_slice(self, process_index: int, process_count: int) -> np.ndarray:
        """Disjoint, covering image-index shard for this host."""
        return np.arange(len(self))[process_index::process_count]

    def sample_batch(
        self, rng: np.random.RandomState, indices: np.ndarray, batch_size: int
    ) -> dict:
        """Sample (image, one-of-its-triples) pairs, the reference's unit."""
        img = indices[rng.randint(len(indices), size=batch_size)]
        if self.triple_weights is None:
            pick = [
                self.triples[i][rng.randint(self.triples[i].shape[0])]
                for i in img
            ]
        else:
            pick = [
                self.triples[i][
                    rng.choice(self.triples[i].shape[0], p=self.triple_weights[i])
                ]
                for i in img
            ]
        trip = np.stack(pick).astype(np.int32)
        return {"features": self.features[img], "triples": trip}


def _dense_cum_weights(tri_list, weights_list, T: int) -> np.ndarray:
    """[N, T] float32 per-image CDF over triples for inverse-CDF sampling.

    Row j holds cumsum(weights_j) over its n_j triples (last entry pinned to
    exactly 1.0 against float-sum drift) and 1.0 in every pad slot, so
    ``(u > cumw).sum(-1)`` with u ∈ [0,1) always lands on a real triple.
    """
    N = len(tri_list)
    cumw = np.ones((N, T), np.float32)
    for j, t in enumerate(tri_list):
        n = t.shape[0]
        c = np.cumsum(np.asarray(weights_list[j], np.float64))
        c[-1] = 1.0
        cumw[j, :n] = c.astype(np.float32)
        cumw[j, n - 1] = 1.0
    return cumw


def _data_store(dataset) -> tuple[np.ndarray, str]:
    """(host array, batch key) for whatever the dataset holds.

    Feature-backed datasets yield ('features', f32[N,R,F]); image-backed
    ones ('images', u8[N,H,W,3]) — the fused step normalizes + encodes on
    device, so the uint8 store is 4× smaller in HBM than f32 features.
    """
    if hasattr(dataset, "features"):
        return dataset.features, "features"
    return dataset.images, "images"


def quantize_feature_store(
    feats: np.ndarray, chunk: int = 8192
) -> tuple[np.ndarray, np.ndarray]:
    """Symmetric per-region int8 quantization of a feature store.

    Halves (vs f16) or quarters (vs f32) the bytes a feature store needs in
    HBM, which is what lets the 21 GB v3 extraction live FULLY device-
    resident on a 16 GB v5e instead of rotating 2 GB subsets through the
    relay forever (the measured rotation tax: ~70 s of upload per 1000
    steps = 13 effective steps/s, VERDICT r4 weak #1 — and every uploaded
    byte also leaks into host RSS through this relay client, NOTES.md).

    Returns ``(q int8 [N, R, F], scale f32 [N, R])`` with
    ``x ≈ q * scale``. The scale is per REGION (row): region vectors are
    one encoder activation each, so their dynamic ranges differ far more
    across regions than across the 512 channels within one — per-region
    absmax keeps the max relative error ≤ 1/127 of each region's own peak.
    Chunked so the temporary f32 view never exceeds ``chunk`` images.
    """
    n = feats.shape[0]
    q = np.empty(feats.shape, np.int8)
    scale = np.empty(feats.shape[:-1], np.float32)
    for lo in range(0, n, chunk):
        f = np.asarray(feats[lo : lo + chunk], np.float32)
        s = np.abs(f).max(axis=-1) / 127.0
        np.maximum(s, 1e-12, out=s)
        q[lo : lo + chunk] = np.clip(
            np.rint(f / s[..., None]), -127, 127
        ).astype(np.int8)
        scale[lo : lo + chunk] = s
    return q, scale


def make_device_train_iterator(
    dataset,
    batch_size: int,
    n_critic: int,
    seed: int = 0,
    process_index: int | None = None,
    process_count: int | None = None,
    sharding: jax.sharding.Sharding | None = None,
    int8_store: bool = False,
):
    """Device-resident pipeline: the whole (local) dataset lives in HBM and
    every super-batch is assembled by ONE jitted gather — zero per-step
    host↔device traffic. The TPU-native choice whenever the data fits device
    memory (vg1k: 1k × 196×512 f32 ≈ 0.4 GB ≪ 16 GB HBM); the host-prefetch
    iterator remains for bigger-than-HBM data. Accepts feature-backed
    (TripleDataset) and image-backed (ArrayImageTripleDataset) datasets —
    the latter keeps raw uint8 pixels resident and lets the end-to-end
    encoder configs (incl. train.train_encoder) run without per-step image
    uploads.
    """
    import jax.numpy as jnp

    arrays, meta = _prepare_device_arrays(
        dataset, process_index, process_count, int8_store
    )
    sample_body = _make_sample_body(
        meta, batch_size, n_critic, seed, sharding
    )
    sample = jax.jit(sample_body)

    def gen():
        step = 0
        while True:
            yield sample(*arrays, step)
            step += 1

    return gen()


def _prepare_device_arrays(dataset, process_index, process_count, int8_store):
    """Shared store-prep for the device-resident paths: the full (local)
    store in HBM (optionally int8-quantized + per-region scale) plus the
    dense triple tables. Returns ``(arrays, meta)`` where ``arrays`` =
    (feats, scale, dense, counts, cumw) device arrays and ``meta`` carries
    what :func:`_make_sample_body` needs to sample from them."""
    import jax.numpy as jnp

    from sgg.eval.sampler import device_put_features

    if process_index is None:
        process_index = jax.process_index()
    if process_count is None:
        process_count = jax.process_count()
    local = dataset.process_slice(process_index, process_count)
    if len(local) == 0:
        raise ValueError(f"process {process_index}/{process_count}: empty shard")

    store_host, key_name = _data_store(dataset)
    # [N, ...] → HBM once. Chunked: a single multi-GB put collapses to
    # ~4 MB/s through the relay (measured; 64 MB chunks sustain ~42 MB/s).
    # Skip the host-side fancy-index copy when this process owns everything.
    host_feats = (
        store_host
        if len(local) == len(dataset) and process_count == 1
        else store_host[local]
    )
    int8_store = int8_store and key_name == "features"
    store_dtype = host_feats.dtype
    if int8_store:
        # int8 + per-region scale resident; the jitted gather dequants the
        # BATCH (not the store) back to the original dtype — a fused
        # gather·mul·cast, zero extra HBM beyond the batch itself.
        q_host, scale_host = quantize_feature_store(host_feats)
        feats = device_put_features(q_host)
        scale_d = device_put_features(scale_host)
        del q_host, scale_host
    else:
        feats = device_put_features(host_feats)
        scale_d = jnp.zeros((1, 1), jnp.float32)  # unused; DCE'd under jit
    tri_list = [dataset.triples[i] for i in local]
    T = max(t.shape[0] for t in tri_list)
    dense = np.zeros((len(local), T, 3), np.int32)
    counts = np.zeros((len(local),), np.int32)
    for j, t in enumerate(tri_list):
        dense[j, : t.shape[0]] = t
        counts[j] = t.shape[0]
    balanced = dataset.triple_weights is not None
    cumw_d = jnp.asarray(
        _dense_cum_weights(
            tri_list, [dataset.triple_weights[i] for i in local], T
        )
        if balanced
        else np.zeros((1, 1), np.float32)  # unused; DCE'd under jit
    )
    arrays = (feats, scale_d, jnp.asarray(dense), jnp.asarray(counts), cumw_d)
    meta = {
        "key_name": key_name,
        "int8": int8_store,
        "store_dtype": store_dtype,
        "balanced": balanced,
        "N": len(local),
        "process_index": process_index,
    }
    return arrays, meta


def _make_sample_body(meta, batch_size, n_critic, seed, sharding):
    """Pure (un-jitted) super-batch sampler over the device-resident arrays.

    Device arrays are ARGUMENTS, not closures: a closed-over array becomes
    a program constant, bloating the compiled executable (and overflowing
    remote-compile request limits) by the size of the dataset. ``step`` may
    be a host int or a traced scalar — keys derive from
    ``fold_in(base, step)`` either way, which is what makes the fused
    multi-step path (make_fused_device_stepper) bit-identical to the
    per-step iterator."""
    import jax.numpy as jnp

    n_sub = n_critic + 1
    base = jax.random.key(seed + 7919 * meta["process_index"])
    key_name = meta["key_name"]
    balanced = meta["balanced"]
    int8_store = meta["int8"]
    store_dtype = meta["store_dtype"]
    N = meta["N"]

    def sample(feats, scale, dense, counts, cumw, step):
        key = jax.random.fold_in(base, step)
        k_img, k_tri = jax.random.split(key)
        img = jax.random.randint(k_img, (n_sub, batch_size), 0, N)
        u = jax.random.uniform(k_tri, (n_sub, batch_size))
        if balanced:
            # inverse-CDF draw from the per-image predicate-balanced weights
            tsel = (u[..., None] > cumw[img]).sum(-1).astype(jnp.int32)
        else:
            # uniform triple choice within each image's true triple count
            tsel = (u * counts[img]).astype(jnp.int32)
        x = feats[img]  # [n_sub, B, R, F] / [n_sub, B, H, W, 3]
        if int8_store:
            x = (x * scale[img][..., None]).astype(store_dtype)
        batch = {
            key_name: x,
            "triples": dense[img, tsel],  # [n_sub, B, 3]
        }
        if sharding is not None:
            batch = jax.lax.with_sharding_constraint(
                batch, jax.tree.map(lambda _: sharding, batch)
            )
        return batch

    return sample


def make_fused_device_stepper(
    dataset,
    step_fn,
    batch_size: int,
    n_critic: int,
    n_steps: int,
    seed: int = 0,
    process_index: int | None = None,
    process_count: int | None = None,
    sharding: jax.sharding.Sharding | None = None,
    int8_store: bool = False,
):
    """N train steps per dispatch: ``lax.scan(step ∘ sample)`` in ONE jitted
    program over the device-resident store.

    The wall-throughput lever for dispatch-latency-bound attachments: this
    machine's TPU relay costs ~30 ms per dispatch × 2-3 dispatches/step
    (sample, step, periodic readback) ≈ 80-100 ms/step of pure latency —
    which bounded every per-step train loop at ~10-13 steps/s REGARDLESS
    of data loading (BASELINE.md round-5 "rotation-upload tax" section:
    in-compute marginal 113 steps/s vs ~10 wall). Fusing N steps amortizes
    the round trip to latency/N.

    The sample stream keys off ``fold_in(base, step0 + k)`` and the step
    body keys off ``state.step`` — both identical to the per-step path, so
    N is a pure scheduling choice (tests pin fused == sequential).

    Returns ``(fused_fn, store_args)``; call
    ``fused_fn(state, *store_args, step0)`` → ``(state', last_metrics)``
    where ``step0`` counts SAMPLE steps from this process's launch (the
    per-step iterator also restarts its sample counter at 0 on relaunch).
    """
    import jax.numpy as jnp

    arrays, meta = _prepare_device_arrays(
        dataset, process_index, process_count, int8_store
    )
    sample_body = _make_sample_body(meta, batch_size, n_critic, seed, sharding)

    @jax.jit
    def fused(state, feats, scale, dense, counts, cumw, step0):
        def body(st, k):
            batch = sample_body(feats, scale, dense, counts, cumw, step0 + k)
            st2, metrics = step_fn(st, batch)
            return st2, metrics

        state2, ms = jax.lax.scan(body, state, jnp.arange(n_steps))
        # Log boundaries see the LAST inner step's metrics — same scalars
        # the per-step loop would have handed the logger at this step.
        return state2, jax.tree.map(lambda x: x[-1], ms)

    return fused, arrays


def make_rotating_device_iterator(
    dataset,
    batch_size: int,
    n_critic: int,
    seed: int = 0,
    subset_bytes: int = 2_000_000_000,
    min_steps_per_subset: int = 0,
    sharding: jax.sharding.Sharding | None = None,
    int8_store: bool = False,
    log=print,
):
    """Bigger-than-HBM corpora without per-step host uploads (VERDICT r2
    weak #3): the feature set is partitioned into equal subsets that each
    fit an HBM budget slice; training samples from the RESIDENT subset with
    the same zero-host-traffic jitted gather as
    :func:`make_device_train_iterator` while a background thread
    chunk-uploads the next subset, and the iterator swaps when the upload
    completes. The swap policy is event-driven — train until the next
    subset is READY — so the schedule self-tunes to the transfer bandwidth
    with zero device idle: effective throughput approaches
    ``subset_images × steps_between_swaps / upload_time`` instead of the
    synchronous per-step upload rate (measured 200–260 img/s/chip through
    this machine's relay at vg_full volume).

    HBM cost: at most TWO subsets resident (current + incoming), so pass
    ``subset_bytes ≤ budget/2``. Subsets are equal-sized (last one wraps)
    so every swap reuses the same compiled sample program. Sampling is
    with-replacement within the resident subset — the same unit the
    single-subset device-resident path uses; rotation only bounds how
    often the window advances. Single-process only (device-resident
    arrays cannot satisfy non-addressable global shardings).
    """
    import queue as _queue

    import jax.numpy as jnp

    from sgg.eval.sampler import device_put_features

    store_host, key_name = _data_store(dataset)
    n = len(dataset)
    int8_store = int8_store and key_name == "features"
    scale_host = None
    if int8_store:
        # Quantize ONCE up front; every subset upload then moves int8 + a
        # tiny f32 scale — half the f16 relay bytes per rotation.
        store_dtype = store_host.dtype
        store_host, scale_host = quantize_feature_store(store_host)
    per_img = store_host[0].nbytes
    if int8_store:
        per_img += scale_host[0].nbytes
    S = max(1, min(n, subset_bytes // max(per_img, 1)))
    n_subsets = max(1, -(-n // S))
    rng = np.random.RandomState(seed)
    order = rng.permutation(n)
    # Equal-sized subsets; the last wraps so one compiled program serves all.
    subsets = [
        np.concatenate([order, order])[j * S : j * S + S]
        for j in range(n_subsets)
    ]

    T = max(t.shape[0] for t in dataset.triples)

    balanced = dataset.triple_weights is not None

    def host_subset(j):
        idx = subsets[j]
        feats = store_host[idx]
        scl = scale_host[idx] if int8_store else np.zeros((1, 1), np.float32)
        dense = np.zeros((S, T, 3), np.int32)
        counts = np.zeros((S,), np.int32)
        for row, i in enumerate(idx):
            t = dataset.triples[i]
            dense[row, : t.shape[0]] = t
            counts[row] = t.shape[0]
        cumw = (
            _dense_cum_weights(
                [dataset.triples[i] for i in idx],
                [dataset.triple_weights[i] for i in idx], T,
            )
            if balanced
            else np.zeros((1, 1), np.float32)  # unused; DCE'd under jit
        )
        return feats, scl, dense, counts, cumw

    def upload(j):
        # Instrumented (VERDICT r4 weak #1): the balanced 100k train ran at
        # ~13 effective steps/s vs ~290 between rotations; this split says
        # whether the ~70 s/rotation goes to the host-side gather (GIL/CPU
        # starvation of the main loop) or the relay device_put (transport
        # serialization ahead of the train-step dispatches).
        t0 = time.perf_counter()
        feats, scl, dense, counts, cumw = host_subset(j)
        t1 = time.perf_counter()
        out = (
            device_put_features(feats),
            jnp.asarray(scl),
            jnp.asarray(dense),
            jnp.asarray(counts),
            jnp.asarray(cumw),
        )
        jax.block_until_ready(out)
        t2 = time.perf_counter()
        if log:
            log(
                f"[sgg.data] subset {j} upload: host gather {t1 - t0:.1f}s, "
                f"device_put {t2 - t1:.1f}s ({feats.nbytes / 1e9:.2f} GB)"
            )
        return out

    n_sub = n_critic + 1
    base = jax.random.key(seed)

    @jax.jit
    def sample(feats, scale, dense, counts, cumw, step):
        key = jax.random.fold_in(base, step)
        k_img, k_tri = jax.random.split(key)
        img = jax.random.randint(k_img, (n_sub, batch_size), 0, S)
        u = jax.random.uniform(k_tri, (n_sub, batch_size))
        if balanced:
            tsel = (u[..., None] > cumw[img]).sum(-1).astype(jnp.int32)
        else:
            tsel = (u * counts[img]).astype(jnp.int32)
        x = feats[img]
        if int8_store:
            x = (x * scale[img][..., None]).astype(store_dtype)
        batch = {key_name: x, "triples": dense[img, tsel]}
        if sharding is not None:
            batch = jax.lax.with_sharding_constraint(
                batch, jax.tree.map(lambda _: sharding, batch)
            )
        return batch

    def gen():
        ready: _queue.Queue = _queue.Queue(maxsize=1)
        current = upload(0)
        swaps = {"count": 0}

        def preload_loop():
            j = 1
            while True:
                ready.put(upload(j % n_subsets))  # blocks until consumed
                j += 1

        if n_subsets > 1:
            threading.Thread(
                target=preload_loop, daemon=True, name="sgg-rotate-upload"
            ).start()

        step = 0
        steps_on_subset = 0
        while True:
            if (
                n_subsets > 1
                and steps_on_subset >= min_steps_per_subset
                and not ready.empty()
            ):
                old = current
                current = ready.get_nowait()
                del old  # free the outgoing subset's HBM before the next put
                swaps["count"] += 1
                if log and swaps["count"] % n_subsets == 0:
                    log(
                        f"[sgg.data] subset rotation: cycle "
                        f"{swaps['count'] // n_subsets} complete "
                        f"({steps_on_subset} steps on last subset)"
                    )
                steps_on_subset = 0
            yield sample(*current, step)
            step += 1
            steps_on_subset += 1

    return gen()


def make_train_iterator(
    dataset: TripleDataset,
    batch_size: int,
    n_critic: int,
    seed: int = 0,
    process_index: int | None = None,
    process_count: int | None = None,
    sharding: jax.sharding.Sharding | None = None,
    prefetch: int = 2,
    device_put: bool = True,
) -> Iterator[dict]:
    """Infinite iterator of super-batches for the fused step.

    Yields ``{'features': f32[n_critic+1, B_local, R, F],
              'triples':  i32[n_critic+1, B_local, 3]}``
    already on device (unless ``device_put=False``). ``batch_size`` is the
    per-process batch; with a sharding it must equal
    global_batch // process_count.
    """
    if process_index is None:
        process_index = jax.process_index()
    if process_count is None:
        process_count = jax.process_count()
    indices = dataset.process_slice(process_index, process_count)
    if len(indices) == 0:
        raise ValueError(
            f"process {process_index}/{process_count} got an empty shard "
            f"({len(dataset)} images)"
        )
    rng = np.random.RandomState(seed + 7919 * process_index)
    n_sub = n_critic + 1

    def host_batch() -> dict:
        subs = [dataset.sample_batch(rng, indices, batch_size) for _ in range(n_sub)]
        # Stack whatever keys the dataset produces ('features' or 'images').
        return {k: np.stack([s[k] for s in subs]) for k in subs[0]}

    def put(b: dict) -> dict:
        if not device_put:
            return b
        if sharding is not None:
            if jax.process_count() > 1:
                # Each process contributes its local batch rows; the runtime
                # assembles the global sharded array (device_put is illegal
                # on non-addressable shardings).
                return jax.tree.map(
                    lambda x: jax.make_array_from_process_local_data(sharding, x), b
                )
            return jax.device_put(b, jax.tree.map(lambda _: sharding, b))
        return jax.device_put(b)

    if prefetch <= 0:
        while True:
            yield put(host_batch())

    q: queue.Queue = queue.Queue(maxsize=prefetch)
    stop = threading.Event()

    def worker():
        while not stop.is_set():
            b = put(host_batch())
            while not stop.is_set():
                try:
                    q.put(b, timeout=0.5)
                    break
                except queue.Full:
                    continue

    t = threading.Thread(target=worker, daemon=True, name="sgg-data-prefetch")
    t.start()
    try:
        while True:
            yield q.get()
    finally:
        stop.set()
