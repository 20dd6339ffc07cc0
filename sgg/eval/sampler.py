"""Batched scene-graph sampling.

Reference call stack (SURVEY.md §3.3): per test image, run the generator k
times with fresh noise, argmax token ids, dedupe/aggregate into a scene
graph. TPU redesign: all k samples for a whole image batch are one compiled
program — ``vmap`` over the sample axis on top of the batch axis — so
inference throughput (triples/sec, BASELINE.json:2) is one dispatch per
batch instead of k·B session calls.

Sampling semantics and deviations from the reference, documented
(round-1 VERDICT missing #6):
  - ranking: generated triples are ordered by SAMPLE FREQUENCY across the
    k noise draws (a Monte-Carlo confidence proxy), which is what recall@k
    cuts on. The reference has no explicit ranking (it emits the deduped
    sample set); frequency ranking is this framework's choice.
  - temperature: the Gumbel-softmax ``tau`` is the sampling temperature —
    higher spreads probability over more triples per image, lower is
    mode-seeking. Exposed as ``--temperature`` on generate/evaluate
    (default: the config's ``tau_min``, i.e. the temperature the
    generator converged at).
  - no beam search, deliberately: the decode is exactly 3 tokens, so
    k-sample ancestral sampling with dedupe already covers the space a
    3-step beam would, without the sequential dependency.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from sgg.config import Config
from sgg.data.vocab import Vocab
from sgg.train.state import make_models


def make_sampler(cfg: Config, step_mask=None, num_samples: int = 50, tau: float | None = None):
    """Build jitted (g_params, feats [B,R,F], rng) → tokens int32[B, K, 3]."""
    gen, _ = make_models(cfg)
    mask = None if step_mask is None else jnp.asarray(step_mask, bool)
    tau_val = cfg.train.tau_min if tau is None else tau

    def sample(g_params, feats, rng):
        B = feats.shape[0]

        def one(key):
            kz, kg = jax.random.split(key)
            z = jax.random.normal(kz, (B, cfg.model.noise_dim), cfg.model.dtype)
            out = gen.apply(
                {"params": g_params}, feats, z, kg,
                tau=tau_val, hard=True, step_mask=mask,
            )
            return out["tokens"].astype(jnp.int32)

        keys = jax.random.split(rng, num_samples)
        toks = jax.vmap(one)(keys)  # [K, B, 3]
        return jnp.transpose(toks, (1, 0, 2))  # [B, K, 3]

    return jax.jit(sample)


def make_indexed_sampler(
    cfg: Config, step_mask=None, num_samples: int = 50, tau: float | None = None
):
    """Device-resident variant: (g_params, feats_dev [N,R,F], idx i32[B], rng)
    → tokens int32[B, K, 3], with the feature gather INSIDE the jit.

    Through a relay-attached TPU (~40 MB/s host→device) re-uploading a
    [B,196,512] feature slab per batch dominates generate wall-clock; with
    the whole feature set resident in HBM, per-batch traffic is B indices up
    and B·K·3 int32 down.
    """
    gen, _ = make_models(cfg)
    mask = None if step_mask is None else jnp.asarray(step_mask, bool)
    tau_val = cfg.train.tau_min if tau is None else tau

    def sample(g_params, feats_dev, idx, rng):
        feats = jnp.take(feats_dev, idx, axis=0)  # [B, R, F] gather in HBM
        B = feats.shape[0]

        def one(key):
            kz, kg = jax.random.split(key)
            z = jax.random.normal(kz, (B, cfg.model.noise_dim), cfg.model.dtype)
            out = gen.apply(
                {"params": g_params}, feats, z, kg,
                tau=tau_val, hard=True, step_mask=mask,
            )
            return out["tokens"].astype(jnp.int32)

        keys = jax.random.split(rng, num_samples)
        toks = jax.vmap(one)(keys)  # [K, B, 3]
        return jnp.transpose(toks, (1, 0, 2))  # [B, K, 3]

    return jax.jit(sample)


def make_dp_sampler(
    cfg: Config, mesh, step_mask=None, num_samples: int = 50,
    tau: float | None = None,
):
    """Data-parallel batch inference: (g_params, feats [B,R,F], rng) →
    tokens int32[B,K,3] with the image batch sharded over the mesh's 'data'
    axis (GSPMD; params replicated).

    Every sampled row is independent — no cross-device collectives — so a
    batch spread over N chips decodes in 1/N the wall time and tokens are
    bit-identical to the single-device :func:`make_sampler` for the same
    rng (asserted in tests/dist/test_dp_inference.py). This is the
    multi-chip serving path: the generate CLI and ``sgg.serve`` engine pick
    it up when given a mesh.
    """
    from sgg.dist.mesh import batch_sharding, replicated_sharding

    gen, _ = make_models(cfg)
    mask = None if step_mask is None else jnp.asarray(step_mask, bool)
    tau_val = cfg.train.tau_min if tau is None else tau

    def sample(g_params, feats, rng):
        B = feats.shape[0]

        def one(key):
            kz, kg = jax.random.split(key)
            z = jax.random.normal(kz, (B, cfg.model.noise_dim), cfg.model.dtype)
            out = gen.apply(
                {"params": g_params}, feats, z, kg,
                tau=tau_val, hard=True, step_mask=mask,
            )
            return out["tokens"].astype(jnp.int32)

        keys = jax.random.split(rng, num_samples)
        toks = jax.vmap(one)(keys)  # [K, B, 3]
        return jnp.transpose(toks, (1, 0, 2))  # [B, K, 3]

    repl = replicated_sharding(mesh)
    batch = batch_sharding(mesh, leading_stacked=False)
    return jax.jit(
        sample, in_shardings=(repl, batch, repl), out_shardings=batch
    )


def make_fused_sampler(
    cfg: Config, step_mask=None, num_samples: int = 50,
    tau: float | None = None, indexed: bool = False, block_b: int = 32,
):
    """Sampler on the fused Pallas decode kernel (sgg/kernels/fused_decode).

    Same signature/contract as :func:`make_sampler` (or, with
    ``indexed=True``, :func:`make_indexed_sampler`) and bit-identical tokens
    for the same rng — the kernel reproduces ``AttentionLSTMGenerator.apply``
    including its per-step rng split sequence (tests/unit/test_fused_decode.py,
    tests/unit/test_fused_sampler.py). Where the XLA sampler vmaps K noise
    draws into one giant program, this one ``lax.scan``s K fused-decode
    dispatches: each draw is ONE Pallas program with all decoder weights
    VMEM-resident, so the sequential op-dispatch chain the MFU analysis
    flagged (BASELINE.md "Step MFU across shapes") collapses to one program
    launch per draw.
    """
    from sgg.kernels.fused_decode import (
        decode_gumbel_noise,
        decode_params_from_generator,
        fused_decode,
        step_mask_bias,
    )

    mask_bias = None if step_mask is None else step_mask_bias(step_mask)
    tau_val = cfg.train.tau_min if tau is None else tau
    dtype = cfg.model.dtype

    def _tokens(g_params, feats, rng):
        dp = decode_params_from_generator(g_params)
        B = feats.shape[0]
        V = dp["wv"].shape[1]

        def one(_, key):
            kz, kg = jax.random.split(key)
            z = jax.random.normal(kz, (B, cfg.model.noise_dim), dtype)
            gum = decode_gumbel_noise(kg, B, V)
            y = fused_decode(
                dp, feats.astype(dtype), z, gum, tau=tau_val,
                mask_bias=mask_bias, hard=True, block_b=block_b,
            )
            return None, jnp.argmax(y, axis=-1).astype(jnp.int32)

        keys = jax.random.split(rng, num_samples)
        _, toks = jax.lax.scan(one, None, keys)  # [K, B, 3]
        return jnp.transpose(toks, (1, 0, 2))  # [B, K, 3]

    if indexed:
        def sample(g_params, feats_dev, idx, rng):
            return _tokens(g_params, jnp.take(feats_dev, idx, axis=0), rng)
    else:
        def sample(g_params, feats, rng):
            return _tokens(g_params, feats, rng)

    return jax.jit(sample)


def device_put_features(
    features: np.ndarray, dtype=None, chunk_bytes: int = 64 << 20
):
    """Upload a [N,R,F] feature array to the device in bounded chunks.

    Two measured relay pathologies motivate this (BASELINE.md round 2):
    a single 411 MB device_put runs at ~4 MB/s while ≤64 MB chunks sustain
    ~42 MB/s, and casting to the compute dtype on-device is free whereas a
    host-side numpy bf16 cast of the same array costs ~7 s on this 1-core
    host. Returns one device array of ``features``'s shape in ``dtype``.

    Assembly is IN PLACE: preallocate the store, then write each uploaded
    chunk with a donated ``dynamic_update_slice`` so the peak footprint is
    store + one chunk. The round-2 upload-then-``jnp.concatenate`` scheme
    peaked at 2× the store, which OOM'd a 5.78 GB pretrain image store on
    the chip (round 3) — and the failure surfaced asynchronously at the
    next readback, far from the cause.
    """
    n = features.shape[0]
    per_img = features[0].nbytes if n else 1
    per = max(1, chunk_bytes // per_img)
    out_dtype = features.dtype if dtype is None else dtype
    if n <= per:
        chunk = jax.device_put(features)
        return chunk if dtype is None else chunk.astype(dtype)

    @partial(jax.jit, donate_argnums=0)
    def write(store, chunk, lo):
        return jax.lax.dynamic_update_slice_in_dim(
            store, chunk.astype(out_dtype), lo, axis=0
        )

    store = jnp.zeros(features.shape, out_dtype)
    for lo in range(0, n, per):
        store = write(store, jax.device_put(features[lo : lo + per]), lo)
    return store


def assemble_scene_graphs(
    tokens: np.ndarray, vocab: Vocab, image_ids
) -> tuple[list[dict], list[list[tuple[int, int, int]]]]:
    """Batch dedupe/aggregate: tokens int[B, K, 3] → (graphs, id_triples).

    One corpus-wide ``np.unique`` call instead of B per-image passes — the
    per-image Python loop was the dominant host cost of the generate CLI
    once sampling went device-resident (this host has a single core).
    ``id_triples`` lists each image's unique (s,p,o) id triples in the same
    confidence order as the graph, for recall scoring without re-encoding.
    """
    tokens = np.asarray(tokens)
    B, K, _ = tokens.shape
    img = np.repeat(np.arange(B, dtype=np.int64), K)[:, None]
    flat = np.concatenate([img, tokens.reshape(-1, 3)], axis=1)
    uniq, counts = np.unique(flat, axis=0, return_counts=True)
    # per image: count desc, ties lexicographic (matches the single-image
    # assemble below)
    order = np.lexsort((-counts,))  # stable; uniq already image-major
    order = order[np.argsort(uniq[order, 0], kind="stable")]
    uniq, counts = uniq[order], counts[order]
    bounds = np.searchsorted(uniq[:, 0], np.arange(B + 1))

    decode_cache: dict = {}
    graphs, id_triples = [], []
    for b in range(B):
        lo, hi = bounds[b], bounds[b + 1]
        triples, ids = [], []
        for row, c in zip(uniq[lo:hi, 1:], counts[lo:hi]):
            t = (int(row[0]), int(row[1]), int(row[2]))
            ids.append(t)
            names = decode_cache.get(t)
            if names is None:
                names = decode_cache[t] = vocab.decode_triple(t)
            triples.append(
                {"subject": names[0], "predicate": names[1],
                 "object": names[2], "count": int(c)}
            )
        graphs.append({"triples": triples, "image_id": int(image_ids[b])})
        id_triples.append(ids)
    return graphs, id_triples


def assemble_scene_graph(
    tokens: np.ndarray, vocab: Vocab, image_id: int | None = None
) -> dict:
    """Aggregate k sampled triples for one image into a deduped scene graph.

    ``tokens``: int[K, 3]. Returns a JSON-ready dict with triples ordered by
    sample frequency (the confidence proxy used for recall@k ranking).
    """
    # np.unique is C-speed; a Python Counter over K tuples per image was a
    # measurable share of generate wall-clock on this 1-core host.
    uniq, counts = np.unique(np.asarray(tokens).reshape(-1, 3), axis=0,
                             return_counts=True)
    order = np.argsort(-counts, kind="stable")
    triples = []
    for i in order:
        s, p, o = (int(x) for x in uniq[i])
        subj, pred, obj = vocab.decode_triple((s, p, o))
        triples.append(
            {"subject": subj, "predicate": pred, "object": obj,
             "count": int(counts[i])}
        )
    out = {"triples": triples}
    if image_id is not None:
        out["image_id"] = int(image_id)
    return out


def make_predcls_scorer(
    cfg: Config, step_mask=None, num_samples: int = 16, tau: float | None = None
):
    """Predicate-classification scorer: (g_params, feats [B,R,F], subj i32[B],
    obj i32[B], rng) → float32[B, V] log p(predicate | subject, image).

    The standard SGG "PredCls" protocol (rank predicates given the GT
    entity pair) mapped onto this generator: the decode is clamped to the
    ground-truth subject at step 0 (and object at step 2, inert for the
    predicate step's logits under the s→p→o order), and the predicate
    step's log-softmax is mixture-averaged over ``num_samples`` noise
    draws — log(1/K Σ softmax(logits_k)) via logsumexp. For the
    non-autoregressive slot decoder the clamp cannot condition the
    predicate slot, so this degrades to the marginal predicate
    distribution (documented in TransformerTripleGenerator).
    """
    gen, _ = make_models(cfg)
    mask = None if step_mask is None else jnp.asarray(step_mask, bool)
    tau_val = cfg.train.tau_min if tau is None else tau

    def score(g_params, feats, subj, obj, rng):
        B = feats.shape[0]
        forced = jnp.stack([subj, jnp.zeros_like(subj), obj], axis=1)

        def one(key):
            kz, kg = jax.random.split(key)
            z = jax.random.normal(kz, (B, cfg.model.noise_dim), cfg.model.dtype)
            out = gen.apply(
                {"params": g_params}, feats, z, kg,
                tau=tau_val, hard=True, step_mask=mask,
                forced_tokens=forced, forced_steps=(0, 2),
            )
            return jax.nn.log_softmax(
                out["logits"][:, 1].astype(jnp.float32), axis=-1
            )

        keys = jax.random.split(rng, num_samples)
        lps = jax.vmap(one)(keys)  # [K, B, V]
        return jax.nn.logsumexp(lps, axis=0) - jnp.log(float(num_samples))

    return jax.jit(score)
