"""Batched scene-graph sampling.

Reference call stack (SURVEY.md §3.3): per test image, run the generator k
times with fresh noise, argmax token ids, dedupe/aggregate into a scene
graph. TPU redesign: all k samples for a whole image batch are one compiled
program — ``vmap`` over the sample axis on top of the batch axis — so
inference throughput (triples/sec, BASELINE.json:2) is one dispatch per
batch instead of k·B session calls.
"""

from __future__ import annotations

from collections import Counter

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


def assemble_scene_graph(
    tokens: np.ndarray, vocab: Vocab, image_id: int | None = None
) -> dict:
    """Aggregate k sampled triples for one image into a deduped scene graph.

    ``tokens``: int[K, 3]. Returns a JSON-ready dict with triples ordered by
    sample frequency (the confidence proxy used for recall@k ranking).
    """
    counts = Counter(tuple(int(x) for x in row) for row in tokens)
    triples = []
    for (s, p, o), c in counts.most_common():
        subj, pred, obj = vocab.decode_triple((s, p, o))
        triples.append(
            {"subject": subj, "predicate": pred, "object": obj, "count": c}
        )
    out = {"triples": triples}
    if image_id is not None:
        out["image_id"] = int(image_id)
    return out
