"""Synthetic Visual-Genome-like fixtures.

Used by tests, benchmarks, and smoke configs when the real VG dataset is not
on disk (SURVEY.md §4: "VG JSON filtering on a 5-image synthetic fixture",
"preprocess→train→generate smoke pipeline on synthetic images").

The synthetic generator plants a *learnable* structure: features are drawn
from per-triple cluster centroids, so a working GAN measurably reduces critic
loss on it — giving integration tests a signal beyond "does not NaN".
"""

from __future__ import annotations

import numpy as np

_OBJECTS = [
    "man", "woman", "dog", "cat", "car", "tree", "building", "sign",
    "table", "chair", "horse", "bus", "window", "shirt", "hat", "plate",
]
_PREDICATES = ["on", "has", "wearing", "behind", "in front of", "near", "riding", "holding"]


def synthetic_vg_json(
    num_images: int = 5, seed: int = 0, max_rels: int = 6
) -> list[dict]:
    """A tiny relationships.json-shaped object (schema of sgg.data.vg)."""
    rng = np.random.RandomState(seed)
    out = []
    for i in range(num_images):
        rels = []
        for _ in range(int(rng.randint(1, max_rels + 1))):
            s, o = rng.choice(len(_OBJECTS), size=2, replace=False)
            p = rng.randint(len(_PREDICATES))
            rels.append(
                {
                    "predicate": _PREDICATES[p].upper(),  # exercise normalization
                    "subject": {"names": [_OBJECTS[s]]},
                    "object": {"name": _OBJECTS[o]},
                }
            )
        out.append({"image_id": 1000 + i, "relationships": rels})
    return out


def synthetic_dataset(
    num_images: int = 64,
    regions: int = 196,
    feat_dim: int = 512,
    vocab_objects: int = 16,
    vocab_predicates: int = 8,
    triples_per_image: int = 4,
    seed: int = 0,
    dtype=np.float32,
):
    """Dense synthetic (features, triples) arrays + matching Vocab.

    Returns dict with:
      features : dtype[num_images, regions, feat_dim]
      triples  : int32[num_images, triples_per_image, 3]
      vocab    : sgg.data.Vocab
    """
    from collections import Counter

    from sgg.data.vocab import Vocab

    objs = _OBJECTS[:vocab_objects]
    preds = _PREDICATES[:vocab_predicates]
    vocab = Vocab.build(
        Counter({o: 100 - i for i, o in enumerate(objs)}),
        Counter({p: 100 - i for i, p in enumerate(preds)}),
    )

    rng = np.random.RandomState(seed)
    obj_ids = np.array([vocab.id(o) for o in objs], dtype=np.int32)
    pred_ids = np.array([vocab.id(p) for p in preds], dtype=np.int32)

    # Each object token gets a centroid direction in feature space; an image's
    # features mix the centroids of the tokens appearing in its triples.
    centroids = rng.randn(len(vocab), feat_dim).astype(np.float32)

    feats = np.zeros((num_images, regions, feat_dim), dtype=np.float32)
    triples = np.zeros((num_images, triples_per_image, 3), dtype=np.int32)
    for i in range(num_images):
        s = obj_ids[rng.randint(len(obj_ids), size=triples_per_image)]
        p = pred_ids[rng.randint(len(pred_ids), size=triples_per_image)]
        o = obj_ids[rng.randint(len(obj_ids), size=triples_per_image)]
        triples[i, :, 0], triples[i, :, 1], triples[i, :, 2] = s, p, o
        toks = np.concatenate([s, p, o])
        base = centroids[toks].mean(axis=0)
        feats[i] = base[None, :] + 0.5 * rng.randn(regions, feat_dim)
    return {
        "features": feats.astype(dtype),
        "triples": triples,
        "vocab": vocab,
    }
