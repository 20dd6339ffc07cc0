"""Image-backed dataset for end-to-end training (on-device features).

BASELINE.json:8: "Full Visual Genome end-to-end: on-device JPEG decode →
VGG features → adversarial training". Host side decodes/resizes JPEGs (the
prefetch thread overlaps this with device compute); the fused train step
normalizes and runs the backbone on device, so raw uint8 pixels are what
crosses PCIe — 4× less than f32 features of the same image.

Same iterator contract as :class:`TripleDataset` (keys: 'images', 'triples'),
so `make_train_iterator` works unchanged. When the decoded uint8 corpus fits
the HBM budget, :meth:`ImageTripleDataset.materialize` turns the path-backed
dataset into an in-memory :class:`ArrayImageTripleDataset`, which the
device-resident gather pipeline accepts directly (zero per-step host↔device
traffic — through this machine's relay that is the difference between
~1.4 s/step of image upload and pure device-compute step times).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


def compute_triple_weights(triples, alpha: float):
    """Per-image triple weights ∝ global-predicate-frequency^(−alpha).

    Shared by every dataset class (feature- and image-backed): the standard
    SGG long-tail resampling lever — see TripleDataset.set_predicate_balance
    for the measured motivation. Returns a list of float[n_i] rows, each
    normalized to sum to 1, or None when alpha ≤ 0.
    """
    if alpha <= 0:
        return None
    freq = np.zeros(0, np.int64)
    for t in triples:
        p = np.asarray(t)[:, 1]
        if p.size and p.max() >= freq.size:
            freq = np.concatenate(
                [freq, np.zeros(int(p.max()) + 1 - freq.size, np.int64)]
            )
        np.add.at(freq, p, 1)
    w_pred = np.where(freq > 0, freq.astype(np.float64), 1.0) ** -alpha
    return [
        (lambda w: w / w.sum())(w_pred[np.asarray(t)[:, 1]]) for t in triples
    ]


@dataclass
class ImageTripleDataset:
    """(image path, triples) pairs; decodes lazily with an LRU of decoded images."""

    paths: list[str]
    triples: list[np.ndarray]
    image_size: int = 224
    cache_images: int = 0  # decoded-image LRU size (0 = no cache)
    triple_weights: list | None = None  # set via set_predicate_balance()

    def __post_init__(self):
        assert len(self.paths) == len(self.triples)
        self._cache: dict[int, np.ndarray] = {}

    def __len__(self) -> int:
        return len(self.paths)

    @property
    def est_bytes(self) -> int:
        """Decoded-corpus size (uint8 HWC) — the HBM/materialize gate."""
        return len(self.paths) * self.image_size * self.image_size * 3

    def set_predicate_balance(self, alpha: float) -> "ImageTripleDataset":
        self.triple_weights = compute_triple_weights(self.triples, alpha)
        return self

    def materialize(self, log=None, chunk: int = 512) -> "ArrayImageTripleDataset":
        """Decode every image once into an in-memory uint8 array.

        One-time host cost (native JPEG loader + decode threads) that buys
        the device-resident gather pipeline for end-to-end encoder training.
        """
        from sgg.data.extract import load_batch

        n = len(self.paths)
        out = np.empty((n, self.image_size, self.image_size, 3), np.uint8)
        for lo in range(0, n, chunk):
            hi = min(lo + chunk, n)
            out[lo:hi] = load_batch(self.paths[lo:hi], self.image_size)
            if log and (lo // chunk) % 20 == 0:
                log(f"[sgg.data] materialize: {hi}/{n} images decoded")
        return ArrayImageTripleDataset(
            images=out, triples=self.triples,
            triple_weights=self.triple_weights,
        )

    def _load(self, i: int) -> np.ndarray:
        if i in self._cache:
            return self._cache[i]
        from sgg.data.extract import load_and_resize

        img = load_and_resize(self.paths[i], self.image_size)
        if self.cache_images and len(self._cache) < self.cache_images:
            self._cache[i] = img
        return img

    def process_slice(self, process_index: int, process_count: int) -> np.ndarray:
        return np.arange(len(self))[process_index::process_count]

    def sample_batch(
        self, rng: np.random.RandomState, indices: np.ndarray, batch_size: int
    ) -> dict:
        img_idx = indices[rng.randint(len(indices), size=batch_size)]
        cached = [int(i) for i in img_idx if int(i) in self._cache]
        if len(cached) == len(img_idx):
            images = np.stack([self._cache[int(i)] for i in img_idx])
        else:
            from sgg.data.extract import load_batch

            images = load_batch(
                [self.paths[int(i)] for i in img_idx], self.image_size
            )
            if self.cache_images:
                for j, i in enumerate(img_idx):
                    if len(self._cache) < self.cache_images:
                        self._cache[int(i)] = images[j]
        trip = np.stack([self._pick_triple(rng, int(i)) for i in img_idx]).astype(
            np.int32
        )
        return {"images": images, "triples": trip}

    def _pick_triple(self, rng, i: int) -> np.ndarray:
        t = self.triples[i]
        if self.triple_weights is None:
            return t[rng.randint(t.shape[0])]
        return t[rng.choice(t.shape[0], p=self.triple_weights[i])]


@dataclass
class ArrayImageTripleDataset:
    """In-memory uint8 images variant (synthetic end-to-end tests, and the
    materialized form the device-resident gather pipeline consumes)."""

    images: np.ndarray  # uint8 [N, H, W, 3]
    triples: list[np.ndarray] | np.ndarray
    triple_weights: list | None = None  # set via set_predicate_balance()

    def __post_init__(self):
        if isinstance(self.triples, np.ndarray) and self.triples.ndim == 3:
            self.triples = [t for t in self.triples]
        assert len(self.triples) == self.images.shape[0]

    def __len__(self) -> int:
        return self.images.shape[0]

    def set_predicate_balance(self, alpha: float) -> "ArrayImageTripleDataset":
        self.triple_weights = compute_triple_weights(self.triples, alpha)
        return self

    def process_slice(self, process_index: int, process_count: int) -> np.ndarray:
        return np.arange(len(self))[process_index::process_count]

    def sample_batch(self, rng, indices, batch_size) -> dict:
        img_idx = indices[rng.randint(len(indices), size=batch_size)]
        if self.triple_weights is None:
            pick = [
                self.triples[i][rng.randint(self.triples[i].shape[0])]
                for i in img_idx
            ]
        else:
            pick = [
                self.triples[i][
                    rng.choice(self.triples[i].shape[0], p=self.triple_weights[i])
                ]
                for i in img_idx
            ]
        trip = np.stack(pick).astype(np.int32)
        return {"images": self.images[img_idx], "triples": trip}
