"""Image-backed dataset for end-to-end training (on-device features).

BASELINE.json:8: "Full Visual Genome end-to-end: on-device JPEG decode →
VGG features → adversarial training". Host side decodes/resizes JPEGs (the
prefetch thread overlaps this with device compute); the fused train step
normalizes and runs the frozen backbone on device, so raw uint8 pixels are
what crosses PCIe — 4× less than f32 features of the same image.

Same iterator contract as :class:`TripleDataset` (keys: 'images', 'triples'),
so `make_train_iterator` works unchanged.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class ImageTripleDataset:
    """(image path, triples) pairs; decodes lazily with an LRU of decoded images."""

    paths: list[str]
    triples: list[np.ndarray]
    image_size: int = 224
    cache_images: int = 0  # decoded-image LRU size (0 = no cache)

    def __post_init__(self):
        assert len(self.paths) == len(self.triples)
        self._cache: dict[int, np.ndarray] = {}

    def __len__(self) -> int:
        return len(self.paths)

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
        trip = np.stack(
            [self.triples[i][rng.randint(self.triples[i].shape[0])] for i in img_idx]
        ).astype(np.int32)
        return {"images": images, "triples": trip}


@dataclass
class ArrayImageTripleDataset:
    """In-memory uint8 images variant (synthetic end-to-end tests)."""

    images: np.ndarray  # uint8 [N, H, W, 3]
    triples: list[np.ndarray] | np.ndarray

    def __post_init__(self):
        if isinstance(self.triples, np.ndarray) and self.triples.ndim == 3:
            self.triples = [t for t in self.triples]
        assert len(self.triples) == self.images.shape[0]

    def __len__(self) -> int:
        return self.images.shape[0]

    def process_slice(self, process_index: int, process_count: int) -> np.ndarray:
        return np.arange(len(self))[process_index::process_count]

    def sample_batch(self, rng, indices, batch_size) -> dict:
        img_idx = indices[rng.randint(len(indices), size=batch_size)]
        trip = np.stack(
            [self.triples[i][rng.randint(self.triples[i].shape[0])] for i in img_idx]
        ).astype(np.int32)
        return {"images": self.images[img_idx], "triples": trip}
