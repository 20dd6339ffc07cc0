"""Device-resident pipeline: on-device batch assembly correctness."""

import jax
import numpy as np
import pytest

from sgg.data import TripleDataset, make_device_train_iterator, synthetic_dataset


@pytest.fixture(scope="module")
def ds():
    d = synthetic_dataset(num_images=32, regions=7, feat_dim=8)
    return TripleDataset(features=d["features"], triples=d["triples"])


def test_device_iterator_shapes_and_validity(ds):
    it = make_device_train_iterator(
        ds, batch_size=4, n_critic=2, seed=0, process_index=0, process_count=1
    )
    b = next(it)
    assert isinstance(b["features"], jax.Array)
    assert b["features"].shape == (3, 4, 7, 8)
    assert b["triples"].shape == (3, 4, 3)
    # every sampled triple must be one of the source image's real triples
    feats = np.asarray(b["features"])
    trips = np.asarray(b["triples"])
    for s in range(3):
        for j in range(4):
            # identify the image by its (unique) feature block
            matches = np.where(
                np.all(np.isclose(ds.features, feats[s, j]), axis=(1, 2))
            )[0]
            assert len(matches) == 1
            img = matches[0]
            assert any(
                (trips[s, j] == t).all() for t in ds.triples[img]
            ), (s, j, trips[s, j], ds.triples[img])


def test_device_iterator_advances_and_deterministic(ds):
    it1 = make_device_train_iterator(ds, 4, 1, seed=5, process_index=0, process_count=1)
    it2 = make_device_train_iterator(ds, 4, 1, seed=5, process_index=0, process_count=1)
    a1, b1 = next(it1), next(it1)
    a2 = next(it2)
    np.testing.assert_array_equal(np.asarray(a1["triples"]), np.asarray(a2["triples"]))
    assert not np.array_equal(np.asarray(a1["triples"]), np.asarray(b1["triples"]))


def test_device_iterator_process_sharding(ds):
    b0 = next(make_device_train_iterator(ds, 8, 0, seed=1, process_index=0, process_count=2))
    b1 = next(make_device_train_iterator(ds, 8, 0, seed=1, process_index=1, process_count=2))
    f0 = {tuple(np.round(np.asarray(x)[0], 4)) for x in np.asarray(b0["features"][0])}
    f1 = {tuple(np.round(np.asarray(x)[0], 4)) for x in np.asarray(b1["features"][0])}
    assert not (f0 & f1)  # disjoint image shards
