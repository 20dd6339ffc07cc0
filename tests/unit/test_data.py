"""Unit tests for sgg.data (SURVEY.md §4: vocab round-trip, VG filtering)."""

import json
import os

import numpy as np
import pytest

from sgg.data import (
    TripleDataset,
    Vocab,
    build_vocab_from_relationships,
    filter_and_encode,
    make_train_iterator,
    parse_relationships,
    read_feature_shard,
    synthetic_dataset,
    synthetic_vg_json,
    write_feature_shard,
)
from sgg.data.vg import train_test_split


def test_vocab_roundtrip():
    v = Vocab.build({"dog": 5, "cat": 3}, {"on": 9, "near": 2})
    assert v.pad_id == 0 and v.unk_id == 1
    assert len(v) == 6
    trip = v.encode_triple("dog", "on", "cat")
    assert v.decode_triple(trip) == ("dog", "on", "cat")
    # unknown tokens map to <unk>
    assert v.id("zebra") == v.unk_id
    # JSON round-trip preserves everything
    v2 = Vocab.from_json(v.to_json())
    assert v2.tokens == v.tokens
    assert v2.encode_triple("cat", "near", "dog") == v.encode_triple("cat", "near", "dog")


def test_vocab_frequency_cut_and_masks():
    v = Vocab.build(
        {"a": 10, "b": 5, "c": 1}, {"on": 10, "under": 1}, max_objects=2, min_count=1
    )
    assert v.id("c") == v.unk_id  # cut by max_objects
    m = v.step_mask()
    assert m.shape == (3, len(v))
    assert m[0, v.id("a")] and m[2, v.id("a")] and not m[1, v.id("a")]
    assert m[1, v.id("on")] and not m[0, v.id("on")]
    assert not m[:, v.pad_id].any() and not m[:, v.unk_id].any()


def test_vocab_token_both_object_and_predicate():
    v = Vocab.build({"light": 4}, {"light": 2, "on": 5})
    i = v.id("light")
    assert v.is_object[i] and v.is_predicate[i]
    # id space has no duplicate
    assert v.tokens.count("light") == 1


def test_parse_filter_encode_synthetic_fixture():
    data = synthetic_vg_json(num_images=5, seed=0)
    images = parse_relationships(data)
    assert len(images) == 5
    # predicates were uppercased in the fixture; parser normalizes
    assert all(p == p.lower() for im in images for (_, p, _) in im.triples)

    vocab = build_vocab_from_relationships(images)
    ids, enc = filter_and_encode(images, vocab, min_triples=1)
    assert len(ids) == len(enc) > 0
    for arr in enc:
        assert arr.dtype == np.int32 and arr.ndim == 2 and arr.shape[1] == 3
        assert (arr > 1).all()  # no pad/unk after drop_unk

    # round-trip a triple back to strings
    s, p, o = vocab.decode_triple(enc[0][0])
    assert (s, p, o) in images[ids.index(ids[0])].triples or True  # string-level check below
    all_strs = {t for im in images for t in im.triples}
    assert (s, p, o) in all_strs


def test_parse_relationships_from_file(tmp_path):
    p = tmp_path / "relationships.json"
    p.write_text(json.dumps(synthetic_vg_json(3)))
    images = parse_relationships(str(p))
    assert len(images) == 3


def test_train_test_split_deterministic():
    ids = list(range(100))
    tr1, te1 = train_test_split(ids, 0.2, seed=3)
    tr2, te2 = train_test_split(ids, 0.2, seed=3)
    assert tr1 == tr2 and te1 == te2
    assert len(te1) == 20
    assert set(tr1) | set(te1) == set(ids)
    assert not set(tr1) & set(te1)


def test_shard_roundtrip(tmp_path):
    n, r, f = 4, 9, 16
    feats = np.random.randn(n, r, f).astype(np.float32)
    ids = np.arange(n, dtype=np.int32) + 100
    triples = [np.random.randint(2, 20, size=(k + 1, 3)).astype(np.int32) for k in range(n)]
    path = str(tmp_path / "shard-00000-of-00001.npz")
    write_feature_shard(path, ids, feats, triples)
    d = read_feature_shard(path)
    np.testing.assert_array_equal(d["image_ids"], ids)
    np.testing.assert_allclose(d["features"], feats)
    # flat triple table reassembles
    ds = TripleDataset.from_shards([path])
    assert len(ds) == n
    for i in range(n):
        np.testing.assert_array_equal(ds.triples[i], triples[i])


def test_process_slices_disjoint_and_covering():
    ds = TripleDataset(
        features=np.zeros((11, 2, 3), np.float32),
        triples=[np.ones((1, 3), np.int32)] * 11,
    )
    slices = [ds.process_slice(i, 4) for i in range(4)]
    all_idx = np.concatenate(slices)
    assert len(all_idx) == 11
    assert len(set(all_idx.tolist())) == 11  # disjoint + covering


def test_train_iterator_shapes_and_determinism():
    d = synthetic_dataset(num_images=16, regions=7, feat_dim=8)
    ds = TripleDataset(features=d["features"], triples=d["triples"])
    it = make_train_iterator(
        ds, batch_size=4, n_critic=3, seed=1, process_index=0, process_count=1,
        device_put=False, prefetch=0,
    )
    b = next(it)
    assert b["features"].shape == (4, 4, 7, 8)
    assert b["triples"].shape == (4, 4, 3)
    # determinism given the seed
    it2 = make_train_iterator(
        ds, batch_size=4, n_critic=3, seed=1, process_index=0, process_count=1,
        device_put=False, prefetch=0,
    )
    np.testing.assert_array_equal(b["triples"], next(it2)["triples"])


def test_train_iterator_device_put_prefetch():
    import jax

    d = synthetic_dataset(num_images=8, regions=4, feat_dim=8)
    ds = TripleDataset(features=d["features"], triples=d["triples"])
    it = make_train_iterator(
        ds, batch_size=2, n_critic=2, seed=0, process_index=0, process_count=1,
        prefetch=2,
    )
    b = next(it)
    assert isinstance(b["features"], jax.Array)
    assert b["features"].shape == (3, 2, 4, 8)


def test_synthetic_corpus_and_streaming_extract(tmp_path):
    """Full-volume pipeline in miniature: corpus writer (real JPEGs on disk,
    VG-schema JSON) → parse/filter/vocab → STREAMING extract-to-shards
    (O(shard) host memory; VERDICT round-1 item 4) → shard round-trip."""
    from sgg.data.extract import extract_to_shards, resolve_image_paths
    from sgg.data.shards import read_feature_shard
    from sgg.data.synthetic import write_synthetic_vg_corpus
    from sgg.data.vg import (
        build_vocab_from_relationships,
        filter_and_encode,
        parse_relationships,
    )

    corpus = tmp_path / "corpus"
    stats = write_synthetic_vg_corpus(
        str(corpus), num_images=9, seed=1, width=64, height=48, log_every=0,
        vocab_objects=24, vocab_predicates=10,
    )
    assert stats["num_images"] == 9 and stats["num_rels"] >= 9

    images = parse_relationships(str(corpus / "relationships.json"))
    vocab = build_vocab_from_relationships(images, min_count=1)
    ids, enc = filter_and_encode(images, vocab)
    assert len(ids) == 9

    paths = resolve_image_paths(ids, str(corpus / "images"))
    out = tmp_path / "shards"
    # ViT-free tiny encoder path: vgg19 with random init at 64px would be
    # heavy; use image_size=32 to keep the conv stack small on CPU.
    res = extract_to_shards(
        "vgg19", ids, paths, enc, str(out), shard_size=4, batch_size=2,
        image_size=32,
    )
    assert res["num_images"] == 9
    assert res["num_shards"] == 3  # 4 + 4 + 1
    shard = read_feature_shard(str(out / "shard-00000-of-00003.npz"))
    assert shard["features"].shape[0] == 4
    assert np.isfinite(shard["features"]).all()
    last = read_feature_shard(str(out / "shard-00002-of-00003.npz"))
    assert last["features"].shape[0] == 1
    assert list(last["image_ids"]) == [ids[-1]]


def test_grounded_corpus(tmp_path):
    """Grounded mode: predicates are a deterministic function of rendered
    boxes, boxes are recorded VG-style, and the standard preprocess chain
    consumes the output."""
    from sgg.data.synthetic import (
        GROUNDED_PREDICATES,
        spatial_predicate,
        write_synthetic_vg_corpus,
    )
    from sgg.data.vg import (
        build_vocab_from_relationships,
        filter_and_encode,
        parse_relationships,
    )

    assert spatial_predicate((20, 20, 20, 20), (10, 10, 100, 80)) == "inside"
    assert spatial_predicate((10, 10, 100, 80), (20, 20, 20, 20)) == "around"
    assert spatial_predicate((0, 0, 40, 40), (10, 20, 40, 40)) == "on"
    assert spatial_predicate((10, 20, 40, 40), (0, 0, 40, 40)) == "under"
    assert spatial_predicate((0, 0, 20, 20), (25, 2, 20, 20)) == "left of"
    assert spatial_predicate((25, 2, 20, 20), (0, 0, 20, 20)) == "right of"
    assert spatial_predicate((0, 0, 10, 10), (400, 300, 10, 10)) == "far from"

    info = write_synthetic_vg_corpus(
        str(tmp_path), num_images=6, seed=0, grounded=True, width=120,
        height=90, log_every=0,
    )
    assert info["num_images"] == 6 and info["num_rels"] > 0
    import json

    entries = json.load(open(tmp_path / "relationships.json"))
    for e in entries:
        for r in e["relationships"]:
            assert r["predicate"] in GROUNDED_PREDICATES
            sb = (r["subject"]["x"], r["subject"]["y"], r["subject"]["w"],
                  r["subject"]["h"])
            ob = (r["object"]["x"], r["object"]["y"], r["object"]["w"],
                  r["object"]["h"])
            assert r["predicate"] == spatial_predicate(sb, ob)

    images = parse_relationships(str(tmp_path / "relationships.json"))
    vocab = build_vocab_from_relationships(images, min_count=1)
    ids, enc = filter_and_encode(images, vocab)
    assert len(ids) == 6


def test_image_dataset_split_matches_preprocess(tmp_path):
    """End-to-end (image-backed) configs hold out the SAME images as
    sgg.cli.preprocess's shard split: load_dataset(split='test') on a vg
    image source must select exactly train_test_split's test ids, and the
    two splits must be disjoint (no eval leak)."""
    import json

    from PIL import Image

    from sgg.cli.common import load_dataset
    from sgg.config import get_config
    from sgg.data.synthetic import synthetic_vg_json
    from sgg.data.vg import (
        build_vocab_from_relationships,
        filter_and_encode,
        parse_relationships,
        train_test_split,
    )

    entries = synthetic_vg_json(20, seed=1)
    (tmp_path / "relationships.json").write_text(json.dumps(entries))
    (tmp_path / "images").mkdir()
    rng = np.random.RandomState(0)
    for e in entries:
        Image.fromarray(
            rng.randint(0, 256, (8, 8, 3), np.uint8)
        ).save(tmp_path / "images" / f"{e['image_id']}.jpg")

    cfg = get_config("smoke")
    cfg.model.encoder = "vgg19"
    cfg.data.source = "vg"
    cfg.data.data_dir = str(tmp_path)
    cfg.data.image_size = 8
    cfg.data.test_fraction = 0.25
    cfg.data.split_seed = 0

    tr_ds, vocab = load_dataset(cfg, split="train")
    te_ds, _ = load_dataset(cfg, split="test")

    # reproduce the expected split from the same inputs
    images = parse_relationships(str(tmp_path / "relationships.json"))
    v2 = build_vocab_from_relationships(images, min_count=2)
    ids, _ = filter_and_encode(
        images, v2, max_triples_per_image=cfg.data.max_triples_per_image
    )
    exp_train, exp_test = train_test_split(ids, 0.25, seed=0)

    def ids_of(ds):
        import os

        return [int(os.path.splitext(os.path.basename(p))[0]) for p in ds.paths]

    assert ids_of(tr_ds) == exp_train
    assert ids_of(te_ds) == exp_test
    assert not set(ids_of(tr_ds)) & set(ids_of(te_ds))

    # max_images caps deterministically after the split
    cfg.data.max_images = 3
    tr_cap, _ = load_dataset(cfg, split="train")
    assert len(tr_cap) == 3
    assert set(ids_of(tr_cap)) <= set(exp_train)
    tr_cap2, _ = load_dataset(cfg, split="train")
    assert ids_of(tr_cap2) == ids_of(tr_cap)
