"""Encoder pretraining (VERDICT r2 item 1): the supervised object-presence
aux task that stands in for the reference's downloaded VGG-19 weights."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sgg.train.pretrain import (
    PresenceModel,
    cell_labels,
    feature_grid,
    load_params_npz,
    make_pretrain_state,
    make_pretrain_step,
    multi_hot_labels,
    save_params_npz,
)


def test_multi_hot_labels():
    t = [np.array([[2, 5, 3], [4, 5, 2]], np.int32), np.zeros((0, 3), np.int32)]
    lab = multi_hot_labels(t, 8)
    assert lab.shape == (2, 8)
    assert lab[0].tolist() == [0, 0, 1, 1, 1, 0, 0, 0]  # ids 2,3,4; pred 5 not
    assert lab[1].sum() == 0
    # <pad> (id 0) is never a positive even if a padded triple names it
    lab2 = multi_hot_labels([np.array([[0, 1, 0]], np.int32)], 4)
    assert lab2[0, 0] == 0


def test_params_npz_roundtrip(tmp_path):
    params = {
        "conv1_1": {"kernel": np.random.randn(3, 3, 3, 4).astype(np.float32)},
        "head": {"bias": np.zeros((7,), np.float32)},
    }
    p = str(tmp_path / "p.npz")
    save_params_npz(p, params)
    back = load_params_npz(p)
    np.testing.assert_array_equal(
        back["conv1_1"]["kernel"], params["conv1_1"]["kernel"]
    )
    np.testing.assert_array_equal(back["head"]["bias"], params["head"]["bias"])


@pytest.fixture(scope="module")
def tiny_corpus():
    """16 rendered images (distinct-color rectangles) + their object labels."""
    from PIL import Image

    from sgg.data.synthetic import render_synthetic_image, synthetic_vg_json
    from sgg.data.vg import (
        build_vocab_from_relationships,
        filter_and_encode,
        parse_relationships,
    )

    entries = synthetic_vg_json(16, seed=3, max_rels=4)
    images = parse_relationships(entries)
    vocab = build_vocab_from_relationships(images, min_count=1)
    ids, enc = filter_and_encode(images, vocab)
    rng = np.random.RandomState(0)
    by_id = {e["image_id"]: e["relationships"] for e in entries}
    imgs = np.stack(
        [
            np.asarray(
                Image.fromarray(
                    render_synthetic_image(by_id[i], rng, width=96, height=96)
                ).resize((32, 32), Image.BILINEAR)
            )
            for i in ids
        ]
    )
    labels = multi_hot_labels(list(enc), len(vocab))
    return imgs, labels, vocab


def test_pretrain_step_learns(tiny_corpus):
    """A few steps of the fused pretrain step reduce the presence BCE on the
    distinct-color rectangle task (the signal the GAN encoder needs)."""
    imgs, labels, vocab = tiny_corpus
    model, params, opt_state, tx = make_pretrain_state(
        "vgg19", len(vocab), image_size=32, lr=3e-4, dtype=jnp.float32, seed=0
    )
    step = make_pretrain_step(model, tx, batch_size=4, seed=0)
    images_d, labels_d = jnp.asarray(imgs), jnp.asarray(labels)
    losses = []
    for i in range(24):
        params, opt_state, m = step(
            params, opt_state, images_d, labels_d, imgs.shape[0], i
        )
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-4:]) < np.mean(losses[:4]) * 0.9


def test_presence_model_encoder_params_extractable(tiny_corpus, tmp_path):
    """The saved encoder subtree drops into the extraction path unchanged."""
    imgs, labels, vocab = tiny_corpus
    model, params, _, _ = make_pretrain_state(
        "vgg19", len(vocab), image_size=32, dtype=jnp.float32, seed=1
    )
    p = str(tmp_path / "enc.npz")
    save_params_npz(p, jax.tree.map(np.asarray, params["encoder"]))
    loaded = {"params": load_params_npz(p)}

    from sgg.models.encoders import make_encoder, normalize_for

    enc = make_encoder("vgg19", dtype=jnp.float32, image_size=32)
    feats = enc.apply(loaded, normalize_for("vgg19", jnp.asarray(imgs[:2])))
    assert feats.shape == (2, 4, 512)  # 32px → 2×2 conv5 grid
    # and matches applying the full model's encoder submodule
    full = PresenceModel(encoder_name="vgg19", num_classes=len(vocab),
                         image_size=32)
    out = full.apply({"params": params}, jnp.asarray(imgs[:2]))
    assert out["presence"].shape == (2, len(vocab))
    assert out["regions"].shape == (2, 4, len(vocab))


# ------------------------------------------------------- spatial supervision


def _mini_vocab():
    from collections import Counter

    from sgg.data.vocab import Vocab

    return Vocab.build(Counter({"dog": 5, "cat": 4}), Counter({"on": 3}))


def test_cell_labels_owner_and_background():
    """Cell label = vocab id of the SMALLEST box covering the cell center
    (draw order of render_grounded_image); uncovered cells stay 0."""
    v = _mini_vocab()
    dog, cat = v.id("dog"), v.id("cat")
    # 4x4 grid on a 40x40 image → cell centers at 5, 15, 25, 35.
    ents = [
        ("dog", (0, 0, 40, 40)),    # covers everything
        ("cat", (0, 0, 12, 12)),    # smaller, on top: owns cell (0, 0)
    ]
    lab = cell_labels([ents, []], v, grid=4, image_wh=(40, 40))
    assert lab.shape == (2, 16)
    g = lab[0].reshape(4, 4)
    assert g[0, 0] == cat
    assert (g.ravel()[1:] == dog).all()
    assert (lab[1] == 0).all()


def test_cell_labels_skips_unknown_and_scales_axes():
    v = _mini_vocab()
    # Non-square image: box spans left half in x, full in y.
    ents = [("dog", (0, 0, 50, 80)), ("zebra", (0, 0, 100, 80))]
    lab = cell_labels([ents], v, grid=2, image_wh=(100, 80))
    g = lab[0].reshape(2, 2)
    assert (g[:, 0] == v.id("dog")).all()
    assert (g[:, 1] == 0).all()  # zebra is out-of-vocab → background


def test_feature_grid():
    assert feature_grid("vgg19", 224) == 14
    assert feature_grid("resnet50", 224) == 7
    assert feature_grid("vit_b16", 224) == 14


def test_spatial_pretrain_step_learns(tiny_corpus):
    """The spatial CE drives non-background cell accuracy upward on a task
    where presence alone carries no position signal."""
    imgs, labels, vocab = tiny_corpus
    model, params, opt_state, tx = make_pretrain_state(
        "vgg19", len(vocab), image_size=32, lr=3e-4, dtype=jnp.float32, seed=0
    )
    step = make_pretrain_step(
        model, tx, batch_size=4, seed=0, spatial=True, spatial_weight=1.0
    )
    n, grid = imgs.shape[0], 2  # 32px vgg → 2x2 regions
    rng = np.random.RandomState(1)
    # Synthetic owner labels correlated with the images' mean color per
    # quadrant would need real boxes; here we only smoke-test the step and
    # its metrics plumbing on random-but-fixed labels.
    cells = rng.randint(0, len(vocab), size=(n, grid * grid)).astype(np.int32)
    images_d, labels_d = jnp.asarray(imgs), jnp.asarray(labels)
    cells_d = jnp.asarray(cells)
    losses, accs = [], []
    for i in range(24):
        params, opt_state, m = step(
            params, opt_state, images_d, labels_d, cells_d, n, i
        )
        losses.append(float(m["loss"]))
        accs.append(float(m["cell_acc"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-4:]) < np.mean(losses[:4])
    assert accs[-1] >= accs[0]  # memorizable fixed labels → acc climbs
