"""Checkpoint manager: save/restore round-trip and structure-drift tolerance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgg.config import get_config
from sgg.train.checkpoint import CheckpointManager, load_workdir
from sgg.train.state import create_train_state


def _cfg(encoder="precomputed"):
    cfg = get_config("smoke")
    cfg.model.vocab_size = 26
    cfg.model.encoder = encoder
    cfg.data.regions, cfg.data.feat_dim = 4, 512
    cfg.data.image_size = 16
    return cfg


def test_save_restore_roundtrip(tmp_path):
    cfg = _cfg()
    st = create_train_state(cfg, jax.random.key(0)).replace(step=jnp.int32(3))
    ck = CheckpointManager(str(tmp_path), cfg)
    ck.save_vocab(__import__("sgg.data", fromlist=["Vocab"]).Vocab.build({"a": 1}, {"on": 1}))
    ck.save(st)
    ck.wait()

    st2 = create_train_state(cfg, jax.random.key(9))
    restored = CheckpointManager(str(tmp_path), cfg).restore(st2)
    assert int(restored.step) == 3
    for a, b in zip(jax.tree.leaves(st.g_params), jax.tree.leaves(restored.g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # workdir is self-describing
    cfg_l, vocab_l = load_workdir(str(tmp_path))
    assert cfg_l.model.vocab_size == 26
    assert vocab_l.id("a") > 1


def test_lenient_restore_across_structure_drift(tmp_path):
    """A checkpoint written before enc_params existed (None) restores into a
    state that has it — the new field keeps its initialized values."""
    old = _cfg()
    st = create_train_state(old, jax.random.key(0)).replace(step=jnp.int32(7))
    ck = CheckpointManager(str(tmp_path), old)
    ck.save(st)
    ck.wait()

    new = _cfg(encoder="vgg19")
    st2 = create_train_state(new, jax.random.key(1))
    restored = CheckpointManager(str(tmp_path), new).restore(st2)
    assert int(restored.step) == 7
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(restored.g_params)[0]),
        np.asarray(jax.tree.leaves(st.g_params)[0]),
    )
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(restored.enc_params)[0]),
        np.asarray(jax.tree.leaves(st2.enc_params)[0]),
    )
    # strict mode still raises
    with pytest.raises(Exception):
        CheckpointManager(str(tmp_path), new).restore(st2, lenient=False)


def test_lenient_restore_ignores_removed_fields(tmp_path):
    """A checkpoint with fields the current state no longer has (here:
    enc_params written by an end-to-end config) restores into a state
    without them — the extra leaves are ignored, everything else loads."""
    old = _cfg(encoder="vgg19")
    st = create_train_state(old, jax.random.key(0)).replace(step=jnp.int32(5))
    ck = CheckpointManager(str(tmp_path), old)
    ck.save(st)
    ck.wait()

    new = _cfg()  # precomputed: enc_params is None
    st2 = create_train_state(new, jax.random.key(1))
    restored = CheckpointManager(str(tmp_path), new).restore(st2)
    assert int(restored.step) == 5
    assert restored.enc_params is None
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(restored.d_params)[0]),
        np.asarray(jax.tree.leaves(st.d_params)[0]),
    )


def test_lenient_restore_keeps_init_on_shape_mismatch(tmp_path):
    """Vocab growth: resized leaves keep their initialized values, while
    every same-shape leaf still restores from the checkpoint."""
    from sgg.train.checkpoint import merge_checkpoint

    old = _cfg()
    st = create_train_state(old, jax.random.key(0)).replace(step=jnp.int32(9))
    ck = CheckpointManager(str(tmp_path), old)
    ck.save(st)
    ck.wait()

    new = _cfg()
    new.model.vocab_size = 40  # grew from 26
    st2 = create_train_state(new, jax.random.key(1))
    restored = CheckpointManager(str(tmp_path), new).restore(st2)
    assert int(restored.step) == 9
    # vocab-shaped leaves kept the fresh init
    np.testing.assert_array_equal(
        np.asarray(restored.g_params["token_embedding"]),
        np.asarray(st2.g_params["token_embedding"]),
    )
    # non-vocab leaves restored from the checkpoint
    np.testing.assert_array_equal(
        np.asarray(restored.g_params["init_c"]["kernel"]),
        np.asarray(st.g_params["init_c"]["kernel"]),
    )
    # the merge report is explicit about what happened
    raw = ck._mgr.restore(ck.latest_step())
    _, report = merge_checkpoint(raw, st2, verbose=False)
    assert report["restored"] > 0 and report["kept"]


def test_pinned_format_fixture_restores():
    """The committed ckpt_v1 fixture (tests/fixtures/) must keep restoring:
    it pins the on-disk format so GANTrainState evolution cannot silently
    orphan existing checkpoints."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "fixtures"))
    import shutil
    import tempfile

    from make_ckpt_fixture import FIXTURE_DIR, fixture_config

    cfg = fixture_config()
    st = create_train_state(cfg, jax.random.key(1))
    # Copy the fixture: CheckpointManager writes config.json into its
    # workdir on init, and the committed fixture must stay byte-pinned.
    with tempfile.TemporaryDirectory() as td:
        workdir = os.path.join(td, "ckpt_v1")
        shutil.copytree(FIXTURE_DIR, workdir)
        restored = CheckpointManager(workdir, cfg).restore(st)
    assert restored is not None
    assert int(restored.step) == 11
    # written with seed 42: restored params must differ from the seed-1 init
    a = np.asarray(jax.tree.leaves(restored.g_params)[0])
    b = np.asarray(jax.tree.leaves(st.g_params)[0])
    assert not np.array_equal(a, b)
    # all optimizer moments came back too (finite, right structure)
    assert all(
        np.isfinite(np.asarray(x)).all()
        for x in jax.tree.leaves(restored.g_opt_state)
    )


def test_old_checkpoint_restores_into_ema_state(tmp_path):
    """A checkpoint written with EMA off (g_ema=None) restores into an
    EMA-on state: all shared leaves load, g_ema keeps its init (= init
    g_params), and training can continue."""
    old = _cfg()
    st = create_train_state(old, jax.random.key(0)).replace(step=jnp.int32(5))
    assert st.g_ema is None
    ck = CheckpointManager(str(tmp_path), old)
    ck.save(st)
    ck.wait()

    new = _cfg()
    new.train.ema_decay = 0.99
    init = create_train_state(new, jax.random.key(3))
    restored = CheckpointManager(str(tmp_path), new).restore(init)
    assert int(restored.step) == 5
    for a, b in zip(jax.tree.leaves(st.g_params), jax.tree.leaves(restored.g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # g_ema fell back to the fresh init values (not the checkpoint's params).
    for a, b in zip(jax.tree.leaves(init.g_ema), jax.tree.leaves(restored.g_ema)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ema_checkpoint_roundtrip(tmp_path):
    """With EMA on, g_ema round-trips bit-exactly through orbax."""
    cfg = _cfg()
    cfg.train.ema_decay = 0.99
    st = create_train_state(cfg, jax.random.key(0))
    st = st.replace(
        step=jnp.int32(2),
        g_ema=jax.tree.map(lambda p: p * 0.5, st.g_params),
    )
    ck = CheckpointManager(str(tmp_path), cfg)
    ck.save(st)
    ck.wait()

    restored = CheckpointManager(str(tmp_path), cfg).restore(
        create_train_state(cfg, jax.random.key(8))
    )
    for a, b in zip(jax.tree.leaves(st.g_ema), jax.tree.leaves(restored.g_ema)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_restore_averaged_tail_swa(tmp_path):
    """restore_averaged: g_params (and g_ema) are the float32 mean of the
    last-N retained checkpoints; everything else comes from the latest."""
    cfg = _cfg()
    cfg.train.ema_decay = 0.99
    st = create_train_state(cfg, jax.random.key(0))
    ck = CheckpointManager(str(tmp_path), cfg)
    scales = [1.0, 2.0, 4.0]
    for i, s in enumerate(scales):
        ck.save(st.replace(
            step=jnp.int32(i + 1),
            g_params=jax.tree.map(lambda p, s=s: p * s, st.g_params),
            g_ema=jax.tree.map(lambda p, s=s: p * (s + 1.0), st.g_params),
            d_params=jax.tree.map(lambda p, s=s: p * s, st.d_params),
        ))
    ck.wait()

    mgr = CheckpointManager(str(tmp_path), cfg)
    assert mgr.all_steps() == [1, 2, 3]
    avg = mgr.restore_averaged(create_train_state(cfg, jax.random.key(7)), 2)
    # mean of the last two scales for g_params / g_ema ...
    for base, got in zip(jax.tree.leaves(st.g_params), jax.tree.leaves(avg.g_params)):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(base) * np.mean(scales[-2:]),
            rtol=1e-6,
        )
    for base, got in zip(jax.tree.leaves(st.g_params), jax.tree.leaves(avg.g_ema)):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(base) * (np.mean(scales[-2:]) + 1.0),
            rtol=1e-6,
        )
    # ... while the critic and step are the LATEST checkpoint's, untouched.
    assert int(avg.step) == 3
    for base, got in zip(jax.tree.leaves(st.d_params), jax.tree.leaves(avg.d_params)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(base) * scales[-1])
    # dtypes survive the float32 averaging round-trip
    for a, b in zip(jax.tree.leaves(st.g_params), jax.tree.leaves(avg.g_params)):
        assert np.asarray(a).dtype == np.asarray(b).dtype


def test_restore_averaged_degenerate_cases(tmp_path):
    """N=1 (or a single retained checkpoint) degrades to plain restore;
    an empty workdir returns None."""
    cfg = _cfg()
    mgr = CheckpointManager(str(tmp_path), cfg)
    st = create_train_state(cfg, jax.random.key(0))
    assert mgr.restore_averaged(st, 3) is None
    mgr.save(st.replace(step=jnp.int32(9)))
    mgr.wait()
    one = mgr.restore_averaged(create_train_state(cfg, jax.random.key(2)), 5)
    assert int(one.step) == 9
    assert one.g_ema is None
    for a, b in zip(jax.tree.leaves(st.g_params), jax.tree.leaves(one.g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
