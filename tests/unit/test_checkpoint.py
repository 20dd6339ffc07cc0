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
