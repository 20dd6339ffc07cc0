"""Regenerate the pinned checkpoint-format fixture (run from the repo root).

The fixture pins the on-disk checkpoint format of the current GANTrainState
so future state evolution cannot silently orphan existing checkpoints
(NOTES.md round-1 #7). If this script must be re-run because the format
changed INTENTIONALLY, the old fixture should keep restoring leniently —
update the test expectations, not just the fixture.

  JAX_PLATFORMS=cpu python tests/fixtures/make_ckpt_fixture.py
"""

import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.getcwd())

from sgg.config import get_config  # noqa: E402
from sgg.train.checkpoint import CheckpointManager  # noqa: E402
from sgg.train.state import create_train_state  # noqa: E402

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "ckpt_v1")


def fixture_config():
    cfg = get_config("smoke")
    cfg.model.vocab_size = 16
    cfg.model.hidden = 16
    cfg.model.embed_dim = 8
    cfg.model.attn_dim = 8
    cfg.model.noise_dim = 4
    cfg.model.critic_hidden = 8
    cfg.data.regions, cfg.data.feat_dim = 4, 8
    return cfg


if __name__ == "__main__":
    jax.config.update("jax_platforms", "cpu")
    cfg = fixture_config()
    state = create_train_state(cfg, jax.random.key(42)).replace(
        step=jnp.int32(11)
    )
    ck = CheckpointManager(FIXTURE_DIR, cfg, max_to_keep=1)
    ck.save(state)
    ck.close()
    print(f"fixture written to {FIXTURE_DIR}")
