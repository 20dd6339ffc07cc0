"""Integration: short training runs on synthetic data (SURVEY.md §4).

Asserts the critic learns (Wasserstein estimate moves up from its initial
value) and nothing NaNs — the "1k-subset config, 50 steps" check scaled to
CI-friendly shapes.
"""

import jax
import numpy as np
import pytest

from sgg.config import get_config
from sgg.data import TripleDataset, make_train_iterator, synthetic_dataset
from sgg.train.state import create_train_state
from sgg.train.step import make_train_step


@pytest.mark.parametrize("hard", [False, True])
def test_short_training_learns_and_stays_finite(hard):
    cfg = get_config("smoke")
    cfg.train.hard = hard
    cfg.train.n_critic = 2

    data = synthetic_dataset(
        num_images=cfg.data.num_synthetic_images,
        regions=cfg.data.regions,
        feat_dim=cfg.data.feat_dim,
        seed=0,
    )
    vocab = data["vocab"]
    cfg.model.vocab_size = len(vocab)

    ds = TripleDataset(features=data["features"], triples=data["triples"])
    it = make_train_iterator(
        ds, cfg.train.batch_size, cfg.train.n_critic, seed=0,
        process_index=0, process_count=1, device_put=False, prefetch=0,
    )
    state = create_train_state(cfg, jax.random.key(0))
    step = make_train_step(cfg, step_mask=vocab.step_mask(), donate=False)

    d_hist = []
    for i in range(50):
        state, metrics = step(state, next(it))
        assert np.isfinite(float(metrics["w_dist"])), f"non-finite w_dist at step {i}"
        assert np.isfinite(float(metrics["g_loss"]))
        d_hist.append(float(metrics["d_loss"]))

    # Learning signal robust to Gumbel noise: the critic loss (dominated by
    # the gradient penalty early on) must come down decisively from its
    # initial level as the critic organizes.
    assert np.mean(d_hist[-10:]) < 0.8 * np.mean(d_hist[:5]), (
        f"critic failed to learn: {d_hist[:5]} -> {d_hist[-10:]}"
    )


def test_host_rss_watchdog_handover_and_resume(tmp_path):
    """host_rss_exit_gb: trainer checkpoints and exits 75 at the first
    checkpoint boundary over the limit; a relaunch auto-resumes and
    finishes. Guards the supervised-relaunch contract that long runs on
    this machine's leaky relay client depend on (config.py rationale)."""
    from sgg.cli.train import main

    wd = str(tmp_path / "wd")
    args = ["--config", "smoke", "--workdir", wd, "--platform", "cpu",
            "--set", "train.checkpoint_every=5", "--set", "train.total_steps=20"]
    rc = main(args + ["--set", "train.host_rss_exit_gb=0.0001"])
    assert rc == 75
    assert main(args) == 0


def test_host_rss_watchdog_fires_at_log_boundary(tmp_path):
    """The watchdog must not wait for a checkpoint boundary: a wedged relay
    op once leaked host RSS at line rate between two checkpoints (BASELINE.md
    round 3). With checkpoint_every out of reach, the limit trips at the
    first LOG boundary, saves an off-cycle checkpoint there, and exits 75."""
    import os

    from sgg.cli.train import main

    wd = str(tmp_path / "wd")
    args = ["--config", "smoke", "--workdir", wd, "--platform", "cpu",
            "--set", "train.log_every=3", "--set", "train.checkpoint_every=1000",
            "--set", "train.total_steps=20"]
    rc = main(args + ["--set", "train.host_rss_exit_gb=0.0001"])
    assert rc == 75
    assert os.path.isdir(os.path.join(wd, "checkpoints", "3"))  # log step, not ckpt cycle
    assert main(args) == 0  # relaunch resumes from step 3 and finishes
