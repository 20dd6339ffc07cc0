"""Profiler window logic + debug assertions."""

import numpy as np
import pytest

from sgg.utils.debug import assert_super_batch
from sgg.utils.profiling import StepProfiler, annotate


def test_step_profiler_window(tmp_path, monkeypatch):
    calls = []
    monkeypatch.setattr(
        "jax.profiler.start_trace", lambda d: calls.append(("start", d))
    )
    monkeypatch.setattr("jax.profiler.stop_trace", lambda: calls.append(("stop",)))
    p = StepProfiler(str(tmp_path / "prof"), start_step=3, num_steps=2)
    for step in range(8):
        p.maybe_start(step)
        p.maybe_stop(step + 1)
    assert calls == [("start", str(tmp_path / "prof")), ("stop",)]


def test_annotate_composes():
    import jax.numpy as jnp

    with annotate("critic_update"):
        x = jnp.ones(3) + 1
    assert float(x.sum()) == 6.0


def test_assert_super_batch_contract():
    good = {
        "features": np.zeros((3, 4, 9, 16), np.float32),
        "triples": np.zeros((3, 4, 3), np.int32),
    }
    assert_super_batch(good, n_critic=2, batch_size=4)
    bad = dict(good, triples=np.zeros((2, 4, 3), np.int32))
    with pytest.raises(AssertionError):
        assert_super_batch(bad, n_critic=2, batch_size=4)
    img = {
        "images": np.zeros((3, 4, 8, 8, 3), np.uint8),
        "triples": np.zeros((3, 4, 3), np.int32),
    }
    assert_super_batch(img, n_critic=2, batch_size=4)
    with pytest.raises(AssertionError):
        assert_super_batch(
            {"images": img["images"].astype(np.float32), "triples": img["triples"]},
            n_critic=2, batch_size=4,
        )
