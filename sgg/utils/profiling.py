"""Tracing/profiling (SURVEY.md §5): jax.profiler + named scopes.

The reference had nothing beyond optional TF timelines; here profiling is a
first-class flag: ``--profile`` on the train CLI captures an XProf/
TensorBoard trace of a window of fused steps, and hot regions carry
``named_scope`` annotations so encoder/decoder/critic show up as named
blocks in the trace viewer.
"""

from __future__ import annotations

import contextlib
import os

import jax


@contextlib.contextmanager
def profile_trace(logdir: str, create_perfetto: bool = False):
    """Capture a profiler trace for the enclosed block (device + host)."""
    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir, create_perfetto_trace=create_perfetto)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named scope for the trace viewer: ``with annotate('critic_update'):``."""
    return jax.named_scope(name)


class StepProfiler:
    """Trace a [start, stop) window of train steps from inside the loop."""

    def __init__(self, logdir: str, start_step: int, num_steps: int = 5):
        self.logdir = logdir
        self.start_step = start_step
        self.stop_step = start_step + num_steps
        self._active = False

    def maybe_start(self, step: int):
        if not self._active and step == self.start_step:
            os.makedirs(self.logdir, exist_ok=True)
            jax.profiler.start_trace(self.logdir)
            self._active = True

    def maybe_stop(self, step: int):
        if self._active and step >= self.stop_step:
            jax.profiler.stop_trace()
            self._active = False
            return True
        return False
