"""Metrics/observability: clu metric writers + throughput tracking.

Reference capability (SURVEY.md §5 "Metrics/logging"): ``tf.summary`` scalars
to TensorBoard plus stdout prints. Rebuild: ``clu.metric_writers`` (summary
files + stdout logging) plus first-class throughput (images/sec/chip,
BASELINE.json:2) computed over the steps between logs.
"""

from __future__ import annotations

import time

import jax


class MetricLogger:
    def __init__(self, workdir: str, just_logging: bool = False):
        import os

        from clu import metric_writers

        self._writer = metric_writers.create_default_writer(
            workdir, just_logging=just_logging
        )
        # Machine-readable mirror next to the TensorBoard events.
        self._jsonl = None
        if not just_logging:
            os.makedirs(workdir, exist_ok=True)
            self._jsonl = open(os.path.join(workdir, "metrics.jsonl"), "a")
        self._last_time: float | None = None
        self._last_step: int | None = None

    def log(self, step: int, metrics: dict, images_per_step: int | None = None):
        scalars = {k: float(v) for k, v in metrics.items()}
        now = time.perf_counter()
        if self._last_time is not None and images_per_step and step > self._last_step:
            dt = now - self._last_time
            steps = step - self._last_step
            scalars["images_per_sec"] = images_per_step * steps / dt
            scalars["images_per_sec_per_chip"] = scalars["images_per_sec"] / max(
                1, jax.device_count()
            )
            scalars["steps_per_sec"] = steps / dt
        self._last_time, self._last_step = now, step
        self._writer.write_scalars(step, scalars)
        if self._jsonl is not None:
            import json

            self._jsonl.write(json.dumps({"step": step, **scalars}) + "\n")
            self._jsonl.flush()
        return scalars

    def flush(self):
        self._writer.flush()

    def close(self):
        self._writer.close()
        if self._jsonl is not None:
            self._jsonl.close()
