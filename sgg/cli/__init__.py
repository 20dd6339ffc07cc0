"""sgg.cli — entry points.

The three public entry points mirroring the reference scripts
(BASELINE.json:5) — ``preprocess``, ``train``, ``generate`` — plus the
framework's own: ``evaluate`` (recall@k / mR@k), ``pretrain`` (supervised
encoder pretraining on the corpus's own labels), ``synth_corpus``
(VG-shaped synthetic corpus writer), ``convert`` (reference TF1 checkpoint
import), ``serve`` (dynamic-batching HTTP inference), and ``export``
(AOT StableHLO artifact for serving hosts without sgg model code).

  python -m sgg.cli.preprocess --help
  python -m sgg.cli.train --config vg1k --workdir /tmp/run
  python -m sgg.cli.generate --workdir /tmp/run --out scene_graphs.json
  python -m sgg.cli.serve --workdir /tmp/run --port 8500
  python -m sgg.cli.export --workdir /tmp/run --out model.sgx --check
"""
