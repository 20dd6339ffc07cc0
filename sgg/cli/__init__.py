"""sgg.cli — the three public entry points mirroring the reference scripts
(BASELINE.json:5): ``preprocess``, ``train``, ``generate-scene-graph``.

  python -m sgg.cli.preprocess --help
  python -m sgg.cli.train --config vg1k --workdir /tmp/run
  python -m sgg.cli.generate --workdir /tmp/run --out scene_graphs.json
"""
