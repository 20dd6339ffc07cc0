"""sgg — TPU-native Scene-Graph GAN framework.

A brand-new JAX/XLA/Pallas re-design of the capabilities of
``mklawonn/Scene-Graph-GAN`` (reference mounted at /root/reference; see
SURVEY.md for the structural analysis — the reference snapshot was empty,
so BASELINE.json is the binding capability spec).

Layers (SURVEY.md §1.2):
  - ``sgg.kernels``  — Pallas TPU kernels (fused conv+ReLU, flash-attention)
  - ``sgg.dist``     — mesh construction, sharding rules, collectives
  - ``sgg.data``     — Visual Genome pipeline: vocab, triples, loaders
  - ``sgg.models``   — encoders (VGG-19/ResNet-50/ViT-B16), triple decoders, critic
  - ``sgg.train``    — WGAN-GP objective, fused train step, checkpointing
  - ``sgg.cli``      — preprocess / train / generate-scene-graph entry points
  - ``sgg.eval``     — recall@k scene-graph evaluation
  - ``sgg.serve``    — dynamic-batching HTTP inference tier
  - ``sgg.export``   — AOT StableHLO artifacts (jax.export) for serving hosts
"""

__version__ = "0.1.0"
