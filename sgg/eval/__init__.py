"""sgg.eval — scene-graph generation (inference) and recall@k evaluation.

Capability parity with SURVEY.md §2.1 #8–#9: sample k triples per image with
different noise draws, aggregate/dedupe into a scene graph, and score
generated triples against Visual Genome ground truth with recall@k.
"""

from sgg.eval.sampler import make_sampler, assemble_scene_graph
from sgg.eval.recall import recall_at_k, corpus_recall

__all__ = [
    "make_sampler",
    "assemble_scene_graph",
    "recall_at_k",
    "corpus_recall",
]
