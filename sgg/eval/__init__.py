"""sgg.eval — scene-graph generation (inference) and recall@k evaluation.

Capability parity with SURVEY.md §2.1 #8–#9: sample k triples per image with
different noise draws, aggregate/dedupe into a scene graph, and score
generated triples against Visual Genome ground truth with recall@k.
"""

from sgg.eval.sampler import (
    assemble_scene_graph,
    assemble_scene_graphs,
    device_put_features,
    make_dp_sampler,
    make_indexed_sampler,
    make_predcls_scorer,
    make_sampler,
    rank_triples,
)
from sgg.eval.recall import (
    corpus_mean_recall,
    corpus_recall,
    corpus_recall_bootstrap,
    corpus_recall_multi,
    corpus_zero_shot_recall,
    predicate_recall,
    recall_at_k,
)

__all__ = [
    "make_sampler",
    "make_indexed_sampler",
    "make_dp_sampler",
    "make_predcls_scorer",
    "device_put_features",
    "assemble_scene_graph",
    "assemble_scene_graphs",
    "rank_triples",
    "recall_at_k",
    "corpus_recall",
    "corpus_recall_bootstrap",
    "corpus_recall_multi",
    "corpus_mean_recall",
    "corpus_zero_shot_recall",
    "predicate_recall",
]
