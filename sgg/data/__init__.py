"""sgg.data — Visual Genome input pipeline.

Capability parity with the reference's preprocessing + queue-runner layers
(SURVEY.md §2.1 #1–#3): VG JSON filtering, vocabulary construction, integer
triple encoding, feature-shard IO, and a host-sharded batching iterator with
device prefetch.
"""

from sgg.data.vocab import Vocab
from sgg.data.vg import (
    parse_relationships,
    filter_and_encode,
    build_vocab_from_relationships,
)
from sgg.data.shards import write_feature_shard, read_feature_shard, list_shards
from sgg.data.pipeline import (
    TripleDataset,
    make_device_train_iterator,
    make_train_iterator,
)
from sgg.data.synthetic import synthetic_dataset, synthetic_vg_json

__all__ = [
    "Vocab",
    "parse_relationships",
    "filter_and_encode",
    "build_vocab_from_relationships",
    "write_feature_shard",
    "read_feature_shard",
    "list_shards",
    "TripleDataset",
    "make_train_iterator",
    "make_device_train_iterator",
    "synthetic_dataset",
    "synthetic_vg_json",
]
