"""Global-frequency recall@k baseline for a preprocessed shard directory.

The trivial image-independent predictor: rank (s, p, o) triples by train-set
frequency, predict the same top-k for every test image, macro-average
recall@k (sgg/eval/recall.py semantics). Any image-conditional model must
beat this for its quality number to mean anything (VERDICT r2 missing #1 /
next-round item 1 uses it as the bar).

  python benchmarks/freq_baseline.py --data-dir /root/data/synthvg_shards [--k 50]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
from collections import Counter

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _iter_shard_triples(shard_dir):
    """Yield per-image triple lists from shard files WITHOUT loading features
    (features dominate shard bytes; np.load is lazy per key)."""
    for path in sorted(glob.glob(os.path.join(shard_dir, "shard-*.npz"))):
        with np.load(path) as d:
            tri = d["triples"]  # rows: (row_in_shard, s, p, o)
            n = int(d["image_ids"].shape[0])
        per = [[] for _ in range(n)]
        for row in tri:
            per[int(row[0])].append(tuple(int(x) for x in row[1:4]))
        yield from per


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-dir", required=True)
    p.add_argument("--k", type=int, default=50)
    args = p.parse_args(argv)

    counts: Counter = Counter()
    n_train = 0
    for triples in _iter_shard_triples(args.data_dir):
        counts.update(triples)
        n_train += 1
    topk = [t for t, _ in counts.most_common(args.k)]

    from sgg.eval.recall import corpus_recall

    test_dir = os.path.join(args.data_dir, "test")
    gts = [t for t in _iter_shard_triples(test_dir) if t]
    r = corpus_recall([topk] * len(gts), gts, k=args.k)
    print(json.dumps({
        "metric": f"freq_baseline_recall_at_{args.k}",
        "value": round(r, 4),
        "train_images": n_train,
        "test_images": len(gts),
        "unique_train_triples": len(counts),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
