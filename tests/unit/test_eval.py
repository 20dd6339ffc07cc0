"""recall@k semantics (SURVEY.md §2.1 #9)."""

import numpy as np

from sgg.eval.recall import corpus_recall, recall_at_k


def test_recall_basic():
    gt = [(1, 2, 3), (4, 5, 6)]
    gen = [(1, 2, 3), (7, 8, 9)]
    assert recall_at_k(gen, gt, k=50) == 0.5


def test_recall_dedupes_generated_before_topk():
    # 49 copies of a wrong triple + the right one at rank 50: dedup must
    # collapse the copies so the hit still lands inside the top-k window.
    gt = [(1, 2, 3)]
    gen = [(9, 9, 9)] * 49 + [(1, 2, 3)]
    assert recall_at_k(gen, gt, k=2) == 1.0
    # And duplicates must not multiply credit.
    gen2 = [(1, 2, 3)] * 10
    assert recall_at_k(gen2, gt, k=50) == 1.0


def test_recall_topk_cut_applies_after_dedup():
    gt = [(1, 2, 3)]
    gen = [(5, 5, 5), (6, 6, 6), (1, 2, 3)]
    assert recall_at_k(gen, gt, k=2) == 0.0  # rank 3 after dedup → outside k=2


def test_recall_empty_gt():
    assert recall_at_k([(1, 2, 3)], np.zeros((0, 3)), k=5) == 0.0


def test_corpus_recall_macro_average():
    gen = [[(1, 2, 3)], [(9, 9, 9)]]
    gt = [[(1, 2, 3)], [(4, 5, 6)]]
    assert corpus_recall(gen, gt, k=50) == 0.5
