"""Task metrics with reference-identical semantics.

These are deliberately plain-Python — they run on small host-side prediction
lists after decoding, where exact parity with the reference formulas matters
more than speed. Reference definitions:

  * jaccard / ndcg_k / map_k / recall_k / precision_k:
    utils/Evaluation_SimpleDyG.py:14-51 and utils/Evaluation_generator.py:8-45
    — note the natural-log DCG discount ``1/ln(i+2)`` and that duplicate
    predicted tokens each earn DCG credit.
  * hit_rate_at_k: train/train_retriever.py:31-38 — set-intersection hit.
  * retriever ndcg_k (log2 discount): train/train_retriever.py:17-29.
"""

from __future__ import annotations

import math
from typing import Sequence


def jaccard(pred: Sequence, label: Sequence) -> float:
    p, l = set(pred), set(label)
    return len(p & l) / len(p | l)


def ndcg_k(sorted_items: Sequence, ground_truth: Sequence, k: int) -> float:
    """Generation NDCG with natural-log discount (1/ln(i+2)).

    Accumulates with += rather than sum() — Python 3.12's sum() uses
    compensated summation and differs from the reference in the last ulp.
    """
    gt = set(ground_truth)
    dcg, pdcg = 0.0, 0.0
    for i, item in enumerate(sorted_items[:k]):
        if item in gt:
            dcg += 1.0 / math.log(i + 2)
    for i in range(min(len(ground_truth), k)):
        pdcg += 1.0 / math.log(i + 2)
    return dcg / pdcg


def ndcg_k_log2(sorted_items: Sequence, ground_truth: Sequence, k: int) -> float:
    """Retriever NDCG with log2 discount and fixed ideal DCG over k slots."""
    gt = set(ground_truth)
    dcg, pdcg = 0.0, 0.0
    for i, item in enumerate(sorted_items[:k]):
        if item in gt:
            dcg += 1.0 / math.log(i + 2, 2)
    for i in range(k):
        pdcg += 1.0 / math.log(i + 2, 2)
    return dcg / pdcg if pdcg > 0 else 0.0


def map_k(sorted_items: Sequence, ground_truth: Sequence, k: int) -> float:
    gt = set(ground_truth)
    hits, total = 0, 0
    for n, item in enumerate(sorted_items[:k]):
        if item in gt:
            hits += 1
            total += hits / (n + 1)
    return total


def recall_k(sorted_items: Sequence, ground_truth: Sequence, k: int) -> float:
    top = sorted_items[:k]
    return sum(1 for y in ground_truth if y in top) / len(ground_truth)


def precision_k(sorted_items: Sequence, ground_truth: Sequence, k: int) -> float:
    top = sorted_items[:k]
    return sum(1 for y in ground_truth if y in top) / k


def hit_rate_at_k(predictions: Sequence, targets: Sequence, k: int = 1) -> int:
    return 1 if set(predictions[:k]) & set(targets) else 0
