"""Metric parity: formulas transliterated from the reference must agree with
our implementations on random lists."""

import math
import random

from rag4dyg_tpu.eval import metrics as M


def _ref_ndcg(sorted_indices, ground_truth, k):
    dcg, pdcg = 0, 0
    for i, item in enumerate(sorted_indices[:k]):
        if item in ground_truth:
            dcg += 1 / math.log(i + 2)
    for i in range(min(len(ground_truth), k)):
        pdcg += 1 / math.log(i + 2)
    return dcg / pdcg


def _ref_ndcg_log2(sorted_indices, ground_truth, k):
    dcg, pdcg = 0, 0
    for i, index in enumerate(sorted_indices[:k]):
        if index in ground_truth:
            dcg += (2 ** 1 - 1) / math.log(i + 2, 2)
    for i in range(k):
        pdcg += (2 ** 1 - 1) / math.log(i + 2, 2)
    return dcg / pdcg if pdcg > 0 else 0


def test_metrics_random_parity():
    rng = random.Random(0)
    for _ in range(200):
        pred = [str(rng.randint(0, 30)) for _ in range(rng.randint(1, 12))]
        gt = [str(rng.randint(0, 30)) for _ in range(rng.randint(1, 8))]
        k = rng.choice([1, 3, 5])
        assert M.ndcg_k(pred, gt, k) == _ref_ndcg(pred, gt, k)
        assert M.ndcg_k_log2(pred, gt, k) == _ref_ndcg_log2(pred, gt, k)
        assert M.jaccard(pred, gt) == len(set(pred) & set(gt)) / len(set(pred) | set(gt))
        assert M.recall_k(pred, gt, k) == sum(1 for y in gt if y in pred[:k]) / len(gt)
        assert M.precision_k(pred, gt, k) == sum(1 for y in gt if y in pred[:k]) / k
        assert M.hit_rate_at_k(pred, gt, k) == (1 if set(pred[:k]) & set(gt) else 0)


def test_ndcg_duplicate_predictions_counted():
    # the reference counts every duplicate occurrence toward DCG
    assert M.ndcg_k(["a", "a"], ["a"], 5) == (1 / math.log(2) + 1 / math.log(3)) / (1 / math.log(2))


def test_map_k():
    assert M.map_k(["a", "b", "c"], ["a", "c"], 3) == 1.0 + 2 / 3
