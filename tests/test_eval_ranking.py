"""On-device retriever eval ranking (VERDICT r2 #4).

Pins: (1) the device top-3 metrics path equals a transliteration of the
reference's per-batch hit loop (train/train_retriever.py:458-479);
(2) DenseIndex.rank_full is bit-equal to the canonical host stable
descending argsort, including exact-tie rows from duplicate pool
entries; (3) .gen files written from device ranks are byte-identical to
the host-sorted ones.
"""

import os

import jax.numpy as jnp
import numpy as np

from rag4dyg_tpu.pool.index import DenseIndex
from rag4dyg_tpu.train.retriever import (
    gt_top3_rows,
    hits_from_top3,
    retrieval_metrics,
    write_gen_files,
)


def _hit_rate_at_k(predictions, targets, k):
    return 1 if set(predictions[:k]) & set(targets) else 0


def reference_hit_loop(pred_scores, gt_scores, batch_size):
    """Transliteration of reference train/train_retriever.py:458-479."""
    hit1, hit3, nb = 0.0, 0.0, 0
    for s in range(0, pred_scores.shape[0], batch_size):
        ps, gs = pred_scores[s:s + batch_size], gt_scores[s:s + batch_size]
        h1 = h3 = 0
        for i in range(ps.shape[0]):
            gt = np.argsort(-gs[i])[:3]
            pred = np.argsort(-ps[i])
            h1 += _hit_rate_at_k(pred, gt, 1)
            h3 += _hit_rate_at_k(pred, gt, 3)
        hit1 += h1 / ps.shape[0]
        hit3 += h3 / ps.shape[0]
        nb += 1
    return {"hit@1": round(hit1 / nb, 4), "hit@3": round(hit3 / nb, 4)}


def test_hits_from_top3_matches_reference_loop():
    rng = np.random.RandomState(0)
    Q, N = 37, 113  # non-multiple of batch: exercises the last-batch weighting
    pred = rng.rand(Q, N).astype(np.float32)  # continuous: no pred ties
    gt = rng.choice([0.0, 0.25, 0.5, 1.0], size=(Q, N))  # heavy gt ties
    ref = reference_hit_loop(pred, gt, batch_size=8)
    pred3 = np.argsort(-pred, axis=1, kind="stable")[:, :3]
    got = hits_from_top3(pred3, gt_top3_rows(gt), batch_size=8)
    assert got == ref
    # the dense-matrix wrapper agrees too
    assert retrieval_metrics(pred, gt, batch_size=8) == ref


def test_topk_device_matches_metrics_path():
    """Device lax.top_k indices (lowest-index ties) feed the same metric
    as the canonical stable argsort."""
    rng = np.random.RandomState(1)
    Q, N, D = 16, 50, 8
    pool = rng.randn(N, D).astype(np.float32)
    pool[7] = pool[3]   # duplicate rows -> exact score ties
    pool[21] = pool[3]
    q = rng.randn(Q, D).astype(np.float32)
    index = DenseIndex(pool, use_pallas=False)
    scores = np.asarray(index.score(jnp.asarray(q)))
    _, pred3 = index.topk(jnp.asarray(q), 3)
    expect3 = np.argsort(-scores, axis=1, kind="stable")[:, :3]
    assert np.array_equal(pred3, expect3)


def test_rank_full_bit_equal_and_gen_files(tmp_path):
    rng = np.random.RandomState(2)
    Q, N, D = 9, 64, 16
    pool = rng.randn(N, D).astype(np.float32)
    for dup in (5, 17, 40):     # exact ties
        pool[dup] = pool[2]
    q = rng.randn(Q, D).astype(np.float32)
    index = DenseIndex(pool, use_pallas=False)
    scores = np.asarray(index.score(jnp.asarray(q)))
    ranks = np.asarray(index.rank_full(jnp.asarray(q)))
    host = np.argsort(-scores, axis=1, kind="stable")
    assert ranks.dtype == np.int32
    assert np.array_equal(ranks, host)

    d_dev, d_host = str(tmp_path / "dev"), str(tmp_path / "host")
    write_gen_files(scores, d_dev, "val", ranks=ranks)
    write_gen_files(scores, d_host, "val")
    for name in ("val_index.gen", "val_score.gen"):
        a = open(os.path.join(d_dev, name)).read()
        b = open(os.path.join(d_host, name)).read()
        assert a == b, name
