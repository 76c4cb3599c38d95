"""Retrieval-pool annotation: positives/hard-negatives for the contrastive
retriever and top-k ground-truth demonstrations for the generator.

Mirrors the reference's offline annotation pass
(reference: retrieval_data_annotation.py:43-198) with the O(N²) similarity
matrices computed on device (see ``jaccard.py``):

  * positives: pool items whose *output* Jaccard with the anchor exceeds
    ``threshold`` (strict >), diagonal excluded.
  * hard negatives: top input-similar items that are not positives and have
    nonzero output similarity; zero-similarity items backfill if fewer than
    ``neg_num``; one sampled negative per (anchor, positive) pair.
  * eval index/score files: full descending ranking of the pool per query.
  * generator gt: top-``gt_topk`` output-similar pool items per train row.

The reference relies on the *unseeded* global numpy RNG for negative
sampling; we take an explicit seed for reproducibility.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import numpy as np

from rag4dyg_tpu.data.serialize import read_corpus_lines
from rag4dyg_tpu.pool.jaccard import jaccard_matrix, parse_inout_sets


@dataclasses.dataclass
class PoolAnnotation:
    train_pairs: np.ndarray       # [P, 3] (anchor, positive, negative)
    train_pair_scores: np.ndarray  # [P, 2] (pos score, neg score)
    test_scores: np.ndarray       # [N_test, N_pool] output Jaccard
    val_scores: np.ndarray        # [N_val, N_pool]
    # [N_pool, N_pool] diag zeroed — None under device mining, where the
    # train matrices never materialize on host (that is the point)
    train_out_scores: Optional[np.ndarray]
    gt_topk_index: np.ndarray     # [N_pool, K]
    gt_topk_score: np.ndarray     # [N_pool, K]
    n_pool: int = 0
    mine_stats: Optional[object] = None  # pool.mine.MineStats


def _row_negatives(out_row: np.ndarray, in_row: np.ndarray, pos_set: set,
                   neg_num: int, stable: bool) -> list:
    """Hard-negative list for one anchor row: top input-similar items that
    are not positives and have output-similarity > 0, zero-similarity
    backfill (reference: retrieval_data_annotation.py:54-71). With
    ``stable`` the descending sort breaks ties by ascending pool index —
    the canonical order the device miner (mine.py) reproduces; the
    default matches the reference's unstable ``np.argsort``."""
    order = np.argsort(-in_row, kind="stable" if stable else None)
    negs = []
    for idx in order:  # input-similar but output-dissimilar first
        if idx not in pos_set and out_row[idx] > 0:
            negs.append(idx)
        if len(negs) == neg_num:
            break
    if len(negs) < neg_num:
        for idx in order:
            if idx not in pos_set and out_row[idx] == 0:
                negs.append(idx)
            if len(negs) == neg_num:
                break
    return negs


def mine_train_pairs(out_scores: np.ndarray, in_scores: np.ndarray, *,
                     threshold: float, neg_num: int,
                     max_positives: Optional[int],
                     rng: np.random.RandomState, stable: bool = False):
    """(anchor, positive, sampled-hard-negative) triples
    (reference: retrieval_data_annotation.py:43-85)."""
    pairs, pair_scores = [], []
    for i in range(out_scores.shape[0]):
        pos = np.where(out_scores[i] > threshold)[0]
        if len(pos) == 0:
            continue
        negs = _row_negatives(out_scores[i], in_scores[i],
                              set(pos.tolist()), neg_num, stable)
        if max_positives is not None:
            pos = pos[:max_positives]
        for p in pos:
            n = rng.choice(negs)
            pairs.append((i, int(p), int(n)))
            pair_scores.append((out_scores[i, p], out_scores[i, n]))
    return (np.asarray(pairs, np.int64).reshape(-1, 3),
            np.asarray(pair_scores, np.float64).reshape(-1, 2))


def annotate_pool(resources_dir: str, tokenizer, *, threshold: float = 0.8,
                  neg_num: int = 5, gt_topk: int = 10,
                  max_positives: Optional[int] = None,
                  seed: int = 0, mesh=None,
                  shard_axis: str = "data",
                  device_mining: bool = False) -> PoolAnnotation:
    """Compute all annotation artifacts from a prepared resources dir.

    Pass a ``jax.sharding.Mesh`` to shard every Jaccard matrix's pool
    axis over ``shard_axis`` (reddit-scale multi-chip annotation).

    ``device_mining`` runs positives / hard-negatives / gt top-k as
    vectorized masked top-k on device (``pool.mine``): the [N, N] train
    matrices never reach the host — only O(N·k) candidates do — which
    removes the dominant matrix download at wikiv2+ scale and is the
    only path that can annotate 100k+-row pools. Outputs are bit-equal
    to the host miner modulo one documented canonicalization: candidate
    tie order is stable (score desc, pool index asc) rather than
    numpy's unstable introsort order, so the RNG can draw different —
    identically distributed — hard negatives (PARITY.md)."""
    train = read_corpus_lines(os.path.join(resources_dir, "train.link_prediction"))
    test = read_corpus_lines(os.path.join(resources_dir, "test.link_prediction"))
    test_gt = read_corpus_lines(os.path.join(resources_dir, "test_gt.link_prediction"))
    val = read_corpus_lines(os.path.join(resources_dir, "val.link_prediction"))
    val_gt = read_corpus_lines(os.path.join(resources_dir, "val_gt.link_prediction"))

    tr_in, tr_out = parse_inout_sets(train, train)
    te_in, te_out = parse_inout_sets(test, test_gt)
    va_in, va_out = parse_inout_sets(val, val_gt)

    tok2id = tokenizer.token_to_id
    V = len(tokenizer)
    sh = {"mesh": mesh, "shard_axis": shard_axis}
    rng = np.random.RandomState(seed)

    if device_mining:
        from rag4dyg_tpu.pool.mine import mine_pool_device
        tr_out_ids = [[tok2id(t) for t in s] for s in tr_out]
        tr_in_ids = [[tok2id(t) for t in s] for s in tr_in]
        mined = mine_pool_device(
            tr_out_ids, tr_in_ids, V, threshold=threshold,
            neg_num=neg_num, gt_topk=gt_topk, max_positives=max_positives,
            rng=rng)
        pairs, pair_scores = mined.train_pairs, mined.train_pair_scores
        topk_idx, topk_score = mined.gt_topk_index, mined.gt_topk_score
        m_train_out, stats = None, mined.stats
    else:
        m_train_out = jaccard_matrix(tr_out, tr_out, tok2id, V, **sh)
        m_train_in = jaccard_matrix(tr_in, tr_in, tok2id, V, **sh)
        np.fill_diagonal(m_train_out, 0.0)
        np.fill_diagonal(m_train_in, 0.0)
        pairs, pair_scores = mine_train_pairs(
            m_train_out, m_train_in, threshold=threshold, neg_num=neg_num,
            max_positives=max_positives, rng=rng)
        topk_idx = np.argsort(-m_train_out, axis=1)[:, :gt_topk]
        topk_score = np.take_along_axis(m_train_out, topk_idx, axis=1)
        stats = None

    m_test = jaccard_matrix(te_out, tr_out, tok2id, V, **sh)
    m_val = jaccard_matrix(va_out, tr_out, tok2id, V, **sh)

    return PoolAnnotation(pairs, pair_scores, m_test, m_val, m_train_out,
                          topk_idx, topk_score, n_pool=len(train),
                          mine_stats=stats)


def write_annotation(ann: PoolAnnotation, retrieval_dir: str,
                     generator_dir: str) -> None:
    """Emit the reference file layout:
    train_retrieval/{train,test,val}_{index,score}.retrieval and
    train_generator .../train_{index,score}.gen."""
    os.makedirs(retrieval_dir, exist_ok=True)
    os.makedirs(generator_dir, exist_ok=True)

    with open(os.path.join(retrieval_dir, "train_index.retrieval"), "w") as f, \
         open(os.path.join(retrieval_dir, "train_score.retrieval"), "w") as g:
        for (a, p, n), (sp, sn) in zip(ann.train_pairs, ann.train_pair_scores):
            f.write(f"{a} {p} {n}\n")
            g.write(f"{a} {sp} {sn}\n")

    for split, scores in (("test", ann.test_scores), ("val", ann.val_scores)):
        idx = np.argsort(-scores, axis=1)
        with open(os.path.join(retrieval_dir, f"{split}_index.retrieval"), "w") as f, \
             open(os.path.join(retrieval_dir, f"{split}_score.retrieval"), "w") as g:
            for i in range(scores.shape[0]):
                f.write(" ".join(str(x) for x in idx[i]) + "\n")
                g.write(" ".join(str(x) for x in scores[i]) + "\n")

    with open(os.path.join(generator_dir, "train_index.gen"), "w") as f, \
         open(os.path.join(generator_dir, "train_score.gen"), "w") as g:
        for i in range(ann.gt_topk_index.shape[0]):
            f.write(" ".join(map(str, ann.gt_topk_index[i])) + "\n")
            g.write(" ".join(map(str, ann.gt_topk_score[i])) + "\n")
