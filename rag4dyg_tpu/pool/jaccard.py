"""Pairwise Jaccard similarity over token sets, on the MXU.

The reference computes four dense query×pool Jaccard matrices with an
O(N²) pure-Python double loop over Python sets
(reference: retrieval_data_annotation.py:36-41) — minutes of host time at
reddit scale. Here each token set becomes a one-hot row and

    intersection(i, j) = onehot_A @ onehot_B.T      (an MXU matmul)
    union(i, j)        = |A_i| + |B_j| - intersection(i, j)

Counts are exact in float32 (set sizes ≪ 2²⁴); the final division happens
in float64 on host so the resulting matrix is bit-identical to the
reference's ``len(a & b) / len(a | b)``. The vocabulary axis is chunked so
arbitrarily large vocabularies stream through device memory, and the
target axis can be row-blocked by the caller.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def parse_inout_sets(data_lines: Sequence[str], gt_lines: Sequence[str]
                     ) -> Tuple[List[set], List[set]]:
    """Per-line (history token set, prediction token set).

    History spans <|history|>..<|endofhistory|> (ego id and time tokens
    included); prediction spans <|pre|>..<|endofpre|> with time tokens
    removed (reference: retrieval_data_annotation.py:17-34).
    """
    in_sets, out_sets = [], []
    for line in data_lines:
        seg = line.split("<|history|>")[1].split("<|endofhistory|>")[0]
        in_sets.append({t for t in seg.split(" ") if t != ""})
    for line in gt_lines:
        seg = line.split("<|pre|>")[1].split("<|endofpre|>")[0]
        out_sets.append({t for t in seg.split(" ") if t != "" and "time" not in t})
    return in_sets, out_sets


def _pad_sets(sets: Sequence[Sequence[int]]) -> Tuple[np.ndarray, np.ndarray]:
    """Ragged id sets -> (ids [N, S], valid [N, S])."""
    S = max(1, max((len(s) for s in sets), default=1))
    N = len(sets)
    ids = np.zeros((N, S), np.int32)
    valid = np.zeros((N, S), bool)
    for i, s in enumerate(sets):
        s = list(s)
        ids[i, : len(s)] = s
        valid[i, : len(s)] = True
    return ids, valid


@functools.partial(jax.jit, static_argnames=("v0", "v1"))
def _onehot_chunk(ids: jnp.ndarray, valid: jnp.ndarray, v0: int, v1: int
                  ) -> jnp.ndarray:
    """One-hot membership over vocab slice [v0, v1) from padded id sets."""
    width = v1 - v0
    in_chunk = jnp.logical_and(valid,
                               jnp.logical_and(ids >= v0, ids < v1))
    col = jnp.where(in_chunk, ids - v0, width)  # width = drop slot
    n = ids.shape[0]
    oh = jnp.zeros((n, width + 1), jnp.float32)
    oh = oh.at[jnp.arange(n)[:, None], col].max(1.0)
    return oh[:, :width]


@functools.partial(jax.jit, static_argnames=("v0", "v1"))
def _chunk_intersection(a_ids, a_valid, b_ids, b_valid, v0: int, v1: int):
    a = _onehot_chunk(a_ids, a_valid, v0, v1)
    b = _onehot_chunk(b_ids, b_valid, v0, v1)
    return jnp.dot(a, b.T, preferred_element_type=jnp.float32)


def intersection_counts(a_sets: Sequence[Sequence[int]],
                        b_sets: Sequence[Sequence[int]],
                        vocab_size: int, vocab_chunk: int = 8192
                        ) -> np.ndarray:
    """Exact |A_i ∩ B_j| counts for all pairs, as int64 [N, M]."""
    a_ids, a_valid = _pad_sets(a_sets)
    b_ids, b_valid = _pad_sets(b_sets)
    inter = np.zeros((len(a_sets), len(b_sets)), np.float32)
    for v0 in range(0, vocab_size, vocab_chunk):
        v1 = min(v0 + vocab_chunk, vocab_size)
        inter += np.asarray(_chunk_intersection(
            jnp.asarray(a_ids), jnp.asarray(a_valid),
            jnp.asarray(b_ids), jnp.asarray(b_valid), v0, v1))
    return inter.astype(np.int64)


def jaccard_matrix(a_sets: Sequence[set], b_sets: Sequence[set],
                   token_to_id, vocab_size: int,
                   vocab_chunk: int = 8192) -> np.ndarray:
    """Dense pairwise Jaccard similarity, float64, bit-equal to the
    reference's per-pair ``len(a&b)/len(a|b)`` (empty-vs-anything -> 0)."""
    a_ids = [[token_to_id(t) for t in s] for s in a_sets]
    b_ids = [[token_to_id(t) for t in s] for s in b_sets]
    inter = intersection_counts(a_ids, b_ids, vocab_size, vocab_chunk)
    sa = np.array([len(s) for s in a_ids], np.int64)
    sb = np.array([len(s) for s in b_ids], np.int64)
    union = sa[:, None] + sb[None, :] - inter
    with np.errstate(invalid="ignore", divide="ignore"):
        out = inter.astype(np.float64) / union.astype(np.float64)
    out[union == 0] = 0.0
    return out
