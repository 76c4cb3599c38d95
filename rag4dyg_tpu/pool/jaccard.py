"""Pairwise Jaccard similarity over token sets, on the MXU.

The reference computes four dense query×pool Jaccard matrices with an
O(N²) pure-Python double loop over Python sets
(reference: retrieval_data_annotation.py:36-41) — minutes of host time at
reddit scale. Here each token set becomes a one-hot row and

    intersection(i, j) = onehot_A @ onehot_B.T      (an MXU matmul)
    union(i, j)        = |A_i| + |B_j| - intersection(i, j)

Counts are exact in float32 (set sizes ≪ 2²⁴); the final division happens
in float64 on host so the resulting matrix is bit-identical to the
reference's ``len(a & b) / len(a | b)``. The vocabulary axis is chunked
inside one jitted ``lax.scan`` (single compile, accumulator stays on
device), the query axis is row-blocked to bound device memory, and the
pool axis can be sharded over a mesh axis — each device one-hots only its
pool rows and the chunk matmul emits a column-sharded block, so the full
[N, M] accumulator never materializes on one chip (SURVEY.md §5.7:
annotation is the long-context pressure point at reddit scale).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


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


def _onehot_chunk(ids: jnp.ndarray, valid: jnp.ndarray, v0: jnp.ndarray,
                  width: int) -> jnp.ndarray:
    """One-hot membership over vocab slice [v0, v0+width) from padded id
    sets. ``v0`` is traced (the scan carries it), ``width`` is static."""
    in_chunk = jnp.logical_and(valid, jnp.logical_and(ids >= v0,
                                                      ids < v0 + width))
    col = jnp.where(in_chunk, ids - v0, width)  # width = drop slot
    n = ids.shape[0]
    oh = jnp.zeros((n, width + 1), jnp.float32)
    oh = oh.at[jnp.arange(n)[:, None], col].max(1.0)
    return oh[:, :width]


@functools.partial(jax.jit, static_argnames=("n_chunks", "width"))
def _intersection_scan(a_ids, a_valid, b_ids, b_valid, n_chunks: int,
                       width: int) -> jnp.ndarray:
    """All vocab chunks inside one jitted scan; the [N, M] accumulator
    never leaves the device until the final transfer."""

    def body(acc, c):
        v0 = c * width
        a = _onehot_chunk(a_ids, a_valid, v0, width)
        b = _onehot_chunk(b_ids, b_valid, v0, width)
        return acc + jnp.dot(a, b.T,
                             preferred_element_type=jnp.float32), None

    acc0 = jnp.zeros((a_ids.shape[0], b_ids.shape[0]), jnp.float32)
    acc, _ = jax.lax.scan(body, acc0, jnp.arange(n_chunks))
    return acc


def intersection_counts(a_sets: Sequence[Sequence[int]],
                        b_sets: Sequence[Sequence[int]],
                        vocab_size: int, vocab_chunk: int = 8192,
                        row_block: int = 8192,
                        mesh: Optional[Mesh] = None,
                        shard_axis: str = "data") -> np.ndarray:
    """Exact |A_i ∩ B_j| counts for all pairs, as int64 [N, M].

    With ``mesh``, the pool (B) axis is sharded over ``shard_axis``: each
    device builds one-hots for its own pool rows only, the chunk matmul
    yields a column-sharded accumulator block, and XLA keeps every shard
    local (queries are replicated; no cross-device traffic until the host
    gather at the end).
    """
    a_ids, a_valid = _pad_sets(a_sets)
    b_ids, b_valid = _pad_sets(b_sets)
    n_chunks = max(1, -(-vocab_size // vocab_chunk))

    bj, bv = jnp.asarray(b_ids), jnp.asarray(b_valid)
    if mesh is not None:
        n_sh = mesh.shape[shard_axis]
        pad_m = (-len(b_sets)) % n_sh
        if pad_m:  # pad pool rows so the shard axis divides evenly
            bj = jnp.concatenate(
                [bj, jnp.zeros((pad_m, bj.shape[1]), bj.dtype)])
            bv = jnp.concatenate(
                [bv, jnp.zeros((pad_m, bv.shape[1]), bv.dtype)])
        sh = NamedSharding(mesh, P(shard_axis, None))
        bj, bv = jax.device_put(bj, sh), jax.device_put(bv, sh)

    out = np.zeros((len(a_sets), len(b_sets)), np.float32)
    for r0 in range(0, len(a_sets), row_block):
        r1 = min(r0 + row_block, len(a_sets))
        block = _intersection_scan(jnp.asarray(a_ids[r0:r1]),
                                   jnp.asarray(a_valid[r0:r1]),
                                   bj, bv, n_chunks, vocab_chunk)
        out[r0:r1] = np.asarray(block)[:, :len(b_sets)]
    return out.astype(np.int64)


def jaccard_matrix(a_sets: Sequence[set], b_sets: Sequence[set],
                   token_to_id, vocab_size: int,
                   vocab_chunk: int = 8192,
                   mesh: Optional[Mesh] = None,
                   shard_axis: str = "data") -> np.ndarray:
    """Dense pairwise Jaccard similarity, float64, bit-equal to the
    reference's per-pair ``len(a&b)/len(a|b)`` (empty-vs-anything -> 0)."""
    a_ids = [[token_to_id(t) for t in s] for s in a_sets]
    b_ids = [[token_to_id(t) for t in s] for s in b_sets]
    inter = intersection_counts(a_ids, b_ids, vocab_size, vocab_chunk,
                                mesh=mesh, shard_axis=shard_axis)
    sa = np.array([len(s) for s in a_ids], np.int64)
    sb = np.array([len(s) for s in b_ids], np.int64)
    union = sa[:, None] + sb[None, :] - inter
    with np.errstate(invalid="ignore", divide="ignore"):
        out = inter.astype(np.float64) / union.astype(np.float64)
    out[union == 0] = 0.0
    return out
