"""Pairwise Jaccard similarity over token sets, on the MXU.

The reference computes four dense query×pool Jaccard matrices with an
O(N²) pure-Python double loop over Python sets
(reference: retrieval_data_annotation.py:36-41) — minutes of host time at
reddit scale. Here each token set becomes a one-hot row and

    intersection(i, j) = onehot_A @ onehot_B.T      (an MXU matmul)
    union(i, j)        = |A_i| + |B_j| - intersection(i, j)

Counts are exact in float32 (set sizes ≪ 2²⁴); the final division happens
in float64 on host so the resulting matrix is bit-identical to the
reference's ``len(a & b) / len(a | b)``. Membership matrices are built as
uint8 on the HOST (scatter serializes on TPU — measured slower than the
reference's own Python loop) and shipped once; the vocabulary axis is
then chunked inside one jitted ``lax.scan`` (single compile, f32 cast on
the VPU, accumulator stays on device), the query axis is row-blocked to
bound device memory, and the pool axis can be sharded over a mesh axis —
each device holds only its pool rows and the chunk matmul emits a
column-sharded block, so the full [N, M] accumulator never materializes
on one chip (SURVEY.md §5.7: annotation is the long-context pressure
point at reddit scale).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple  # noqa: F401

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


DEFAULT_VOCAB_CHUNK = 8192


def reference_pairs_matrix(a_sets: Sequence[set],
                           b_sets: Sequence[set]) -> np.ndarray:
    """Transliteration oracle of the reference's pure-Python pair loop
    (retrieval_data_annotation.py:5-15,36-41) — the single source of
    truth used by both the parity tests and benchmarks."""
    out = np.zeros((len(a_sets), len(b_sets)))
    for i, si in enumerate(a_sets):
        for j, sj in enumerate(b_sets):
            if len(si) == 0 or len(sj) == 0:
                continue
            out[i, j] = len(si & sj) / len(si | sj)
    return out


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


def _host_onehot(id_sets: Sequence[Sequence[int]],
                 vocab_size: int) -> np.ndarray:
    """Dense uint8 membership matrix [N, V], built with one vectorized
    numpy assignment. Scatter belongs on the host: a TPU scatter
    serializes (the original per-chunk ``.at[].max`` one-hot made the
    device path slower than the reference's Python loop); a uint8 upload
    is V/32 the size of an f32 one-hot and casts to f32 on the VPU."""
    n = len(id_sets)
    oh = np.zeros((n, vocab_size), np.uint8)
    lens = np.fromiter((len(s) for s in id_sets), np.int64, n)
    if lens.sum():
        rows = np.repeat(np.arange(n), lens)
        cols = np.fromiter((t for s in id_sets for t in s), np.int64,
                           lens.sum())
        oh[rows, cols] = 1
    return oh


@functools.partial(jax.jit, static_argnames=("n_chunks", "width"))
def _intersection_scan(a_oh, b_oh, n_chunks: int, width: int) -> jnp.ndarray:
    """All vocab chunks inside one jitted scan; the [N, M] accumulator
    never leaves the device until the final transfer. Counts are exact:
    0/1 values, f32 accumulation on the MXU."""

    def body(acc, c):
        a = jax.lax.dynamic_slice_in_dim(a_oh, c * width, width, 1)
        b = jax.lax.dynamic_slice_in_dim(b_oh, c * width, width, 1)
        return acc + jnp.dot(a.astype(jnp.float32),
                             b.astype(jnp.float32).T,
                             preferred_element_type=jnp.float32), None

    acc0 = jnp.zeros((a_oh.shape[0], b_oh.shape[0]), jnp.float32)
    acc, _ = jax.lax.scan(body, acc0, jnp.arange(n_chunks))
    # counts are bounded by the max set size (<= sequence length << 2^16);
    # uint16 halves the device->host transfer, which dominates wall-clock
    # through the remote relay (measured 266 s for one f32 8556^2 matrix
    # vs 2.3 s of device compute)
    return acc.astype(jnp.uint16)


def intersection_counts(a_sets: Sequence[Sequence[int]],
                        b_sets: Sequence[Sequence[int]],
                        vocab_size: int, vocab_chunk: int = DEFAULT_VOCAB_CHUNK,
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
    n_chunks = max(1, -(-vocab_size // vocab_chunk))
    v_pad = n_chunks * vocab_chunk
    # counts transfer as uint16; a set larger than 65535 tokens would
    # silently wrap and break the bit-equality contract
    max_len = max((len(s) for s in a_sets), default=0)
    max_len = max(max_len, max((len(s) for s in b_sets), default=0))
    if max_len >= 2 ** 16:
        raise ValueError(
            f"token set of size {max_len} overflows the uint16 count "
            f"transfer (limit {2 ** 16 - 1})")
    a_oh = _host_onehot(a_sets, v_pad)
    b_oh = _host_onehot(b_sets, v_pad)

    bj = jnp.asarray(b_oh)
    if mesh is not None:
        n_sh = mesh.shape[shard_axis]
        pad_m = (-len(b_sets)) % n_sh
        if pad_m:  # pad pool rows so the shard axis divides evenly
            bj = jnp.concatenate(
                [bj, jnp.zeros((pad_m, v_pad), bj.dtype)])
        bj = jax.device_put(bj, NamedSharding(mesh, P(shard_axis, None)))

    out = np.zeros((len(a_sets), len(b_sets)), np.int64)
    for r0 in range(0, len(a_sets), row_block):
        r1 = min(r0 + row_block, len(a_sets))
        block = _intersection_scan(jnp.asarray(a_oh[r0:r1]), bj,
                                   n_chunks, vocab_chunk)
        out[r0:r1] = np.asarray(block)[:, :len(b_sets)]
    return out


def jaccard_matrix(a_sets: Sequence[set], b_sets: Sequence[set],
                   token_to_id, vocab_size: int,
                   vocab_chunk: int = DEFAULT_VOCAB_CHUNK,
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
