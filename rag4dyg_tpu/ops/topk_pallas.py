"""Pallas TPU kernel: fused cosine-scoring + running top-k over the pool.

The retrieval hot path is ``scores = (Q_hat @ P_hatᵀ + 1)/2`` followed by a
top-k over the pool axis (reference: train/train_retriever.py:425-443 does
the matmul on device then a FULL numpy argsort per query batch on host —
O(N log N) host work and a [B, N] device->host transfer per batch).

This kernel streams the pool through VMEM in tiles: each grid step does
one [TILE_B, D] x [D, TILE_N] MXU matmul and folds the tile's scores into
a running top-k held in the (revisited) output block — so the full [B, N]
score matrix never materializes in HBM and only [B, k] scores + indices
leave the chip. The merge is k unrolled max-extract steps over the
[TILE_B, k + TILE_N] concat (k is small: 3..10 in every config).

CPU fallback/testing runs the same kernel under ``interpret=True``.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float("-inf")


def _merge_topk(cat_s: jnp.ndarray, cat_i: jnp.ndarray, k: int
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """k unrolled max-extract steps over the lane axis. Ties resolve to the
    lowest pool index (numpy argsort order for distinct scores; duplicate
    scores are ordered by index, matching a stable descending sort)."""
    out_s, out_i = [], []
    for _ in range(k):
        m = jnp.max(cat_s, axis=1)                       # [TB]
        is_max = cat_s == m[:, None]
        # among max-score slots, pick the one with the smallest pool index
        cand_idx = jnp.where(is_max, cat_i, jnp.int32(2**31 - 1))
        idx = jnp.min(cand_idx, axis=1)                  # [TB]
        out_s.append(m)
        out_i.append(idx)
        # knock out the selected slot (by pool index, unique per slot)
        cat_s = jnp.where(cat_i == idx[:, None], NEG_INF, cat_s)
    return jnp.stack(out_s, axis=1), jnp.stack(out_i, axis=1)


def _topk_kernel(q_ref, p_ref, s_out, i_out, *, k: int, tile_n: int,
                 n_valid: int, precision):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        s_out[:] = jnp.full_like(s_out, NEG_INF)
        i_out[:] = jnp.zeros_like(i_out)

    q = q_ref[:]                                          # [TB, D]
    p = p_ref[:]                                          # [TN, D]
    cos = jax.lax.dot_general(
        q, p, dimension_numbers=(((1,), (1,)), ((), ())),
        # HIGHEST (default): true-f32 multi-pass on the MXU — the single
        # bf16 pass perturbs scores ~1e-3 and reorders near-ties vs the
        # reference's f32 cosine. HIGH (bf16x3) is ~2x faster at ~f32
        # accuracy; select per-call when tie-order is verified not to
        # matter for the workload.
        precision=precision,
        preferred_element_type=jnp.float32)               # [TB, TN]
    scores = (cos + 1.0) * 0.5

    base = j * tile_n
    col = base + jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    scores = jnp.where(col < n_valid, scores, NEG_INF)    # mask pool padding

    cat_s = jnp.concatenate([s_out[:, :k], scores], axis=1)
    cat_i = jnp.concatenate([i_out[:, :k], col], axis=1)
    new_s, new_i = _merge_topk(cat_s, cat_i, k)
    s_out[:, :k] = new_s
    i_out[:, :k] = new_i


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(jax.jit,
                   static_argnames=("k", "n_valid", "tile_b", "tile_n",
                                    "interpret", "normalize", "precision"))
def fused_score_topk(queries: jnp.ndarray, pool_normed: jnp.ndarray, *,
                     k: int, n_valid: int, tile_b: int = 128,
                     tile_n: int = 512, interpret: bool = False,
                     normalize: bool = False,
                     precision: jax.lax.Precision = jax.lax.Precision.HIGHEST
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k rescaled-cosine scores of normalized ``queries`` [B, D]
    against normalized ``pool_normed`` [N, D] (N, D already padded to tile
    multiples; rows >= n_valid are padding). Returns ([B, k], [B, k]).
    ``normalize=True`` L2-normalizes the queries inside the same jit so a
    call is one device dispatch.

    ``precision``: DEFAULT (one bf16 MXU pass) or HIGHEST (6-pass f32).
    Mosaic's in-kernel dot lowering does not implement HIGH (bf16x3) —
    rejected here with a clear error instead of a lowering crash."""
    if precision == jax.lax.Precision.HIGH:
        raise ValueError(
            "fused_score_topk: Precision.HIGH is not lowerable inside a "
            "Mosaic kernel; use DEFAULT (serving) or HIGHEST (parity)")
    if normalize:
        queries = queries / jnp.maximum(
            jnp.linalg.norm(queries, axis=-1, keepdims=True), 1e-12)
    B, D = queries.shape
    N = pool_normed.shape[0]
    assert N % tile_n == 0
    Bp = _round_up(B, tile_b)
    if Bp != B:
        queries = jnp.concatenate(
            [queries, jnp.zeros((Bp - B, D), queries.dtype)], axis=0)

    # output lane dim padded to 128 for clean VMEM tiling; sliced below
    out_lanes = _round_up(k, 128)
    grid = (Bp // tile_b, N // tile_n)
    kernel = functools.partial(_topk_kernel, k=k, tile_n=tile_n,
                               n_valid=n_valid, precision=precision)
    s, i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, D), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, D), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_b, out_lanes), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, out_lanes), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, out_lanes), jnp.float32),
            jax.ShapeDtypeStruct((Bp, out_lanes), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * N * D, transcendentals=0,
            bytes_accessed=4 * (Bp * D + N * D + 2 * Bp * out_lanes)),
        interpret=interpret,
    )(queries.astype(jnp.float32), pool_normed.astype(jnp.float32))
    return s[:B, :k], i[:B, :k]


def topk_reference(queries: np.ndarray, pool_normed: np.ndarray, k: int
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Host oracle for tests: stable descending sort by (score, -index)."""
    cos = queries @ pool_normed.T
    scores = (cos + 1.0) * 0.5
    idx = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(scores, idx, axis=1), idx
