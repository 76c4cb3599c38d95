"""Device-resident dense retrieval index.

The reference scores queries against the train pool with a host-looped
normalized matmul and a full numpy argsort per batch
(reference: train/train_retriever.py:414-456). Here the pool embedding
matrix lives on device (optionally sharded over a mesh axis), scoring is a
single jitted matmul, and top-k is computed with ``lax.top_k`` — sharded
pools do a local top-k per shard followed by an all-gather merge inside
``shard_map``, so only O(k · n_shards) candidates cross the ICI instead of
the full pool axis.

Scores use the reference's convention: cosine similarity rescaled to [0, 1]
via (cos + 1) / 2 (reference: train/train_retriever.py:437-438).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _normalize(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    # torch Tensor.norm keeps zero rows zero; clamp like torch's division
    n = jnp.linalg.norm(x, axis=-1, keepdims=True)
    return x / jnp.maximum(n, eps)


@jax.jit
def _score_dense(queries: jnp.ndarray, pool_normed: jnp.ndarray
                 ) -> jnp.ndarray:
    q = _normalize(queries.astype(jnp.float32))
    # HIGHEST: keep true-f32 cosine parity with the reference scorer
    # (TPU's default single bf16 MXU pass perturbs scores ~1e-3)
    cos = jnp.dot(q, pool_normed.T, precision=jax.lax.Precision.HIGHEST,
                  preferred_element_type=jnp.float32)
    return (cos + 1.0) * 0.5


class DenseIndex:
    """Cosine-scored dense index over pool embeddings.

    Args:
      embeddings: [N, D] pool embedding matrix (host or device array).
      mesh: optional ``jax.sharding.Mesh``; the pool axis is sharded over
        ``shard_axis`` and queries are replicated.
    """

    def __init__(self, embeddings, mesh: Optional[Mesh] = None,
                 shard_axis: str = "data", use_pallas: Optional[bool] = None):
        self.n, self.dim = embeddings.shape
        self.mesh = mesh
        self.shard_axis = shard_axis
        # the fused Pallas matmul+top-k path (single-chip): auto-on on TPU
        self.use_pallas = (jax.default_backend() == "tpu"
                           if use_pallas is None else use_pallas)
        self._pallas_pool = None
        normed = _normalize(jnp.asarray(embeddings, jnp.float32))
        if mesh is not None:
            n_shards = mesh.shape[shard_axis]
            pad = (-self.n) % n_shards
            if pad:
                normed = jnp.concatenate(
                    [normed, jnp.zeros((pad, self.dim), jnp.float32)], axis=0)
            self.padded_n = normed.shape[0]
            self.pool = jax.device_put(
                normed, NamedSharding(mesh, P(shard_axis, None)))
        else:
            self.padded_n = self.n
            self.pool = normed

    def score(self, queries) -> jnp.ndarray:
        """[B, D] query embeddings -> [B, N] scores in [0, 1]."""
        return _score_dense(jnp.asarray(queries), self.pool)[:, : self.n]

    def topk_device(self, queries, k: int,
                    interpret: bool = False
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Top-k (scores, indices) as device arrays — one dispatch, no
        host sync; use for throughput-critical pipelined scoring."""
        if self.mesh is None and self.use_pallas:
            from rag4dyg_tpu.ops.topk_pallas import fused_score_topk

            tile_n = 512
            if self._pallas_pool is None:
                pad = (-self.n) % tile_n
                pool = self.pool
                if pad:
                    pool = jnp.concatenate(
                        [pool, jnp.zeros((pad, self.dim), jnp.float32)],
                        axis=0)
                self._pallas_pool = pool
            return fused_score_topk(jnp.asarray(queries, jnp.float32),
                                    self._pallas_pool, k=k, n_valid=self.n,
                                    tile_n=tile_n, interpret=interpret,
                                    normalize=True)
        if self.mesh is None:
            return _topk_dense(jnp.asarray(queries), self.pool, k)
        return _topk_sharded(jnp.asarray(queries), self.pool, k, self.mesh,
                             self.shard_axis, self.n)

    def topk(self, queries, k: int,
             interpret: bool = False) -> Tuple[np.ndarray, np.ndarray]:
        """Top-k (scores, indices) per query, on host."""
        s, i = self.topk_device(queries, k, interpret=interpret)
        return np.asarray(s), np.asarray(i)

    def rank_full(self, queries) -> jnp.ndarray:
        """Full descending ranking of the pool per query, on device.

        Returns int32 [B, N] pool indices, ties broken to the LOWEST pool
        index (stable descending order — the canonical tie order of
        ``ops.topk_pallas.topk_reference``; the reference's
        ``np.argsort(-scores)`` at train/train_retriever.py:358 is an
        unstable introsort whose tie order we canonicalize, documented in
        PARITY.md). Replaces the host-side full argsort of a downloaded
        [B, N] f32 score matrix for .gen emission
        (reference: train/train_retriever.py:357-368).

        Sharded pools: each shard scores its own rows, the [B, N] score
        row is all-gathered over ICI, and every replica ranks the full
        row — O(B·N) memory per device, so use this at reference pool
        scales only; at the 1M-row north-star scale emit the top-k .gen
        format instead (``topk_device`` + ``write_gen_files_topk``,
        which keeps cross-shard traffic at O(k · n_shards)).
        """
        if self.mesh is not None:
            return _rank_sharded(jnp.asarray(queries), self.pool,
                                 self.mesh, self.shard_axis,
                                 self.n)[:, : self.n]
        return _rank_dense(jnp.asarray(queries), self.pool)


@functools.partial(jax.jit, static_argnames=("k",))
def _topk_dense(queries, pool_normed, k: int):
    return jax.lax.top_k(_score_dense(queries, pool_normed), k)


@jax.jit
def _rank_dense(queries, pool_normed):
    scores = _score_dense(queries, pool_normed)
    # stable ascending argsort of -scores == stable descending ranking
    # (lowest index first on ties); f32 negation is exact
    return jnp.argsort(-scores, axis=1, stable=True).astype(jnp.int32)


@functools.partial(jax.jit,
                   static_argnames=("k", "mesh", "axis", "n_valid"))
def _topk_sharded(queries, pool_sharded, k: int, mesh, axis: str,
                  n_valid: int):
    shard_map = jax.shard_map

    n_shards = mesh.shape[axis]
    shard_rows = pool_sharded.shape[0] // n_shards

    def local(q, pool_block):
        # pool_block: [rows/n_shards, D] local shard
        scores = _score_dense(q, pool_block)
        shard_id = jax.lax.axis_index(axis)
        base = shard_id * shard_rows
        # padding rows (beyond n_valid) must never win
        local_rows = jnp.arange(shard_rows) + base
        scores = jnp.where(local_rows[None, :] < n_valid, scores, -jnp.inf)
        s, i = jax.lax.top_k(scores, min(k, shard_rows))
        i = i + base
        # gather all shards' candidates, merge
        s_all = jax.lax.all_gather(s, axis, axis=1, tiled=True)
        i_all = jax.lax.all_gather(i, axis, axis=1, tiled=True)
        ms, mi = jax.lax.top_k(s_all, k)
        return ms, jnp.take_along_axis(i_all, mi, axis=1)

    # outputs ARE replicated (each shard all-gathers every candidate set
    # and runs the same merge), but the static checker can't prove it
    return shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(axis, None)),
        out_specs=(P(), P()), check_vma=False)(queries, pool_sharded)


@functools.partial(jax.jit, static_argnames=("mesh", "axis", "n_valid"))
def _rank_sharded(queries, pool_sharded, mesh, axis: str, n_valid: int):
    """Full stable descending ranking of a mesh-sharded pool: local
    shard scoring, all-gather of the [B, N] score row, replicated
    stable argsort. Padding rows scored -inf so they rank last."""
    shard_map = jax.shard_map
    n_shards = mesh.shape[axis]
    shard_rows = pool_sharded.shape[0] // n_shards

    def local(q, pool_block):
        scores = _score_dense(q, pool_block)
        base = jax.lax.axis_index(axis) * shard_rows
        rows = jnp.arange(shard_rows) + base
        scores = jnp.where(rows[None, :] < n_valid, scores, -jnp.inf)
        s_all = jax.lax.all_gather(scores, axis, axis=1, tiled=True)
        return jnp.argsort(-s_all, axis=1, stable=True).astype(jnp.int32)

    return shard_map(local, mesh=mesh,
                     in_specs=(P(), P(axis, None)),
                     out_specs=P(), check_vma=False)(queries, pool_sharded)
