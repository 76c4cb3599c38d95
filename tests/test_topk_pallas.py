"""Fused score+top-k Pallas kernel vs the host oracle (interpret mode on
CPU; the same kernel compiles for TPU)."""

import numpy as np
import pytest

from rag4dyg_tpu.ops.topk_pallas import fused_score_topk, topk_reference
from rag4dyg_tpu.pool.index import DenseIndex, _normalize


def _normed(rng, n, d):
    x = rng.randn(n, d).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


@pytest.mark.parametrize("B,N,D,k", [(8, 512, 128, 5), (130, 1024, 128, 10)])
def test_kernel_matches_oracle(B, N, D, k):
    rng = np.random.RandomState(0)
    q = _normed(rng, B, D)
    p = _normed(rng, N, D)
    s, i = fused_score_topk(q, p, k=k, n_valid=N, tile_b=128, tile_n=512,
                            interpret=True)
    rs, ri = topk_reference(q, p, k)
    np.testing.assert_array_equal(np.asarray(i), ri)
    np.testing.assert_allclose(np.asarray(s), rs, atol=1e-5)


def test_kernel_masks_pool_padding():
    rng = np.random.RandomState(1)
    q = _normed(rng, 8, 128)
    n_valid = 300  # pool padded 300 -> 512 with zero rows (score 0.5)
    p = np.zeros((512, 128), np.float32)
    p[:n_valid] = _normed(rng, n_valid, 128)
    s, i = fused_score_topk(q, p, k=5, n_valid=n_valid, tile_n=512,
                            interpret=True)
    assert np.asarray(i).max() < n_valid
    rs, ri = topk_reference(q, p[:n_valid], 5)
    np.testing.assert_array_equal(np.asarray(i), ri)


def test_kernel_ties_resolve_to_lowest_index():
    # duplicate pool rows -> equal scores; stable order keeps lower index
    q = _normed(np.random.RandomState(2), 4, 128)
    row = _normed(np.random.RandomState(3), 1, 128)
    p = np.repeat(row, 512, axis=0)
    s, i = fused_score_topk(q, p, k=3, n_valid=512, tile_n=512,
                            interpret=True)
    np.testing.assert_array_equal(np.asarray(i),
                                  np.tile([0, 1, 2], (4, 1)))


def test_dense_index_pallas_path_matches_default():
    rng = np.random.RandomState(4)
    emb = rng.randn(700, 64).astype(np.float32)
    queries = rng.randn(9, 64).astype(np.float32)

    idx_plain = DenseIndex(emb, use_pallas=False)
    s0, i0 = idx_plain.topk(queries, 7)

    idx_pallas = DenseIndex(emb, use_pallas=True)
    s1, i1 = idx_pallas.topk(queries, 7, interpret=True)

    np.testing.assert_array_equal(i0, i1)
    np.testing.assert_allclose(s0, s1, atol=1e-5)
