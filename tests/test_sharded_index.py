"""Mesh-sharded DenseIndex: shard_map local-top-k + all-gather merge must
match the single-device path exactly (incl. pool padding rows)."""

import jax
import numpy as np
import pytest

from rag4dyg_tpu.parallel import make_mesh
from rag4dyg_tpu.pool.index import DenseIndex

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 (virtual) devices")


def test_sharded_topk_matches_dense():
    rng = np.random.RandomState(0)
    emb = rng.randn(1003, 32).astype(np.float32)  # pads to 1008 over 8
    queries = rng.randn(17, 32).astype(np.float32)
    mesh = make_mesh(n_data=8, n_model=1)

    plain = DenseIndex(emb, use_pallas=False)
    s0, i0 = plain.topk(queries, 9)

    sharded = DenseIndex(emb, mesh=mesh, shard_axis="data")
    s1, i1 = sharded.topk(queries, 9)

    np.testing.assert_allclose(s1, s0, atol=1e-5)
    # indices may differ only on exact score ties; verify score-equality
    mismatch = i0 != i1
    if mismatch.any():
        np.testing.assert_allclose(
            np.take_along_axis(plain.score(queries), i1, 1)[mismatch],
            s0[mismatch], atol=1e-5)
    assert i1.max() < 1003  # padding rows never surface


def test_sharded_score_matches_dense():
    rng = np.random.RandomState(1)
    emb = rng.randn(256, 16).astype(np.float32)
    queries = rng.randn(5, 16).astype(np.float32)
    mesh = make_mesh(n_data=8, n_model=1)
    plain = DenseIndex(emb, use_pallas=False)
    sharded = DenseIndex(emb, mesh=mesh)
    np.testing.assert_allclose(np.asarray(sharded.score(queries)),
                               np.asarray(plain.score(queries)), atol=1e-5)
