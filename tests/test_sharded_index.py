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


def test_sharded_rank_full_matches_dense():
    """rank_full on a mesh-sharded pool (all-gather + replicated stable
    argsort) must equal the single-device canonical ranking bit-for-bit
    — same scores enter the same stable sort, so even ties agree."""
    rng = np.random.RandomState(2)
    emb = rng.randn(203, 16).astype(np.float32)
    emb[50] = emb[51]  # force exact score ties across rows
    emb[120] = emb[7]
    queries = rng.randn(9, 16).astype(np.float32)
    mesh = make_mesh(n_data=8, n_model=1)
    plain = DenseIndex(emb, use_pallas=False)
    sharded = DenseIndex(emb, mesh=mesh)
    r0 = np.asarray(plain.rank_full(queries))
    r1 = np.asarray(sharded.rank_full(queries))
    assert r1.shape == (9, 203)
    np.testing.assert_array_equal(r0, r1)


def test_topk_gen_emission_shard_count_invariant(tmp_path):
    """The top-k .gen writer must emit byte-identical files from a
    1-, 2-, 4- or 8-way sharded pool (VERDICT r4 #3), and the generator's
    index loader must read back exactly the written top-k rows."""
    from rag4dyg_tpu.train.generator import load_index_file
    from rag4dyg_tpu.train.retriever import write_gen_files_topk

    rng = np.random.RandomState(3)
    emb = rng.randn(1003, 32).astype(np.float32)
    emb[17] = emb[904]  # cross-shard exact tie
    queries = rng.randn(13, 32).astype(np.float32)

    files = {}
    for n_shards in (1, 2, 4, 8):
        mesh = (None if n_shards == 1
                else make_mesh(n_data=n_shards, n_model=1,
                               devices=jax.devices()[:n_shards]))
        idx = DenseIndex(emb, mesh=mesh, use_pallas=False)
        s, i = idx.topk(queries, 9)
        out = tmp_path / f"shards{n_shards}"
        write_gen_files_topk(s, i, str(out), "test")
        files[n_shards] = ((out / "test_index.gen").read_text(),
                           (out / "test_score.gen").read_text())
        rows = load_index_file(str(out / "test_index.gen"))
        assert np.array_equal(np.asarray(rows), i)
    for n_shards in (2, 4, 8):
        assert files[n_shards] == files[1], f"{n_shards}-shard delta"
