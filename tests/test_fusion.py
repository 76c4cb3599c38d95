"""Closed-form star-union GCN pooling must match a direct reimplementation
of the reference's networkx + GCNConv pipeline
(reference: utils/model.py:167-223)."""

import networkx as nx
import numpy as np
import pytest

from rag4dyg_tpu.models.fusion import (
    mlp_fusion_pool,
    splice_fused,
    splice_labels,
    star_union_gcn_pool,
)


def _gcn_norm_adj(G, nodes):
    """PyG gcn_norm semantics: symmetric adjacency + remaining self-loops,
    D^-1/2 (A+I*) D^-1/2 (existing self-loops kept, missing ones added)."""
    n = len(nodes)
    idx = {v: i for i, v in enumerate(nodes)}
    A = np.zeros((n, n))
    for u, v in G.edges():
        A[idx[u], idx[v]] = 1.0
        A[idx[v], idx[u]] = 1.0
    for i in range(n):
        A[i, i] = 1.0  # add_remaining_self_loops (existing kept once)
    deg = A.sum(1)
    dinv = 1.0 / np.sqrt(deg)
    return A * dinv[:, None] * dinv[None, :]


def _reference_fusion(demo_token_lists, wte, W, b):
    """Transliteration of fusion_graphpooling for one sample."""
    G = nx.Graph()
    for seq in demo_token_lists:
        ego = int(seq[2])
        G.add_edges_from([(ego, int(t)) for t in seq])
    nodes = list(G.nodes)
    A = _gcn_norm_adj(G, nodes)
    X = wte[np.asarray(nodes)]
    out = A @ X @ W + b
    return out.mean(axis=0)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_star_union_gcn_matches_networkx(seed):
    rng = np.random.RandomState(seed)
    V, D, B, K, S = 60, 16, 3, 4, 10
    wte = rng.randn(V, D).astype(np.float32)
    W = rng.randn(D, D).astype(np.float32)
    b = rng.randn(D).astype(np.float32)

    demo_tokens = rng.randint(0, V, (B, K, S)).astype(np.int32)
    demo_valid = np.ones((B, K, S), bool)
    # ragged demos: invalidate random tails
    for i in range(B):
        for k in range(K):
            demo_valid[i, k, rng.randint(4, S):] = False

    ours = np.asarray(star_union_gcn_pool(demo_tokens, demo_valid, wte, W, b))
    for i in range(B):
        lists = [demo_tokens[i, k][demo_valid[i, k]].tolist()
                 for k in range(K)]
        ref = _reference_fusion(lists, wte, W, b)
        np.testing.assert_allclose(ours[i], ref, atol=1e-4, rtol=1e-4)


def test_star_union_shared_tokens_across_demos():
    """Demos sharing tokens / containing each other's egos (the edge-dedup
    and symmetrization corner cases)."""
    V, D = 20, 8
    rng = np.random.RandomState(9)
    wte = rng.randn(V, D).astype(np.float32)
    W = rng.randn(D, D).astype(np.float32)
    b = np.zeros(D, np.float32)
    # demo 0 ego=5 contains ego of demo 1 (7); demo 1 ego=7 contains 5
    demo_tokens = np.array([[[1, 2, 5, 7, 3, 3], [1, 2, 7, 5, 9, 9]]],
                           np.int32)
    demo_valid = np.ones((1, 2, 6), bool)
    ours = np.asarray(star_union_gcn_pool(demo_tokens, demo_valid, wte, W, b))
    ref = _reference_fusion([demo_tokens[0, 0].tolist(),
                             demo_tokens[0, 1].tolist()], wte, W, b)
    np.testing.assert_allclose(ours[0], ref, atol=1e-4, rtol=1e-4)


def test_mlp_fusion_matches_reference_reshape():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(3)
    B, L, D, m = 2, 512, 16, 3
    wte = rng.randn(40, D).astype(np.float32)
    kernel = rng.randn(L, m).astype(np.float32)
    bias = rng.randn(m).astype(np.float32)
    toks = rng.randint(0, 40, (B, L)).astype(np.int32)

    ours = np.asarray(mlp_fusion_pool(toks, wte, kernel, bias, m))

    # reference: utils/model.py:147-157 with torch Linear(512, m)
    H = torch.as_tensor(wte)[torch.as_tensor(toks).long()]
    flat = H.reshape(-1, L)
    lin = torch.nn.Linear(L, m)
    with torch.no_grad():
        lin.weight.copy_(torch.as_tensor(kernel.T))
        lin.bias.copy_(torch.as_tensor(bias))
        ref = lin(flat).view(-1, m, D).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_splice():
    import jax.numpy as jnp

    emb = jnp.arange(2 * 5 * 3, dtype=jnp.float32).reshape(2, 5, 3)
    fused = jnp.full((2, 3), -1.0)
    out = splice_fused(emb, fused)
    assert out.shape == (2, 6, 3)
    np.testing.assert_array_equal(np.asarray(out[:, 2]), -1.0)
    np.testing.assert_array_equal(np.asarray(out[:, :2]), np.asarray(emb[:, :2]))
    np.testing.assert_array_equal(np.asarray(out[:, 3:]), np.asarray(emb[:, 2:]))

    labels = jnp.ones((2, 5), jnp.int32)
    lab = splice_labels(labels, 2)
    assert lab.shape == (2, 7)
    np.testing.assert_array_equal(np.asarray(lab[:, 2:4]), -100)
