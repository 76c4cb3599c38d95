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


def _reference_fusion_multilayer(demo_token_lists, wte, weights, biases):
    """Transliteration of the reference's n-layer GNN.forward
    (models/modeling_rag.py:44-71; ReLU between layers, dropout treated
    as 0 for determinism) + fusion_graphpooling mean pool."""
    G = nx.Graph()
    for seq in demo_token_lists:
        ego = int(seq[2])
        G.add_edges_from([(ego, int(t)) for t in seq])
    nodes = list(G.nodes)
    A = _gcn_norm_adj(G, nodes)
    X = wte[np.asarray(nodes)]
    n = len(weights)
    for i, (W, b) in enumerate(zip(weights, biases)):
        X = A @ X @ W + b
        if i != n - 1:
            X = np.maximum(X, 0.0)
    return X.mean(axis=0)


@pytest.mark.parametrize("n_layers", [1, 2, 3])
def test_star_union_gcn_multilayer_matches_networkx(n_layers):
    from rag4dyg_tpu.models.fusion import star_union_gcn_multilayer

    rng = np.random.RandomState(100 + n_layers)
    V, D, B, K, S = 60, 16, 3, 4, 10
    H = D // 2
    wte = rng.randn(V, D).astype(np.float32)
    dims = ([(D, D)] if n_layers == 1 else
            [(D, H)] + [(H, H)] * (n_layers - 2) + [(H, D)])
    weights = [rng.randn(i, o).astype(np.float32) * 0.3 for i, o in dims]
    biases = [rng.randn(o).astype(np.float32) * 0.1 for _, o in dims]

    demo_tokens = rng.randint(0, V, (B, K, S)).astype(np.int32)
    demo_valid = np.ones((B, K, S), bool)
    for i in range(B):
        for k in range(K):
            demo_valid[i, k, rng.randint(4, S):] = False
    demo_tokens = np.where(demo_valid, demo_tokens, 0)

    ours = np.asarray(star_union_gcn_multilayer(
        demo_tokens, demo_valid, wte, weights, biases))
    for i in range(B):
        lists = [demo_tokens[i, k][demo_valid[i, k]].tolist()
                 for k in range(K)]
        ref = _reference_fusion_multilayer(lists, wte, weights, biases)
        np.testing.assert_allclose(ours[i], ref, atol=2e-4, rtol=2e-4)


def test_star_union_gcn_multilayer_torch_oracle():
    """n_layers=2 against the PyG-semantics torch GCNConv stub (the same
    code path the reference executes), including shared-ego demos."""
    torch = pytest.importorskip("torch")
    import sys
    for p in ("/root/repo/refrun/stubs",):
        if p not in sys.path:
            sys.path.insert(0, p)
    from torch_geometric.nn import GCNConv
    from torch_geometric.utils import from_networkx

    from rag4dyg_tpu.models.fusion import star_union_gcn_multilayer

    rng = np.random.RandomState(7)
    V, D = 30, 8
    wte = rng.randn(V, D).astype(np.float32)
    demo_tokens = np.array([[[1, 2, 5, 7, 3, 3], [1, 2, 7, 5, 9, 9],
                             [4, 6, 5, 8, 8, 8]]], np.int32)
    demo_valid = np.ones((1, 3, 6), bool)

    conv1, conv2 = GCNConv(D, D // 2), GCNConv(D // 2, D)
    weights = [conv1.weight.detach().numpy(), conv2.weight.detach().numpy()]
    biases = [conv1.bias.detach().numpy(), conv2.bias.detach().numpy()]

    ours = np.asarray(star_union_gcn_multilayer(
        demo_tokens, demo_valid, wte, weights, biases))[0]

    G = nx.Graph()
    for k in range(3):
        seq = demo_tokens[0, k].tolist()
        ego = seq[2]
        G.add_edges_from([(ego, t) for t in seq])
    nodes = list(G.nodes)
    data = from_networkx(G)
    X = torch.as_tensor(wte[np.asarray(nodes)])
    with torch.no_grad():
        h = torch.relu(conv1(X, data.edge_index))
        ref = conv2(h, data.edge_index).mean(dim=0).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=2e-4)


def test_mlp_fusion_multilayer_matches_torch():
    torch = pytest.importorskip("torch")
    from rag4dyg_tpu.models.fusion import mlp_fusion_pool_multilayer

    rng = np.random.RandomState(11)
    B, L, D, m = 2, 64, 8, 2
    H = L // 2
    wte = rng.randn(30, D).astype(np.float32)
    toks = rng.randint(0, 30, (B, L)).astype(np.int32)
    dims = [(L, H), (H, H), (H, m)]
    kernels = [rng.randn(i, o).astype(np.float32) for i, o in dims]
    biases = [rng.randn(o).astype(np.float32) for _, o in dims]

    ours = np.asarray(mlp_fusion_pool_multilayer(toks, wte, kernels,
                                                 biases, m))

    # reference MLP_custom (models/modeling_rag.py:74-99): Linear+ReLU
    flat = torch.as_tensor(wte)[torch.as_tensor(toks).long()].reshape(-1, L)
    with torch.no_grad():
        x = flat
        for i, (k, b) in enumerate(zip(kernels, biases)):
            x = x @ torch.as_tensor(k) + torch.as_tensor(b)
            if i != len(kernels) - 1:
                x = torch.relu(x)
        ref = x.view(-1, m, D).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-4)
