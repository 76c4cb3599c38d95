"""Demonstration-fusion heads: graph pooling (GCN over the union of
retrieved star graphs) and MLP compression.

The reference builds, per batch sample and per decode step, a networkx
graph unioning one star per retrieved demonstration (center = that demo's
ego = its 3rd token; edges center->every token of the demo), converts it to
torch_geometric, runs GCNConv, and mean-pools — a pure host loop
(reference: utils/model.py:167-223). Here the same graph semantics are
evaluated in closed form as batched tensor contractions over the vocab
axis, so fusion lives inside jit and the MXU does the work.

Exact-semantics derivation (single GCNConv layer, PyG gcn_norm with
add_remaining_self_loops — the committed configs all use gnn_layers=1):

  The union graph's edges connect only demo centers c_d to token nodes t.
  With E[d, t] = 1 iff the (symmetrized, deduplicated) edge (c_d, t)
  exists — E[d, t] = member_d[t] OR (t == c_e AND member_e[c_d]) — and
  hatted degrees

      D[t]    = 1 + Σ_d E[d, t]          (non-centers: added self-loop)
      D[c_d]  = Σ_t E[d, t]              (centers: own self-loop is in E)

  the GCN aggregation for node u is  agg(u) = x_u/D[u] +
  Σ_{v~u} x_v / sqrt(D[u] D[v]),  and the mean-pooled fused embedding is

      fused = mean_u agg(u) @ W + b
            = [ (m/D) @ X  +  Σ_d w_d q_d x_{c_d}  +  u @ X ] / n  @ W + b

  with  m = node-membership mask, w_d = 1/sqrt(D[c_d]),
  q_d = Σ_{t≠c_d} E[d,t]/sqrt(D[t]),
  u[t] = Σ_d E[d,t]·[t≠c_d]·w_d / sqrt(D[t]),  n = Σ m.

  Every term is a masked [B,V] x [V,emb] matmul or tiny gather — no graph
  library, no host round-trip, O(B·k·V + B·V·emb) on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def demo_membership(demo_tokens: jnp.ndarray, demo_valid: jnp.ndarray,
                    vocab_size: int) -> jnp.ndarray:
    """[B, k, S] padded demo token ids -> {0,1} membership [B, k, V]."""
    B, K, S = demo_tokens.shape
    col = jnp.where(demo_valid, demo_tokens, vocab_size)  # drop slot
    m = jnp.zeros((B, K, vocab_size + 1), jnp.float32)
    b_idx = jnp.arange(B)[:, None, None]
    k_idx = jnp.arange(K)[None, :, None]
    m = m.at[b_idx, k_idx, col].max(1.0)
    return m[..., :vocab_size]


def star_union_structure(demo_tokens: jnp.ndarray, demo_valid: jnp.ndarray,
                         vocab_size: int):
    """Shared star-union graph structure in vocab space.

    Returns a dict with:
      E_nc: [B, k, V] per-center incidence (mirrored center-center edges,
        duplicate-center rows collapsed into the owner row, self edges
        removed)
      centers: [B, k]; is_center/member: [B, V] masks;
      degree / inv_deg / inv_sqrt_deg: [B, V] hatted degrees (self-loops
        included per PyG gcn_norm add_remaining_self_loops);
      w_center: [B, k] = inv_sqrt_deg at each center; n_nodes: [B].
    """
    V = vocab_size
    B, K, S = demo_tokens.shape
    M = demo_membership(demo_tokens, demo_valid, V)      # [B, k, V]
    centers = demo_tokens[:, :, 2]                        # [B, k] demo egos

    b_idx = jnp.arange(B)[:, None]
    k_idx = jnp.arange(K)[None, :]
    # P[b, d, e] = 1 iff demo e's member set contains center c_d; that edge
    # (c_d, c_e) is incident to BOTH centers, so mirror it into row d too —
    # each center's row then holds exactly its full incidence list.
    P = jnp.take_along_axis(M.transpose(0, 2, 1), centers[:, :, None],
                            axis=1)                       # [B, k(d), k(e)]
    k_cols = jnp.broadcast_to(centers[:, None, :], (B, K, K))
    E = M.at[b_idx[:, :, None], k_idx[:, :, None], k_cols].max(P)

    # collapse rows that share a center (duplicate demo egos), so each
    # undirected edge appears exactly once per center endpoint
    owner = (jnp.argmax(centers[:, :, None] == centers[:, None, :],
                        axis=2)[:, :, None]
             == jnp.arange(K)[None, None, :]).astype(jnp.float32)  # [B,Kd,Ke]
    E = jnp.minimum(jnp.einsum("bde,bdt->bet", owner, E,
                               preferred_element_type=jnp.float32), 1.0)

    is_center = jnp.zeros((B, V), bool).at[b_idx, centers].set(True)
    row_sum = E.sum(axis=2)                               # [B, k] = D[c_d]
    col_sum = E.sum(axis=1)                               # [B, V] distinct
    #   center-neighbor counts of non-center nodes (post-collapse)
    center_deg = jnp.zeros((B, V), jnp.float32).at[
        b_idx, centers].max(row_sum)                      # dup-safe scatter
    degree = jnp.where(is_center, center_deg, 1.0 + col_sum)
    inv_sqrt_deg = jnp.where(degree > 0, jax.lax.rsqrt(degree), 0.0)

    member = jnp.max(E, axis=1)                           # [B, V] node mask
    n_nodes = jnp.maximum(member.sum(axis=1), 1.0)        # [B]
    inv_deg = jnp.where(degree > 0, 1.0 / degree, 0.0)

    # E without the (center, center) self entries
    eye_cd = jnp.zeros((B, K, V), jnp.float32).at[
        b_idx[:, :, None], k_idx[:, :, None],
        centers[:, :, None]].set(1.0)
    E_nc = E * (1.0 - eye_cd)                             # edges minus self
    w_center = inv_sqrt_deg[b_idx, centers]               # [B, k]
    return {"E_nc": E_nc, "centers": centers, "is_center": is_center,
            "member": member, "degree": degree, "inv_deg": inv_deg,
            "inv_sqrt_deg": inv_sqrt_deg, "w_center": w_center,
            "n_nodes": n_nodes}


def star_union_gcn_pool(demo_tokens: jnp.ndarray, demo_valid: jnp.ndarray,
                        wte: jnp.ndarray, gcn_kernel: jnp.ndarray,
                        gcn_bias: jnp.ndarray) -> jnp.ndarray:
    """Mean-pooled 1-layer GCN over the union of demo star graphs.

    Args:
      demo_tokens: [B, k, S] token ids of the k retrieved demonstrations.
      demo_valid: [B, k, S] True on real (non-pad) tokens.
      wte: [V, D] embedding table (node features).
      gcn_kernel/gcn_bias: [D, D_out]/[D_out] GCNConv weight and bias.

    Returns [B, D_out] fused embeddings.
    """
    V, D = wte.shape
    B = demo_tokens.shape[0]
    st = star_union_structure(demo_tokens, demo_valid, V)
    E_nc, centers, is_center = st["E_nc"], st["centers"], st["is_center"]
    inv_sqrt_deg, w_center = st["inv_sqrt_deg"], st["w_center"]
    b_idx = jnp.arange(B)[:, None]

    self_weights = st["member"] * st["inv_deg"]           # x_t/D_t terms
    # into-non-center flow: x_{c_d} reaches its NON-center neighbors here;
    # center neighbors receive it through their own (mirrored) row via u
    q = (E_nc * jnp.where(is_center, 0.0, inv_sqrt_deg)[:, None, :]
         ).sum(axis=2)                                    # [B, k]
    center_weights = jnp.zeros((B, V), jnp.float32).at[
        b_idx, centers].add(w_center * q)                 # Σ_d w_d q_d δ_{c_d}

    # into-center flow: every neighbor's x (incl. other centers) enters
    # each center's aggregation through that center's own row
    u = (E_nc * w_center[:, :, None]).sum(axis=1) * inv_sqrt_deg  # [B, V]

    total_weights = (self_weights + center_weights + u) / st["n_nodes"][:, None]
    agg = jnp.dot(total_weights, wte.astype(jnp.float32),
                  preferred_element_type=jnp.float32)     # [B, D]
    return agg @ gcn_kernel + gcn_bias


def star_union_gcn_multilayer(demo_tokens: jnp.ndarray,
                              demo_valid: jnp.ndarray, wte: jnp.ndarray,
                              kernels, biases, *, dropout_rate: float = 0.0,
                              rng=None,
                              deterministic: bool = True) -> jnp.ndarray:
    """Mean-pooled n-layer GCN over the union of demo star graphs —
    message-passing form (reference: models/modeling_rag.py:44-71:
    stacked GCNConv with ReLU + dropout between layers).

    Node states are materialized as [B, V, D_l] (zero outside the member
    set); one propagation is three small einsums against the [B, k, V]
    center-incidence — no V x V adjacency ever exists. Quirk note: the
    reference calls ``F.dropout(x, p)`` WITHOUT ``training=self.training``
    (models/modeling_rag.py:70), so its inter-layer dropout stays active
    even at eval; here dropout is honest (off when ``deterministic``) —
    the committed configs all use gnn_layers=1 where no dropout fires.
    """
    V, _ = wte.shape
    B = demo_tokens.shape[0]
    st = star_union_structure(demo_tokens, demo_valid, V)
    E_nc, centers = st["E_nc"], st["centers"]
    isd, inv_deg = st["inv_sqrt_deg"], st["inv_deg"]
    member, is_center = st["member"], st["is_center"]
    b_idx = jnp.arange(B)[:, None]

    # propagation weights fixed across layers
    W_in = E_nc * isd[:, None, :]                         # into-center
    W_out = (E_nc * jnp.where(is_center, 0.0, isd)[:, None, :]
             * st["w_center"][:, :, None])                # center -> non-center

    X = member[:, :, None] * wte[None].astype(jnp.float32)  # [B, V, D]
    n_layers = len(kernels)
    for li, (Wl, bl) in enumerate(zip(kernels, biases)):
        cs = jnp.take_along_axis(X, centers[:, :, None], axis=1)  # [B, k, D]
        t2 = jnp.einsum("bdv,bde->bve", W_out, cs,
                        preferred_element_type=jnp.float32)
        G = jnp.einsum("bdv,bve->bde", W_in, X,
                       preferred_element_type=jnp.float32)
        t3 = jnp.zeros_like(X).at[b_idx, centers].add(
            st["w_center"][:, :, None] * G)
        agg = inv_deg[:, :, None] * X + t2 + t3
        X = (agg @ Wl + bl) * member[:, :, None]
        if li != n_layers - 1:
            X = jax.nn.relu(X)
            if dropout_rate > 0.0 and not deterministic:
                assert rng is not None, "dropout needs an rng"
                rng, drop_rng = jax.random.split(rng)
                keep = jax.random.bernoulli(drop_rng, 1.0 - dropout_rate,
                                            X.shape)
                X = jnp.where(keep, X / (1.0 - dropout_rate), 0.0)
    return X.sum(axis=1) / st["n_nodes"][:, None]


def mlp_fusion_pool(demo_tokens_concat: jnp.ndarray, wte: jnp.ndarray,
                    mlp_kernel: jnp.ndarray, mlp_bias: jnp.ndarray,
                    m: int) -> jnp.ndarray:
    """MLP fusion head (reference: utils/model.py:105-164).

    ``demo_tokens_concat``: [B, 512] demo tokens concatenated and padded.
    Reproduces the reference's raw ``view(-1, 512)`` reshape (which mixes
    sequence and embedding axes) exactly — it is a quirky but fixed linear
    map. Returns [B, m, D].
    """
    B, L = demo_tokens_concat.shape
    H_sim = jnp.take(wte, demo_tokens_concat, axis=0)     # [B, 512, D]
    D = H_sim.shape[-1]
    flat = H_sim.reshape(-1, L)                           # [B*D, 512]
    out = flat @ mlp_kernel + mlp_bias                    # [B*D, m]
    return out.reshape(B, m, D)


def mlp_fusion_pool_multilayer(demo_tokens_concat: jnp.ndarray,
                               wte: jnp.ndarray, kernels, biases,
                               m: int) -> jnp.ndarray:
    """n-layer MLP fusion head (reference: models/modeling_rag.py:74-99
    MLP_custom — Linear/ReLU stacks with hidden = input//2, built by
    get_mlp(512, m, mlp_layers), main_generator.py:80-81). Operates on
    the same raw ``view(-1, 512)`` flat as the 1-layer head."""
    B, L = demo_tokens_concat.shape
    H_sim = jnp.take(wte, demo_tokens_concat, axis=0)
    D = H_sim.shape[-1]
    x = H_sim.reshape(-1, L)                              # [B*D, 512]
    n = len(kernels)
    for i, (W, b) in enumerate(zip(kernels, biases)):
        x = x @ W + b
        if i != n - 1:
            x = jax.nn.relu(x)
    return x.reshape(B, m, D)


def splice_fused(inputs_embeds: jnp.ndarray, fused: jnp.ndarray
                 ) -> jnp.ndarray:
    """Insert fused demo token(s) after position 2 (= after
    '<bos> <|history|>'), reference: utils/model.py:159,219."""
    if fused.ndim == 2:
        fused = fused[:, None, :]
    return jnp.concatenate(
        [inputs_embeds[:, :2], fused.astype(inputs_embeds.dtype),
         inputs_embeds[:, 2:]], axis=1)


def splice_labels(labels: jnp.ndarray, m: int,
                  ignore_index: int = -100) -> jnp.ndarray:
    """Insert m ignore slots after position 2 to align labels with the
    fused inputs (reference: train/train_generator.py:95-98)."""
    pad = jnp.full((labels.shape[0], m), ignore_index, labels.dtype)
    return jnp.concatenate([labels[:, :2], pad, labels[:, 2:]], axis=1)


def batch_window_labels(spliced_labels: jnp.ndarray, batch: jnp.ndarray,
                        pad_id: int, m: int,
                        ignore_index: int = -100) -> jnp.ndarray:
    """Reference label-window parity for statically padded batches.

    The reference pads each generator batch only to its LONGEST row
    (dataloader/generator.py:118-119 ``pad_sequence``) and counts every
    position — pad labels of shorter rows included — in the mean CE
    (train/train_generator.py:79,100-102: labels = raw inputs, only the
    m fused slots are -100). Our batches are statically padded to the
    resident-pool width (hundreds of extra [PAD] columns), so without
    this mask ~94% of the counted positions are trivial pad→pad
    predictions. That is not just a cosmetic loss-scale change: with a
    frozen backbone, pad-position losses backprop into the trainable
    fusion head (pad positions attend to the fused tokens) and the
    untied lm_head, drowning the real-token signal the reference
    trains on. Masking spliced labels at positions >= max_row_len + m
    makes the counted-position set bit-identical to the reference's.

    ``batch`` is the un-spliced [B, L] token batch; rows contain
    ``pad_id`` only in their right-pad tail (the tokenizer never emits
    [PAD] inside a line).
    """
    window = (batch != pad_id).sum(axis=1).max() + m
    j = jnp.arange(spliced_labels.shape[1])
    return jnp.where(j[None, :] < window, spliced_labels, ignore_index)
