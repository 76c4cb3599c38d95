"""Training losses: shifted LM cross-entropy, time-decayed contrastive loss,
and SimCLR-style info-NCE, all as jit-friendly pure functions.

Reference semantics:
  * shift_ce_loss — labels are the inputs shifted by one; the reference
    computes plain CE over every shifted position *including padding*
    (reference: models/modeling_rag.py:678-685). Positions with label
    ``ignore_index`` (-100) are masked out, matching
    torch.nn.CrossEntropyLoss's ignore_index as used by the generator
    (reference: train/train_generator.py:95-102).
  * cltime_loss — cosine-similarity matrix over [anchor; positive; hard-neg]
    embeddings; positive / in-batch-negative / hard-negative logits each
    scaled by exp(-λ·|Δt|) with the in-batch diagonal zeroed; CE against the
    aligned-positive labels (reference: train/train_retriever.py:40-72).
  * info_nce_loss — *unnormalized* dot-product similarities over the two
    augmented views, positives on the ±batch diagonals
    (reference: train/train_retriever.py:74-98).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

IGNORE_INDEX = -100


def shift_ce_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean CE of logits[..., :-1, :] against labels[..., 1:].

    Labels equal to IGNORE_INDEX contribute nothing (and the mean divides by
    the count of non-ignored positions only).
    """
    logits = logits[..., :-1, :].astype(jnp.float32)
    labels = labels[..., 1:]
    valid = labels != IGNORE_INDEX
    safe_labels = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    token_ll = jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    token_ll = jnp.where(valid, token_ll, 0.0)
    return -token_ll.sum() / jnp.maximum(valid.sum(), 1)


def _cosine_sim_matrix(z: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Pairwise cosine similarity (torch.F.cosine_similarity semantics)."""
    norms = jnp.sqrt(jnp.sum(z * z, axis=-1))
    denom = jnp.maximum(norms[:, None] * norms[None, :], eps)
    return (z @ z.T) / denom


def cltime_loss(anchors: jnp.ndarray, positives: jnp.ndarray,
                hard_negatives: jnp.ndarray, anchors_time: jnp.ndarray,
                positives_time: jnp.ndarray, negatives_time: jnp.ndarray,
                *, temperature: float, decay_rate: float) -> jnp.ndarray:
    """Time-aware contrastive loss over (anchor, positive, hard-negative).

    Times are 1-D [B] arrays in dataset time units.
    """
    B = anchors.shape[0]
    z = jnp.concatenate([anchors, positives, hard_negatives], axis=0)
    sim = _cosine_sim_matrix(z.astype(jnp.float32))

    decay_pos = jnp.exp(-decay_rate * jnp.abs(anchors_time[:, None]
                                              - positives_time[None, :]))
    pos_sim = sim[:B, B:2 * B] * decay_pos

    decay_neg = jnp.exp(-decay_rate * jnp.abs(anchors_time[:, None]
                                              - anchors_time[None, :]))
    decay_neg = decay_neg * (1.0 - jnp.eye(B))  # no self-comparison
    neg_sim = sim[:B, :B] * decay_neg

    decay_hneg = jnp.exp(-decay_rate * jnp.abs(anchors_time[:, None]
                                               - negatives_time[None, :]))
    hneg_sim = sim[:B, 2 * B:] * decay_hneg

    logits = jnp.concatenate([pos_sim, neg_sim, hneg_sim], axis=1) / temperature
    labels = jnp.arange(B)
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1))


def info_nce_loss(z_i: jnp.ndarray, z_j: jnp.ndarray,
                  temperature: float) -> jnp.ndarray:
    """SimCLR NT-Xent over two views, on raw (unnormalized) dot products."""
    B = z_i.shape[0]
    N = 2 * B
    z = jnp.concatenate([z_i, z_j], axis=0).astype(jnp.float32)
    sim = (z @ z.T) / temperature
    pos = jnp.concatenate([jnp.diagonal(sim, offset=B),
                           jnp.diagonal(sim, offset=-B)])[:, None]  # [N,1]
    # mask out self and the positive pair; keep the remaining N-2 negatives
    mask = jnp.ones((N, N), bool)
    idx = jnp.arange(N)
    mask = mask.at[idx, idx].set(False)
    mask = mask.at[idx, (idx + B) % N].set(False)
    # row-wise gather of the N-2 unmasked entries, keeping row order
    order = jnp.argsort(~mask, axis=1, stable=True)[:, : N - 2]
    neg = jnp.take_along_axis(sim, order, axis=1)
    logits = jnp.concatenate([pos, neg], axis=1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(logp[:, 0])
