"""Vectorized sequence augmentation for contrastive retriever training.

The reference's ``_aug`` (reference: models/modeling_rag.py:774-840) loops
over the batch in Python, producing two views per sequence: a *crop* (keep
the trailing ``eta`` fraction of a window ending ``crop_begin`` tokens from
the right, zero elsewhere; crop_begin uniform in [4, length-num_left]) and a
*mask* (``gamma`` fraction of positions counted from the right replaced with
the mask token). Here both views are computed for the whole batch inside
jit with jax.random.

Reference quirks preserved on purpose:
  * ``length`` is ``count_nonzero`` over the padded row — PAD tokens (whose
    id is nonzero) count toward length, while node-id 0 does not, so the
    augmentation window spans the padding. Downstream consumes mean-pooled
    embeddings of the full padded row, so this is self-consistent.
  * crop view is all-zeros outside the kept window (token id 0, i.e. node 0).
  * view 1 is always crop, view 2 always mask (the reference's ``switch``
    is the constant [0, 1]).

Divergence: the reference crashes (randint(4, <4)) when
``length - num_left < 4``; we clamp the range instead.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def crop_view(seqs: jnp.ndarray, lengths: jnp.ndarray, key: jax.Array,
              eta: float) -> jnp.ndarray:
    B, L = seqs.shape
    cols = jnp.arange(L)[None, :]
    num_left = jnp.floor(lengths * eta).astype(jnp.int32)
    hi = jnp.maximum(4, lengths - num_left)
    crop_begin = jax.random.randint(key, (B,), 4, hi + 1)  # [4, hi]
    src = cols - crop_begin[:, None]
    gathered = jnp.take_along_axis(seqs, jnp.clip(src, 0, L - 1), axis=1)
    keep = cols >= (L - num_left)[:, None]
    out = jnp.where(keep, gathered, 0)
    use_orig = jnp.logical_or(num_left <= 0, lengths <= 1)
    return jnp.where(use_orig[:, None], seqs, out)


def mask_view(seqs: jnp.ndarray, lengths: jnp.ndarray, key: jax.Array,
              gamma: float, mask_token: int) -> jnp.ndarray:
    B, L = seqs.shape
    cols = jnp.arange(L)[None, :]
    num_mask = jnp.floor(lengths * gamma).astype(jnp.int32)
    scores = jax.random.uniform(key, (B, L))
    scores = jnp.where(cols < lengths[:, None], scores, jnp.inf)
    order = jnp.argsort(scores, axis=1)
    ranks = jnp.argsort(order, axis=1)  # rank of each slot's score
    sel = ranks < num_mask[:, None]     # num_mask distinct offsets i < length
    pos_mask = sel[:, ::-1]             # offset i masks position L-1-i
    out = jnp.where(pos_mask, mask_token, seqs)
    use_orig = jnp.logical_or(num_mask <= 0, lengths <= 1)
    return jnp.where(use_orig[:, None], seqs, out)


def augment_views(seqs: jnp.ndarray, key: jax.Array, *, eta: float,
                  gamma: float, mask_token: int
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Two augmentation views of a right-padded id batch [B, L]."""
    lengths = jnp.count_nonzero(seqs, axis=1).astype(jnp.int32)
    k1, k2 = jax.random.split(key)
    return (crop_view(seqs, lengths, k1, eta),
            mask_view(seqs, lengths, k2, gamma, mask_token))
