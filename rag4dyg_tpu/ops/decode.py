"""Batched greedy decoding with a KV cache.

The reference evaluates generation one sample at a time, re-running the
full forward over the growing sequence for every generated token with no
KV cache (reference: utils/Evaluation_SimpleDyG.py:126-145) — an O(n²)
host-device ping-pong that dominates eval wall-clock. Here the whole batch
decodes inside one jitted ``lax.scan``:

  * queries are LEFT-padded so every row's most recent token sits at the
    final column; together with an explicit padding mask and per-row
    position ids this makes batched decoding token-for-token equivalent to
    the reference's unpadded per-sample loop (greedy argmax is
    deterministic).
  * the KV cache is pre-sized to prefill-bucket + max-new-tokens, so shapes
    are static and XLA compiles one program per bucket.

Stop conditions mirror the reference loop: a sample stops after appending
the eos token, or after appending its ``cap``-th new token (val: 11 tokens
— the reference breaks on gen_len>10 after incrementing; test: remaining
context budget n_ctx - #special-tokens - prompt length).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rag4dyg_tpu.models.gpt2 import init_cache


def left_pad_batch(seqs: Sequence[Sequence[int]], pad_id: int,
                   length: Optional[int] = None, multiple_of: int = 1
                   ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Left-pad ragged id lists -> (ids [B,L], pad_mask [B,L], position_ids).

    Position ids run 0..n-1 over the real tokens (pads get position 0),
    matching the reference's per-sample ``arange(len)`` positions.
    """
    max_len = max(len(s) for s in seqs)
    if length is None:
        length = -(-max_len // multiple_of) * multiple_of
    assert max_len <= length
    B = len(seqs)
    ids = np.full((B, length), pad_id, dtype=np.int32)
    mask = np.zeros((B, length), dtype=bool)
    pos = np.zeros((B, length), dtype=np.int32)
    for i, s in enumerate(seqs):
        n = len(s)
        ids[i, length - n:] = s
        mask[i, length - n:] = True
        pos[i, length - n:] = np.arange(n)
    return ids, mask, pos


def greedy_decode(model, params, seqs: Sequence[Sequence[int]], *,
                  eos_id: int, pad_id: int, caps: Sequence[int],
                  max_steps: int, bucket: int = 128,
                  prefill_embed_fn: Optional[Callable] = None
                  ) -> Tuple[np.ndarray, np.ndarray]:
    """Greedy-decode a ragged batch of prompts.

    Args:
      model: a ``GPT2LMModel`` instance.
      params: its parameter pytree.
      seqs: prompt token-id lists.
      caps: per-sample max number of new tokens (reference stop budget).
      max_steps: static unroll bound (>= max(caps)).
      bucket: prefill lengths are rounded up to a multiple of this to bound
        the number of compiled programs.
      prefill_embed_fn: optional ``(ids, pad_mask, position_ids) ->
        (embeds, pad_mask, position_ids)`` hook that maps the left-padded
        prompt to prefill embeddings (the RAG fusion path splices
        demonstration embeddings here; the widened width is inferred from
        the returned pad_mask).

    Returns:
      (tokens [B, max_steps], lengths [B]) — generated ids per row; entries
      past ``lengths[i]`` are padding. The final token of a finished row is
      the eos it stopped on (the reference's predicted list includes it; it
      is filtered later as a special token).
    """
    ids, pad_mask, position_ids = left_pad_batch(seqs, pad_id,
                                                 multiple_of=bucket)
    caps = jnp.asarray(np.asarray(caps, np.int32))

    prefill_embeds = None
    if prefill_embed_fn is not None:
        prefill_embeds, pad_mask, position_ids = prefill_embed_fn(
            ids, pad_mask, position_ids)

    tokens, lengths = _greedy_decode_jit(
        model, params,
        None if prefill_embeds is not None else jnp.asarray(ids),
        prefill_embeds, jnp.asarray(pad_mask), jnp.asarray(position_ids),
        caps, eos_id, max_steps)
    return np.asarray(tokens), np.asarray(lengths)


@functools.partial(jax.jit, static_argnames=("model", "eos_id", "max_steps"))
def _greedy_decode_jit(model, params, prefill_ids, prefill_embeds, pad_mask,
                       position_ids, caps, eos_id: int, max_steps: int):
    B, L = pad_mask.shape
    cfg = model.config
    cache = init_cache(cfg, B, L + max_steps, dtype=jnp.dtype(cfg.dtype))

    logits, _, cache = model.apply(
        {"params": params},
        input_ids=prefill_ids, inputs_embeds=prefill_embeds,
        deterministic=True, position_ids=position_ids,
        pad_mask=pad_mask, cache=cache)
    last_logits = logits[:, -1, :]
    next_pos = position_ids[:, -1] + 1  # per-row next position id

    def cond(state):
        t, _, _, _, done, _, _ = state
        return jnp.logical_and(t < max_steps, ~jnp.all(done))

    def body(state):
        t, last_logits, next_pos, cache, done, count, out = state
        nxt = jnp.argmax(last_logits, axis=-1).astype(jnp.int32)
        emit = jnp.where(done, -1, nxt)
        out = jax.lax.dynamic_update_slice(out, emit[:, None], (0, t))
        count = count + jnp.where(done, 0, 1)
        done = jnp.logical_or(done,
                              jnp.logical_or(nxt == eos_id, count >= caps))
        logits, _, cache = model.apply(
            {"params": params}, input_ids=nxt[:, None],
            deterministic=True, position_ids=next_pos[:, None], cache=cache)
        return (t + 1, logits[:, -1, :], next_pos + 1, cache, done, count, out)

    out0 = jnp.full((B, max_steps), -1, jnp.int32)
    state = (jnp.asarray(0, jnp.int32), last_logits, next_pos, cache,
             jnp.zeros((B,), bool), jnp.zeros((B,), jnp.int32), out0)
    state = jax.lax.while_loop(cond, body, state)
    return state[6], state[5]  # tokens [B, max_steps], counts [B]
