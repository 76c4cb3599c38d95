"""Flax GPT-2 backbone for temporal interaction sequences.

A from-scratch decoder-only transformer matching the architecture the
reference trains from scratch (reference: models/modeling_gpt2.py — pre-LN
blocks, learned positions, gelu_new MLP, scaled dot-product causal
attention, weight-tied LM head), designed TPU-first:

  * fully functional — no mutable state; the KV cache is an explicit pytree
    threaded through calls, so decode steps jit cleanly and batch.
  * static shapes everywhere — the cache is pre-sized, sequence growth is a
    ``dynamic_update_slice`` + mask, not a reshape.
  * compute dtype is configurable (bfloat16 on TPU; f32 accumulation in the
    attention softmax and logits via ``preferred_element_type``).

The model returns ``(logits, hidden)`` like the reference forward returns
``(outputs, hidden_states)`` (reference: models/modeling_rag.py:687) — the
retriever mean-pools ``hidden``.

Parity notes (deliberate reference-quirk reproductions):
  * training attends over right-padding and computes loss on pad positions
    (the reference passes no attention mask and labels == inputs); padding
    masks exist here only for the batched left-padded decode path, where
    they make batched decoding exactly equivalent to the reference's
    one-sample-at-a-time loop.
  * the LM head is weight-tied to ``wte`` (reference ties via
    ``init_weights``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from rag4dyg_tpu.config import ModelConfig

NEG_INF = -1e9


def _dense_init(config: ModelConfig):
    return nn.initializers.normal(stddev=config.initializer_range)


class CausalSelfAttention(nn.Module):
    """Multi-head causal self-attention with optional external KV cache."""

    config: ModelConfig

    @nn.compact
    def __call__(self, x, *, deterministic: bool,
                 pad_mask: Optional[jnp.ndarray] = None,
                 cache_kv: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
                 cache_index: Optional[jnp.ndarray] = None,
                 cache_valid: Optional[jnp.ndarray] = None):
        cfg = self.config
        B, L, D = x.shape
        H, Dh = cfg.n_head, cfg.head_dim

        qkv = nn.Dense(3 * D, kernel_init=_dense_init(cfg), name="c_attn",
                       dtype=x.dtype)(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, L, H, Dh).transpose(0, 2, 1, 3)  # [B,H,L,Dh]
        k = k.reshape(B, L, H, Dh).transpose(0, 2, 1, 3)
        v = v.reshape(B, L, H, Dh).transpose(0, 2, 1, 3)

        # fused Pallas path for the train/encode (no-cache, no-pad-mask)
        # shape — the [L, L] scores never touch HBM and attention dropout
        # is drawn in-kernel (ops/flash_attention.py). The KV-cache decode
        # and masked-prefill shapes keep the XLA form.
        if (cfg.attention_impl == "flash" and cache_kv is None
                and pad_mask is None):
            # local import: ops.__init__ imports ops.decode which imports
            # this module (cache helpers) — module-level would be circular
            from rag4dyg_tpu.ops.flash_attention import flash_attention
            rate = 0.0 if deterministic else cfg.attn_pdrop
            seed = None
            if rate > 0.0:
                seed = jax.random.bits(
                    self.make_rng("dropout"), dtype=jnp.uint32
                ).astype(jnp.int32)
            y = flash_attention(
                q, k, v, scale=1.0 / np.sqrt(Dh), dropout_rate=rate,
                dropout_seed=seed).astype(x.dtype)
            y = y.transpose(0, 2, 1, 3).reshape(B, L, D)
            y = nn.Dense(D, kernel_init=_dense_init(cfg), name="c_proj",
                         dtype=x.dtype)(y)
            y = nn.Dropout(cfg.resid_pdrop)(y, deterministic=deterministic)
            return y, None

        if cache_kv is not None:
            ck, cv = cache_kv  # [B,H,T,Dh] pre-sized
            T = ck.shape[2]
            idx = cache_index  # scalar int32: number of already-cached tokens
            ck = jax.lax.dynamic_update_slice(ck, k.astype(ck.dtype),
                                              (0, 0, idx, 0))
            cv = jax.lax.dynamic_update_slice(cv, v.astype(cv.dtype),
                                              (0, 0, idx, 0))
            keys, values = ck, cv
            new_cache_kv = (ck, cv)
            # fused prefill: an L>1 call with a cache is the decode
            # PREFILL (ops/decode.py populates a fresh cache at index 0,
            # the only L>1-with-cache caller), where causal masking
            # confines attention to the L just-inserted positions — so
            # the [L, L] self-attention runs through the flash kernel
            # with the left-pad prefix of cache_valid as a per-row
            # key-skip count, and only the cache update above touches
            # the pre-sized [B, H, T, Dh] buffers. Deterministic-only
            # (decode always is): keeps eval numerics free of the
            # kernel's alternative dropout stream.
            if (cfg.attention_impl == "flash" and L > 1 and deterministic
                    and L <= 1024):
                # INVARIANT: this branch is only correct for a FRESH
                # cache (idx == 0) — queries attend solely to the L
                # just-inserted keys, so an L>1 apply at idx > 0
                # (chunked prefill, re-prefill after a splice) would
                # silently ignore every previously cached token. idx is
                # traced under jit, so the check fires in eager use; the
                # XLA path below handles idx > 0 correctly if a chunked
                # prefill caller ever appears.
                if not isinstance(idx, jax.core.Tracer) and int(idx) != 0:
                    raise ValueError(
                        "attention_impl='flash' does not support an L>1 "
                        "apply on a partially-filled cache (cache index "
                        f"{int(idx)}); use the XLA attention path")
                from rag4dyg_tpu.ops.flash_attention import flash_attention
                skip = (jnp.zeros((B,), jnp.int32) if cache_valid is None
                        else L - jnp.sum(cache_valid[:, :L], axis=1,
                                         dtype=jnp.int32))
                y = flash_attention(q, k, v, scale=1.0 / np.sqrt(Dh),
                                    key_skip=skip).astype(x.dtype)
                y = y.transpose(0, 2, 1, 3).reshape(B, L, D)
                y = nn.Dense(D, kernel_init=_dense_init(cfg),
                             name="c_proj", dtype=x.dtype)(y)
                y = nn.Dropout(cfg.resid_pdrop)(y,
                                                deterministic=deterministic)
                return y, new_cache_kv
            key_pos = jnp.arange(T)[None, :]                 # [1,T]
            query_pos = idx + jnp.arange(L)[:, None]         # [L,1]
            causal = key_pos <= query_pos                    # [L,T] (bcast)
            mask = causal[None, None]                        # [1,1,L,T]
            if cache_valid is not None:
                mask = jnp.logical_and(mask, cache_valid[:, None, None, :])
        else:
            keys, values = k, v
            new_cache_kv = None
            causal = jnp.tril(jnp.ones((L, L), dtype=bool))
            mask = causal[None, None]
            if pad_mask is not None:
                mask = jnp.logical_and(mask, pad_mask[:, None, None, :])

        scale = 1.0 / np.sqrt(Dh)
        att = jnp.einsum("bhqd,bhkd->bhqk", q, keys,
                         preferred_element_type=jnp.float32) * scale
        att = jnp.where(mask, att, NEG_INF)
        att = jax.nn.softmax(att, axis=-1).astype(x.dtype)
        att = nn.Dropout(cfg.attn_pdrop)(att, deterministic=deterministic)
        y = jnp.einsum("bhqk,bhkd->bhqd", att, values.astype(x.dtype))
        y = y.transpose(0, 2, 1, 3).reshape(B, L, D)
        y = nn.Dense(D, kernel_init=_dense_init(cfg), name="c_proj",
                     dtype=x.dtype)(y)
        y = nn.Dropout(cfg.resid_pdrop)(y, deterministic=deterministic)
        return y, new_cache_kv


class MLP(nn.Module):
    config: ModelConfig

    @nn.compact
    def __call__(self, x, *, deterministic: bool):
        cfg = self.config
        h = nn.Dense(4 * cfg.n_embd, kernel_init=_dense_init(cfg),
                     name="c_fc", dtype=x.dtype)(x)
        h = jax.nn.gelu(h, approximate=True)  # == reference gelu_new
        h = nn.Dense(cfg.n_embd, kernel_init=_dense_init(cfg),
                     name="c_proj", dtype=x.dtype)(h)
        return nn.Dropout(cfg.resid_pdrop)(h, deterministic=deterministic)


class Block(nn.Module):
    """Pre-LN transformer block (reference: models/modeling_gpt2.py:270-290)."""

    config: ModelConfig

    @nn.compact
    def __call__(self, x, *, deterministic: bool, pad_mask=None,
                 cache_kv=None, cache_index=None, cache_valid=None):
        cfg = self.config
        a, new_kv = CausalSelfAttention(cfg, name="attn")(
            nn.LayerNorm(epsilon=cfg.layer_norm_epsilon, name="ln_1")(x),
            deterministic=deterministic, pad_mask=pad_mask,
            cache_kv=cache_kv, cache_index=cache_index,
            cache_valid=cache_valid)
        x = x + a
        m = MLP(cfg, name="mlp")(
            nn.LayerNorm(epsilon=cfg.layer_norm_epsilon, name="ln_2")(x),
            deterministic=deterministic)
        return x + m, new_kv


class GPT2LMModel(nn.Module):
    """GPT-2 with weight-tied LM head.

    Returns ``(logits, hidden, new_cache)``; ``hidden`` is the post-``ln_f``
    hidden state the retriever mean-pools.
    """

    config: ModelConfig

    @nn.compact
    def __call__(self, input_ids: Optional[jnp.ndarray] = None,
                 inputs_embeds: Optional[jnp.ndarray] = None,
                 *, deterministic: bool = True,
                 position_ids: Optional[jnp.ndarray] = None,
                 pad_mask: Optional[jnp.ndarray] = None,
                 cache: Optional[Dict[str, Any]] = None,
                 compute_logits: bool = True):
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)

        wte = self.param("wte", nn.initializers.normal(cfg.initializer_range),
                         (cfg.vocab_size, cfg.n_embd), jnp.float32)
        wpe = self.param("wpe", nn.initializers.normal(cfg.initializer_range),
                         (cfg.n_positions, cfg.n_embd), jnp.float32)

        if inputs_embeds is None:
            inputs_embeds = jnp.take(wte, input_ids, axis=0)
        B, L = inputs_embeds.shape[:2]

        if position_ids is None:
            start = cache["index"] if cache is not None else 0
            position_ids = start + jnp.arange(L)[None, :]
        pos_embeds = jnp.take(wpe, position_ids, axis=0)
        if pos_embeds.ndim == 2:  # shared positions across batch
            pos_embeds = pos_embeds[None]

        h = (inputs_embeds + pos_embeds).astype(dtype)
        h = nn.Dropout(cfg.embd_pdrop)(h, deterministic=deterministic)

        new_cache = None if cache is None else dict(cache)
        cache_valid = None
        if cache is not None:
            # mark the new slots valid (pad_mask marks real vs left-pad slots)
            step_valid = (jnp.ones((B, L), bool) if pad_mask is None
                          else pad_mask.astype(bool))
            valid = jax.lax.dynamic_update_slice(
                cache["valid"], step_valid, (0, cache["index"]))
            new_cache["valid"] = valid
            cache_valid = valid

        for layer in range(cfg.n_layer):
            layer_kv = None
            if cache is not None:
                layer_kv = (cache["k"][layer], cache["v"][layer])
            h, new_kv = Block(cfg, name=f"h_{layer}")(
                h, deterministic=deterministic,
                pad_mask=None if cache is not None else pad_mask,
                cache_kv=layer_kv,
                cache_index=None if cache is None else cache["index"],
                cache_valid=cache_valid)
            if cache is not None:
                new_cache["k"] = new_cache["k"].at[layer].set(new_kv[0])
                new_cache["v"] = new_cache["v"].at[layer].set(new_kv[1])

        h = nn.LayerNorm(epsilon=cfg.layer_norm_epsilon, name="ln_f")(h)
        # encoder-only callers (retriever mean-pooling) skip the [L, V]
        # vocab projection — at 2 layers and wikiv2's V=8791 the tied-head
        # einsum is ~half the forward FLOPs, all discarded
        logits = None
        if compute_logits:
            # the generator stage uses an untied trainable head — the
            # reference's broken-weight-tying quirk (utils/model.py:71-78
            # replaces model.transformer, leaving lm_head.weight the original
            # random tensor, unfrozen); init matches HF _init_weights
            # normal(initializer_range)
            head = wte
            if cfg.untied_lm_head:
                head = self.param(
                    "lm_head", nn.initializers.normal(cfg.initializer_range),
                    (cfg.vocab_size, cfg.n_embd), jnp.float32)
            logits = jnp.einsum("bld,vd->blv", h, head.astype(h.dtype),
                                preferred_element_type=jnp.float32)
        if cache is not None:
            new_cache["index"] = cache["index"] + L
        return logits, h.astype(jnp.float32), new_cache


def init_params(config: ModelConfig, rng: jax.Array,
                example_len: int = 8) -> Dict[str, Any]:
    model = GPT2LMModel(config)
    ids = jnp.zeros((1, example_len), jnp.int32)
    return model.init({"params": rng}, ids)["params"]


def init_cache(config: ModelConfig, batch: int, max_len: int,
               dtype=jnp.float32) -> Dict[str, Any]:
    """Pre-sized KV cache pytree for batched decoding."""
    H, Dh = config.n_head, config.head_dim
    shape = (config.n_layer, batch, H, max_len, Dh)
    return {
        "k": jnp.zeros(shape, dtype),
        "v": jnp.zeros(shape, dtype),
        "valid": jnp.zeros((batch, max_len), bool),
        "index": jnp.asarray(0, jnp.int32),
    }


def load_node_feature_embeddings(params: Dict[str, Any],
                                 node_features: np.ndarray,
                                 num_nodes: int) -> Dict[str, Any]:
    """Overwrite the first ``num_nodes`` wte rows with raw node features,
    zero-padded to n_embd; special-token rows keep their learned init
    (reference: main_SimpleDyG.py:108-120). Returns a new params tree."""
    wte = np.asarray(params["wte"])
    feats = np.asarray(node_features, np.float32)[:num_nodes]
    if feats.shape[1] < wte.shape[1]:
        feats = np.concatenate(
            [feats, np.zeros((feats.shape[0], wte.shape[1] - feats.shape[1]),
                             np.float32)], axis=1)
    new_wte = np.concatenate([feats, wte[feats.shape[0]:]], axis=0)
    out = dict(params)
    out["wte"] = jnp.asarray(new_wte)
    return out


def freeze_backbone_labels(params: Dict[str, Any],
                           trainable_keys: Tuple[str, ...] = ()) -> Dict[str, Any]:
    """Pytree of 'trainable'/'frozen' labels for optax.multi_transform,
    mirroring the reference's transformer freeze
    (reference: utils/model.py:71-78)."""
    def label(path, _):
        top = path[0].key if hasattr(path[0], "key") else str(path[0])
        return "trainable" if top in trainable_keys else "frozen"
    return jax.tree_util.tree_map_with_path(label, params)
