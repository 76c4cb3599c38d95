"""Stage 3: time-aware contrastive retriever.

Protocol mirror of the reference trainer (reference:
train/train_retriever.py): triples of (anchor, positive, hard-negative)
history-only sequences are encoded by the GPT-2 backbone, mean-pooled over
the (padded) sequence axis, and optimized with the time-decayed contrastive
loss plus alpha * info-NCE over two crop/mask augmentation views. Per-epoch
validation embeds the entire train pool and scores queries by rescaled
cosine similarity; early stopping tracks hit@3 (saves only after the
warmup epoch, strictly-greater improves — reference:
train/train_retriever.py:309-327). The best model writes the ranked
{val,test}_{index,score}.gen files the generator consumes.

TPU-first deltas: all three encoder passes and both augmentation passes run
inside one jit-compiled train step, and whole epochs run as a single
lax.scan dispatch over the device-resident padded pool; pool scoring is
the DenseIndex matmul (optionally mesh-sharded) instead of a host loop.
Sequence embeddings default to MASKED mean pooling (real tokens only,
deterministic per line) — the reference's torch.mean over the padded batch
makes embeddings depend on batch composition; set
``RetrieverConfig.pool_mode="padded"`` to reproduce that behavior against
the fixed pool padding.
"""

from __future__ import annotations

import dataclasses
import functools
import logging
import os
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from rag4dyg_tpu.config import DatasetSpec, ModelConfig
from rag4dyg_tpu.data.serialize import read_corpus_lines
from rag4dyg_tpu.data.vocab import Tokenizer
from rag4dyg_tpu.models import GPT2LMModel, init_params
from rag4dyg_tpu.models.augment import augment_views
from rag4dyg_tpu.pool.index import DenseIndex
from rag4dyg_tpu.train.losses import cltime_loss, info_nce_loss
from rag4dyg_tpu.train.state import epoch_cosine_schedule, make_optimizer
from rag4dyg_tpu.utils.checkpoint import (
    latest_checkpoint,
    load_meta,
    load_opt_state,
    load_params,
    restore_rng_state,
    rng_state_meta,
    rotate_checkpoints,
    save_checkpoint,
    transfer_backbone,
)
from rag4dyg_tpu.utils.logging import RunLogger, append_result_row
from rag4dyg_tpu.utils.profiling import StepTimer, lm_train_flops, mfu
from rag4dyg_tpu.utils.retry import retry_transient

logger = logging.getLogger(__name__)


def history_lines(lines: List[str]) -> List[str]:
    """History-only view of corpus lines (text before <|pre|>; reference:
    dataloader/retriever.py:48,75)."""
    return [ln.split("<|pre|>")[0].strip() for ln in lines]


@dataclasses.dataclass
class RetrieverResult:
    best_epoch: int
    val_metrics: Dict
    test_metrics: Dict
    train_hours: float
    checkpoint_dir: str


def mean_pool(h: jnp.ndarray, ids: jnp.ndarray, pad_id: int,
              mode: str) -> jnp.ndarray:
    """Sequence embedding from per-token hidden states. "masked": average
    real tokens only; "padded": average the whole (padded) row
    (reference torch.mean semantics, train/train_retriever.py:183-185)."""
    if mode == "padded":
        return jnp.mean(h, axis=1)
    mask = (ids != pad_id)[..., None].astype(h.dtype)
    return (h * mask).sum(axis=1) / jnp.maximum(mask.sum(axis=1), 1.0)


def _remat_decorator(remat: str):
    """Encoder-pass rematerialization mode.

    - "full": plain ``jax.checkpoint`` — store only pass inputs, recompute
      the whole forward in the backward. Peak activation memory = ONE
      pass, at the cost of one extra forward (~25% of step FLOPs). The
      safe default at wikiv2/reddit scale with the XLA attention path
      (whose [B, H, L, L] score buffers dominate HBM).
    - "dots": ``checkpoint_dots`` policy — store every MXU (dot) output,
      recompute only the cheap elementwise ops (LN, gelu, dropout masks)
      in the backward. Eliminates the remat matmul FLOPs; viable once
      ``attention_impl="flash"`` removes the score buffers from the saved
      set (the pallas call is opaque to the policy, so attention itself
      still recomputes — one fast fused pass).
    - "none": store everything. Smallest compute, largest memory; only
      for small shapes.

    Numerics are identical across modes: saved values are the stored
    originals and recomputed ops are deterministic (threefry dropout
    re-draws from the same keys) — pinned by
    tests/test_retriever_step.py.
    """
    if remat == "full":
        return jax.checkpoint
    if remat == "dots":
        return functools.partial(
            jax.checkpoint,
            policy=jax.checkpoint_policies.checkpoint_dots)
    if remat == "none":
        return lambda f: f
    raise ValueError(f"unknown remat mode {remat!r} "
                     "(expected full|dots|none)")


#: HBM budget for ``--remat dots`` saved-dot buffers. The contrastive
#: step scans five encoder passes; with the ``checkpoint_dots`` policy
#: every pass's stored MXU outputs are live at once between the scan's
#: forward and backward, and at wikiv2 scale (B=128 L=512 x 12 layers)
#: that is tens of GB — the remote XLA compile helper crashes (HTTP 500)
#: before the program could even OOM (RESULTS.md round-2 remat note).
#: 4 GiB leaves headroom for params/optimizer/activations on a 16 GB
#: chip; everything the committed runs use ("full") bypasses the check.
_REMAT_DOTS_BUDGET_BYTES = 4 << 30


def _check_remat_dots_budget(remat: str, *, batch: int, seq_len: int,
                             n_layer: int, n_embd: int, n_head: int,
                             dtype: str, attention_impl: str) -> None:
    """Fail fast when ``--remat dots`` would save more dot outputs than
    the chip can hold (VERDICT r2 "What's missing" #6).

    Estimate per encoder pass, per layer: qkv projection [B,L,3E] +
    attention output projection [B,L,E] + MLP fc [B,L,4E] + MLP proj
    [B,L,E] = 9*B*L*E stored elements, plus the XLA attention path's
    [B,H,L,L] score matmul output (the flash pallas call is opaque to
    the checkpoint policy, so its internals never enter the saved set).
    All five contrastive passes' saved dots are live simultaneously.
    """
    if remat != "dots":
        return
    itemsize = 2 if dtype == "bfloat16" else 4
    per_layer = 9 * batch * seq_len * n_embd
    if attention_impl != "flash":
        per_layer += batch * n_head * seq_len * seq_len
    total = 5 * n_layer * per_layer * itemsize
    if total > _REMAT_DOTS_BUDGET_BYTES:
        raise ValueError(
            f"--remat dots would keep ~{total / (1 << 30):.1f} GiB of saved "
            f"dot outputs live across the five contrastive passes at this "
            f"shape (B={batch}, L={seq_len}, {n_layer} layers, {dtype}, "
            f"attention={attention_impl}) — beyond the "
            f"{_REMAT_DOTS_BUDGET_BYTES / (1 << 30):.0f} GiB budget; the "
            f"remote TPU compiler is known to crash here (RESULTS.md "
            f"round-2 remat note). Use --remat full (the default: one "
            f"pass's activations, ~25% extra forward FLOPs) or shrink the "
            f"batch/sequence length.")


def make_contrastive_loss_fn(model: GPT2LMModel, *, alpha: float,
                             temperature: float, lambda_decay: float,
                             eta: float, gamma: float, mask_token: int,
                             pad_id: int, pool_mode: str, remat: str,
                             constrain=None, neg_pass_scan: bool = True):
    """The shared CLtime + α·info-NCE loss body used by both the
    single-device step and the mesh-sharded step (parallel/mesh.py) —
    one definition so remat modes, scan structure, and loss math can
    never drift apart.

    The five encoder passes are rematerialized per the `remat` mode AND
    run through one lax.scan: checkpointing alone still let XLA overlap
    the five backwards and hold several remat buffers at once (measured
    16.7G > 15.75G HBM at wikiv2 scale, B=128 L=512 bf16); the scan's
    backward is strictly sequential, so peak activation memory is ONE
    pass's. Fresh dropout mask per pass (the reference's five torch
    forwards each draw their own; train/train_retriever.py:177-195).

    ``constrain``: optional fn applied to the stacked [5, B, L] passes —
    the sharded step injects ``with_sharding_constraint`` here.

    Per-role padding: when ``neg`` has a different length than
    ``anchor``/``pos``, the negatives are encoded in their own pass at
    their own length — the reference collate pads each role SEPARATELY
    to its own batch max (dataloader/retriever.py:147-152
    ``pad_sequence`` per role), so short anchors never pay a long
    negative's quadratic attention (at reddit's length mix this is the
    difference between 18.9%% and >30%% MFU). The four same-length
    passes (anchor/pos/aug1/aug2) stay in one sequential-backward scan;
    dropout streams stay keyed by role index (anchor 0, pos 1, neg 2,
    aug 3/4) in both layouts.
    """
    ckpt = _remat_decorator(remat)

    def loss_fn(p, anchor, pos, neg, a_t, p_t, n_t, rng):
        drop_rng, aug_rng = jax.random.split(rng)

        @ckpt
        def encode(ids, pass_rng):
            _, h, _ = model.apply({"params": p}, ids,
                                  deterministic=False,
                                  rngs={"dropout": pass_rng},
                                  compute_logits=False)
            return mean_pool(h, ids, pad_id, pool_mode)

        aug1, aug2 = augment_views(anchor, aug_rng, eta=eta, gamma=gamma,
                                   mask_token=mask_token)
        fold = lambda i: jax.random.fold_in(drop_rng, i)

        if constrain is not None or neg.shape == anchor.shape:
            # joint 5-pass scan (the sharded step's constrain needs the
            # stacked form; also the bit-exact layout of the recorded
            # equal-bucket runs)
            stacked = jnp.stack([anchor, pos, neg, aug1, aug2])  # [5,B,L]
            if constrain is not None:
                stacked = constrain(stacked)
            pass_rngs = jax.vmap(fold)(jnp.arange(5))

            def body(_, xs):
                ids, r = xs
                return None, encode(ids, r)
            _, embs = jax.lax.scan(body, None, (stacked, pass_rngs))
            h_a, h_p, h_n, z1, z2 = embs
        else:
            # split layout: 4-pass scan at the anchor/pos length + one
            # negative pass at its own length. Peak backward memory is
            # two passes (the scan's sequential one + the neg pass);
            # the equal-length path above keeps the single-pass peak.
            stacked = jnp.stack([anchor, pos, aug1, aug2])
            pass_rngs = jax.vmap(fold)(jnp.asarray([0, 1, 3, 4]))

            def body(_, xs):
                ids, r = xs
                return None, encode(ids, r)
            _, embs = jax.lax.scan(body, None, (stacked, pass_rngs))
            h_a, h_p, z1, z2 = embs
            if neg_pass_scan:
                # length-1 scan: numerically the body itself, but
                # compiled as its own while-loop computation — isolates
                # the long neg pass from the surrounding program's
                # layout/schedule choices. Measured on chip (round 5,
                # benchmarks/step_breakdown.py --per-bucket): the
                # inlined lone neg pass ran at ~20 TFLOPS inside the
                # (ba=128, bn=512) program (15.3% step MFU on wikiv2's
                # DOMINANT group) while the identical subgraph in the
                # (256, 512)/(128, 384) programs ran at ~65 TFLOPS.
                _, h_n1 = jax.lax.scan(
                    body, None, (neg[None], fold(2)[None]))
                h_n = h_n1[0]
            else:
                h_n = encode(neg, fold(2))
        cl = cltime_loss(h_a, h_p, h_n, a_t, p_t, n_t,
                         temperature=temperature,
                         decay_rate=lambda_decay)
        aug = alpha * info_nce_loss(z1, z2, temperature)
        return cl + aug, (cl, aug)

    return loss_fn


def make_retriever_train_step(model: GPT2LMModel, optimizer, *, alpha: float,
                              temperature: float, lambda_decay: float,
                              eta: float, gamma: float, mask_token: int,
                              pad_id: int, pool_mode: str = "masked",
                              remat: str = "full",
                              neg_pass_scan: bool = True):
    """The triple batch is gathered ON DEVICE from the resident padded
    pool — each step ships only [B, 3] indices + times to the device
    instead of three [B, L] token arrays (the host->device transfer was
    the wall-clock bottleneck through the remote tunnel)."""
    loss_body = make_contrastive_loss_fn(
        model, alpha=alpha, temperature=temperature,
        lambda_decay=lambda_decay, eta=eta, gamma=gamma,
        mask_token=mask_token, pad_id=pad_id, pool_mode=pool_mode,
        remat=remat, neg_pass_scan=neg_pass_scan)

    @jax.jit
    def step(params, opt_state, pool_ids, idx, a_t, p_t, n_t, rng,
             pool_ids_neg=None):
        # pool_ids_neg: optional second pool view (possibly longer padded
        # length) to gather negatives from — per-role padding like the
        # reference collate (see make_contrastive_loss_fn)
        anchor = jnp.take(pool_ids, idx[:, 0], axis=0)
        pos = jnp.take(pool_ids, idx[:, 1], axis=0)
        neg = jnp.take(pool_ids if pool_ids_neg is None else pool_ids_neg,
                       idx[:, 2], axis=0)

        def loss_fn(p):
            return loss_body(p, anchor, pos, neg, a_t, p_t, n_t, rng)

        (loss, (cl, aug)), grads = jax.value_and_grad(loss_fn,
                                                      has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, cl, aug
    return step


def pad_to_length(examples, pad_id: int, length: int) -> np.ndarray:
    out = np.full((len(examples), length), pad_id, np.int32)
    for i, s in enumerate(examples):
        out[i, : len(s)] = s[:length]
    return out


def make_retriever_epoch_fn(model: GPT2LMModel, optimizer, *, alpha: float,
                            temperature: float, lambda_decay: float,
                            eta: float, gamma: float, mask_token: int,
                            pad_id: int, pool_mode: str = "masked",
                            remat: str = "full",
                            neg_pass_scan: bool = True):
    """Whole-epoch ``lax.scan`` over the step batches: ONE device dispatch
    per epoch (plus one for any remainder batch) instead of one per step —
    through a ~30ms-latency remote tunnel this is the difference between
    seconds and minutes per epoch."""
    step = make_retriever_train_step(
        model, optimizer, alpha=alpha, temperature=temperature,
        lambda_decay=lambda_decay, eta=eta, gamma=gamma,
        mask_token=mask_token, pad_id=pad_id, pool_mode=pool_mode,
        remat=remat, neg_pass_scan=neg_pass_scan)

    @jax.jit
    def epoch(params, opt_state, pool_ids, idx_all, a_t, p_t, n_t, rngs,
              valids, pool_ids_neg=None):
        # idx_all: [S, B, 3]; times [S, B]; rngs [S] keys; valids [S] —
        # False marks padding steps (chunks are padded to a fixed length
        # so every dispatch reuses one compiled shape); their updates are
        # discarded, so the optimizer step count tracks real steps only.
        # pool_ids_neg: optional separate (longer) view for negatives.
        def body(carry, xs):
            params, opt_state = carry
            idx, at, pt, nt, rng, valid = xs
            # nested jit inlines under the outer trace
            new_p, new_o, loss, _, _ = step(
                params, opt_state, pool_ids, idx, at, pt, nt, rng,
                pool_ids_neg=pool_ids_neg)
            keep = lambda new, old: jax.tree.map(
                lambda a, b: jnp.where(valid, a, b), new, old)
            return ((keep(new_p, params), keep(new_o, opt_state)),
                    jnp.where(valid, loss, 0.0))
        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), (idx_all, a_t, p_t, n_t, rngs,
                                        valids))
        return params, opt_state, losses.sum()
    return epoch, step


def make_corpus_encoder(model: GPT2LMModel, pad_id: int,
                        pool_mode: str = "masked"):
    """Persistent jitted scan-encoder: params x [C, B, L] -> [C, B, D].
    Build ONCE per run and thread through ``embed_corpus`` so repeated
    evals reuse the jit instance instead of retracing every call."""
    @jax.jit
    def encode_jit(params, ids3):
        def body(_, ids):
            _, h, _ = model.apply({"params": params}, ids,
                                  deterministic=True, compute_logits=False)
            return None, mean_pool(h, ids, pad_id, pool_mode)
        _, embs = jax.lax.scan(body, None, ids3)
        return embs  # [C, B, D]

    def encode_all(params, ids3):
        return encode_jit(params, ids3)
    encode_all.pool_mode = pool_mode
    encode_all.pad_id = pad_id
    return encode_all


def embed_corpus(model: GPT2LMModel, params, tokenizer: Tokenizer,
                 lines: Optional[List[str]] = None, *,
                 ids_array: Optional[jnp.ndarray] = None,
                 block_size: int = 512, length: Optional[int] = None,
                 batch_size: int = 64, bucket: int = 64,
                 pool_mode: str = "masked", encode_all=None) -> np.ndarray:
    """Mean-pooled hidden-state embeddings for (history) lines.

    Pass ``ids_array`` (a device-resident padded [N, L] id matrix) to
    skip tokenization and host->device transfer entirely; otherwise
    ``lines`` are tokenized and padded (to ``length`` if given, else one
    shared bucket rounded up from the longest line).

    The whole corpus goes through ONE jitted ``lax.scan`` over fixed-size
    row chunks — a single device dispatch — instead of one dispatch per
    batch: through the remote relay a dispatch costs seconds, and the
    per-batch loop made pool embedding the dominant eval cost. With
    ``pool_mode='padded'`` the mean divides by this call's padded length
    (the reference divides by each torch batch's max — same class of
    batch-shape dependence, documented)."""
    if encode_all is None:
        encode_all = make_corpus_encoder(model, tokenizer.pad_id, pool_mode)
    else:
        # a pre-built encoder bakes in its pool_mode/pad_id; a silent
        # mismatch would produce wrong embeddings with no error (raise,
        # not assert: the guard must survive python -O)
        enc_mode = getattr(encode_all, "pool_mode", pool_mode)
        if enc_mode != pool_mode:
            raise ValueError(f"encoder pooled {enc_mode!r}, caller asked "
                             f"{pool_mode!r}")
        enc_pad = getattr(encode_all, "pad_id", tokenizer.pad_id)
        if enc_pad != tokenizer.pad_id:
            raise ValueError(f"encoder pad_id {enc_pad} != tokenizer "
                             f"pad_id {tokenizer.pad_id}")

    if ids_array is None:
        # left-truncate (reference truncation side) to the fixed length
        # when one is forced, so pad_to_length never right-truncates
        examples = tokenizer.encode_batch(
            lines, max_len=block_size if length is None else min(block_size,
                                                                 length))
        L = length or max(1, -(-max((len(s) for s in examples), default=1)
                               // bucket) * bucket)
        ids_array = jnp.asarray(pad_to_length(examples, tokenizer.pad_id, L))

    n, L = ids_array.shape
    C = -(-n // batch_size)
    pad = C * batch_size - n
    if pad:
        ids_array = jnp.concatenate(
            [ids_array,
             jnp.full((pad, L), tokenizer.pad_id, ids_array.dtype)])
    embs = encode_all(params, ids_array.reshape(C, batch_size, L))
    return np.asarray(embs).reshape(C * batch_size, -1)[:n]


def score_pool(model: GPT2LMModel, params, tokenizer: Tokenizer,
               query_lines: List[str], index: DenseIndex, *,
               block_size: int = 512, length: Optional[int] = None,
               batch_size: int = 32, pool_mode: str = "masked",
               encode_all=None) -> np.ndarray:
    """[n_queries, n_pool] rescaled-cosine scores."""
    q = embed_corpus(model, params, tokenizer, query_lines,
                     block_size=block_size, length=length,
                     batch_size=batch_size, pool_mode=pool_mode,
                     encode_all=encode_all)
    return np.asarray(index.score(q))


def gt_top3_rows(gt_scores: np.ndarray) -> np.ndarray:
    """Per-query gt top-3 pool rows, ``np.argsort(-g)[:3]`` with numpy's
    default introsort tie order — EXACTLY the reference's gt selection
    (train/train_retriever.py:460-462). Jaccard gt matrices are full of
    exact ties, so the (arbitrary but deterministic) introsort order is
    part of the recorded metric; computed once per run since the gt
    matrices never change across epochs."""
    return np.argsort(-gt_scores, axis=1)[:, :3]


def hits_from_top3(pred_top3: np.ndarray, gt_top3: np.ndarray,
                   batch_size: int = 32) -> Dict[str, float]:
    """hit@1/hit@3 from per-query top-3 predictions with the reference's
    per-batch averaging (reference: train/train_retriever.py:458-479 —
    each eval batch contributes the mean of its rows, so a smaller final
    batch weighs its queries more)."""
    hit1 = (pred_top3[:, :1, None] == gt_top3[:, None, :]).any((1, 2))
    hit3 = (pred_top3[:, :, None] == gt_top3[:, None, :]).any((1, 2))
    h1, h3, nb = 0.0, 0.0, 0
    for s in range(0, pred_top3.shape[0], batch_size):
        h1 += float(hit1[s:s + batch_size].mean())
        h3 += float(hit3[s:s + batch_size].mean())
        nb += 1
    return {"hit@1": round(h1 / max(1, nb), 4),
            "hit@3": round(h3 / max(1, nb), 4)}


def retrieval_metrics(pred_scores: np.ndarray, gt_scores: np.ndarray,
                      batch_size: int = 32) -> Dict[str, float]:
    """hit@1/hit@3 from a dense [Q, N] score matrix (host fallback /
    test oracle; production eval goes through ``hits_from_top3`` fed by
    ``DenseIndex.topk_device`` so only [Q, 3] leaves the device). Pred
    ties canonicalized to lowest-index-first like the device path."""
    pred_top3 = np.argsort(-pred_scores, axis=1, kind="stable")[:, :3]
    return hits_from_top3(pred_top3, gt_top3_rows(gt_scores),
                          batch_size=batch_size)


def write_gen_files(scores: np.ndarray, out_dir: str, split: str,
                    ranks: Optional[np.ndarray] = None) -> None:
    """Ranked index/score files for the generator
    (reference: train/train_retriever.py:357-368 — index rows are the
    full descending ranking, score rows are the raw scores in POOL order
    at '%.4f'). ``ranks`` (int32 [Q, N], from ``DenseIndex.rank_full``)
    skips the host argsort; without it the host sorts with stable ties —
    the same canonical order as the device path."""
    os.makedirs(out_dir, exist_ok=True)
    idx = (np.argsort(-scores, axis=1, kind="stable") if ranks is None
           else ranks)
    with open(os.path.join(out_dir, f"{split}_index.gen"), "w") as f, \
         open(os.path.join(out_dir, f"{split}_score.gen"), "w") as g:
        for i in range(scores.shape[0]):
            f.write(" ".join(str(x) for x in idx[i]) + "\n")
            g.write(" ".join(f"{x:.4f}" for x in scores[i]) + "\n")


def write_gen_files_topk(topk_scores: np.ndarray, topk_indices: np.ndarray,
                         out_dir: str, split: str) -> None:
    """Top-k .gen emission for mesh-sharded pools (VERDICT r4 #3).

    Format delta vs the reference (documented in PARITY.md): index rows
    hold only the top-k ranking (the generator reads just the top
    ``top_k``=7 of them — reference dataloader/generator.py:29-44), and
    score rows hold the scores OF THOSE k entries in rank order rather
    than all N pool-order scores ('%.4f' like the reference,
    train/train_retriever.py:444-456) — a 1M-wide pool-order score row
    is exactly the artifact a sharded pool exists to avoid. Rankings
    come from ``DenseIndex.topk`` whose sharded merge keeps the same
    canonical tie order (score desc, pool index asc) at every shard
    count."""
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, f"{split}_index.gen"), "w") as f, \
         open(os.path.join(out_dir, f"{split}_score.gen"), "w") as g:
        for i in range(topk_indices.shape[0]):
            f.write(" ".join(str(int(x)) for x in topk_indices[i]) + "\n")
            g.write(" ".join(f"{x:.4f}" for x in topk_scores[i]) + "\n")


def load_pairs(path: str) -> np.ndarray:
    with open(path) as f:
        rows = [list(map(int, ln.split())) for ln in f.read().splitlines()
                if ln.strip()]
    return np.asarray(rows, np.int64)


def load_score_matrix(path: str) -> np.ndarray:
    with open(path) as f:
        rows = [list(map(float, ln.split())) for ln in f.read().splitlines()
                if ln.strip()]
    return np.asarray(rows, np.float64)


def train_retriever(spec: DatasetSpec, resources_dir: str, out_dir: str, *,
                    backbone_ckpt: Optional[str] = None,
                    query_times: Optional[np.ndarray] = None,
                    epochs: Optional[int] = None,
                    seed: Optional[int] = None, dtype: str = "float32",
                    attention_impl: str = "xla", remat: str = "full",
                    eval_batch_size: int = 32, accumulate_steps: int = 1,
                    chunk_ladder: Optional[bool] = None,
                    max_steps_per_epoch: Optional[int] = None,
                    max_eval_queries: Optional[int] = None,
                    gen_out_dir: Optional[str] = None,
                    save_every: int = 0, save_total_limit: int = 2,
                    resume: bool = False,
                    stop_after_epoch: Optional[int] = None
                    ) -> RetrieverResult:
    """``save_every`` > 0 writes a rotating checkpoint-step<epoch> (params
    + optimizer state + RNG/early-stop state) every that many epochs;
    ``resume`` continues bit-exactly from the latest one — the resumed run
    produces the same best epoch, metrics and .gen files as an
    uninterrupted run (tests/test_resume.py). Mirrors the reference's
    --should_continue/--save_total_limit (utils/model.py:23-53)."""
    rcfg = spec.retriever
    seed = rcfg.seed if seed is None else seed
    epochs = rcfg.epochs if epochs is None else epochs
    rng = jax.random.PRNGKey(seed)
    np_rng = np.random.RandomState(seed)

    tokenizer = Tokenizer.from_vocab_file(
        os.path.join(resources_dir, "vocab.json"), spec.timestep,
        with_mask_token=True)

    train_lines = read_corpus_lines(
        os.path.join(resources_dir, "train.link_prediction"))
    pool_lines = history_lines(train_lines)
    pool_examples = tokenizer.encode_batch(pool_lines, max_len=spec.block_size)

    pairs = load_pairs(os.path.join(resources_dir, "train_retrieval",
                                    "train_index.retrieval"))
    val_lines = read_corpus_lines(
        os.path.join(resources_dir, "val.link_prediction"))
    test_lines = read_corpus_lines(
        os.path.join(resources_dir, "test.link_prediction"))
    val_gt = load_score_matrix(os.path.join(resources_dir, "train_retrieval",
                                            "val_score.retrieval"))
    test_gt = load_score_matrix(os.path.join(resources_dir, "train_retrieval",
                                             "test_score.retrieval"))
    if max_eval_queries:  # smoke-mode cap
        val_lines, val_gt = val_lines[:max_eval_queries], val_gt[:max_eval_queries]
        test_lines, test_gt = test_lines[:max_eval_queries], test_gt[:max_eval_queries]

    if query_times is None:
        qt_path = os.path.join(resources_dir, "train_query_time.npy")
        query_times = np.load(qt_path)
    query_times = np.asarray(query_times, np.float32)
    assert len(query_times) == len(train_lines)

    config = ModelConfig(vocab_size=len(tokenizer), n_layer=rcfg.n_layer,
                         n_head=rcfg.n_head, n_embd=rcfg.n_embd, dtype=dtype,
                         attention_impl=attention_impl,
                         eta=rcfg.eta, gamma=rcfg.gamma)
    _check_remat_dots_budget(remat, batch=rcfg.batch_size,
                             seq_len=spec.block_size, n_layer=rcfg.n_layer,
                             n_embd=rcfg.n_embd, n_head=rcfg.n_head,
                             dtype=dtype, attention_impl=attention_impl)
    model = GPT2LMModel(config)
    rng, init_rng = jax.random.split(rng)
    params = init_params(config, init_rng)
    if backbone_ckpt is not None and rcfg.init_from_backbone:
        params = transfer_backbone(params, load_params(backbone_ckpt))

    steps_per_epoch = max(1, int(np.ceil(len(pairs) / rcfg.batch_size)))
    # schedule advances per optimizer update (= per accumulate_steps
    # micro-batches; reference gradient accumulation:
    # train/train_retriever.py:202-221)
    schedule = epoch_cosine_schedule(
        rcfg.learning_rate, rcfg.warmup_epochs, epochs,
        max(1, steps_per_epoch // accumulate_steps))
    optimizer = make_optimizer(params, schedule,
                               weight_decay=rcfg.weight_decay,
                               accumulate_steps=accumulate_steps)
    opt_state = optimizer.init(params)
    # the reference masks token vocab_size-1, which after the [MASK] resize
    # IS the mask token id (modeling_rag.py:790)
    epoch_fn, train_step = make_retriever_epoch_fn(
        model, optimizer, alpha=rcfg.alpha, temperature=rcfg.temperature,
        lambda_decay=rcfg.lambda_decay, eta=rcfg.eta, gamma=rcfg.gamma,
        mask_token=len(tokenizer) - 1, pad_id=tokenizer.pad_id,
        pool_mode=rcfg.pool_mode, remat=remat)

    gen_out_dir = gen_out_dir or os.path.join(out_dir, "retrieval_result")

    # device-resident padded pool: per-step transfers shrink to [B, 3]
    # indices and the per-epoch pool embedding never re-uploads tokens.
    # Length-bucketed views (128-multiples) keep compute proportional to
    # real sequence length — e.g. reddit's pool is p50=8 tokens with a
    # 512-token tail, and flat-512 padding wastes ~16x FLOPs and
    # overflows HBM with [B, H, 512, 512] attention activations.
    pool_len = min(spec.block_size,
                   -(-max(len(s) for s in pool_examples) // 64) * 64)
    pool_dev = jnp.asarray(pad_to_length(pool_examples, tokenizer.pad_id,
                                         pool_len))
    LB = 128
    pool_lens_np = np.minimum(
        np.array([max(1, len(s)) for s in pool_examples]), pool_len)
    line_bucket = np.minimum(-(-pool_lens_np // LB) * LB, pool_len)
    buckets = sorted(set(line_bucket.tolist()))
    pool_views = {b: pool_dev[:, :b] for b in buckets}
    # per-bucket row sets and gathered id blocks are fixed for the whole
    # run — gather ONCE, not per eval (each device op costs a relay
    # round-trip)
    bucket_rows = {b: np.where(line_bucket == b)[0] for b in buckets}
    bucket_pool_ids = {
        b: jnp.take(pool_views[b], jnp.asarray(bucket_rows[b]), axis=0)
        for b in buckets}

    corpus_encoder = make_corpus_encoder(model, tokenizer.pad_id,
                                         rcfg.pool_mode)

    # gt matrices are fixed across epochs: their reference-order top-3
    # (introsort ties, see gt_top3_rows) is computed exactly once
    gt3 = {"val": gt_top3_rows(val_gt), "test": gt_top3_rows(test_gt)}

    def evaluate(params, split: str, write_best: bool) -> Dict:
        lines = val_lines if split == "val" else test_lines
        # bucketed pool embedding (masked mean is padding-invariant, so
        # bucketing is exact; 'padded' mode becomes bucket-dependent the
        # way the reference was batch-dependent)
        t0 = time.time()
        pool_emb = None
        for b in buckets:
            rows = bucket_rows[b]
            emb = embed_corpus(model, params, tokenizer,
                               ids_array=bucket_pool_ids[b],
                               pool_mode=rcfg.pool_mode,
                               encode_all=corpus_encoder)
            if pool_emb is None:
                pool_emb = np.zeros((len(pool_examples), emb.shape[1]),
                                    np.float32)
            pool_emb[rows] = emb
        t1 = time.time()
        index = DenseIndex(pool_emb)
        q_emb = embed_corpus(model, params, tokenizer, lines,
                             block_size=spec.block_size,
                             batch_size=eval_batch_size,
                             pool_mode=rcfg.pool_mode,
                             encode_all=corpus_encoder)
        # per-epoch metrics download only [Q, 3] top-k indices (fused
        # Pallas kernel on chip / lax.top_k elsewhere) — the full [Q, N]
        # score matrix crosses the relay ONLY for the best-epoch .gen
        # write (the score file needs every pool-order score; the index
        # file's ranking is computed on device, VERDICT r2 #4)
        _, pred3 = index.topk(q_emb, 3)
        t2 = time.time()
        if write_best:
            # The score .gen file needs every pool-order score, so the
            # [Q, N] f32 matrix must cross the relay regardless; the
            # host stable argsort of those same scores is bit-identical
            # to DenseIndex.rank_full (tests/test_eval_ranking.py), so
            # downloading the [Q, N] int32 rank matrix too would double
            # the dominant device->host transfer for nothing.
            scores = np.asarray(index.score(q_emb))
            write_gen_files(scores, gen_out_dir, split, ranks=None)
        out = hits_from_top3(pred3, gt3[split], batch_size=eval_batch_size)
        logger.info("eval[%s]: pool-embed %.0fs score+top3 %.0fs rest %.0fs",
                    split, t1 - t0, t2 - t1, time.time() - t2)
        return out

    best_score, best_params, best_epoch, counter = None, params, -1, 0
    start_epoch = 0
    if resume:
        latest = latest_checkpoint(out_dir)
        if latest:
            params = load_params(latest)
            opt_state = load_opt_state(latest, opt_state)
            meta = load_meta(latest)
            start_epoch = meta.get("epoch", -1) + 1
            rng, np_rng = restore_rng_state(meta)
            best_score = meta.get("best_score")
            best_epoch = meta.get("best_epoch", -1)
            counter = meta.get("counter", 0)
            best_params = (load_params(os.path.join(out_dir,
                                                    "checkpoint-best"))
                           if best_epoch >= 0 else params)
            logger.info("resumed from %s at epoch %d (best %d)", latest,
                        start_epoch, best_epoch)
    last_params = params
    start = time.time()
    runlog = RunLogger(out_dir, "retriever", config=rcfg)

    n_pairs = len(pairs)
    B = rcfg.batch_size
    # cap the steps per scan dispatch: the remote worker kills dispatches
    # running longer than ~100 s ("TPU worker process crashed or
    # restarted"). At ~0.7 s/step worst case (L=512, B=128) a 32-step
    # chunk stays ~4x under the cap; relay round-trips cost seconds, so
    # bigger chunks directly cut epoch wall-clock. Step cost under the
    # per-role split is 4 passes at the anchor bucket + 1 at the neg
    # bucket, so the cap scales with that mix, and small groups round up
    # to a power of two instead of the full cap (bounded compiled shapes,
    # <50% masked-step waste even with many (ba, bn) groups).
    def chunk_steps(ba: int, bn: int, group: int) -> int:
        ch = max(32, int(128 * (5 * LB) / (4 * ba + bn)))
        if group < ch:
            ch = max(8, 1 << (group - 1).bit_length())
        return ch

    def chunk_plan(n: int, ch: int) -> list:
        """Dispatch sizes covering ``n`` steps under ``--chunk-ladder``:
        full cap-sized chunks, then a descending power-of-two remainder
        ladder (min 8). Numerics are bit-identical to the single-size
        plan — masked no-op padding steps are exact no-ops either way
        (tests/test_retriever_step.py) — but padding waste per bucket
        group drops from up-to-`ch-1` full-cost steps to <8, at the
        price of ≤log2(ch) extra compiled shapes per group. Measured at
        the wikiv2 shape (RESULTS.md "Retriever MFU accounting"): step
        padding 12.2% → 2.2% (~9% of epoch FLOPs recovered), vs
        ~15-20 min of one-time extra compiles — opt-in for long runs."""
        sizes = [ch] * (n // ch)
        rem = n - ch * len(sizes)
        while rem >= 8:
            p = 1 << (rem.bit_length() - 1)   # largest pow2 <= rem
            sizes.append(min(p, ch))
            rem -= sizes[-1]
        if rem:
            sizes.append(8)                    # final, partially masked
        return sizes

    if chunk_ladder is None:
        # Auto-enable (VERDICT r4 #5): simulate one epoch's bucket-group
        # composition on a DECISION-ONLY rng (the training streams must
        # stay untouched — recorded runs replay bit-exactly) and predict
        # the flat plan's FLOP-weighted padding; ladder on when > 5%.
        # The ladder itself is numerics-identical either way
        # (tests/test_retriever_step.py); the only cost is one-time
        # extra shape compiles, disk-cached after the first run.
        sim = np.random.RandomState((seed or 0) ^ 0x5EED)
        order = sim.permutation(n_pairs)
        sim_full = n_pairs // B
        if max_steps_per_epoch:
            sim_full = min(sim_full, max_steps_per_epoch)
        pad_cost = tot_cost = 0.0
        if sim_full:
            sim_idx = pairs[order[: sim_full * B]].astype(np.int32)
            sim_idx = sim_idx.reshape(sim_full, B, 3)
            b_ap = line_bucket[sim_idx[:, :, :2]].max(axis=(1, 2))
            b_ng = line_bucket[sim_idx[:, :, 2]].max(axis=1)
            for ba, bn in sorted(set(zip(b_ap.tolist(), b_ng.tolist()))):
                n_sel = int(((b_ap == ba) & (b_ng == bn)).sum())
                ch = chunk_steps(ba, bn, n_sel)
                step_cost = 4 * ba + bn       # per-step encoder passes
                pad_cost += (-(-n_sel // ch) * ch - n_sel) * step_cost
                tot_cost += n_sel * step_cost
        frac = pad_cost / max(tot_cost, 1.0)
        chunk_ladder = frac > 0.05
        logger.info("chunk-ladder auto: predicted flat-plan FLOP padding "
                    "%.1f%% -> %s", 100 * frac,
                    "ladder" if chunk_ladder else "flat")
    dispatch_timer = StepTimer()
    for epoch in range(start_epoch, epochs):
        t_epoch = time.time()
        order = np_rng.permutation(n_pairs)
        epoch_loss, nb = 0.0, 0
        epoch_flops = 0.0
        n_full = n_pairs // B
        if max_steps_per_epoch:
            n_full = min(n_full, max_steps_per_epoch)
        if n_full:
            idx_all = pairs[order[: n_full * B]].astype(np.int32)
            idx_all = idx_all.reshape(n_full, B, 3)
            # per-batch, PER-ROLE pad buckets (the reference collate pads
            # each of anchor/pos/neg to its own batch max —
            # dataloader/retriever.py:147-152 pad_sequence per role):
            # anchor/pos/aug share one bucket, negatives get their own, so
            # a batch of short anchors never pays a long negative's
            # quadratic attention (reddit: p50=8-token pool, 512-token
            # tail). Batches stay randomly composed.
            bucket_ap = line_bucket[idx_all[:, :, :2]].max(axis=(1, 2))
            bucket_ng = line_bucket[idx_all[:, :, 2]].max(axis=1)
            times = query_times[idx_all]                  # [S, B, 3]
            rng, epoch_rng = jax.random.split(rng)
            rngs = np.asarray(jax.random.split(epoch_rng, n_full))
            groups = sorted(set(zip(bucket_ap.tolist(), bucket_ng.tolist())))
            for ba, bn in groups:
                sel = np.where((bucket_ap == ba) & (bucket_ng == bn))[0]
                # pad to a multiple of the group's chunk size with masked
                # no-op steps so every dispatch reuses one compiled shape
                # (or, under --chunk-ladder, cover the tail with a
                # power-of-two remainder ladder: same numerics, <8 padded
                # steps per group instead of up-to-CH)
                CH = chunk_steps(ba, bn, len(sel))
                sizes = (chunk_plan(len(sel), CH) if chunk_ladder
                         else [CH] * (-(-len(sel) // CH)))
                total = sum(sizes)
                padded = np.zeros(total, np.int64)
                padded[: len(sel)] = sel
                valid = np.zeros(total, bool)
                valid[: len(sel)] = True
                neg_view = None if bn == ba else pool_views[bn]
                off = 0
                for sz in sizes:
                    sl = padded[off:off + sz]
                    vl = valid[off:off + sz]
                    off += sz
                    with dispatch_timer.step():
                        params, opt_state, loss_sum = retry_transient(
                            epoch_fn, params, opt_state, pool_views[ba],
                            jnp.asarray(idx_all[sl]),
                            jnp.asarray(times[sl, :, 0]),
                            jnp.asarray(times[sl, :, 1]),
                            jnp.asarray(times[sl, :, 2]),
                            jnp.asarray(rngs[sl]), jnp.asarray(vl),
                            pool_ids_neg=neg_view)
                        epoch_loss += float(loss_sum)
                    nb += int(vl.sum())
                    # 4 anchor-bucket passes + 1 neg-bucket pass per step;
                    # the full-remat mode pays one extra forward
                    nv = float(vl.sum()) * B
                    epoch_flops += lm_train_flops(
                        rcfg.n_layer, rcfg.n_embd, nv * ba * 4, ba,
                        remat=(remat == "full"))
                    epoch_flops += lm_train_flops(
                        rcfg.n_layer, rcfg.n_embd, nv * bn, bn,
                        remat=(remat == "full"))
        rem = pairs[order[n_full * B:]].astype(np.int32)
        if len(rem) and not max_steps_per_epoch:  # drop_last=False tail
            ba = int(line_bucket[rem[:, :2]].max())
            bn = int(line_bucket[rem[:, 2]].max())
            rng, step_rng = jax.random.split(rng)
            params, opt_state, loss, _, _ = retry_transient(
                train_step, params, opt_state, pool_views[ba],
                jnp.asarray(rem),
                jnp.asarray(query_times[rem[:, 0]]),
                jnp.asarray(query_times[rem[:, 1]]),
                jnp.asarray(query_times[rem[:, 2]]), step_rng,
                pool_ids_neg=None if bn == ba else pool_views[bn])
            epoch_loss += float(loss)
            nb += 1

        t_train = time.time() - t_epoch
        val_metrics = retry_transient(evaluate, params, "val",
                                       write_best=False)
        t_eval = time.time() - t_epoch - t_train
        score = val_metrics["hit@3"]
        epoch_mfu = mfu(epoch_flops, t_train)
        logger.info("epoch %d | loss %.4f | val hit@3 %.4f | "
                    "train %.0fs eval %.0fs | %.1f TFLOPS (MFU %.1f%%)",
                    epoch, epoch_loss / max(1, nb), score, t_train, t_eval,
                    epoch_flops / max(t_train, 1e-9) / 1e12,
                    100 * epoch_mfu)
        runlog.log_scalars(epoch, {"train_loss": epoch_loss / max(1, nb),
                                   "val_hit1": val_metrics["hit@1"],
                                   "val_hit3": score,
                                   "train_seconds": round(t_train, 1),
                                   "eval_seconds": round(t_eval, 1),
                                   "train_tflops": round(
                                       epoch_flops / max(t_train, 1e-9)
                                       / 1e12, 2),
                                   "mfu": round(epoch_mfu, 4)})

        last_params = params
        if epoch > rcfg.warmup_epochs:  # reference skips epoch<=warmup
            if best_score is None or score > best_score:
                best_score, best_params, best_epoch, counter = (
                    score, params, epoch, 0)
                save_checkpoint(os.path.join(out_dir, "checkpoint-best"),
                                best_params, config=config,
                                meta={"epoch": epoch, "val_hit3": score,
                                      "stage": "retriever", "seed": seed})
            else:
                counter += 1
                if counter >= rcfg.patience:
                    logger.info("early stop at epoch %d", epoch)
                    break

        if save_every and (epoch + 1) % save_every == 0:
            save_checkpoint(
                os.path.join(out_dir, f"checkpoint-step{epoch}"), params,
                config=config, opt_state=opt_state,
                meta={"epoch": epoch, "stage": "retriever", "seed": seed,
                      "best_score": best_score, "best_epoch": best_epoch,
                      "counter": counter, **rng_state_meta(rng, np_rng)})
            rotate_checkpoints(out_dir, save_total_limit)
        if stop_after_epoch is not None and epoch >= stop_after_epoch:
            logger.info("stopping after epoch %d as requested", epoch)
            break

    hours = (time.time() - start) / 3600
    ds = dispatch_timer.summary()
    if ds.get("steps"):
        logger.info("train dispatches: %d | p50 %.0f ms | p90 %.0f ms",
                    ds["steps"], ds["p50_ms"], ds["p90_ms"])
    if best_epoch < 0:  # fewer epochs than warmup: fall back to last
        best_params, best_epoch = last_params, epochs - 1
    save_checkpoint(os.path.join(out_dir, "checkpoint-last"), last_params,
                    config=config, meta={"stage": "retriever", "seed": seed})

    # final evals retry over a longer horizon than the in-epoch wrapper —
    # a relay outage measured at ~25 min must not lose a finished run
    test_metrics = retry_transient(evaluate, best_params, "test",
                                   write_best=True,
                                   attempts=8, backoff_s=120.0)
    val_metrics = retry_transient(evaluate, best_params, "val",
                                  write_best=True,
                                  attempts=8, backoff_s=120.0)
    # the reference's final pass tests checkpoint-last alongside best
    # (reference: train/train_retriever.py:338-352)
    last_test = retry_transient(evaluate, last_params, "test",
                                write_best=False,
                                attempts=8, backoff_s=120.0)
    append_result_row(os.path.join(out_dir, "results.csv"),
                      {"stage": "retriever", "dataset": spec.name,
                       "seed": seed, "best_epoch": best_epoch,
                       "hours": round(hours, 4),
                       **{f"val_{k}": v for k, v in val_metrics.items()},
                       **{f"test_{k}": v for k, v in test_metrics.items()},
                       **{f"last_test_{k}": v for k, v in last_test.items()}})
    runlog.close()
    logger.info("best epoch %d | val %s | test %s", best_epoch, val_metrics,
                test_metrics)
    return RetrieverResult(best_epoch, val_metrics, test_metrics, hours,
                           os.path.join(out_dir, "checkpoint-best"))
