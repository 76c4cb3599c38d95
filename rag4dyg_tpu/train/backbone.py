"""Stage 1: train the SimpleDyG GPT-2 backbone on serialized sequences.

The training protocol mirrors the reference driver
(reference: main_SimpleDyG.py:213-343): AdamW + linear warmup/decay, labels
are the inputs (LM objective over every position, padding included),
gradient clipping at 1.0, one generation-metric validation per epoch with
early stopping on val NDCG@5 (a tie with the best score *saves and resets*
the patience counter — stage-1 semantics differ from the later stages),
best model kept as checkpoint-best plus a rolling checkpoint-last.

TPU-first deltas from the reference: the padded corpus is device-resident
and each epoch runs as ONE jitted lax.scan dispatch gathering its batches
on device (vs one host->device round-trip per batch), and validation
decoding runs the batched KV-cache decoder instead of a per-sample
re-forward loop.
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from rag4dyg_tpu.config import DatasetSpec, ModelConfig
from rag4dyg_tpu.data.serialize import read_corpus_lines
from rag4dyg_tpu.data.vocab import Tokenizer
from rag4dyg_tpu.eval.evaluate import generation_eval
from rag4dyg_tpu.models import GPT2LMModel, init_params
from rag4dyg_tpu.models.gpt2 import load_node_feature_embeddings
from rag4dyg_tpu.train.losses import shift_ce_loss
from rag4dyg_tpu.train.state import (
    linear_warmup_linear_decay,
    make_optimizer,
)
from rag4dyg_tpu.utils.checkpoint import (
    latest_checkpoint,
    load_meta,
    load_opt_state,
    load_params,
    rotate_checkpoints,
    save_checkpoint,
)
from rag4dyg_tpu.utils.logging import RunLogger, append_result_row
from rag4dyg_tpu.utils.profiling import lm_train_flops, mfu
from rag4dyg_tpu.utils.retry import retry_transient

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class StageResult:
    best_epoch: int
    best_val: Dict
    val_metrics: Dict
    test_metrics: Dict
    train_hours: float
    checkpoint_dir: str


def make_lm_train_step(model: GPT2LMModel, optimizer):
    @jax.jit
    def step(params, opt_state, batch, rng):
        def loss_fn(p):
            logits, _, _ = model.apply(
                {"params": p}, batch, deterministic=False,
                rngs={"dropout": rng})
            return shift_ce_loss(logits, batch)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss
    return step


def make_lm_epoch_fn(model: GPT2LMModel, optimizer):
    """Whole-epoch ``lax.scan``: batches gather on device from the
    resident padded corpus, one dispatch per epoch (see the retriever's
    twin for the tunnel-latency rationale)."""
    step = make_lm_train_step(model, optimizer)

    @jax.jit
    def epoch(params, opt_state, corpus_ids, rows_all, rngs, valids):
        # valids marks padding steps (fixed-shape chunking); their
        # updates are discarded so the schedule tracks real steps only
        def body(carry, xs):
            params, opt_state = carry
            rows, rng, valid = xs
            batch = jnp.take(corpus_ids, rows, axis=0)
            new_p, new_o, loss = step(params, opt_state, batch, rng)
            keep = lambda new, old: jax.tree.map(
                lambda a, b: jnp.where(valid, a, b), new, old)
            return ((keep(new_p, params), keep(new_o, opt_state)),
                    jnp.where(valid, loss, 0.0))
        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), (rows_all, rngs, valids))
        return params, opt_state, losses.sum()
    return epoch, step


def build_backbone(spec: DatasetSpec, tokenizer: Tokenizer,
                   rng: jax.Array, *, dtype: str = "float32",
                   attention_impl: str = "xla",
                   node_features: Optional[np.ndarray] = None):
    config = ModelConfig(
        vocab_size=len(tokenizer), n_layer=spec.n_layer, n_head=spec.n_head,
        n_embd=spec.n_embd, dtype=dtype, attention_impl=attention_impl)
    model = GPT2LMModel(config)
    params = init_params(config, rng)
    if node_features is not None:
        params = load_node_feature_embeddings(params, node_features,
                                              tokenizer.vocab_size)
    return model, params


def train_backbone(spec: DatasetSpec, resources_dir: str, out_dir: str, *,
                   epochs: Optional[int] = None, seed: Optional[int] = None,
                   dtype: str = "float32", attention_impl: str = "xla",
                   eval_batch_size: int = 64,
                   node_features: Optional[np.ndarray] = None,
                   max_steps_per_epoch: Optional[int] = None,
                   max_eval_queries: Optional[int] = None,
                   save_every: int = 0, save_total_limit: int = 2,
                   resume: bool = False,
                   stop_after_epoch: Optional[int] = None,
                   mesh=None, accumulate_steps: int = 1,
                   log_every: int = 50) -> StageResult:
    """``save_every`` > 0 writes a rotating checkpoint-step<epoch> (with
    optimizer state) every that many epochs; ``resume`` continues from
    the latest one (reference: --should_continue + --save_total_limit,
    utils/model.py:23-53, main_SimpleDyG.py:382-387)."""
    seed = spec.seed if seed is None else seed
    epochs = spec.epochs if epochs is None else epochs
    base_rng = jax.random.PRNGKey(seed)

    tokenizer = Tokenizer.from_vocab_file(
        os.path.join(resources_dir, "vocab.json"), spec.timestep,
        with_mask_token=False)
    train_lines = read_corpus_lines(
        os.path.join(resources_dir, "train.link_prediction"))
    val_lines = read_corpus_lines(
        os.path.join(resources_dir, "val.link_prediction"))
    val_gt = read_corpus_lines(
        os.path.join(resources_dir, "val_gt.link_prediction"))
    test_lines = read_corpus_lines(
        os.path.join(resources_dir, "test.link_prediction"))
    test_gt = read_corpus_lines(
        os.path.join(resources_dir, "test_gt.link_prediction"))
    if max_eval_queries:  # smoke-mode cap
        val_lines, val_gt = val_lines[:max_eval_queries], val_gt[:max_eval_queries]
        test_lines, test_gt = test_lines[:max_eval_queries], test_gt[:max_eval_queries]

    examples = tokenizer.encode_batch(train_lines, max_len=spec.block_size)

    init_rng = jax.random.fold_in(base_rng, 0)
    model, params = build_backbone(spec, tokenizer, init_rng, dtype=dtype,
                                   attention_impl=attention_impl,
                                   node_features=node_features)

    steps_per_epoch = len(examples) // spec.batch_size
    # with accumulation the schedule advances once per OPTIMIZER step
    # (reference: t_total = len(dataloader) // accumulation * epochs,
    # main_SimpleDyG.py:224-232,173-191)
    updates_per_epoch = max(1, steps_per_epoch // accumulate_steps)
    schedule = linear_warmup_linear_decay(spec.learning_rate, 0,
                                          updates_per_epoch * epochs)
    optimizer = make_optimizer(params, schedule, weight_decay=0.0,
                               accumulate_steps=accumulate_steps)
    if mesh is not None:
        # multi-chip SPMD: params/opt-state sharded per partition specs,
        # batches constrained onto the mesh's data axis inside the scan
        from rag4dyg_tpu.parallel.mesh import make_sharded_lm_epoch_fn
        epoch_fn, params, opt_state = make_sharded_lm_epoch_fn(
            model, optimizer, mesh, params)
    else:
        opt_state = optimizer.init(params)
        epoch_fn, _ = make_lm_epoch_fn(model, optimizer)

    # device-resident padded corpus for on-device batch gathers
    corpus_len = -(-max(len(s) for s in examples) // 64) * 64
    corpus_np = np.full((len(examples), corpus_len), tokenizer.pad_id,
                        np.int32)
    for i, s in enumerate(examples):
        corpus_np[i, : len(s)] = s
    corpus_dev = jnp.asarray(corpus_np)

    node_vocab = tokenizer.node_vocab
    best_score, best_params, best_epoch = None, params, -1
    counter = 0
    start_epoch = 0
    if resume:
        latest = latest_checkpoint(out_dir)
        if latest:
            params = load_params(latest)
            opt_state = load_opt_state(latest, opt_state)
            meta = load_meta(latest)
            start_epoch = meta.get("epoch", -1) + 1
            # early-stop state so a resumed run selects the same best
            # epoch (older step checkpoints lack these keys: best resets,
            # matching the previous resume behavior)
            best_score = meta.get("best_score")
            best_epoch = meta.get("best_epoch", -1)
            counter = meta.get("counter", 0)
            best_params = (load_params(os.path.join(out_dir,
                                                    "checkpoint-best"))
                           if best_epoch >= 0 else params)
            logger.info("resumed from %s at epoch %d (best %d)", latest,
                        start_epoch, best_epoch)
    start = time.time()
    global_step = 0
    runlog = RunLogger(out_dir, "backbone", config=spec)

    B = spec.batch_size
    epoch = start_epoch - 1  # meta value if the loop never runs (resume done)
    for epoch in range(start_epoch, epochs):
        # per-epoch derived rngs so a resumed run replays the same stream
        t_epoch = time.time()
        epoch_rng = jax.random.fold_in(base_rng, 1 + epoch)
        np_rng = np.random.RandomState((seed + 7919 * (epoch + 1)) % 2**31)
        order = np_rng.permutation(len(examples))
        n_full = len(examples) // B  # drop_last=True (reference loader)
        if max_steps_per_epoch:
            n_full = min(n_full, max_steps_per_epoch)
        rows_all = order[: n_full * B].astype(np.int32).reshape(n_full, B)
        rngs = np.asarray(jax.random.split(epoch_rng, n_full))
        # fixed-size scan chunks: one compiled shape, and no multi-minute
        # single dispatch to trip the remote worker watchdog
        MAX_SCAN = 256
        n_chunks = -(-n_full // MAX_SCAN)
        total = n_chunks * MAX_SCAN
        if total > n_full:  # cyclic-pad the masked no-op steps
            rows_all = np.resize(rows_all, (total, rows_all.shape[1]))
            rngs = np.resize(rngs, (total, rngs.shape[1]))
        valid = np.arange(total) < n_full
        epoch_loss = 0.0
        for c in range(n_chunks):
            sl = slice(c * MAX_SCAN, (c + 1) * MAX_SCAN)
            params, opt_state, loss_sum = retry_transient(
                epoch_fn, params, opt_state, corpus_dev,
                jnp.asarray(rows_all[sl]), jnp.asarray(rngs[sl]),
                jnp.asarray(valid[sl]))
            epoch_loss += float(loss_sum)
        n_batches = n_full
        global_step += n_full

        t_train = time.time() - t_epoch
        epoch_flops = lm_train_flops(spec.n_layer, spec.n_embd,
                                     float(n_full) * B * corpus_len,
                                     corpus_len,
                                     vocab_size=len(tokenizer))
        epoch_mfu = mfu(epoch_flops, t_train)
        val_metrics = retry_transient(
            generation_eval, model, params, tokenizer, val_lines, val_gt,
            node_vocab, "val", batch_size=eval_batch_size)
        t_eval = time.time() - t_epoch - t_train
        score = val_metrics["NDCG"]
        logger.info("epoch %d | loss %.4f | val NDCG@5 %.4f jaccard %.4f | "
                    "train %.0fs eval %.0fs | %.1f TFLOPS (MFU %.1f%%)",
                    epoch, epoch_loss / max(1, n_batches), score,
                    val_metrics["jaccard"], t_train, t_eval,
                    epoch_flops / max(t_train, 1e-9) / 1e12, 100 * epoch_mfu)
        runlog.log_scalars(epoch, {"train_loss": epoch_loss / max(1, n_batches),
                                   "val_ndcg5": score,
                                   "val_jaccard": val_metrics["jaccard"],
                                   "train_seconds": round(t_train, 1),
                                   "eval_seconds": round(t_eval, 1),
                                   "train_tflops": round(
                                       epoch_flops / max(t_train, 1e-9)
                                       / 1e12, 2),
                                   "mfu": round(epoch_mfu, 4)})

        # stage-1 early stopping: ties save and reset (main_SimpleDyG.py:306-328)
        if best_score is None or score >= best_score:
            # sharded epochs donate their input buffers — snapshot to host
            best = jax.device_get(params) if mesh is not None else params
            best_score, best_params, best_epoch = score, best, epoch
            counter = 0
            save_checkpoint(os.path.join(out_dir, "checkpoint-best"),
                            best_params, config=model.config,
                            meta={"epoch": epoch, "val_ndcg5": score,
                                  "stage": "backbone", "seed": seed})
        else:
            counter += 1
            if counter >= spec.patience:
                logger.info("early stop at epoch %d (best %d)", epoch,
                            best_epoch)
                break

        if save_every and (epoch + 1) % save_every == 0:
            save_checkpoint(
                os.path.join(out_dir, f"checkpoint-step{epoch}"), params,
                config=model.config, opt_state=opt_state,
                meta={"epoch": epoch, "stage": "backbone", "seed": seed,
                      "best_score": best_score, "best_epoch": best_epoch,
                      "counter": counter})
            rotate_checkpoints(out_dir, save_total_limit)
        if stop_after_epoch is not None and epoch >= stop_after_epoch:
            logger.info("stopping after epoch %d as requested", epoch)
            break

    hours = (time.time() - start) / 3600
    save_checkpoint(os.path.join(out_dir, "checkpoint-last"), params,
                    config=model.config,
                    meta={"epoch": epoch, "stage": "backbone", "seed": seed})

    # final evals retry over a longer horizon than the in-epoch wrapper —
    # a relay outage measured at ~25 min must not lose a finished run
    val_metrics = retry_transient(generation_eval, model, best_params,
                                  tokenizer, val_lines,
                                  val_gt, node_vocab, "val",
                                  batch_size=eval_batch_size,
                                  attempts=8, backoff_s=120.0)
    test_metrics = retry_transient(generation_eval, model, best_params,
                                   tokenizer, test_lines,
                                   test_gt, node_vocab, "test",
                                   batch_size=eval_batch_size,
                                   collect_generations=True,
                                   attempts=8, backoff_s=120.0)
    generations = test_metrics.pop("generations", {})
    # per-query generation dump for manual inspection
    # (reference: utils/Evaluation_SimpleDyG.py:208-209)
    with open(os.path.join(out_dir, "generations_test.json"), "w") as f:
        json.dump(generations, f, indent=1)
    append_result_row(os.path.join(out_dir, "results.csv"),
                      {"stage": "backbone", "dataset": spec.name,
                       "seed": seed, "best_epoch": best_epoch,
                       "hours": round(hours, 4), **{f"val_{k}": v for k, v
                                                    in val_metrics.items()},
                       **{f"test_{k}": v for k, v in test_metrics.items()}})
    runlog.close()
    logger.info("best epoch %d | val %s | test %s", best_epoch, val_metrics,
                test_metrics)
    return StageResult(best_epoch, {"NDCG": best_score}, val_metrics,
                       test_metrics, hours,
                       os.path.join(out_dir, "checkpoint-best"))
