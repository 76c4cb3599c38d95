"""Configuration system: model hyperparameters and the per-dataset registry.

The reference keeps per-dataset hyperparameters scattered across shell
launchers (reference: scripts/SimpleDyG/train_*.sh,
scripts/train_retriever/train_retriever_*.sh,
scripts/train_generator/train_rag_graphpooling_*_seed.sh) and argparse
defaults (reference: utils/args_parser_*.py). Here they live in one typed
registry so every stage of the pipeline reads the same source of truth.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """GPT-2 backbone hyperparameters.

    Mirrors the knobs of the reference GPT2Config
    (reference: models/configuration_gpt2.py:120-162) that the drivers
    actually override (n_layer/n_head/n_embd), with TPU-specific additions
    (compute dtype).
    """

    vocab_size: int  # total token-table size incl. special tokens
    n_layer: int = 12
    n_head: int = 12
    n_embd: int = 768
    n_positions: int = 1024
    embd_pdrop: float = 0.1
    attn_pdrop: float = 0.1
    resid_pdrop: float = 0.1
    layer_norm_epsilon: float = 1e-5
    initializer_range: float = 0.02
    # TPU compute dtype for activations ("float32" or "bfloat16"); params
    # are always float32.
    dtype: str = "float32"
    # attention implementation for the no-cache (training/encode) path:
    # "xla" materializes [B, H, L, L] scores through HBM (threefry attention
    # dropout); "flash" runs the fused Pallas kernel (ops/flash_attention.py
    # — VMEM-resident tile, hash-based in-kernel dropout). The KV-cache
    # decode path always uses the XLA form. Requires L <= 1024.
    attention_impl: str = "xla"
    # Untied LM head: a separate trainable [V, D] projection instead of the
    # weight-tied wte einsum. The reference generator has this *by accident*:
    # load_and_freeze_params (reference utils/model.py:71-78) replaces
    # model.transformer wholesale, which silently breaks HF weight tying —
    # lm_head.weight stays the original random-init tensor, its name lacks
    # 'transformer' so it is never frozen, and the generator retrains the
    # whole output head from scratch. Quirk-parity for the generator stage.
    untied_lm_head: bool = False
    # contrastive-augmentation hyperparameters carried on the config like the
    # reference does (reference: utils/tokenizer.py:24-26)
    eta: float = 0.8
    gamma: float = 0.4
    beta: float = 1.0

    @property
    def head_dim(self) -> int:
        assert self.n_embd % self.n_head == 0
        return self.n_embd // self.n_head

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "ModelConfig":
        d = json.loads(s)
        return cls(**{f.name: d[f.name] for f in dataclasses.fields(cls) if f.name in d})


@dataclasses.dataclass(frozen=True)
class RetrieverConfig:
    """Stage-3 contrastive retriever hyperparameters
    (reference: scripts/train_retriever/train_retriever_*.sh)."""

    alpha: float = 1.0          # weight on the info-NCE augmentation loss
    eta: float = 0.8            # crop keep-fraction
    gamma: float = 0.4          # mask fraction
    # sequence-embedding pooling: "masked" averages real tokens only
    # (deterministic per line — the TPU-native default); "padded" averages
    # the full padded row like the reference's torch.mean (whose result
    # depends on batch composition there, and on the fixed pad length here)
    pool_mode: str = "masked"
    lambda_decay: float = 1e-4  # time-decay rate in CLtime loss
    temperature: float = 0.1
    batch_size: int = 64
    n_layer: int = 4
    n_head: int = 2
    n_embd: int = 512
    learning_rate: float = 1e-5
    weight_decay: float = 0.0
    init_from_backbone: bool = True
    epochs: int = 50
    # Early-stop patience. The committed launchers diverge per dataset
    # (reference: scripts/train_retriever/train_retriever_*.sh — UCI 10,
    # dialog/hepth/wikiv2/enron 5, reddit 3); the registry entries below
    # override this default accordingly.
    patience: int = 10
    warmup_epochs: int = 0
    seed: int = 42


@dataclasses.dataclass(frozen=True)
class GeneratorConfig:
    """Stage-4 RAG generator hyperparameters
    (reference: scripts/train_generator/train_rag_graphpooling_*_seed.sh)."""

    fusion: str = "graphpooling"  # or "mlp"
    top_k: int = 7
    m: int = 1                    # number of fused demonstration tokens
    gnn_layers: int = 1
    mlp_layers: int = 1
    gnn_dropout: float = 0.2
    fusion_pad_len: int = 512     # MLP-fusion demo concat length
    learning_rate: float = 1e-3
    weight_decay: float = 1e-5  # reference args_parser_generator.py:162 default
    batch_size: int = 32
    epochs: int = 50
    # Early-stop patience. Committed launchers: UCI/hepth/wikiv2 15,
    # dialog 10, enron/reddit 5
    # (reference: scripts/train_generator/train_rag_graphpooling_*_seed.sh);
    # registry entries override per dataset.
    patience: int = 15
    warmup_epochs: int = 0
    freeze_backbone: bool = True
    # The reference's broken-tie quirk (see ModelConfig.untied_lm_head): the
    # committed --freeze pipeline always trains a from-scratch output head on
    # top of the frozen transformer. This — not the fusion token — is where
    # most of its generator-vs-backbone gain comes from.
    untied_lm_head: bool = True
    seed: int = 42


@dataclasses.dataclass(frozen=True)
class DatasetSpec:
    """Everything dataset-specific, in one place.

    ``timestep`` is the max timestamp T; sequences carry time tokens
    <|time0|>..<|timeT|>. ``time_scale`` divides raw edge timestamps into the
    units used by the time-decay contrastive loss
    (reference: get_train_query_time.py:47-54).
    """

    name: str
    timestep: int
    csv_name: str                       # ml_<csv_name>.csv under all_data/<csv_name>/<t>/
    time_scale: float
    # backbone (stage 1) hyperparameters (reference: scripts/SimpleDyG/train_<ds>.sh)
    n_layer: int
    n_head: int
    n_embd: int
    learning_rate: float = 1e-4
    batch_size: int = 32
    epochs: int = 100
    # Backbone early-stop patience: 10 everywhere except reddit's 5
    # (reference: scripts/SimpleDyG/train_*.sh).
    patience: int = 10
    block_size: int = 512
    seed: int = 42
    node_features: Optional[str] = None  # path fragment for wte init, if any
    node_feature_dim: int = 0
    # dialog-style split: train ≤ T-4, val = T-2, test = T
    dialog_split: bool = False
    # hepth-style eval queries carry only the previous time token
    # (reference: csv2resources.py:182-183)
    hepth_style: bool = False
    # annotation
    jaccard_threshold: float = 0.8
    neg_num: int = 5
    gt_topk: int = 10
    max_positives: Optional[int] = None  # dialog caps positives at 4
    retriever: RetrieverConfig = dataclasses.field(default_factory=RetrieverConfig)
    generator: GeneratorConfig = dataclasses.field(default_factory=GeneratorConfig)


DATASETS = {
    "UCI_13": DatasetSpec(
        name="UCI_13", timestep=12, csv_name="uci", time_scale=86400.0,
        n_layer=6, n_head=8, n_embd=768, learning_rate=1e-4, seed=42,
        retriever=RetrieverConfig(alpha=1.0, eta=0.8, gamma=0.4, lambda_decay=1e-4,
                                  batch_size=64, n_layer=4, n_head=2, n_embd=512,
                                  learning_rate=1e-5, weight_decay=1e-3,
                                  init_from_backbone=False),
        generator=GeneratorConfig(learning_rate=1e-3),
    ),
    "dialog": DatasetSpec(
        name="dialog", timestep=15, csv_name="dialog", time_scale=1.0,
        n_layer=2, n_head=2, n_embd=256, learning_rate=1e-4, seed=7,
        dialog_split=True, max_positives=4,
        retriever=RetrieverConfig(alpha=0.4, eta=0.8, gamma=0.6, lambda_decay=10.0,
                                  batch_size=128, n_layer=2, n_head=2, n_embd=256,
                                  learning_rate=1e-5, patience=5),
        generator=GeneratorConfig(learning_rate=1e-3, patience=10, batch_size=64),
    ),
    "hepth": DatasetSpec(
        name="hepth", timestep=11, csv_name="hepth", time_scale=2592000.0,
        n_layer=12, n_head=2, n_embd=256, learning_rate=1e-4, seed=4,
        hepth_style=True,
        node_features="node_features.npy", node_feature_dim=172,
        retriever=RetrieverConfig(alpha=1.0, eta=0.8, gamma=0.6, lambda_decay=0.1,
                                  batch_size=128, n_layer=12, n_head=2, n_embd=256,
                                  learning_rate=1e-4, patience=5),
        generator=GeneratorConfig(learning_rate=1e-3),
    ),
    "wikiv2": DatasetSpec(
        name="wikiv2", timestep=15, csv_name="wikiv2", time_scale=86400.0,
        n_layer=2, n_head=6, n_embd=768, learning_rate=1e-4, seed=42,
        retriever=RetrieverConfig(alpha=0.2, eta=0.6, gamma=0.8, lambda_decay=1.0,
                                  batch_size=128, n_layer=2, n_head=6, n_embd=768,
                                  learning_rate=1e-6, patience=5, seed=1),
        generator=GeneratorConfig(learning_rate=1e-4),
    ),
    "enron": DatasetSpec(
        # Primary seeds follow the committed loops: backbone `for seed in
        # 0 1..8 #42` (scripts/SimpleDyG/train_enron.sh:9), retriever seed 0,
        # generator `for seed in 1 2 3`.
        name="enron", timestep=16, csv_name="enron", time_scale=1.0,
        n_layer=2, n_head=6, n_embd=768, learning_rate=1e-4, seed=0,
        retriever=RetrieverConfig(alpha=0.2, eta=0.6, gamma=0.8, lambda_decay=10.0,
                                  batch_size=32, n_layer=2, n_head=6, n_embd=768,
                                  learning_rate=1e-6, patience=5, seed=0),
        generator=GeneratorConfig(learning_rate=1e-4, patience=5, seed=1),
    ),
    "reddit": DatasetSpec(
        name="reddit", timestep=11, csv_name="reddit", time_scale=1.0,
        n_layer=2, n_head=8, n_embd=512, learning_rate=1e-4, seed=42,
        patience=5,
        node_features="node_features.npy", node_feature_dim=300,
        retriever=RetrieverConfig(alpha=0.2, eta=0.2, gamma=0.8, lambda_decay=10.0,
                                  batch_size=128, n_layer=2, n_head=8, n_embd=512,
                                  learning_rate=1e-6, patience=3),
        generator=GeneratorConfig(learning_rate=1e-4, patience=5),
    ),
}
