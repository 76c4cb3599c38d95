"""RAG4DyG-TPU: a TPU-native framework for retrieval-augmented dynamic graph modeling.

A from-scratch JAX/Flax/Pallas re-design of the capabilities of RAG4DyG
(SIGIR 2025, arXiv:2408.14523; reference implementation studied at
/root/reference). The pipeline:

  1. ``rag4dyg_tpu.data``   — dynamic-graph CSV ingestion, temporal sequence
     serialization, vocab/tokenizer (pure NumPy + optional C++ runtime).
  2. ``rag4dyg_tpu.models`` — Flax GPT-2 backbone with KV-cache decoding,
     demonstration-fusion heads (closed-form star-graph GCN, MLP).
  3. ``rag4dyg_tpu.pool``   — the index-and-query engine: MXU Jaccard
     annotation, device-resident dense retrieval index with sharded
     matmul+top-k scoring.
  4. ``rag4dyg_tpu.train``  — jit-compiled training loops (backbone,
     time-aware contrastive retriever, RAG generator) on optax.
  5. ``rag4dyg_tpu.eval``   — generation metrics (NDCG@k, Jaccard, Recall@k,
     MAP@k, hit@k) with reference-identical semantics.
  6. ``rag4dyg_tpu.parallel`` — mesh construction and sharding rules
     (dp/fsdp/tp) for multi-chip execution over ICI.
"""

__version__ = "0.1.0"

from rag4dyg_tpu.config import DATASETS, DatasetSpec, ModelConfig  # noqa: F401
from rag4dyg_tpu.data.serialize import prepare_dataset  # noqa: F401
from rag4dyg_tpu.data.vocab import Tokenizer  # noqa: F401
