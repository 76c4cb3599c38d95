from rag4dyg_tpu.models.gpt2 import (  # noqa: F401
    GPT2LMModel,
    init_cache,
    init_params,
    load_node_feature_embeddings,
)
