from rag4dyg_tpu.eval.metrics import (  # noqa: F401
    hit_rate_at_k,
    jaccard,
    map_k,
    ndcg_k,
    precision_k,
    recall_k,
)
