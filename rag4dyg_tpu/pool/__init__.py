from rag4dyg_tpu.pool.jaccard import jaccard_matrix, parse_inout_sets  # noqa: F401
from rag4dyg_tpu.pool.annotate import annotate_pool  # noqa: F401
