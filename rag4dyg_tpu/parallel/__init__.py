from rag4dyg_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    make_sharded_lm_train_step,
    make_sharded_retriever_step,
    param_partition_specs,
    shard_params,
)
