from rag4dyg_tpu.ops.decode import greedy_decode, left_pad_batch  # noqa: F401
