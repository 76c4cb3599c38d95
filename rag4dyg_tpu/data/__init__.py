from rag4dyg_tpu.data.vocab import SPECIAL_BOS, Tokenizer, build_vocab  # noqa: F401
from rag4dyg_tpu.data.serialize import prepare_dataset, serialize_corpus  # noqa: F401
