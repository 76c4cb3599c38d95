#!/bin/bash
# On-chip A/B for --chunk-ladder at the wikiv2 shape (RESULTS.md "MFU
# accounting" predicts ~20% of steps are padding; ladder cuts that to
# <8/group). 3 epochs: epoch 0 doubles as a bit-parity check against
# the recorded 50-epoch run (same seed/flags/horizon-independent
# epoch-0 LR -> train loss must be exactly 122.9546, val hit@3 0.4810);
# warm epochs 1-2 give the timing/MFU comparison vs the flat plan's
# 336-406 s (MFU 23.6-28.2%). Calls train_retriever directly so the
# scratch run's .gen files do NOT overwrite the 50-epoch run's
# resources/retrieval_result (cli train-retriever always writes there).
set -e -o pipefail
cd /root/repo
python - <<'EOF'
from rag4dyg_tpu.cli import _enable_compile_cache
_enable_compile_cache()
from rag4dyg_tpu.config import DATASETS
from rag4dyg_tpu.train.retriever import train_retriever
res = train_retriever(
    DATASETS["wikiv2"], "runs/wikiv2/resources",
    "runs/wikiv2/retriever_ladder_ab",
    backbone_ckpt="runs/wikiv2/backbone_r2b/checkpoint-best",
    epochs=3, dtype="bfloat16", attention_impl="flash",
    chunk_ladder=True,
    gen_out_dir="runs/wikiv2/retriever_ladder_ab/retrieval_result")
print("LADDER_AB_DONE", res.best_epoch, res.val_metrics)
EOF
