#!/bin/bash
# Round-2 chunk 2: wikiv2 + reddit — backbone, short-schedule retriever
# (regenerates the uncommitted retrieval_result .gen files; both
# retrievers plateau at backbone init, best epoch 4 in the long runs),
# then the quirk-parity generator.
set -x
cd /root/repo
LOG=/tmp/r2q2
mkdir -p $LOG

run() { echo "=== $(date -u +%H:%M:%S) $1 ==="; shift; "$@"; echo "rc=$?"; }

# wikiv2 (annotation outputs not committed -> annotate first)
run wikiv2-annotate python -m rag4dyg_tpu.cli annotate --dataset wikiv2 \
    --resources runs/wikiv2/resources \
    > $LOG/wikiv2_annotate.json 2> $LOG/wikiv2_annotate.log
run wikiv2-backbone python -m rag4dyg_tpu.cli train-backbone --dataset wikiv2 \
    --resources runs/wikiv2/resources --out runs/wikiv2/backbone_r2 \
    > $LOG/wikiv2_backbone.json 2> $LOG/wikiv2_backbone.log
run wikiv2-retriever python -m rag4dyg_tpu.cli train-retriever --dataset wikiv2 \
    --resources runs/wikiv2/resources --out runs/wikiv2/retriever_r2 \
    --backbone runs/wikiv2/backbone_r2/checkpoint-best \
    --epochs 6 --dtype bfloat16 --attention-impl flash \
    > $LOG/wikiv2_retriever.json 2> $LOG/wikiv2_retriever.log
run wikiv2-generator python -m rag4dyg_tpu.cli train-generator --dataset wikiv2 \
    --resources runs/wikiv2/resources --out runs/wikiv2/generator_r2 \
    --backbone runs/wikiv2/backbone_r2/checkpoint-best \
    > $LOG/wikiv2_generator.json 2> $LOG/wikiv2_generator.log

# reddit (no node features: the reference commits no reddit npy)
run reddit-annotate python -m rag4dyg_tpu.cli annotate --dataset reddit \
    --resources runs/reddit/resources \
    > $LOG/reddit_annotate.json 2> $LOG/reddit_annotate.log
run reddit-backbone python -m rag4dyg_tpu.cli train-backbone --dataset reddit \
    --resources runs/reddit/resources --out runs/reddit/backbone_r2 \
    > $LOG/reddit_backbone.json 2> $LOG/reddit_backbone.log
run reddit-retriever python -m rag4dyg_tpu.cli train-retriever --dataset reddit \
    --resources runs/reddit/resources --out runs/reddit/retriever_r2 \
    --backbone runs/reddit/backbone_r2/checkpoint-best \
    --epochs 6 --dtype bfloat16 --attention-impl flash \
    > $LOG/reddit_retriever.json 2> $LOG/reddit_retriever.log
run reddit-generator python -m rag4dyg_tpu.cli train-generator --dataset reddit \
    --resources runs/reddit/resources --out runs/reddit/generator_r2 \
    --backbone runs/reddit/backbone_r2/checkpoint-best \
    > $LOG/reddit_generator.json 2> $LOG/reddit_generator.log

# Full test suite in the serialized queue slot (forces CPU itself;
# ~20 min — never concurrent with a chip job per CLAUDE.md).
run pytest python -m pytest tests/ -q > $LOG/pytest.log 2>&1

echo "CHUNK2 DONE $(date -u)"
