#!/bin/bash
# Round-2 quirk-parity generator runs, chunk 1: UCI -> hepth -> dialog.
# Sequential (ONE TPU-compiling process at a time per CLAUDE.md).
set -x
cd /root/repo
LOG=/tmp/r2q1
mkdir -p $LOG

run() { echo "=== $(date -u +%H:%M:%S) $1 ==="; shift; "$@"; echo "rc=$?"; }

# 1. UCI_13: backbone retrain (bit-deterministic; expect test 0.1328) + quirk generator
run uci-backbone python -m rag4dyg_tpu.cli train-backbone --dataset UCI_13 \
    --resources runs/uci_masked/resources --out runs/uci_masked/backbone_r2 \
    > $LOG/uci_backbone.json 2> $LOG/uci_backbone.log
run uci-generator python -m rag4dyg_tpu.cli train-generator --dataset UCI_13 \
    --resources runs/uci_masked/resources --out runs/uci_masked/generator_r2 \
    --backbone runs/uci_masked/backbone_r2/checkpoint-best \
    > $LOG/uci_generator.json 2> $LOG/uci_generator.log

# 2. hepth: backbone (word2vec wte init) + quirk generator
run hepth-backbone python -m rag4dyg_tpu.cli train-backbone --dataset hepth \
    --resources runs/hepth/resources --out runs/hepth/backbone_r2 \
    --node-features /root/reference/resources/hepth/node_features.npy \
    > $LOG/hepth_backbone.json 2> $LOG/hepth_backbone.log
run hepth-generator python -m rag4dyg_tpu.cli train-generator --dataset hepth \
    --resources runs/hepth/resources --out runs/hepth/generator_r2 \
    --backbone runs/hepth/backbone_r2/checkpoint-best \
    > $LOG/hepth_generator.json 2> $LOG/hepth_generator.log

# 3. dialog: annotate (train_retrieval not committed) + backbone + retriever + generator
run dialog-annotate python -m rag4dyg_tpu.cli annotate --dataset dialog \
    --resources runs/dialog/resources \
    > $LOG/dialog_annotate.json 2> $LOG/dialog_annotate.log
run dialog-backbone python -m rag4dyg_tpu.cli train-backbone --dataset dialog \
    --resources runs/dialog/resources --out runs/dialog/backbone_r2 \
    > $LOG/dialog_backbone.json 2> $LOG/dialog_backbone.log
run dialog-retriever python -m rag4dyg_tpu.cli train-retriever --dataset dialog \
    --resources runs/dialog/resources --out runs/dialog/retriever_r2 \
    --backbone runs/dialog/backbone_r2/checkpoint-best \
    > $LOG/dialog_retriever.json 2> $LOG/dialog_retriever.log
run dialog-generator python -m rag4dyg_tpu.cli train-generator --dataset dialog \
    --resources runs/dialog/resources --out runs/dialog/generator_r2 \
    --backbone runs/dialog/backbone_r2/checkpoint-best \
    > $LOG/dialog_generator.json 2> $LOG/dialog_generator.log

echo "CHUNK1 DONE $(date -u)"
