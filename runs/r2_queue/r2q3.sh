#!/bin/bash
# Round-2 chunk 3: generator seed sweeps (reference sweep set: seeds
# 42,0..8 — scripts/train_generator/train_rag_graphpooling_*_seed.sh),
# with the round-2 quirk-parity generator. Reuses the chunk-1/2
# backbone_r2 checkpoints and committed/regenerated retrieval results.
# Order: dialog -> hepth -> wikiv2 -> UCI (UCI last: a committed round-1
# 10-seed sweep already exists; sweep_results.csv streams per-seed, so a
# sweep cut off by round end still leaves usable partial CSVs).
set -x
cd /root/repo
LOG=/tmp/r2q3
mkdir -p $LOG
SEEDS=42,0,1,2,3,4,5,6,7,8

run() { echo "=== $(date -u +%H:%M:%S) $1 ==="; shift; "$@"; echo "rc=$?"; }

run dialog-sweep python -m rag4dyg_tpu.cli sweep --stage generator \
    --dataset dialog --seeds $SEEDS \
    --resources runs/dialog/resources --out runs/dialog/sweep_generator_r2 \
    --backbone runs/dialog/backbone_r2/checkpoint-best \
    > $LOG/dialog_sweep.json 2> $LOG/dialog_sweep.log

run hepth-sweep python -m rag4dyg_tpu.cli sweep --stage generator \
    --dataset hepth --seeds $SEEDS \
    --resources runs/hepth/resources --out runs/hepth/sweep_generator_r2 \
    --backbone runs/hepth/backbone_r2/checkpoint-best \
    > $LOG/hepth_sweep.json 2> $LOG/hepth_sweep.log

run wikiv2-sweep python -m rag4dyg_tpu.cli sweep --stage generator \
    --dataset wikiv2 --seeds $SEEDS \
    --resources runs/wikiv2/resources --out runs/wikiv2/sweep_generator_r2 \
    --backbone runs/wikiv2/backbone_r2/checkpoint-best \
    > $LOG/wikiv2_sweep.json 2> $LOG/wikiv2_sweep.log

run uci-sweep python -m rag4dyg_tpu.cli sweep --stage generator \
    --dataset UCI_13 --seeds $SEEDS \
    --resources runs/uci_masked/resources --out runs/uci_masked/sweep_generator_r2 \
    --backbone runs/uci_masked/backbone_r2/checkpoint-best \
    > $LOG/uci_sweep.json 2> $LOG/uci_sweep.log

echo "CHUNK3 DONE $(date -u)"
