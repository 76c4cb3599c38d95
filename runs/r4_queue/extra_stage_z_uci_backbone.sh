#!/bin/bash
# ADVICE r3 #1 follow-through: the UCI +4.6% RAG-vs-backbone comparison
# rests on a SINGLE backbone seed (42 -> test NDCG 0.1328). Sweep four
# more backbone seeds (~13 min each on chip, runs/uci_masked/backbone
# hours=0.21-0.23) so the headline can quote backbone mean +/- std at
# n=5 instead of one draw. Matches the reference backbone protocol
# (scripts/SimpleDyG/train_UCI_13.sh config via the registry).
set -e -o pipefail
cd /root/repo
python -m rag4dyg_tpu.cli sweep --stage backbone --dataset UCI_13 \
  --seeds 0,1,2,3 \
  --resources runs/uci_masked/resources \
  --out runs/uci_masked/sweep_backbone_r4
