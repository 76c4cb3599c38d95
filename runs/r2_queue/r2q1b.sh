#!/bin/bash
# Chunk 1b: apples-to-apples UCI test30 parity eval.
# The reference generator experiment (RESULTS.md "transplant" section) was
# scored on a 30-query test subset (the refrun sandbox caps test files to
# ~30 queries because reference decode is 1-15 s/token on this host).
# Score OUR backbone_r2 and quirk generator_r2 on the identical subset.
set -x
cd /root/repo
LOG=/tmp/r2q1b
mkdir -p $LOG

# Rebuild the fixture deterministically from the run resources.
F=/tmp/uci_test30
R=/root/repo/runs/uci_masked/resources
mkdir -p $F/retrieval_result $F/train_generator
cp $R/train.link_prediction $R/val.link_prediction $R/val_gt.link_prediction \
   $R/vocab.json $R/train_query_time.npy $F/
head -30 $R/test.link_prediction > $F/test.link_prediction
head -30 $R/test_gt.link_prediction > $F/test_gt.link_prediction
head -30 $R/retrieval_result/test_index.gen > $F/retrieval_result/test_index.gen
head -30 $R/retrieval_result/test_score.gen > $F/retrieval_result/test_score.gen
cp $R/retrieval_result/val_index.gen $R/retrieval_result/val_score.gen $F/retrieval_result/
cp $R/train_generator/* $F/train_generator/ 2>/dev/null

run() { echo "=== $(date -u +%H:%M:%S) $1 ==="; shift; "$@"; echo "rc=$?"; }

run test30-backbone python -m rag4dyg_tpu.cli eval --dataset UCI_13 \
    --resources $F --checkpoint runs/uci_masked/backbone_r2/checkpoint-best \
    --split test > $LOG/test30_backbone.json 2> $LOG/test30_backbone.log

run test30-generator python -m rag4dyg_tpu.cli eval --dataset UCI_13 \
    --resources $F --checkpoint runs/uci_masked/generator_r2/checkpoint-best \
    --split test > $LOG/test30_generator.json 2> $LOG/test30_generator.log

echo "CHUNK1B DONE $(date -u)"
