#!/bin/bash
# Round-3 chunk 3: resume after the TPU-relay outage (relay back up
# 02:00 UTC Aug 19; chip canary re-run PASSED — the round-3 flash
# [BH,2] SMEM meta spec is certified on chip, see /tmp/r3q3/canary.log).
#
# Order (highest headline value first; each seed its own invocation so
# a deadline cut lands on a seed boundary):
#   1. reddit generator seeds 0..8  (headline row is n=1; ~25 min/seed)
#   2. UCI generator 10-seed sweep   (~7 min/seed)
#   3. dialog seeds 6,7,8 at the corrected patience 10
#   4. wikiv2 generator seeds 4..8   (BEFORE the wikiv2 retriever so all
#      10 seeds share the round-2 .gen retrieval files)
#   5. wikiv2 retriever at the true 50-epoch cosine horizon (VERDICT #3)
#   6. tail: 100k-pool .gen-ranking measurement on chip (VERDICT #4)
set -x
cd /root/repo
LOG=/tmp/r3q3
mkdir -p $LOG

DEADLINE=$(date -u -d '2026-08-19 12:40' +%s)
left() { echo $(( DEADLINE - $(date -u +%s) )); }
run() { name=$1; shift
  if [ "$(left)" -le 600 ]; then echo "SKIP $name: past deadline"; return 1; fi
  echo "=== $(date -u +%H:%M:%S) $name (budget $(left)s) ==="
  timeout "$(left)" "$@"; rc=$?; echo "rc=$rc"; return $rc
}

for S in 0 1 2 3 4 5 6 7 8; do
  run reddit-gen-$S python -m rag4dyg_tpu.cli sweep --stage generator \
      --dataset reddit --seeds $S \
      --resources runs/reddit/resources --out runs/reddit/sweep_generator_r3 \
      --backbone runs/reddit/backbone_r3/checkpoint-best \
      >> $LOG/reddit_sweep.json 2>> $LOG/reddit_sweep.log
done

for PASS in "42,0,1,2,3" "4,5,6,7,8"; do
  run uci-sweep-$PASS python -m rag4dyg_tpu.cli sweep --stage generator \
      --dataset UCI_13 --seeds $PASS \
      --resources runs/uci_masked/resources --out runs/uci_masked/sweep_generator_r3 \
      --backbone runs/uci_masked/backbone_r2/checkpoint-best \
      >> $LOG/uci_sweep.json 2>> $LOG/uci_sweep.log
done

run dialog-sweep-678 python -m rag4dyg_tpu.cli sweep --stage generator \
    --dataset dialog --seeds 6,7,8 \
    --resources runs/dialog/resources --out runs/dialog/sweep_generator_r2 \
    --backbone runs/dialog/backbone_r2/checkpoint-best \
    >> $LOG/dialog_sweep.json 2>> $LOG/dialog_sweep.log

for PASS in "4,5" "6,7,8"; do
  run wikiv2-sweep-$PASS python -m rag4dyg_tpu.cli sweep --stage generator \
      --dataset wikiv2 --seeds $PASS \
      --resources runs/wikiv2/resources --out runs/wikiv2/sweep_generator_r2 \
      --backbone runs/wikiv2/backbone_r2/checkpoint-best \
      >> $LOG/wikiv2_sweep.json 2>> $LOG/wikiv2_sweep.log
done

# wikiv2 retriever, true 50-epoch cosine horizon (patience 5 stops it
# early; bf16+flash ~9-14 min/epoch). Runs AFTER the wikiv2 generator
# sweep so its .gen rewrite cannot split the sweep across retrievers.
run wikiv2-retriever-50ep python -m rag4dyg_tpu.cli train-retriever \
    --dataset wikiv2 \
    --resources runs/wikiv2/resources --out runs/wikiv2/retriever_r3 \
    --backbone runs/wikiv2/backbone_r2/checkpoint-best \
    --dtype bfloat16 --attention-impl flash \
    > $LOG/wikiv2_retriever.json 2> $LOG/wikiv2_retriever.log

# --- post-guard chip-validation tail -----------------------------------
echo "=== $(date -u +%H:%M:%S) scale_pool gen-rank (chip) ==="
timeout 900 python benchmarks/scale_pool.py --mode chip --skip-reddit \
    --skip-jaccard-synthetic > $LOG/scale_pool_r3.log 2>&1
echo "scale_pool rc=$?"
echo "R3Q3 DONE $(date -u)"
