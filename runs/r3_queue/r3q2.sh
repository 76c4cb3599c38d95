#!/bin/bash
# Round-3 chunk 2 (replaces r3q1's remaining stages, reordered after the
# seed-42 reddit result): the corrected-protocol reddit generator beats
# its new backbone by only +1.8% (0.1410 vs 0.1385), well inside seed
# noise — more reddit seeds are now the highest-value chip work, ahead
# of the UCI/dialog/wikiv2 sweep completion. Same deadline guard; after
# it cuts, the chip-validation tail (pallas lowering canary + the
# 100k-pool .gen ranking measurement) runs in the idle window before
# the driver bench, then the full test suite on CPU.
set -x
cd /root/repo
LOG=/tmp/r3q1
mkdir -p $LOG

DEADLINE=$(date -u -d '2026-08-19 00:40' +%s)
left() { echo $(( DEADLINE - $(date -u +%s) )); }
run() { name=$1; shift
  if [ "$(left)" -le 600 ]; then echo "SKIP $name: past deadline"; return 1; fi
  echo "=== $(date -u +%H:%M:%S) $name (budget $(left)s) ==="
  timeout "$(left)" "$@"; rc=$?; echo "rc=$rc"; return $rc
}

# reddit 10-seed protocol, one seed per invocation so the guard cuts at
# a seed boundary and every finished seed is already in the CSV
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

# dialog seeds 6,7,8 at the corrected patience 10 complete its 10-seed
# protocol (seeds 42,0..5 valid per the patience replay)
run dialog-sweep-678 python -m rag4dyg_tpu.cli sweep --stage generator \
    --dataset dialog --seeds 6,7,8 \
    --resources runs/dialog/resources --out runs/dialog/sweep_generator_r2 \
    --backbone runs/dialog/backbone_r2/checkpoint-best \
    >> $LOG/dialog_sweep.json 2>> $LOG/dialog_sweep.log

run wikiv2-sweep python -m rag4dyg_tpu.cli sweep --stage generator \
    --dataset wikiv2 --seeds 4,5,6,7,8 \
    --resources runs/wikiv2/resources --out runs/wikiv2/sweep_generator_r2 \
    --backbone runs/wikiv2/backbone_r2/checkpoint-best \
    >> $LOG/wikiv2_sweep.json 2>> $LOG/wikiv2_sweep.log

# --- post-guard chip-validation tail (small, idle-window jobs) ---------
echo "=== $(date -u +%H:%M:%S) chip canary ==="
timeout 600 python benchmarks/chip_canary.py > $LOG/chip_canary.log 2>&1
echo "canary rc=$?"
echo "=== $(date -u +%H:%M:%S) scale_pool gen-rank (chip) ==="
timeout 900 python benchmarks/scale_pool.py --mode chip --skip-reddit \
    --skip-jaccard-synthetic > $LOG/scale_pool_r3.log 2>&1
echo "scale_pool rc=$?"

echo "=== $(date -u +%H:%M:%S) pytest (CPU) ==="
timeout 1800 python -m pytest tests/ -q > $LOG/pytest.log 2>&1
echo "pytest rc=$?"
echo "R3Q2 DONE $(date -u)"
