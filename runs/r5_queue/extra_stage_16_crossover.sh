#!/bin/bash
# VERDICT r4 #4: measure the recommended-but-unmeasured XLA dense
# matmul+lax.top_k path and publish the full fused-vs-XLA crossover
# table {16k, 100k, 1M} x {pallas, xla} q/s on the real chip. The 1M
# Pallas number (776.3 q/s, tile-count-bound) is already recorded in
# runs/scale_pool_1m/result_chip.json.
set -e -o pipefail
cd /root/repo
OUT=runs/scale_pool_1m
mkdir -p $OUT
# Trimmed under deadline pressure (relay outages ate ~2h): 16k-pallas
# re-landed with delta timing (639.7k q/s); 100k-pallas has the round-3
# 115.6k number; the two missing table cells that matter are 16k-xla
# (fused kernel's home turf, XLA comparator) and 1M-xla (the
# recommended-but-unmeasured regime — VERDICT r4 #3's hole).
for spec in "16384 xla" "1000000 xla" "100000 xla" "100000 pallas"; do
  set -- $spec
  rows=$1; impl=$2
  f=$OUT/crossover_${rows}_${impl}.json
  [ -s "$f" ] && { echo "have $f"; continue; }
  extra=""
  [ "$impl" = xla ] && extra="--no-pallas"
  echo "=== $rows $impl ==="
  timeout 1800 python benchmarks/scale_pool.py --mode chip \
    --synthetic-rows "$rows" $extra \
    --skip-reddit --skip-jaccard-synthetic --skip-gen-rank \
    > "$f.tmp" 2> "$OUT/crossover_${rows}_${impl}.log"
  tail -1 "$f.tmp" > "$f" && rm "$f.tmp"
  cat "$f"
done
echo CROSSOVER_DONE
