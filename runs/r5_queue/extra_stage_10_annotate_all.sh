#!/bin/bash
# VERDICT r4 #1 (a)+(b): device-mining bit-equality on ALL SIX datasets
# on chip, plus the wikiv2 three-way timing (device-mined vs the
# reference pure-Python stage vs the round-4 full-matrix-download path
# that only TIED the reference at 24.3 vs 24.5 s).
set -e -o pipefail
cd /root/repo
OUT=runs/annotate_bench
mkdir -p $OUT
for spec in "UCI_13 uci_masked" "dialog dialog" "hepth hepth" \
            "enron enron_full" "wikiv2 wikiv2" "reddit reddit"; do
  set -- $spec
  ds=$1; dir=$2
  [ -s "$OUT/$ds.json" ] && { echo "have $ds"; continue; }
  extra=""
  [ "$ds" = wikiv2 ] && extra="--with-r4-path"
  echo "=== $ds ==="
  timeout 1800 python benchmarks/annotate_bench.py --dataset "$ds" \
      --resources "runs/$dir/resources" $extra > "$OUT/$ds.json.tmp" 2> "$OUT/$ds.log"
  tail -1 "$OUT/$ds.json.tmp" > "$OUT/$ds.json" && rm "$OUT/$ds.json.tmp"
  cat "$OUT/$ds.json"
done
echo ANNOTATE_ALL_DONE
