#!/bin/bash
# VERDICT r4 #1 (c): a FULL 100k-row annotation pass (not a slice) on
# the real chip — the host path is structurally impossible here (four
# 100k² f64 matrices = 320 GB). Verified against the 64-row exact
# prefix oracle inside the benchmark.
set -e -o pipefail
cd /root/repo
OUT=runs/annotate_bench
mkdir -p $OUT
timeout 3600 python benchmarks/annotate_bench.py --synthetic 100000 \
    --vocab 65536 --avg-set 24 > $OUT/synthetic_100k.json.tmp 2> $OUT/synthetic_100k.log
tail -1 $OUT/synthetic_100k.json.tmp > $OUT/synthetic_100k.json
rm $OUT/synthetic_100k.json.tmp
cat $OUT/synthetic_100k.json
echo ANNOTATE_100K_DONE
