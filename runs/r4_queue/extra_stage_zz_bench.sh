#!/bin/bash
# Round-end sanity: run bench.py once on the live chip so the round-4
# output shape (pinned vs_baseline + live_baseline_qps) is validated
# before the driver's own BENCH run records it.
set -e -o pipefail
cd /root/repo
python bench.py | tee runs/scale_pool_1m/bench_r4_sanity.json
