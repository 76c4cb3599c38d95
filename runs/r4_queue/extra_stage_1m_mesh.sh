#!/bin/bash
# VERDICT r3 stretch #8: the 1M-row pool demonstration on the virtual
# 8-device CPU mesh — mesh-sharded fused top-k (per-shard lax.top_k +
# all-gather candidate merge) and the sharded Jaccard slice at the
# BASELINE.json "million-edge pool" scale. Query/rep counts are bounded
# because the 8 virtual devices share ONE core (2*Q*D*N FLOPs per rep);
# the point is the sharding story executing + verified at 1M rows, with
# measured numbers labeled as virtual-mesh.
set -e -o pipefail
cd /root/repo
mkdir -p runs/scale_pool_1m
python benchmarks/scale_pool.py --mode mesh \
  --synthetic-rows 1000000 --synthetic-queries 128 --synthetic-vocab 8192 \
  --topk-queries 128 --topk-reps 3 --skip-reddit --skip-gen-rank \
  | tee runs/scale_pool_1m/result_mesh.json
