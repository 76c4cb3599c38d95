#!/bin/bash
# Companion to extra_stage_1m_mesh.sh: the same 1M-row pool through the
# single-chip Pallas fused score+top-k path on the REAL TPU (pool is
# 1M x 512 f32 = 2 GB, well inside v5e HBM; upload rides the fast
# direction of the relay). gen-rank is skipped: a [512, 1M] int32 rank
# download is ~2 GB through the 3-6 MB/s relay download path.
set -e -o pipefail
cd /root/repo
mkdir -p runs/scale_pool_1m
python benchmarks/scale_pool.py --mode chip \
  --synthetic-rows 1000000 \
  --skip-reddit --skip-jaccard-synthetic --skip-gen-rank \
  | tee runs/scale_pool_1m/result_chip.json
