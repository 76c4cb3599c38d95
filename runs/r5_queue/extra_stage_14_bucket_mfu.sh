#!/bin/bash
# VERDICT r4 #6: per-bucket MFU measurement at the production config
# (bf16+flash+remat=full) over the real wikiv2 FLOP-weighted bucket-group
# mix — turns the "29.8% is what the bucket mix permits" assertion into
# per-group numbers.
set -e -o pipefail
cd /root/repo
mkdir -p runs/mfu_buckets
timeout 3600 python benchmarks/step_breakdown.py --per-bucket --steps 4 \
    > runs/mfu_buckets/wikiv2_per_bucket.json.raw 2> runs/mfu_buckets/wikiv2_per_bucket.log
mv runs/mfu_buckets/wikiv2_per_bucket.json.raw runs/mfu_buckets/wikiv2_per_bucket.json
cat runs/mfu_buckets/wikiv2_per_bucket.json
echo BUCKET_MFU_DONE
