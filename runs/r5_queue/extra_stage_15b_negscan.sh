#!/bin/bash
# Mitigation experiment for the (ba=128, bn=512) bucket-MFU sink
# (wikiv2's DOMINANT group: 67% of epoch FLOPs at 15.3% MFU, twice
# reproduced — runs/mfu_buckets/). Two questions:
#  1. robustness: does the 0.527 s/step number hold at 16/32-step scans
#     (the 4/8 delta could hide relay jitter)?
#  2. mitigation: does wrapping the lone negative pass in a length-1
#     lax.scan (bit-identical — tests/test_retriever_step.py) recover
#     the ~65 TFLOPS the same subgraph reaches in other programs?
set -e -o pipefail
cd /root/repo
mkdir -p runs/mfu_buckets
timeout 3000 python - > runs/mfu_buckets/negscan_ab.json 2> runs/mfu_buckets/negscan_ab.log <<'EOF'
import json
import sys
sys.path.insert(0, "benchmarks")
from rag4dyg_tpu.cli import _enable_compile_cache
_enable_compile_cache()
import step_breakdown as sb

for label, kw, steps in [
        ("baseline_4_8", dict(neg_pass_scan=False), 4),
        ("baseline_16_32", dict(neg_pass_scan=False), 16),
        ("negscan_4_8", dict(neg_pass_scan=True), 4),
        ("negscan_16_32", dict(neg_pass_scan=True), 16)]:
    r = sb.bench_bucket(128, 512, steps, 2 * steps, **kw)
    r["label"] = label
    print(json.dumps(r), flush=True)
EOF
cat runs/mfu_buckets/negscan_ab.json
echo NEGSCAN_AB_DONE
