#!/bin/bash
# VERDICT r3 next #2 contingency: after the wikiv2 retriever ran at the
# TRUE 50-epoch cosine horizon (queue stage 4 overwrites
# runs/wikiv2/resources/retrieval_result/ with its best-epoch .gen
# files), check whether retrieval moved beyond noise vs the 6-epoch
# capped row (test hit@3 0.4412, band 0.4330-0.4461 across recorded
# runs) and re-chain generator sweep seeds on the new .gen files:
# 3 seeds if it moved (sensitivity matters), 1 spot-check seed if not.
# Same-seed comparisons land against the r2 sweep (seed 42: 0.3219,
# seed 0: 0.3269, seed 1: 0.3311-band).
set -e -o pipefail
cd /root/repo
RES=runs/wikiv2/retriever_r3_50ep/results.csv
[ -f "$RES" ] || { echo "rechain: no 50-epoch retriever results; skip"; exit 0; }
NEW=$(tail -1 "$RES" | awk -F, '{print $9}')   # test_hit@3 column
echo "rechain: 50-epoch test hit@3 = $NEW (6-epoch row: 0.4412)"
MOVED=$(python - "$NEW" <<'EOF'
import sys
print(1 if abs(float(sys.argv[1]) - 0.4412) > 0.005 else 0)
EOF
)
if [ "$MOVED" = "1" ]; then SEEDS=42,0,1; else SEEDS=42; fi
echo "rechain: moved=$MOVED -> seeds $SEEDS"
python -m rag4dyg_tpu.cli sweep --stage generator \
  --dataset wikiv2 --seeds "$SEEDS" \
  --resources runs/wikiv2/resources --out runs/wikiv2/sweep_generator_r4_rechain \
  --backbone runs/wikiv2/backbone_r2b/checkpoint-best
