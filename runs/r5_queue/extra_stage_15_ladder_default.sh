#!/bin/bash
# VERDICT r4 #5: the chunk-ladder is now AUTO-DEFAULT (train_retriever
# chunk_ladder=None simulates the flat plan's FLOP-weighted padding on a
# decision-only RNG and enables the ladder above 5%). Validate the
# DEFAULT path at the wikiv2 shape: 3 epochs, no ladder flag passed —
# must (a) log the auto-enable, (b) replay all three epochs bit-
# identically to the recorded ladder A/B at the SAME 3-epoch cosine
# horizon (losses 123.20457564459906 / 8.970548257008605 /
# 8.405445352889497 — the 50-epoch run's 122.9546 differs because the
# cosine horizon differs), (c) hit >=29% epoch MFU on warm epochs.
set -e -o pipefail
cd /root/repo
LOGF=runs/wikiv2/retriever_ladder_default/run.log
mkdir -p runs/wikiv2/retriever_ladder_default
timeout 5400 python - > "$LOGF" 2>&1 <<'EOF'
import logging
logging.basicConfig(level=logging.INFO)  # surface the auto-enable line
from rag4dyg_tpu.cli import _enable_compile_cache
_enable_compile_cache()
from rag4dyg_tpu.config import DATASETS
from rag4dyg_tpu.train.retriever import train_retriever
res = train_retriever(
    DATASETS["wikiv2"], "runs/wikiv2/resources",
    "runs/wikiv2/retriever_ladder_default",
    backbone_ckpt="runs/wikiv2/backbone_r2b/checkpoint-best",
    epochs=3, dtype="bfloat16", attention_impl="flash",
    save_every=1, resume=True,  # tonight's relay drops ~every 10 min
    gen_out_dir="runs/wikiv2/retriever_ladder_default/retrieval_result")
print("LADDER_DEFAULT_DONE", res.best_epoch, res.val_metrics)
EOF
SC=runs/wikiv2/retriever_ladder_default/logs/scalars.jsonl
python - "$SC" <<'EOF'
import json, sys
want = [123.20457564459906, 8.970548257008605, 8.405445352889497]
got = {}
for ln in open(sys.argv[1]):
    d = json.loads(ln)
    got[d["step"]] = d["train_loss"]
for e, w in enumerate(want):
    assert got.get(e) == w, f"epoch {e}: {got.get(e)!r} != {w!r}"
print("BIT-PARITY OK (3 epochs, 15 digits)")
EOF
grep -E "chunk-ladder auto|TFLOPS" "$LOGF" | head -10
echo LADDER_DEFAULT_OK
