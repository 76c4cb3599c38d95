#!/bin/bash
# Round-3 chunk 6 (runs after r3q5 exits): the round's remaining
# engineering-run items, in cheap-first order so the deadline guard cuts
# from the bottom:
#  A. enron synthetic-fixture chain at FULL config (not smoke) — the 6th
#     dataset family end-to-end (prepare/annotate/query-time/backbone/
#     retriever/generator seeds 1,2,3 per scripts/train_generator/
#     train_rag_graphpooling_enron_seed.sh's committed loop).
#  B. MLP fusion at full reference scale (VERDICT r2 weak #3): UCI_13
#     generator --fusion mlp, seed 42, full dims — first non-smoke MLP
#     run; uses the r3q5-rebuilt UCI backbone.
#  C. wikiv2 retriever at the TRUE 50-epoch cosine horizon (VERDICT r2
#     missing #3; ~15 min/epoch bf16+flash, patience 5) — trains the
#     wikiv2 backbone first if r3q5's stage D was deadline-cut.
# Supervision framework identical to r3q5.sh (relay-probe before start,
# loopback-traffic watchdog while running, deterministic re-runs).
set -x
cd /root/repo
LOG=/tmp/r3q6
mkdir -p $LOG

DEADLINE=$(date -u -d '2026-08-19 12:40' +%s)
left() { echo $(( DEADLINE - $(date -u +%s) )); }

probe() {
  timeout 90 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128, 128))
assert float((x @ x).sum()) == 128.0 * 128 * 128
" > /dev/null 2>&1
}

wait_relay() {
  while [ "$(left)" -gt 600 ]; do
    if probe; then echo "RELAY UP $(date -u +%H:%M:%S)"; return 0; fi
    echo "relay down $(date -u +%H:%M:%S); sleeping 120"
    sleep 120
  done
  return 1
}

log_age() {
  [ -f "$1" ] || { echo 0; return; }
  echo $(( $(date +%s) - $(stat -c %Y "$1") ))
}

lo_bytes() { awk '/lo:/ {print $2}' /proc/net/dev; }

run() {
  name=$1; logf=$2; shift 2
  fails=0
  while true; do
    if [ "$(left)" -le 600 ]; then echo "SKIP $name: past deadline"; return 1; fi
    wait_relay || { echo "SKIP $name: deadline while relay down"; return 1; }
    echo "=== $(date -u +%H:%M:%S) $name (budget $(left)s) ==="
    "$@" >> "$logf" 2>&1 &
    JOB=$!
    quiet=0
    last_lo=$(lo_bytes)
    while kill -0 $JOB 2>/dev/null; do
      sleep 60
      now_lo=$(lo_bytes)
      if [ "$now_lo" -ne "$last_lo" ]; then quiet=0; else quiet=$((quiet+1)); fi
      last_lo=$now_lo
      age=$(log_age "$logf")
      if [ "$quiet" -ge 10 ] && [ "$age" -gt 300 ]; then
        echo "WATCHDOG $name: ${quiet}min zero lo traffic, log stale ${age}s — kill + rerun"
        kill $JOB 2>/dev/null; sleep 5; kill -9 $JOB 2>/dev/null
        break
      fi
      if [ "$(left)" -le 0 ]; then
        echo "DEADLINE $name: killing"
        kill $JOB 2>/dev/null; sleep 5; kill -9 $JOB 2>/dev/null
        return 1
      fi
    done
    wait $JOB; rc=$?
    echo "$name rc=$rc"
    [ $rc -eq 0 ] && return 0
    if [ $rc -ne 143 ] && [ $rc -ne 137 ]; then
      fails=$((fails + 1))
      if [ "$fails" -ge 3 ]; then echo "GIVEUP $name after $fails real fails"; return 1; fi
    fi
  done
}

# --- A. enron fixture chain, full config --------------------------------
run enron-pipeline $LOG/enron_pipeline.log \
    python -m rag4dyg_tpu.cli pipeline --dataset enron \
    --csv runs/enron_fixture/ml_enron.csv --out runs/enron_full

run enron-gen-sweep $LOG/enron_sweep.log \
    python -m rag4dyg_tpu.cli sweep --stage generator \
    --dataset enron --seeds 1,2,3 \
    --resources runs/enron_full/resources --out runs/enron_full/sweep_generator \
    --backbone runs/enron_full/backbone/checkpoint-best

# --- B. MLP fusion at full UCI scale ------------------------------------
if [ ! -f runs/uci_masked/backbone_r2b/checkpoint-best/params.msgpack ]; then
  run uci-backbone $LOG/uci_backbone.log \
      python -m rag4dyg_tpu.cli train-backbone --dataset UCI_13 \
      --resources runs/uci_masked/resources --out runs/uci_masked/backbone_r2b
fi
run uci-mlp-generator $LOG/uci_mlp.log \
    python -m rag4dyg_tpu.cli train-generator --dataset UCI_13 \
    --resources runs/uci_masked/resources --out runs/uci_masked/generator_mlp_r3 \
    --backbone runs/uci_masked/backbone_r2b/checkpoint-best \
    --fusion mlp

# --- C. wikiv2 true-50-epoch retriever horizon --------------------------
if [ ! -f runs/wikiv2/backbone_r2b/checkpoint-best/params.msgpack ]; then
  run wikiv2-backbone $LOG/wikiv2_backbone.log \
      python -m rag4dyg_tpu.cli train-backbone --dataset wikiv2 \
      --resources runs/wikiv2/resources --out runs/wikiv2/backbone_r2b
fi
run wikiv2-retriever-50ep $LOG/wikiv2_ret50.log \
    python -m rag4dyg_tpu.cli train-retriever --dataset wikiv2 \
    --resources runs/wikiv2/resources --out runs/wikiv2/retriever_r3_50ep \
    --backbone runs/wikiv2/backbone_r2b/checkpoint-best \
    --dtype bfloat16 --attention-impl flash

echo "R3Q6 DONE $(date -u)"
