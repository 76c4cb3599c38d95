#!/bin/bash
# Round-3 continuation chunk 4: SAME stages as r4q2.sh, with a FIXED
# hang watchdog. r4q2's zero-loopback-traffic heuristic never fires on
# this VM (the firecracker control plane chatters on lo constantly), so
# a job whose grpc channel died with the relay blocked forever. The new
# watchdog tracks the JOB's own CPU-time advance (/proc/PID/stat
# utime+stime): a live remote dispatch leaves host CPU frozen too, so a
# frozen+stale job triggers an explicit relay probe — probe DOWN kills
# immediately (no progress is possible), probe UP waits 25 min before
# killing (covers the ~15 min zero-host-CPU wikiv2 epoch dispatch while
# still recovering from a dead channel after a relay bounce).
# Stage order (unchanged from r4q2):
#   1. wikiv2 generator sweep seeds 4..8   (n=10; compile already warm)
#   2. UCI generator sweep seeds 4..8      (n=10; ~8 min/seed)
#   3. dialog chain + batch-64 re-sweep    (headline-critical: round-2
#      dialog rows were invalidated by the batch-32 launcher bug)
#   4. enron fixture chain at full config + seeds
#   5. hepth backbone restore (durability only)
#   6. wikiv2 retriever true-50-epoch horizon (expensive, ~1.5h, runs
#      only after every wikiv2 sweep seed is recorded — it overwrites
#      the shared .gen retrieval inputs)
#   7. 100k-pool .gen-ranking measurement if round-3's log lacks it
# Each stage self-skips on its durable artifact; safe to relaunch
# verbatim any number of times. Supervision framework = r4q1.sh.
set -x
cd /root/repo
LOG=/tmp/r4q2
mkdir -p $LOG

DEADLINE_FILE=/root/repo/runs/r3_queue/DEADLINE_UTC
left() {
  local d
  d=$(cat "$DEADLINE_FILE" 2>/dev/null) || d='2026-08-20 05:30'
  [ -n "$d" ] || d='2026-08-20 05:30'
  echo $(( $(date -u -d "$d" +%s) - $(date -u +%s) ))
}

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

job_cpu() {  # utime+stime jiffies of PID $1 (0 if gone)
  awk '{print $14 + $15}' "/proc/$1/stat" 2>/dev/null || echo 0
}

run() {
  name=$1; logf=$2; shift 2
  fails=0
  while true; do
    if [ "$(left)" -le 600 ]; then echo "SKIP $name: past deadline"; return 1; fi
    wait_relay || { echo "SKIP $name: deadline while relay down"; return 1; }
    echo "=== $(date -u +%H:%M:%S) $name (budget $(left)s) ==="
    "$@" >> "$logf" 2>&1 &
    JOB=$!
    frozen=0
    last_cpu=$(job_cpu $JOB)
    while kill -0 $JOB 2>/dev/null; do
      sleep 60
      now_cpu=$(job_cpu $JOB)
      age=$(log_age "$logf")
      # <0.5 s CPU in a minute AND log stale 5 min = no host-side progress
      if [ $(( now_cpu - last_cpu )) -lt 50 ] && [ "$age" -gt 300 ]; then
        frozen=$((frozen+1))
      else
        frozen=0
      fi
      last_cpu=$now_cpu
      if [ "$frozen" -ge 5 ]; then
        if probe; then
          if [ "$frozen" -ge 25 ]; then
            echo "WATCHDOG $name: frozen ${frozen}min despite live relay (dead channel?) — kill + rerun"
            kill $JOB 2>/dev/null; sleep 5; kill -9 $JOB 2>/dev/null
            break
          fi
        else
          echo "WATCHDOG $name: frozen ${frozen}min and relay probe DOWN — kill + rerun"
          kill $JOB 2>/dev/null; sleep 5; kill -9 $JOB 2>/dev/null
          break
        fi
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

commit_stage() {
  local msg=$1 i
  bash runs/commit_artifacts.sh > /dev/null 2>&1
  for i in 1 2 3; do
    if git diff --cached --quiet; then return 0; fi
    git commit -q -m "$msg" && return 0
    sleep 10
    bash runs/commit_artifacts.sh > /dev/null 2>&1
  done
  echo "commit_stage FAILED: $msg"
}

have_ckpt() { [ -f "$1/checkpoint-best/params.msgpack" ]; }

have_seed() {  # have_seed CSV DATASET SEED — true if the sweep row exists
  [ -f "$1" ] && awk -F, -v d="$2" -v s="$3" '$2==d && $3==s {found=1} END {exit !found}' "$1"
}

# --- 0. wikiv2 chain prerequisites (all durable already; self-skip) -------
if ! [ -f runs/wikiv2/resources/train_retrieval/train_index.retrieval ]; then
  run wikiv2-annotate $LOG/wikiv2_annotate.log \
      python -m rag4dyg_tpu.cli annotate --dataset wikiv2 \
      --resources runs/wikiv2/resources
fi
if ! have_ckpt runs/wikiv2/backbone_r2b; then
  run wikiv2-backbone $LOG/wikiv2_backbone.log \
      python -m rag4dyg_tpu.cli train-backbone --dataset wikiv2 \
      --resources runs/wikiv2/resources --out runs/wikiv2/backbone_r2b --save-every 1 --resume
  commit_stage "Restore wikiv2 backbone_r2b checkpoint (deterministic replay)"
fi
if ! have_ckpt runs/wikiv2/retriever_r2b \
   || ! [ -f runs/wikiv2/resources/retrieval_result/.from_r2b_replay ]; then
  run wikiv2-retriever $LOG/wikiv2_retriever.log \
      python -m rag4dyg_tpu.cli train-retriever --dataset wikiv2 \
      --resources runs/wikiv2/resources --out runs/wikiv2/retriever_r2b \
      --backbone runs/wikiv2/backbone_r2b/checkpoint-best \
      --epochs 6 --dtype bfloat16 --attention-impl flash \
      --save-every 1 --resume \
  && touch runs/wikiv2/resources/retrieval_result/.from_r2b_replay
  commit_stage "Restore wikiv2 retriever_r2b checkpoint + round-2 .gen files (deterministic replay)"
fi

# --- 1. wikiv2 generator sweep tail -> n=10 --------------------------------
for S in 4 5 6 7 8; do
  have_seed runs/wikiv2/sweep_generator_r2/sweep_results.csv wikiv2 $S && continue
  if ! [ -f runs/wikiv2/resources/retrieval_result/.from_r2b_replay ]; then
    echo "SKIP wikiv2-gen-$S: retrieval_result provenance is not the r2b replay"
    continue
  fi
  run wikiv2-gen-$S $LOG/wikiv2_sweep.log \
      python -m rag4dyg_tpu.cli sweep --stage generator \
      --dataset wikiv2 --seeds $S \
      --resources runs/wikiv2/resources --out runs/wikiv2/sweep_generator_r2 \
      --backbone runs/wikiv2/backbone_r2b/checkpoint-best
  commit_stage "wikiv2 generator sweep seed $S (toward n=10)"
done

# --- 2. UCI sweep completion ------------------------------------------------
if ! have_ckpt runs/uci_masked/backbone_r2b; then
  run uci-backbone $LOG/uci_backbone.log \
      python -m rag4dyg_tpu.cli train-backbone --dataset UCI_13 \
      --resources runs/uci_masked/resources --out runs/uci_masked/backbone_r2b --save-every 1 --resume
  commit_stage "Restore UCI backbone_r2b checkpoint (deterministic replay)"
fi
for S in 42 0 1 2 3 4 5 6 7 8; do
  have_seed runs/uci_masked/sweep_generator_r3/sweep_results.csv UCI_13 $S && continue
  run uci-gen-$S $LOG/uci_sweep.log \
      python -m rag4dyg_tpu.cli sweep --stage generator \
      --dataset UCI_13 --seeds $S \
      --resources runs/uci_masked/resources --out runs/uci_masked/sweep_generator_r3 \
      --backbone runs/uci_masked/backbone_r2b/checkpoint-best
  commit_stage "UCI generator sweep seed $S (toward n=10)"
done

# --- 3. dialog chain + corrected batch-64 re-sweep --------------------------
if ! [ -f runs/dialog/resources/train_retrieval/train_index.retrieval ]; then
  run dialog-annotate $LOG/dialog_annotate.log \
      python -m rag4dyg_tpu.cli annotate --dataset dialog \
      --resources runs/dialog/resources
fi
if ! have_ckpt runs/dialog/backbone_r2b; then
  run dialog-backbone $LOG/dialog_backbone.log \
      python -m rag4dyg_tpu.cli train-backbone --dataset dialog \
      --resources runs/dialog/resources --out runs/dialog/backbone_r2b --save-every 1 --resume
  commit_stage "Restore dialog backbone_r2b checkpoint (deterministic replay)"
fi
if ! have_ckpt runs/dialog/retriever_r2b \
   || ! [ -f runs/dialog/resources/retrieval_result/val_index.gen ]; then
  run dialog-retriever $LOG/dialog_retriever.log \
      python -m rag4dyg_tpu.cli train-retriever --dataset dialog \
      --resources runs/dialog/resources --out runs/dialog/retriever_r2b \
      --backbone runs/dialog/backbone_r2b/checkpoint-best --save-every 1 --resume
  commit_stage "Restore dialog retriever_r2b checkpoint + round-2 .gen files (deterministic replay)"
fi
for S in 42 0 1 2 3 4 5 6 7 8; do
  have_seed runs/dialog/sweep_generator_r3/sweep_results.csv dialog $S && continue
  run dialog-gen-$S $LOG/dialog_sweep.log \
      python -m rag4dyg_tpu.cli sweep --stage generator \
      --dataset dialog --seeds $S \
      --resources runs/dialog/resources --out runs/dialog/sweep_generator_r3 \
      --backbone runs/dialog/backbone_r2b/checkpoint-best
  commit_stage "Dialog generator sweep seed $S at the corrected batch-64 protocol"
done

# --- 4. enron fixture chain at full config + seeds ---------------------------
if ! [ -f runs/enron_full/generator/results.csv ]; then
  run enron-pipeline $LOG/enron_pipeline.log \
      python -m rag4dyg_tpu.cli pipeline --dataset enron \
      --csv runs/enron_fixture/ml_enron.csv --out runs/enron_full
  commit_stage "enron fixture chain at full reference config"
fi
for S in 1 2 3; do
  have_seed runs/enron_full/sweep_generator/sweep_results.csv enron $S && continue
  run enron-gen-$S $LOG/enron_sweep.log \
      python -m rag4dyg_tpu.cli sweep --stage generator \
      --dataset enron --seeds $S \
      --resources runs/enron_full/resources --out runs/enron_full/sweep_generator \
      --backbone runs/enron_full/backbone/checkpoint-best
  commit_stage "enron generator sweep seed $S"
done

# --- 5. UCI MLP fusion at full scale (durable since r3; self-skips) ----------
if ! [ -f runs/uci_masked/generator_mlp_r3/results.csv ]; then
  run uci-mlp-generator $LOG/uci_mlp.log \
      python -m rag4dyg_tpu.cli train-generator --dataset UCI_13 \
      --resources runs/uci_masked/resources --out runs/uci_masked/generator_mlp_r3 \
      --backbone runs/uci_masked/backbone_r2b/checkpoint-best \
      --fusion mlp --save-every 1 --resume
  commit_stage "MLP fusion generator at full UCI scale"
fi

# --- 6. hepth backbone restore (durability only) -----------------------------
if ! have_ckpt runs/hepth/backbone_r2b; then
  run hepth-backbone $LOG/hepth_backbone.log \
      python -m rag4dyg_tpu.cli train-backbone --dataset hepth \
      --resources runs/hepth/resources --out runs/hepth/backbone_r2b \
      --node-features /root/reference/resources/hepth/node_features.npy --save-every 1 --resume
  commit_stage "Restore hepth backbone_r2b checkpoint (deterministic replay)"
fi

# --- 7. wikiv2 retriever at the TRUE 50-epoch cosine horizon -----------------
# Runs only once every wikiv2 sweep seed is recorded: it overwrites the
# shared .gen files (provenance marker cleared first).
if ! have_ckpt runs/wikiv2/retriever_r3_50ep; then
  missing=0
  for S in 42 0 1 2 3 4 5 6 7 8; do
    have_seed runs/wikiv2/sweep_generator_r2/sweep_results.csv wikiv2 $S || missing=1
  done
  if [ "$missing" -eq 0 ]; then
    rm -f runs/wikiv2/resources/retrieval_result/.from_r2b_replay
    run wikiv2-retriever-50ep $LOG/wikiv2_ret50.log \
        python -m rag4dyg_tpu.cli train-retriever --dataset wikiv2 \
        --resources runs/wikiv2/resources --out runs/wikiv2/retriever_r3_50ep \
        --backbone runs/wikiv2/backbone_r2b/checkpoint-best \
        --dtype bfloat16 --attention-impl flash --save-every 1 --resume
    commit_stage "wikiv2 retriever at the true 50-epoch cosine horizon"
  else
    echo "DEFER wikiv2-retriever-50ep: sweep seeds missing"
  fi
fi

# --- 8. 100k-pool .gen-ranking measurement (already recorded in round 3;
#        re-run only if no log anywhere says gen_rank) ------------------------
if ! grep -q "gen_rank" /tmp/r3q7/scale_pool_r3.log /tmp/r4q1/scale_pool.log \
     $LOG/scale_pool.log 2>/dev/null \
   && ! grep -q "Round-3 re-measurement" RESULTS.md; then
  run scale-pool $LOG/scale_pool.log \
      python benchmarks/scale_pool.py --mode chip --skip-reddit \
      --skip-jaccard-synthetic
fi

echo "R4Q2 DONE $(date -u)"
