#!/bin/bash
# Round-4 queue chunk 1. Same framework as r4q5.sh with the ADVICE r3
# fixes applied:
#  - the CSV-watcher subshell is spawned via setsid, bounded on the
#    parent PID being alive, and cleaned up with a trap that kills its
#    whole process group (ADVICE r3 #2/#4: an orphaned watcher used to
#    loop forever; kill $WATCH left an in-flight git child contending
#    with the tail commit).
#  - the dead stage-5 guard (grep for a string RESULTS.md already
#    contains, ADVICE r3 #3) is dropped; the scale-pool slot is now an
#    extension hook (runs runs/r4_queue/extra_stage_*.sh if present) so
#    stages can be appended while the queue runs.
# Stages: dialog batch-64 sweep tail (seeds recomputed from the CSV;
# interrupted seeds auto-resume from checkpoint) -> enron fixture chain
# at full config + seeds 1,2,3 -> hepth backbone restore -> wikiv2
# retriever at the TRUE 50-epoch cosine horizon -> extension hooks.
set -x
cd /root/repo
LOG=/tmp/r5q1
mkdir -p $LOG

DEADLINE_FILE=/root/repo/runs/r3_queue/DEADLINE_UTC
left() {
  local d
  d=$(cat "$DEADLINE_FILE" 2>/dev/null) || d='2026-08-20 19:45'
  [ -n "$d" ] || d='2026-08-20 19:45'
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

have_seed() {
  [ -f "$1" ] && awk -F, -v d="$2" -v s="$3" '$2==d && $3==s {found=1} END {exit !found}' "$1"
}

WATCH=
stop_watcher() {  # kill the watcher's whole process group, then reap
  [ -n "$WATCH" ] || return 0
  kill -- -"$WATCH" 2>/dev/null
  wait "$WATCH" 2>/dev/null
  WATCH=
}
trap stop_watcher EXIT

DIALOG_CSV=runs/dialog/sweep_generator_r3/sweep_results.csv

# --- 1. dialog batch-64 re-sweep: remaining seeds in ONE process ------------
missing=""
for S in 42 0 1 2 3 4 5 6 7 8; do
  have_seed $DIALOG_CSV dialog $S || missing="$missing,$S"
done
missing=${missing#,}
if [ -n "$missing" ]; then
  # per-row committer: commits each seed row as cli sweep appends it.
  # setsid gives it its own process group; the loop exits on its own if
  # this queue shell dies (ADVICE r3 #2).
  QUEUE_PID=$$
  setsid bash -c '
    last=$(wc -l < '"$DIALOG_CSV"' 2>/dev/null || echo 0)
    while kill -0 '"$QUEUE_PID"' 2>/dev/null; do
      sleep 60
      now=$(wc -l < '"$DIALOG_CSV"' 2>/dev/null || echo 0)
      if [ "$now" -gt "$last" ]; then
        seed=$(tail -1 '"$DIALOG_CSV"' | cut -d, -f3)
        bash runs/commit_artifacts.sh > /dev/null 2>&1
        git diff --cached --quiet || git commit -q -m "Dialog generator sweep seed $seed at the corrected batch-64 protocol"
        last=$now
      fi
    done
  ' &
  WATCH=$!
  run dialog-gen-batch $LOG/dialog_sweep.log \
      python -m rag4dyg_tpu.cli sweep --stage generator \
      --dataset dialog --seeds "$missing" \
      --resources runs/dialog/resources --out runs/dialog/sweep_generator_r3 \
      --backbone runs/dialog/backbone_r2b/checkpoint-best
  sleep 65  # let the watcher commit the final row
  stop_watcher
  commit_stage "Dialog generator sweep tail at the corrected batch-64 protocol"
fi

# --- 2. enron fixture chain at full config + seeds ---------------------------
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

# --- 3. hepth backbone restore (durability only) -----------------------------
if ! have_ckpt runs/hepth/backbone_r2b; then
  run hepth-backbone $LOG/hepth_backbone.log \
      python -m rag4dyg_tpu.cli train-backbone --dataset hepth \
      --resources runs/hepth/resources --out runs/hepth/backbone_r2b \
      --node-features /root/reference/resources/hepth/node_features.npy --save-every 1 --resume
  commit_stage "Restore hepth backbone_r2b checkpoint (deterministic replay)"
fi

# --- 4. wikiv2 retriever at the TRUE 50-epoch cosine horizon -----------------
if ! have_ckpt runs/wikiv2/retriever_r3_50ep; then
  rm -f runs/wikiv2/resources/retrieval_result/.from_r2b_replay
  run wikiv2-retriever-50ep $LOG/wikiv2_ret50.log \
      python -m rag4dyg_tpu.cli train-retriever --dataset wikiv2 \
      --resources runs/wikiv2/resources --out runs/wikiv2/retriever_r3_50ep \
      --backbone runs/wikiv2/backbone_r2b/checkpoint-best \
      --dtype bfloat16 --attention-impl flash --save-every 1 --resume
  commit_stage "wikiv2 retriever at the true 50-epoch cosine horizon"
fi

# --- 5. extension hooks: stages appended while the queue runs ----------------
# Each hook runs once; a .done stamp prevents re-runs on queue relaunch.
for hook in runs/r4_queue/extra_stage_*.sh; do
  [ -f "$hook" ] || continue
  [ -f "$hook.done" ] && continue
  run "$(basename $hook .sh)" "$LOG/$(basename $hook .sh).log" bash "$hook" \
    && touch "$hook.done"
  commit_stage "queue hook $(basename $hook .sh)"
done

echo "R5Q1 DONE $(date -u)"
