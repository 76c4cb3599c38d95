#!/bin/bash
# Round-5 queue. Framework of runs/r4_queue/r5q1.sh with BOTH ADVICE r4
# medium findings fixed:
#  - run() launches every job via `setsid` and the watchdog/deadline
#    paths kill the whole PROCESS GROUP (`kill -- -$JOB`), so killing a
#    `bash hook.sh` wrapper can no longer orphan a python child that
#    keeps the chip (the round-4 two-concurrent-wikiv2-jobs failure).
#  - the preamble runs the enforced ops canary gate and aborts on
#    failure, so no flash/pallas job can reach the chip uncertified.
#
# Work: VERDICT r4 #2 — backbone seed sweeps for dialog/hepth/reddit
# (4 new seeds each; n=5 with the recorded canonical seed), interleaved
# per-seed with extension hooks (runs/r5_queue/extra_stage_*.sh, added
# while the queue runs) so short chip jobs never wait hours behind the
# sweeps. Hooks run in lexicographic order; a .done stamp prevents
# re-runs on queue relaunch.
set -x
cd /root/repo
LOG=/tmp/r5q
mkdir -p $LOG

DEADLINE_FILE=/root/repo/runs/r5_queue/DEADLINE_UTC
left() {
  local d
  d=$(cat "$DEADLINE_FILE" 2>/dev/null) || d='2026-08-21 04:05'
  [ -n "$d" ] || d='2026-08-21 04:05'
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

group_cpu() {  # summed utime+stime jiffies of the whole process group $1
  local total=0 pid
  for pid in $(ps -o pid= -g "$1" 2>/dev/null); do
    total=$(( total + $(awk '{print $14 + $15}' "/proc/$pid/stat" 2>/dev/null || echo 0) ))
  done
  echo $total
}

kill_group() {  # TERM then KILL the whole group (ADVICE r4 #1)
  kill -- -"$1" 2>/dev/null
  sleep 5
  kill -9 -- -"$1" 2>/dev/null
}

run() {
  name=$1; logf=$2; shift 2
  fails=0
  while true; do
    if [ "$(left)" -le 600 ]; then echo "SKIP $name: past deadline"; return 1; fi
    wait_relay || { echo "SKIP $name: deadline while relay down"; return 1; }
    echo "=== $(date -u +%H:%M:%S) $name (budget $(left)s) ==="
    setsid "$@" >> "$logf" 2>&1 &
    JOB=$!
    frozen=0
    last_cpu=$(group_cpu $JOB)
    while kill -0 $JOB 2>/dev/null; do
      sleep 60
      now_cpu=$(group_cpu $JOB)
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
            echo "WATCHDOG $name: frozen ${frozen}min despite live relay (dead channel?) — kill group + rerun"
            kill_group $JOB
            break
          fi
        else
          echo "WATCHDOG $name: frozen ${frozen}min and relay probe DOWN — kill group + rerun"
          kill_group $JOB
          break
        fi
      fi
      if [ "$(left)" -le 0 ]; then
        echo "DEADLINE $name: killing group"
        kill_group $JOB
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

have_seed() {
  [ -f "$1" ] && awk -F, -v d="$2" -v s="$3" '$2==d && $3==s {found=1} END {exit !found}' "$1"
}

# --- preamble: enforced pallas-certification gate (ADVICE r4 #2) -------------
wait_relay || exit 1
bash runs/ops_canary_gate.sh || { echo "CANARY GATE FAILED — refusing to run"; exit 1; }

drain_hooks() {
  local hook
  for hook in runs/r5_queue/extra_stage_*.sh; do
    [ -f "$hook" ] || continue
    [ -f "$hook.done" ] && continue
    # re-check the gate before each hook: hooks added mid-queue may
    # follow an ops/ edit
    bash runs/ops_canary_gate.sh || { echo "gate failed; skipping $hook"; continue; }
    run "$(basename $hook .sh)" "$LOG/$(basename $hook .sh).log" bash "$hook" \
      && touch "$hook.done"
    commit_stage "queue hook $(basename $hook .sh)"
  done
}

sweep_one() {  # sweep_one <runs-subdir> <dataset-name> <seed> [extra flags...]
  local dir=$1 ds=$2 seed=$3; shift 3
  local out=runs/$dir/sweep_backbone_r5
  have_seed "$out/sweep_results.csv" "$ds" "$seed" && return 0
  run "bb-$dir-s$seed" "$LOG/bb_$dir.log" \
      python -m rag4dyg_tpu.cli sweep --stage backbone --dataset "$ds" \
      --seeds "$seed" --resources "runs/$dir/resources" --out "$out" "$@"
  commit_stage "$ds backbone sweep seed $seed (VERDICT r4 #2)"
}

# --- work loop: hooks between every sweep seed -------------------------------
for SEED in 0 1 2 3; do
  drain_hooks
  sweep_one hepth hepth $SEED \
      --node-features /root/reference/resources/hepth/node_features.npy
  drain_hooks
  sweep_one reddit reddit $SEED
  drain_hooks
  sweep_one dialog dialog $SEED
done

# --- idle loop: pick up late hooks until the deadline ------------------------
while [ "$(left)" -gt 420 ]; do
  drain_hooks
  sleep 60
done
echo "R5Q DONE $(date -u)"
