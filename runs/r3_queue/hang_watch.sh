#!/bin/bash
# Hang watcher for queue children: the r3q5/r3q6 `run` wrapper detects
# hangs via zero LOOPBACK traffic, but background lo chatter (relay
# proxy keepalives, ~2 KB/s) keeps the counter moving, so a job wedged
# on a dead RPC is never killed (observed 04:45-05:05 UTC Aug 19:
# reddit seed-0 generator, 0 CPU ticks / no log line for 18 min while
# the relay was dead). This watcher uses the job's OWN CPU time instead:
# a JAX training driver always burns host CPU between dispatches
# (batch prep, result copies); <1 s of CPU per minute for 10
# consecutive minutes means wedged — kill the job BY PID so the queue
# wrapper's rerun path takes over (rc 143/137 does not count as a real
# failure there). Worst case a false kill costs one deterministic
# re-run.
#
# Threshold 10 min: the longest legitimate host-idle wait observed is
# the first eval-decode compile (~225 s); dispatches are capped ~100 s.
#
# Usage: hang_watch.sh  (daemon; scans for python cli jobs every minute)
declare -A last_cpu quiet
while true; do
  sleep 60
  # explicit listing (list-only; kills are by explicit PID below)
  for pid in $(ps -eo pid=,args= | awk '/python -m rag4dyg_tpu.cli/ && !/awk/ {print $1}'); do
    cpu=$(awk '{print $14+$15}' /proc/$pid/stat 2>/dev/null) || continue
    prev=${last_cpu[$pid]:-}
    last_cpu[$pid]=$cpu
    [ -z "$prev" ] && continue
    if [ $((cpu - prev)) -lt 100 ]; then   # <1 s CPU (100 ticks) this minute
      quiet[$pid]=$(( ${quiet[$pid]:-0} + 1 ))
    else
      quiet[$pid]=0
    fi
    if [ "${quiet[$pid]}" -ge 10 ]; then
      echo "$(date -u +%H:%M:%S) HANG pid $pid ($(tr '\0' ' ' < /proc/$pid/cmdline 2>/dev/null | cut -c1-120)): 10 min <1s CPU — killing"
      kill "$pid" 2>/dev/null
      sleep 5
      kill -9 "$pid" 2>/dev/null
      unset "quiet[$pid]" "last_cpu[$pid]"
    fi
  done
done
