#!/bin/bash
# Preempt r3q5 at its uci-backbone stage (right after the reddit sweep
# completes) and hand the chip to r3q7.sh's cheap-first reordering of
# everything that remains. Kills are by EXPLICIT PID only. The r3q6
# waiter and the wikiv2 handoff watcher must already be dead before this
# runs (otherwise killing r3q5 would also fire r3q6 concurrently).
Q5PID=${1:?usage: r3q7_watch.sh <r3q5-shell-pid>}
while kill -0 "$Q5PID" 2>/dev/null; do
  if grep -q "run uci-backbone" /tmp/r3q5/queue.log 2>/dev/null; then
    CHILDREN=$(ps -o pid= --ppid "$Q5PID")
    echo "r3q7 handoff $(date -u +%H:%M:%S): killing r3q5 ($Q5PID) + children: $CHILDREN"
    kill "$Q5PID" 2>/dev/null
    sleep 2
    for c in $CHILDREN; do kill "$c" 2>/dev/null; done
    sleep 5
    kill -9 "$Q5PID" 2>/dev/null
    for c in $CHILDREN; do kill -9 "$c" 2>/dev/null; done
    break
  fi
  sleep 60
done
# r3q5 is gone (preempted above, or exited/deadlined on its own);
# either way the chip is free for the reordered remainder.
mkdir -p /tmp/r3q7
exec bash /root/repo/runs/r3_queue/r3q7.sh >> /tmp/r3q7/queue.log 2>&1
