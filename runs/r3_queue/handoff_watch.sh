#!/bin/bash
# Round-3 chip-budget handoff: r3q5's tail section (wikiv2 chain rebuild
# + sweep seeds 4..8) is the lowest value/hour left this round — RAG
# loses to the backbone on wikiv2 at n=5 (0/5 seeds, RESULTS.md), so
# five more seeds only tighten a negative result, and the chain rebuild
# alone costs ~2h of the ~1.5h that will remain. When r3q5 reaches the
# wikiv2-annotate stage, kill the queue shell and its running child (by
# EXPLICIT PID only — never pkill by pattern) so the r3q6 runner
# (waiting on the queue PID) hands the chip to the enron full-config
# chain and the full-scale MLP-fusion run instead. wikiv2 work moves to
# round 4 (deterministic replays; commands committed in r3q5.sh).
Q5PID=${1:?usage: handoff_watch.sh <r3q5-shell-pid>}
while kill -0 "$Q5PID" 2>/dev/null; do
  if grep -q "run wikiv2-annotate" /tmp/r3q5/queue.log 2>/dev/null; then
    CHILDREN=$(ps -o pid= --ppid "$Q5PID")
    echo "handoff $(date -u +%H:%M:%S): killing r3q5 ($Q5PID) + children: $CHILDREN"
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
echo "handoff watcher done $(date -u)"
