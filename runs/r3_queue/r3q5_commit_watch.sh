#!/bin/bash
# Durably commit reddit sweep rows as r3q5 lands them (r3q5 predates the
# r3q7 per-stage commit_stage helper and cannot be edited while running —
# bash reads scripts lazily). Polls the sweep CSV; on growth, force-adds
# the durable artifact set and commits. Exits when r3q5's shell is gone
# (r3q7 commits its own stages).
Q5PID=${1:?usage: r3q5_commit_watch.sh <r3q5-shell-pid>}
CSV=/root/repo/runs/reddit/sweep_generator_r3/sweep_results.csv
cd /root/repo
last=$(wc -l < "$CSV" 2>/dev/null || echo 0)
while kill -0 "$Q5PID" 2>/dev/null; do
  sleep 120
  now=$(wc -l < "$CSV" 2>/dev/null || echo 0)
  if [ "$now" -gt "$last" ]; then
    last=$now
    row=$(tail -1 "$CSV")
    seed=$(echo "$row" | cut -d, -f3)
    ndcg=$(echo "$row" | cut -d, -f12)
    bash runs/commit_artifacts.sh > /dev/null 2>&1
    for i in 1 2 3; do
      git diff --cached --quiet && break
      git commit -q -m "Reddit generator sweep seed $seed: test NDCG $ndcg (queue mid-sweep checkpoint)" && break
      sleep 10
      bash runs/commit_artifacts.sh > /dev/null 2>&1
    done
    echo "$(date -u +%H:%M:%S) committed seed $seed ndcg $ndcg"
  fi
done
echo "$(date -u +%H:%M:%S) r3q5 gone; watcher exiting"
