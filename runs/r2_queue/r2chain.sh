#!/bin/bash
# Chain supervisor: wait for the r2q1.sh queue shell (explicit PID) to
# exit, then run chunk 1b (test30 parity eval), chunk 2, chunk 3
# sequentially. One TPU-compiling process at a time (CLAUDE.md).
# Invokes its committed siblings so the chain is self-contained.
HERE=$(dirname "$(readlink -f "$0")")
Q1_SHELL_PID=$1
while kill -0 "$Q1_SHELL_PID" 2>/dev/null; do sleep 30; done
echo "chunk1 shell $Q1_SHELL_PID exited at $(date -u)"
mkdir -p /tmp/r2q1b /tmp/r2q2 /tmp/r2q3
"$HERE/r2q1b.sh" > /tmp/r2q1b/queue.log 2>&1
echo "chunk1b rc=$? at $(date -u)"
"$HERE/r2q2.sh" > /tmp/r2q2/queue.log 2>&1
echo "chunk2 rc=$? at $(date -u)"
"$HERE/r2q3.sh" > /tmp/r2q3/queue.log 2>&1
echo "chunk3 rc=$? at $(date -u)"
echo "ALL CHUNKS DONE $(date -u)"
