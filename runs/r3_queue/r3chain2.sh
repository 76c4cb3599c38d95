#!/bin/bash
# Supervisor: wait for the currently-running hepth sweep python (explicit
# PID passed as $1) to exit, then run chunk 2. The r3q1 queue SHELL was
# killed by PID to reorder priorities; its detached child finishes
# untouched (CLAUDE.md: kill by explicit PID only, check lineage).
HERE=$(dirname "$(readlink -f "$0")")
WAIT_PID=$1
while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
echo "pid $WAIT_PID exited at $(date -u)"
"$HERE/r3q2.sh"
echo "chain2 rc=$? at $(date -u)"
