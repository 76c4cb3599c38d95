#!/bin/bash
# Enforced chip-lowering canary gate (VERDICT r3 weak #5 / next #5).
#
# The project's known silent-failure mode: CPU interpret-mode Pallas
# accepts block specs that Mosaic REJECTS on real TPU (CLAUDE.md), so a
# green CPU suite cannot certify a pallas-spec change. This gate makes
# the on-chip canary mandatory: it hashes every file under
# rag4dyg_tpu/ops/ and compares against the hash recorded at the last
# on-chip `benchmarks/chip_canary.py` PASS (stamp file
# runs/canary_stamp/OPS_CANARY_PASS). If anything changed, it re-runs
# the canary ON CHIP and refuses (exit 1) unless it passes.
#
# Usage: queue scripts MUST run `bash runs/ops_canary_gate.sh` in their
# preamble before launching any flash/pallas job, and abort on non-zero.
# CI-style enforcement: tests/test_canary_gate.py fails the suite if the
# stamp is stale, so a contributor who edits an ops/ file cannot get a
# green suite without a fresh on-chip PASS.
set -e
cd "$(dirname "$0")/.."

STAMP=runs/canary_stamp/OPS_CANARY_PASS
mkdir -p runs/canary_stamp

current_hash() {
  # Stable digest over content of every tracked-or-not source under ops/.
  # NUL-delimited + LC_ALL=C sort on the repo-relative path string so the
  # order matches tests/test_canary_gate.py:_ops_hash exactly (ADVICE r4:
  # Path-object component sort vs raw-string sort can diverge once ops/
  # gains subdirectories; xargs without -0 breaks on spaces).
  find rag4dyg_tpu/ops -name '*.py' -type f -print0 | LC_ALL=C sort -z \
    | xargs -0 sha256sum | sha256sum | cut -d' ' -f1
}

CUR=$(current_hash)
if [ -f "$STAMP" ] && [ "$(cut -d' ' -f1 "$STAMP")" = "$CUR" ]; then
  echo "OPS CANARY GATE: ops/ unchanged since last on-chip PASS ($CUR)"
  exit 0
fi

echo "OPS CANARY GATE: ops/ changed (or no stamp) — running on-chip canary"
# Run to completion FIRST, then inspect: a `tee | grep -q` pipeline exits
# (and used to stamp PASS) as soon as the PASS line appeared, while the
# canary python could still crash later on the chip (ADVICE r4).
timeout 900 python benchmarks/chip_canary.py > /tmp/ops_canary_gate.log 2>&1
rc=$?
if [ "$rc" -eq 0 ] && grep -q "CHIP CANARY PASS" /tmp/ops_canary_gate.log; then
  echo "$CUR $(date -u '+%Y-%m-%d %H:%M:%S') PASS" > "$STAMP"
  echo "OPS CANARY GATE: PASS recorded -> $STAMP"
  exit 0
fi
echo "OPS CANARY GATE: canary rc=$rc" >&2

echo "OPS CANARY GATE: FAIL — on-chip canary did not pass; refusing to launch" >&2
echo "  (log: /tmp/ops_canary_gate.log; fix the pallas spec or rerun when the relay is up)" >&2
exit 1
