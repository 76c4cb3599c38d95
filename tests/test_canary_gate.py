"""Suite-level enforcement of the on-chip Pallas canary gate.

VERDICT r3 weak #5: CPU interpret-mode Pallas accepts block specs that
Mosaic rejects on real TPU, so interpret-only tests cannot certify a
pallas-spec change — the repo's known silent-failure mode. This test
makes the on-chip canary a *gate*, not a convention: if any file under
``rag4dyg_tpu/ops/`` differs from the hash recorded at the last on-chip
``benchmarks/chip_canary.py`` PASS (stamp: runs/canary_stamp/
OPS_CANARY_PASS, written by runs/ops_canary_gate.sh), the suite goes
red with instructions to re-certify. Escape hatch for local iteration:
``OPS_CANARY_ALLOW_STALE=1`` (queue launches must NOT set it).
"""

import hashlib
import os
import subprocess
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
STAMP = REPO / "runs" / "canary_stamp" / "OPS_CANARY_PASS"


def _ops_hash() -> str:
    # Mirrors runs/ops_canary_gate.sh:current_hash (sha256 of the sorted
    # `sha256sum` manifest of every .py under rag4dyg_tpu/ops/). Sort on
    # the repo-relative path STRING — identical to the shell side's
    # LC_ALL=C byte sort — not on Path objects, whose component-wise
    # order diverges for some subdirectory layouts (ADVICE r4).
    files = sorted((REPO / "rag4dyg_tpu" / "ops").rglob("*.py"),
                   key=lambda f: str(f.relative_to(REPO)))
    manifest = "".join(
        f"{hashlib.sha256(f.read_bytes()).hexdigest()}  {f.relative_to(REPO)}\n"
        for f in files
    )
    return hashlib.sha256(manifest.encode()).hexdigest()


def test_gate_script_hash_agrees():
    """The shell gate and this test must compute the same digest."""
    sh = subprocess.run(
        ["bash", "-c",
         "cd '%s' && find rag4dyg_tpu/ops -name '*.py' -type f -print0"
         " | LC_ALL=C sort -z | xargs -0 sha256sum | sha256sum"
         " | cut -d' ' -f1" % REPO],
        capture_output=True, text=True, check=True)
    assert sh.stdout.strip() == _ops_hash()


def test_ops_canary_stamp_fresh():
    if os.environ.get("OPS_CANARY_ALLOW_STALE") == "1":
        return
    assert STAMP.is_file(), (
        "No on-chip canary stamp. Run `bash runs/ops_canary_gate.sh` "
        "(needs the TPU relay) to certify rag4dyg_tpu/ops/ on real "
        "hardware — CPU interpret mode cannot catch Mosaic lowering "
        "rejections."
    )
    recorded = STAMP.read_text().split()[0]
    assert recorded == _ops_hash(), (
        "rag4dyg_tpu/ops/ changed since the last ON-CHIP canary PASS. "
        "Interpret-mode tests cannot certify pallas specs (Mosaic "
        "rejects specs CPU accepts) — run `bash runs/ops_canary_gate.sh` "
        "on a live relay to re-certify, or export "
        "OPS_CANARY_ALLOW_STALE=1 while iterating locally."
    )
