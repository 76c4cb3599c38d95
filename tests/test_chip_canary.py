"""Opt-in on-chip Pallas lowering gate (automates the round-2 lesson).

CPU interpret mode accepts block specs the real Mosaic lowering rejects
(e.g. a (1, 1) SMEM block over an [N, 1] array), so interpret-only tests
cannot certify a kernel change — the certification must execute on the
chip. This test subprocesses ``benchmarks/chip_canary.py`` on the real
backend when ``RUN_CHIP_TESTS=1``:

    RUN_CHIP_TESTS=1 python -m pytest tests/test_chip_canary.py -q

and is skipped in the normal CPU suite (tests/conftest.py pins the cpu
platform in-process, so the canary needs its own interpreter to reach
the axon backend). Run it after ANY change to a pallas_call block spec,
before queueing long flash jobs.
"""

import os
import pathlib
import subprocess
import sys

import pytest

ROOT = pathlib.Path(__file__).resolve().parent.parent


@pytest.mark.skipif(
    os.environ.get("RUN_CHIP_TESTS") != "1",
    reason="on-chip canary needs the TPU relay; opt in with RUN_CHIP_TESTS=1",
)
def test_chip_canary_real_backend():
    env = dict(os.environ)
    # Drop the conftest's CPU pins so the fresh interpreter initializes
    # the axon (real TPU) platform from sitecustomize.
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, str(ROOT / "benchmarks" / "chip_canary.py")],
        capture_output=True, text=True, timeout=900, env=env, cwd=str(ROOT),
    )
    assert proc.returncode == 0, (
        f"chip canary failed rc={proc.returncode}\n"
        f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    )
    assert "platform:" in proc.stdout
