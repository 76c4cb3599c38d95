"""Test harness config: force CPU with 8 virtual devices so sharding tests
run without real multi-chip hardware. Must run before jax is imported."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import pathlib  # noqa: E402

import pytest  # noqa: E402

REFERENCE = pathlib.Path("/root/reference")


@pytest.fixture(scope="session")
def reference_path():
    if not REFERENCE.exists():
        pytest.skip("reference repo not mounted")
    return REFERENCE
