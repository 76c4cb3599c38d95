"""Test harness config: force CPU with 8 virtual devices so sharding tests
run without real multi-chip hardware.

This environment registers a remote-TPU ("axon") JAX backend from
sitecustomize at interpreter startup and pins ``jax_platforms=axon,cpu``
via jax.config — which silently overrides the JAX_PLATFORMS env var. Tests
must run on local CPU (the tunnel makes every distinct jit compile a
multi-second round-trip and has produced hangs), so we both set the env
vars AND override the config knob back to cpu before any backend is used.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
os.environ["XLA_FLAGS"] = flags.strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pathlib  # noqa: E402

import pytest  # noqa: E402

REFERENCE = pathlib.Path("/root/reference")


@pytest.fixture(scope="session")
def reference_path():
    if not REFERENCE.exists():
        pytest.skip("reference repo not mounted")
    return REFERENCE


def pytest_sessionstart(session):
    assert jax.default_backend() == "cpu", (
        f"tests must run on CPU, got {jax.default_backend()}")
    assert len(jax.devices()) == 8
