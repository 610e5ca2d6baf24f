"""Test configuration: force an 8-device virtual CPU mesh before jax import."""

import os

# Force CPU: the ambient environment pins JAX_PLATFORMS=axon (remote TPU),
# which must not be used for unit tests.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pathlib

import pytest

REFERENCE_ROOT = pathlib.Path("/root/reference")


@pytest.fixture(scope="session")
def reference_root():
    """Path to the read-only reference checkout (skips if unavailable)."""
    if not REFERENCE_ROOT.exists():
        pytest.skip("reference repo not mounted")
    return REFERENCE_ROOT
