"""Test configuration: force an 8-device virtual CPU mesh before jax import."""

import os

# Force CPU: the ambient environment pins JAX_PLATFORMS=axon (remote TPU)
# and the axon sitecustomize imports jax at interpreter startup, so the env
# var alone is not enough — override via jax.config as well (below).
# PARC_TEST_TPU=1 skips the forcing so TPU-gated tests (e.g.
# test_pallas.py::test_tpu_full_parity) can run on real hardware.
_ON_TPU = os.environ.get("PARC_TEST_TPU") == "1"
if not _ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

# persistent compilation cache: rerunning the suite skips recompiles
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")

import jax

if not _ON_TPU:
    jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

REFERENCE_ROOT = pathlib.Path("/root/reference")


@pytest.fixture(scope="session")
def reference_root():
    """Path to the read-only reference checkout (skips if unavailable)."""
    if not REFERENCE_ROOT.exists():
        pytest.skip("reference repo not mounted")
    return REFERENCE_ROOT
