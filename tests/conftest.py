"""Test harness: run everything on a simulated 8-device CPU mesh.

Must set the env vars before jax initializes its backends — this file is
imported by pytest before any test module imports jax.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# Persistent compile cache: CPU test compiles are the bottleneck of the suite.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The axon TPU plugin's sitecustomize overrides jax_platforms programmatically;
# env vars alone are not enough to keep tests off the (single, tunneled) TPU.
jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()

import numpy as np
import pytest


def pytest_sessionstart(session):
    # Advertise the run so the TPU campaign runner never contends with the
    # suite on this 1-core host (scripts/r4_tpu_campaign.sh waits on this).
    try:
        with open("/tmp/pytest.pid", "w") as f:
            f.write(str(os.getpid()))
    except OSError:
        pass


def pytest_sessionfinish(session, exitstatus):
    try:
        if os.path.exists("/tmp/pytest.pid"):
            with open("/tmp/pytest.pid") as f:
                if f.read().strip() == str(os.getpid()):
                    os.remove("/tmp/pytest.pid")
    except OSError:
        pass


@pytest.fixture
def rng():
    return np.random.default_rng(35)
