"""Test configuration: force CPU with 8 virtual devices.

Must run before the first ``import jax`` anywhere in the test session so the
XLA client is created with the forced host platform.  Sharding tests then
see an 8-device mesh (the CPU stand-in for a v5e-8 slice).
"""

import os

# Force CPU even when the host environment preselects a TPU platform
# (e.g. JAX_PLATFORMS=axon): unit tests must not occupy the real chip.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# A sitecustomize may have imported jax at interpreter startup (before this
# file ran), in which case the env vars above were read too early; override
# through the config API — backends are created lazily, so this still wins
# as long as no computation has run yet.
import jax

jax.config.update("jax_platforms", "cpu")

# Keep the suite's XLA compile-cache entries out of the user's real
# ~/.cache (the simulators enable the persistent cache by default).
os.environ.setdefault("LBM_COMPILE_CACHE", "off")

import pathlib

import pytest

REFERENCE = pathlib.Path("/root/reference")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: full-length golden runs (deselect with -m 'not slow')"
    )
    config.addinivalue_line(
        "markers",
        "medium: heavy interpret-mode kernel/mesh combos — each has a "
        "fast-tier representative; run with `make test-medium`/`test-all`",
    )


@pytest.fixture(scope="session")
def reference_dir():
    if not REFERENCE.exists():
        pytest.skip("reference checkout not available")
    return REFERENCE
