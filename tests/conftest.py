"""Test harness for Sionna-TPU.

Runs on a virtual 8-device CPU mesh so multi-chip sharding paths are
exercised without TPU hardware (mirrors the reference's seeded
determinism fixtures, test/conftest.py:44-54).
"""

import os

# Must run before jax initializes a backend. Tests always run on a
# virtual 8-device CPU mesh (override any externally-set platform,
# e.g. a live TPU tunnel): set SIONNA_TPU_TEST_PLATFORM to opt out.
_platform = os.environ.get("SIONNA_TPU_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# Site plugins (e.g. an axon TPU tunnel) may force jax_platforms after
# the env var is read; re-assert the test platform via config.
jax.config.update("jax_platforms", _platform)

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def set_seed():
    """Deterministic global seed per test function."""
    from sionna_tpu.phy import config
    config.seed = 42
    config.precision = "single"
    yield


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running tests (opt in with -m slow)")
