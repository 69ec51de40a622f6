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


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables between test modules.

    A full single-process suite run accumulates hundreds of XLA:CPU
    executables; with that state the LLVM JIT deterministically
    segfaults compiling one of the large lifted-LDPC programs
    (reproduced at tests/test_nr_goldens.py::
    test_tb_encoder_against_reference — the same program compiles
    fine in a fresh process).  Clearing caches at module boundaries
    keeps the compiler healthy and bounds memory."""
    yield
    jax.clear_caches()


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running tests (opt in with -m slow, "
                   "--runslow, or RUN_SLOW=1)")


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="run tests marked slow")


def pytest_collection_modifyitems(config, items):
    """Slow tests are opt-in: deselected unless --runslow / RUN_SLOW=1
    or an explicit -m expression mentioning 'slow' is given.

    Beyond in-file @pytest.mark.slow marks, the default-tier wall-time
    budget (<5 min on one CPU) is enforced by tests/tier_manifest.py:
    tests listed there are promoted to the slow tier centrally."""
    from tier_manifest import is_slow
    for item in items:
        if "slow" not in item.keywords and is_slow(item.nodeid):
            item.add_marker(pytest.mark.slow)
    if (config.getoption("--runslow")
            or os.environ.get("RUN_SLOW", "") == "1"
            or "slow" in (config.getoption("-m") or "")):
        return
    skip = pytest.mark.skip(reason="slow: opt in with --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
