"""Smoke-runs every example script (FAST mode, CPU subprocess)."""

import glob
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLES = sorted(glob.glob(os.path.join(REPO, "examples", "0*.py")))


# one smoke example in the default tier; the rest (each a fresh
# subprocess paying full import+compile, ~30-60 s on one CPU) are
# slow-tier
def test_example_smoke():
    _run_example(EXAMPLES[0])


@pytest.mark.slow
@pytest.mark.parametrize(
    "script", EXAMPLES[1:],
    ids=[os.path.basename(e) for e in EXAMPLES[1:]])
def test_example_runs(script):
    _run_example(script)


def _run_example(script):
    env = dict(os.environ)
    env["SIONNA_TPU_EXAMPLES_CPU"] = "1"
    env["SIONNA_TPU_EXAMPLES_FAST"] = "1"
    env["PYTHONPATH"] = REPO
    env.pop("JAX_PLATFORMS", None)
    res = subprocess.run([sys.executable, script], env=env, cwd=REPO,
                         capture_output=True, text=True, timeout=900)
    assert res.returncode == 0, (
        f"{script} rc={res.returncode}\n{res.stdout[-1500:]}\n"
        f"{res.stderr[-3000:]}")
