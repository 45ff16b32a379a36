"""Opt-in example-script smoke (FLUVII_SPARK_STRESS=1): every demo in
examples/ must run end-to-end in a fresh interpreter — demos are the
user-facing composition surface and silently rot without an executable
check. Each spawns its own JVM (~30-60 s), hence the env gate."""

from __future__ import annotations

import glob
import os
import subprocess
import sys

import pytest

STRESS = os.environ.get("FLUVII_SPARK_STRESS") == "1"
pytestmark = pytest.mark.skipif(
    not STRESS, reason="set FLUVII_SPARK_STRESS=1 to run example smoke"
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLES = sorted(glob.glob(os.path.join(REPO, "examples", "*_demo.py")))


@pytest.mark.parametrize(
    "path", EXAMPLES, ids=[os.path.basename(p) for p in EXAMPLES]
)
def test_example_runs(path):
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_CPUS", "4")  # demos don't need 32 threads
    out = subprocess.run(
        [sys.executable, path],
        capture_output=True,
        text=True,
        timeout=420,
        env=env,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-3000:]
