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


def test_bench_runs_clean_end_to_end(tmp_path):
    """bench.py is the driver's perf surface and swallows per-query
    failures into -1 timings while still exiting 0 — a query that works
    under the correctness harness but breaks under the noop-write bench
    path would silently corrupt BENCH_r{N}. Run the whole inventory once
    at sf0.001 and assert valid JSON, full coverage, and zero failures."""
    import json

    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_BENCH_PASSES="1",
        SPARK_GRAFT_BENCH_CONCURRENCY="8",
    )
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        timeout=1200,
        cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    payload = json.loads(r.stdout.strip().splitlines()[-1])
    from fluvii_spark.queries import registry

    assert len(payload["queries"]) == len(registry())
    failed = [k for k, v in payload["queries"].items() if v < 0]
    assert not failed, f"bench-path failures (check stderr): {failed}"
