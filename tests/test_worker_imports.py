"""Worker-side import independence: Arrow-UDF operators must run even when
the DRIVING process starts outside the repo (different cwd, no PYTHONPATH) —
the exact environment a round driver or spark-submit job may use. The fix
under test is ``session.ensure_package_on_workers`` (addPyFile of the
package zip), mirroring a real cluster's ``--py-files`` deploy."""

from __future__ import annotations

import os
import subprocess
import sys

SCRIPT = r"""
import importlib.util, sys
spec = importlib.util.spec_from_file_location(
    "__spark_entry__", "{repo}/__spark_entry__.py")
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[2]")
         .config("spark.sql.shuffle.partitions", "2")
         .config("spark.ui.enabled", "false").getOrCreate())
# q76 plans a mapInPandas whose closure references a module-level helper —
# this collect() fails with worker-side ModuleNotFoundError without the fix.
n = mod.queries()["q76_multimodal_features"](spark, "{sf}").count()
assert n > 0, n
print("WORKER_IMPORT_OK", n)
spark.stop()
"""


def test_arrow_udf_query_runs_from_foreign_cwd(sf_dir, tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "drive_from_outside.py"
    script.write_text(SCRIPT.format(repo=repo, sf=sf_dir))
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    out = subprocess.run(
        [sys.executable, str(script)],
        cwd=str(tmp_path),  # NOT the repo root
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "WORKER_IMPORT_OK" in out.stdout


import pytest


@pytest.mark.skipif(
    os.environ.get("FLUVII_SPARK_STRESS") != "1",
    reason="set FLUVII_SPARK_STRESS=1 (spawns a second JVM, ~90s)",
)
def test_streaming_restart_from_foreign_cwd(tmp_path):
    """The full verify-recipe streaming drive (tools/stream_drive.py):
    stage -> stream through the keyed fold -> parquet sink -> stop ->
    restage -> restart on the same checkpoint -> exactly-once output,
    all with the driver cwd OUTSIDE the repo (the environment that
    exposes worker-side pickling/import failures)."""
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    out = subprocess.run(
        [sys.executable, os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools", "stream_drive.py")],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=400,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "STREAM_DRIVE_OK" in out.stdout
