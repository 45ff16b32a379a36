#!/usr/bin/env python
"""Benchmark harness: runs the declared query inventory end-to-end.

Runs every ``queries()`` entry at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line::

    {"metric": "...", "value": <total-sec>, "unit": "sec",
     "queries": {"q01_scan_project": sec, ...}, "sf": 0.1}

Execution is forced with the ``noop`` sink (full computation, no driver
collect) so the timing measures the distributed plan, not result transfer.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from fluvii_spark.queries import registry  # noqa: E402
from fluvii_spark.session import get_session  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")
    spark = get_session("fluvii-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = registry()
    timings: dict[str, float] = {}
    for name in sorted(qs):
        t0 = time.perf_counter()
        try:
            df = qs[name].fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # keep benching; a failed query shows as -1
            print(f"BENCH ERROR {name}: {type(e).__name__}: {e}", file=sys.stderr)
            timings[name] = -1.0
    total = round(sum(t for t in timings.values() if t >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
