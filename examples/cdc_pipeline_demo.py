"""Demo: CDC changelog materialization, batch AND streaming.

The same apply rules — views/clicks UPSERT a user's value, purchases are
TOMBSTONES, last writer wins — run two ways:

- BATCH: the q182 inventory query (one arg-max window per key over the
  whole log, then the live/tombstoned rollup);
- STREAMING: ``streaming_cdc_apply`` folds the same log incrementally
  with O(1) state per key, emitting each key's current materialized row
  as it changes (the micro-batch apply a MERGE-based lakehouse sink
  runs); ``cdc_snapshot`` compacts the emission log to the current
  table. Files stand in for topics so it runs anywhere — swap the file
  source for ``fluvii_spark.io.kafka`` builders on a real cluster.

The demo ASSERTS the streaming snapshot reproduces the batch rollup
exactly (live keys, tombstoned keys, DECIMAL-exact live total).

Run:  python examples/cdc_pipeline_demo.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

# allow running straight from a checkout (pip install -e . also works)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from fluvii_spark import get_session
from fluvii_spark.io.readers import load_table
from fluvii_spark.queries import registry
from fluvii_spark.streaming.cdc import (
    cdc_snapshot,
    events_to_cdc_changelog,
    streaming_cdc_apply,
)

SF_DIR = os.environ.get("FLUVII_SPARK_DEMO_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_session("cdc-pipeline-demo", master="local[4]",
                        shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="fluvii_cdc_")
    try:
        # ---- batch: the oracle-checked q182 rollup -------------------
        q = registry()["q182_cdc_apply"]
        print("batch CDC apply rollup (q182):")
        q.fn(spark, SF_DIR).show(truncate=False)

        # ---- stage the changelog as 3 sequential files (mtime-pinned:
        # FileStreamSource orders by (modTime, path)) -------------------
        log = (
            events_to_cdc_changelog(load_table(spark, SF_DIR, "events"))
            .orderBy("ts", "event_id")
            .collect()
        )
        staged = os.path.join(root, "staged")
        os.makedirs(staged)
        chunk = (len(log) + 2) // 3
        for i in range(3):
            rows = log[i * chunk : (i + 1) * chunk]
            d = os.path.join(root, f"build{i}")
            spark.createDataFrame(
                rows,
                "user_id LONG, ts TIMESTAMP_NTZ, event_id LONG, "
                "op STRING, v DOUBLE",
            ).coalesce(1).write.parquet(d)
            part = next(f for f in os.listdir(d) if f.endswith(".parquet"))
            dst = os.path.join(staged, f"{i:02d}.parquet")
            shutil.copy(os.path.join(d, part), dst)
            t = time.time() - 300 + i * 10
            os.utime(dst, (t, t))

        # ---- streaming: the MERGE-sink twin ---------------------------
        src = (
            spark.readStream.schema(
                "user_id LONG, ts TIMESTAMP_NTZ, event_id LONG, "
                "op STRING, v DOUBLE"
            )
            .option("maxFilesPerTrigger", "1")
            .parquet(staged)
        )
        out, ck = os.path.join(root, "out"), os.path.join(root, "ck")
        query = (
            streaming_cdc_apply(src)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .start()
        )
        query.processAllAvailable()  # no timers armed — pAA terminates
        query.stop()

        emissions = spark.read.parquet(out)
        print(f"\nstreaming: {emissions.count()} applied changes "
              f"({len(log)} in the log):")
        snap = cdc_snapshot(emissions, keep_tombstones=True)
        got = snap.agg(
            F.count(F.when(F.col("op") == "upsert", 1))
            .cast("bigint")
            .alias("live_keys"),
            F.count(F.when(F.col("op") == "delete", 1))
            .cast("bigint")
            .alias("tombstoned_keys"),
            F.round(
                F.sum(
                    F.when(
                        F.col("op") == "upsert",
                        F.col("v").cast("decimal(18,6)"),
                    )
                ).cast("double"),
                2,
            ).alias("live_value_total"),
        ).first()
        print("compacted snapshot rollup:")
        print(f"  live={got['live_keys']} tombstoned={got['tombstoned_keys']}"
              f" live_total={got['live_value_total']}")

        batch = q.fn(spark, SF_DIR).first()
        for k in ("live_keys", "tombstoned_keys", "live_value_total"):
            assert got[k] == batch[k], (k, got[k], batch[k])
        print("streaming snapshot == batch q182 on all three stats ✔")
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
