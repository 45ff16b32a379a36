#!/usr/bin/env python
"""Bounded-state stream summaries demo: the mergeable-sketch trio.

Replays the events table as a 3-batch file stream and maintains, per
event_type, the three classic O(small) stream summaries this engine ships
(`fluvii_spark/streaming/sketch.py`):

- KMV (k-minimum values)  — distinct user estimate, O(k) state, mergeable,
  replay-idempotent (bit-equal to the batch q102 sketch);
- Misra-Gries             — heavy-hitter items, O(m) counters, every item
  above n/m frequency guaranteed tracked;
- MRL/KLL quantiles       — running median of `value`, O(k log n) state,
  deterministic compaction.

The reference (a Kafka client library) keeps unbounded per-key JSON blobs
(fluvii/components/sqlite/sqlite.py); these sketches are what the same
keyed-fold contract looks like when state must stay bounded at 100 TB.

Run: python examples/sketch_trio_demo.py [sf_dir]
"""
from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from fluvii_spark import get_session, load_tables  # noqa: E402
from fluvii_spark.streaming.sketch import (  # noqa: E402
    streaming_heavy_hitters,
    streaming_kmv_distinct,
    streaming_quantile,
    streaming_trending,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_session("sketch-trio-demo")
    spark.sparkContext.setLogLevel("ERROR")
    events = load_tables(spark, sf_dir).events

    work = tempfile.mkdtemp(prefix="sketch_trio_")
    src_dir = os.path.join(work, "stream")
    for m in range(3):
        events.filter(F.col("event_id") % 3 == m).coalesce(1).write.mode(
            "append"
        ).parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema

    def replay():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src_dir)
        )

    # --- KMV distinct users per type --------------------------------------
    hashed = replay().select(
        "event_type",
        (
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 8),
                16,
                10,
            ).cast("long")
            / F.lit(4294967296.0)
        ).alias("h"),
    )
    runs = [
        ("kmv", streaming_kmv_distinct(hashed, "event_type", "h")),
        (
            "mg",
            streaming_heavy_hitters(
                replay().select(
                    "event_type",
                    "ts",
                    "event_id",
                    (F.col("user_id") % 10).cast("string").alias("item"),
                ),
                "event_type",
                "item",
                m=4,
                order_by=["ts", "event_id"],
            ),
        ),
        (
            "mrl",
            streaming_quantile(
                replay().select("event_type", "ts", "event_id", "value"),
                "event_type",
                "value",
                q=0.5,
                order_by=["ts", "event_id"],
            ),
        ),
        (
            "trend",
            streaming_trending(
                replay().select(
                    "event_type",
                    "ts",
                    "event_id",
                    (F.col("user_id") % 10).cast("string").alias("item"),
                ),
                "event_type",
                "item",
                ts_col="ts",
                window="1 day",
                m=3,
                order_by=["ts", "event_id"],
            ),
        ),
    ]
    for name, out in runs:
        q = (
            out.writeStream.format("memory")
            .outputMode("append")
            .queryName(f"demo_{name}")
            .option(
                "checkpointLocation", os.path.join(work, f"ck_{name}")
            )
            .start()
        )
        q.processAllAvailable()
        q.stop()

    print("\n== KMV distinct-user estimates (final row per key) ==")
    spark.sql(
        """
        SELECT event_type, max(n_kept) AS n_kept,
               max(estimate) AS distinct_estimate
        FROM demo_kmv GROUP BY event_type ORDER BY event_type
        """
    ).show(truncate=False)

    print("== Misra-Gries: final tracked-item counts per key ==")
    spark.sql(
        """
        SELECT event_type, max(n_seen) AS n_seen,
               max_by(n_tracked, n_seen) AS n_tracked
        FROM demo_mg GROUP BY event_type ORDER BY event_type
        """
    ).show(truncate=False)

    print("== MRL: running-median estimate vs exact batch median ==")
    mrl = spark.sql(
        """
        SELECT event_type, max(n_seen) AS n,
               max_by(estimate, n_seen) AS median_estimate,
               max_by(n_stored, n_seen) AS sketch_size
        FROM demo_mrl GROUP BY event_type
        """
    )
    exact = events.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("exact_median")
    )
    mrl.join(exact, "event_type").orderBy("event_type").show(truncate=False)

    print("== Trending: top tracked item per (type, day window) ==")
    spark.sql(
        """
        SELECT event_type, window_start,
               max_by(item, n_seen) AS last_item,
               max(n_seen) AS n_in_window,
               max_by(n_tracked, n_seen) AS n_tracked
        FROM demo_trend
        GROUP BY event_type, window_start
        ORDER BY event_type, window_start
        """
    ).show(8, truncate=False)


if __name__ == "__main__":
    main()
