"""Demo: dual-constraint session analytics, batch AND streaming.

The same session rules — a 30-minute idle gap closes a session, and a
hard 30-minute duration cap splits continuously-active streams (so a
bot's week-long click storm can't form one session) — run two ways:

- BATCH: the q226 inventory query (two window passes over the
  user-partitioned event stream, exact whole-second epoch arithmetic);
- STREAMING: ``streaming_sessions`` keeps the identical semantics
  incrementally with O(1) state per user, emitting sessions as they
  close — files stand in for topics so it runs anywhere (swap the file
  source for ``fluvii_spark.io.kafka`` builders on a real cluster).

Run:  python examples/session_analytics_demo.py
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
from fluvii_spark.streaming.sessionize import streaming_sessions

SF_DIR = os.environ.get("FLUVII_SPARK_DEMO_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_session("session-analytics-demo", master="local[4]",
                        shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="fluvii_sessions_")
    try:
        # ---- batch: the oracle-checked q226 rollup -------------------
        q = registry()["q226_capped_sessions"]
        print("batch session rollup (q226):")
        q.fn(spark, SF_DIR).show(truncate=False)

        # ---- streaming: sessions emitted as they close ---------------
        # stage events as 3 sequential time-range files (micro-batches);
        # mtimes pinned because FileStreamSource orders by (modTime, path)
        ev = (
            load_table(spark, SF_DIR, "events")
            .select("user_id", "ts", "event_id")
            .orderBy("ts", "event_id")
            .collect()
        )
        staged = os.path.join(root, "staged")
        os.makedirs(staged)
        chunk = (len(ev) + 2) // 3
        for i in range(3):
            rows = ev[i * chunk : (i + 1) * chunk]
            d = os.path.join(root, f"build{i}")
            spark.createDataFrame(
                rows, "user_id LONG, ts TIMESTAMP_NTZ, event_id LONG"
            ).coalesce(1).write.parquet(d)
            part = next(f for f in os.listdir(d) if f.endswith(".parquet"))
            dst = os.path.join(staged, f"{i:02d}.parquet")
            shutil.copy(os.path.join(d, part), dst)
            t = time.time() - 300 + i * 10
            os.utime(dst, (t, t))

        src = (
            spark.readStream.schema(
                "user_id LONG, ts TIMESTAMP_NTZ, event_id LONG"
            )
            .option("maxFilesPerTrigger", "1")
            .parquet(staged)
        )
        out, ck = os.path.join(root, "out"), os.path.join(root, "ck")
        # idle_flush emits every user's open tail once the stream drains,
        # so the streaming session set equals the batch one EXACTLY and
        # the q226 parity claim below is asserted, not just stated.
        # The flush window sits far above any micro-batch gap: a flush
        # firing MID-stream (a user absent from one staged file on a
        # slow host) would drop that user's state and split their
        # event-time session, breaking the exact-equality assert
        query = (
            streaming_sessions(src, gap_s=1800, cap_s=1800,
                               idle_flush_ms=15_000)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .start()
        )
        # NO processAllAvailable here: ProcessingTimeTimeout keeps the
        # engine running timer batches forever, so pAA never unblocks —
        # poll the sink instead (the test_idle_flush pattern)
        batch = q.fn(spark, SF_DIR).first()
        deadline = time.time() + 120
        n = 0
        while time.time() < deadline:
            try:
                n = spark.read.parquet(out).count()
            except Exception:  # sink not yet materialized
                n = 0
            if n >= batch["n_sessions"]:
                break
            time.sleep(0.5)
        query.stop()

        closed = spark.read.parquet(out)
        print(f"\nstreaming: {n} sessions (incl. flushed open tails):")
        closed.groupBy("closed_by").agg(
            F.count("*").alias("n_sessions"),
            F.round(F.avg("n_events"), 2).alias("avg_events"),
            F.max("span_s").alias("max_span_s"),
        ).show()

        got = closed.agg(
            F.count("*").alias("n_sessions"),
            F.round(
                F.sum("n_events").cast("double") / F.count("*"), 6
            ).alias("avg_events"),
            F.max("span_s").cast("bigint").alias("max_span_s"),
            F.count(F.when(F.col("closed_by") == "cap", 1))
            .cast("bigint")
            .alias("n_cap_chunks"),
        ).first()
        # every chunk the batch rollup counts as chunk>0 was OPENED by a
        # cap close, so cap-closed emissions == n_cap_chunks
        for k in ("n_sessions", "avg_events", "max_span_s", "n_cap_chunks"):
            assert got[k] == batch[k], (k, got[k], batch[k])
        print("streaming == batch on all four q226 stats ✔")
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
