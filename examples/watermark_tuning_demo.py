"""Demo: watermark tuning end to end — size it in batch, deploy it live.

The two halves of the late-data story (SURVEY §2.2's late-data row):

1. SIZE: the q177 inventory query replays the ingest sequence and
   reports, per event type, how many events arrive more than 1 h / 24 h
   behind the event-time high watermark — "exactly the rows a streaming
   watermark of that delay would drop";
2. DEPLOY: ``streaming_late_window_counts`` runs the chosen delay as a
   real ``withWatermark`` + tumbling windowed aggregation over a staged
   late-heavy stream, while ``LateDataAccountant`` (a
   StreamingQueryListener) harvests the engine's own per-batch
   watermarks and ``numRowsDroppedByWatermark``.

The demo ASSERTS the conservation law on the deployed stream: every
ingested row is either aggregated into a window or refused by the
watermark under the engine-reported per-batch watermark model (drop rule:
window end ≤ the batch's applied watermark; the applied watermark lags
the reported one by one micro-batch — both facts pinned in
tests/test_late_stream.py).

The real events fixture is time-ordered (q177 reports zero late rows on
it — the right answer), so the streaming half scrambles a deterministic
fraction of timestamps to manufacture lateness, the way a replay harness
would inject disorder.

Run:  python examples/watermark_tuning_demo.py
"""

from __future__ import annotations

import datetime as dt
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fluvii_spark import get_session
from fluvii_spark.queries import registry
from fluvii_spark.streaming.late import (
    LateDataAccountant,
    streaming_late_window_counts,
)

SF_DIR = os.environ.get("FLUVII_SPARK_DEMO_SF_DIR", "/root/testdata/sf0.001")
US_H = 3600 * 1_000_000
BASE = dt.datetime(2024, 1, 1)


def late_heavy_rows(n: int = 4000) -> list[tuple]:
    rows = []
    for i in range(n):
        ts = BASE + dt.timedelta(seconds=i * 10)
        if i >= n // 2 and i % 7 == 0:  # deterministic injected disorder
            ts -= dt.timedelta(hours=2 + (i % 4))
        rows.append(
            (i, ["view", "click", "purchase"][i % 3], ts, float(i % 13))
        )
    return rows


def main() -> None:
    spark = get_session(
        "watermark-tuning-demo", master="local[4]", shuffle_partitions=4
    )
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="fluvii_late_")
    try:
        # ---- 1. SIZE: the batch report -------------------------------
        print("q177 late-data report (sizes the watermark):")
        registry()["q177_late_data_report"].fn(spark, SF_DIR).show(
            truncate=False
        )

        # ---- 2. DEPLOY: watermarked windowed counts on a late stream -
        rows = late_heavy_rows()
        schema = "event_id long, event_type string, ts timestamp, value double"
        staged = os.path.join(root, "staged")
        os.makedirs(staged)
        chunk = (len(rows) + 3) // 4
        for i in range(4):
            part = rows[i * chunk : (i + 1) * chunk]
            d = os.path.join(root, f"build{i}")
            spark.createDataFrame(part, schema).coalesce(1).write.parquet(d)
            f = next(x for x in os.listdir(d) if x.endswith(".parquet"))
            dst = os.path.join(staged, f"{i:02d}.parquet")
            shutil.copy(os.path.join(d, f), dst)
            t = time.time() - 300 + i * 10
            os.utime(dst, (t, t))

        acct = LateDataAccountant("late_demo")
        spark.streams.addListener(acct)
        try:
            src = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", "1")
                .parquet(staged)
            )
            q = (
                streaming_late_window_counts(src, delay="1 hour", window="1 hour")
                .writeStream.format("memory")
                .outputMode("update")
                .queryName("late_demo")
                .option("checkpointLocation", os.path.join(root, "ck"))
                .start()
            )
            q.processAllAvailable()
            q.stop()
            q.awaitTermination(60)
        finally:
            spark.streams.removeListener(acct)

        t = acct.totals()
        print(
            f"ingested={t['rows_in']} engine-dropped(state rows)="
            f"{t['rows_dropped']} final watermark={t['last_watermark']}"
        )

        # conservation under the engine-reported watermark model
        reported = {}
        for b in t["batches"]:
            if b["rows_in"] and b["watermark"]:
                wm = dt.datetime.fromisoformat(
                    b["watermark"].replace("Z", "+00:00")
                )
                reported[b["batch_id"]] = max(
                    0, int(wm.timestamp() * 1_000_000)
                )
        dropped_src = 0
        for bid, wm_us in sorted(reported.items()):
            applied = reported.get(bid - 1, 0)
            if applied <= 0:
                continue
            for (eid, _et, ts, _v) in (
                rows[bid * chunk : (bid + 1) * chunk]
            ):
                t_us = int(ts.timestamp() * 1_000_000)
                if (t_us // US_H) * US_H + US_H <= applied:
                    dropped_src += 1
        kept = spark.sql(
            """
            SELECT sum(n_events) FROM (
              SELECT window_start, event_type, max(n_events) AS n_events
              FROM late_demo GROUP BY window_start, event_type)
            """
        ).collect()[0][0]
        assert kept == t["rows_in"] - dropped_src, (
            kept, t["rows_in"], dropped_src
        )
        assert t["rows_dropped"] > 0 and dropped_src >= t["rows_dropped"]
        print(
            f"conservation OK: kept={kept} + dropped_source={dropped_src} "
            f"== ingested={t['rows_in']} (engine metric counts "
            f"{t['rows_dropped']} post-partial-agg state rows)"
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
