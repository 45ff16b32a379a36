"""Streaming late-data accounting (the q177 deployment twin, VERDICT r7
ask #6): withWatermark windowed counts + listener-harvested
numRowsDroppedByWatermark, pinned by a conservation law and a per-batch
watermark model driven by the ENGINE's own reported watermarks."""

from __future__ import annotations

import datetime as dt
import os
import shutil

from pyspark.sql import functions as F

from fluvii_spark.streaming.late import (
    LateDataAccountant,
    streaming_late_window_counts,
)

US_H = 3600 * 1_000_000
BASE = dt.datetime(2024, 1, 1, 0, 0, 0)


def _mk_rows():
    """4000 rows over ~11 hours, timestamps mostly advancing with row
    order; every 7th row in the back half arrives 2-5 h behind its
    neighbors — deterministic late data (the real events fixture is
    monotone in event_id, so it exercises no drops)."""
    rows = []
    for i in range(4000):
        ts = BASE + dt.timedelta(seconds=i * 10)
        if i >= 2000 and i % 7 == 0:
            ts -= dt.timedelta(hours=2 + (i % 4))
        rows.append(
            (i, f"u{i % 50}", ["view", "click", "purchase"][i % 3], ts, float(i % 13))
        )
    return rows


def _stage(spark, tmp_path, n_files=4):
    df = spark.createDataFrame(
        _mk_rows(),
        "event_id long, user_id string, event_type string, "
        "ts timestamp, value double",
    )
    staged = str(tmp_path / "staged")
    os.makedirs(staged)
    # contiguous row-order chunks = ingest replay order; one parquet file
    # per chunk so maxFilesPerTrigger=1 maps one chunk to one micro-batch
    per = 4000 // n_files
    batches = []
    for b in range(n_files):
        chunk = df.filter(
            (F.col("event_id") >= b * per) & (F.col("event_id") < (b + 1) * per)
        )
        cdir = str(tmp_path / f"chunk{b}")
        chunk.coalesce(1).write.parquet(cdir)
        f = next(x for x in os.listdir(cdir) if x.endswith(".parquet"))
        shutil.copy(os.path.join(cdir, f), os.path.join(staged, f"b{b}.parquet"))
        batches.append(chunk.select("event_id", "ts").collect())
    return df, staged, batches


def test_late_stream_conservation_and_model(spark, tmp_path):
    df, staged, batches = _stage(spark, tmp_path)
    schema = (
        "event_id long, user_id string, event_type string, "
        "ts timestamp, value double"
    )
    from fluvii_spark.metrics import FluviiMetricsListener, GaugeSet

    gauges = GaugeSet("late-test")
    metrics = FluviiMetricsListener(gauges)
    acct = LateDataAccountant("late_stream")
    spark.streams.addListener(acct)
    spark.streams.addListener(metrics)
    try:
        src = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(staged)
        )
        out = streaming_late_window_counts(
            src, delay="1 hour", window="1 hour"
        )
        q = (
            out.writeStream.format("memory")
            .outputMode("update")
            .queryName("late_stream")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.processAllAvailable()
        q.stop()
        q.awaitTermination(60)
    finally:
        spark.streams.removeListener(acct)
        spark.streams.removeListener(metrics)

    t = acct.totals()
    assert t["rows_in"] == 4000
    assert t["rows_dropped"] > 0, "fixture must actually exercise lateness"

    # --- per-batch drop model, driven by the ENGINE's own reported
    # watermarks: a source row is dropped iff its window END is at or
    # below the batch's APPLIED watermark, and the applied watermark lags
    # the reported one by one micro-batch (progress for batch b reports
    # the value computed from data through b-1; the filter in batch b
    # uses the value reported for b-1). Both facts are pinned here.
    def _wm_us(wm: str | None) -> int:
        if not wm:
            return 0
        wm_dt = dt.datetime.fromisoformat(wm.replace("Z", "+00:00"))
        return max(0, int(wm_dt.timestamp() * 1_000_000))

    reported = {
        b["batch_id"]: _wm_us(b["watermark"])
        for b in t["batches"]
        if b["rows_in"] > 0
    }
    model_dropped_src = 0  # source rows the watermark refuses
    model_dropped_state = 0  # distinct refused (window, type) groups/batch
    for bid in sorted(reported):
        applied = reported.get(bid - 1, 0)
        if applied <= 0 or bid >= len(batches):
            continue
        refused_groups = set()
        for r in batches[bid]:
            t_us = int(r["ts"].timestamp() * 1_000_000)
            wend = (t_us // US_H) * US_H + US_H
            if wend <= applied:
                model_dropped_src += 1
                refused_groups.add((wend, r["event_id"] % 3))
        model_dropped_state += len(refused_groups)

    # conservation against the SOURCE-row model: every ingested row is
    # either aggregated into a window or refused by the watermark
    final = spark.sql(
        """
        SELECT sum(n_events) AS kept FROM (
          SELECT window_start, event_type, max(n_events) AS n_events
          FROM late_stream GROUP BY window_start, event_type
        )
        """
    ).collect()[0]["kept"]
    assert model_dropped_src > 0
    assert final == t["rows_in"] - model_dropped_src, (
        final, t["rows_in"], model_dropped_src
    )

    # the engine metric counts STATE-INPUT rows (post partial-agg groups),
    # the documented lower bound on dropped source rows — exact match to
    # the group model, and <= the source model
    assert t["rows_dropped"] == model_dropped_state, (
        t["rows_dropped"], model_dropped_state, t["batches"]
    )
    assert t["rows_dropped"] <= model_dropped_src

    # the beyond-reference messages_late gauge sees the same engine metric
    assert gauges.get("messages_late") == t["rows_dropped"]
