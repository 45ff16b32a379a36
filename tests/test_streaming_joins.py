"""Streaming joins: stream-static enrichment and stream-stream interval
joins must equal their batch equivalents on a file-replayed events table;
watermarks must actually drop late rows (the state-bounding contract)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fluvii_spark.io.readers import load_table, load_tables
from fluvii_spark.streaming.joins import (
    stream_static_join,
    stream_stream_interval_join,
)


@pytest.fixture(scope="module")
def events_batch(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


@pytest.fixture(scope="module")
def events_stream_dir(events_batch, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ev_join_stream"))
    events_batch.repartition(2).write.mode("overwrite").parquet(d)
    return d


def _read_stream(spark, d, schema):
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
    )


def _run_to_memory(df, name, tmp_path):
    q = (
        df.writeStream.format("memory")
        .outputMode("append")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / f"ck_{name}"))
        .start()
    )
    q.processAllAvailable()
    q.stop()


def test_stream_static_join_matches_batch(
    spark, sf_dir, events_batch, events_stream_dir, tmp_path
):
    """Enriching the event stream with the customer dim (user_id →
    c_custkey) must produce exactly the batch join's rows."""
    dim = load_tables(spark, sf_dir).customer.select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    schema = spark.read.parquet(events_stream_dir).schema
    src = _read_stream(spark, events_stream_dir, schema)
    out = stream_static_join(
        src.select("event_id", "user_id"), dim, on="user_id"
    )
    _run_to_memory(out, "ss_join", tmp_path)

    got = {
        (r["event_id"], r["c_mktsegment"])
        for r in spark.sql("SELECT event_id, c_mktsegment FROM ss_join").collect()
    }
    expected = {
        (r["event_id"], r["c_mktsegment"])
        for r in events_batch.select("event_id", "user_id")
        .join(dim, "user_id")
        .collect()
    }
    assert got == expected
    assert len(got) > 0


def test_stream_stream_interval_join_matches_batch(
    spark, events_batch, events_stream_dir, tmp_path
):
    """purchase←click correlation within [0, 300 s] per user: the streaming
    interval join (watermarked both sides) equals the batch join."""
    schema = spark.read.parquet(events_stream_dir).schema

    def split(df):
        pur = df.filter(F.col("event_type") == "purchase").select(
            "user_id",
            F.col("ts").cast("timestamp").alias("p_ts"),
            F.col("event_id").alias("p_id"),
        )
        clk = df.filter(F.col("event_type") == "click").select(
            F.col("user_id").alias("c_user"),
            F.col("ts").cast("timestamp").alias("c_ts"),
            F.col("event_id").alias("c_id"),
        )
        return pur, clk

    pur_s, clk_s = split(_read_stream(spark, events_stream_dir, schema))
    clk_s = clk_s.withColumnRenamed("c_user", "user_id")
    out = stream_stream_interval_join(
        pur_s,
        clk_s,
        key_cols=["user_id"],
        left_ts="p_ts",
        right_ts="c_ts",
        lower_s=0,
        upper_s=300,
        # wider than the table's whole time span: the part files interleave
        # event-time, so a tight watermark would (correctly!) drop
        # cross-batch rows and the result could not equal the batch join.
        # Eviction semantics are asserted separately below.
        watermark="3650 days",
    ).select("p_id", "c_id")
    _run_to_memory(out, "ssi_join", tmp_path)

    got = {
        (r["p_id"], r["c_id"])
        for r in spark.sql("SELECT * FROM ssi_join").collect()
    }
    pur_b, clk_b = split(events_batch)
    expected = {
        (r["p_id"], r["c_id"])
        for r in pur_b.join(
            clk_b,
            (pur_b["user_id"] == clk_b["c_user"])
            & (clk_b["c_ts"] >= pur_b["p_ts"])
            & (clk_b["c_ts"] <= pur_b["p_ts"] + F.expr("INTERVAL 300 SECOND")),
        ).collect()
    }
    assert got == expected
    assert len(got) > 0


def test_watermark_drops_late_rows(spark, tmp_path):
    """A row older than the watermark must be excluded from the windowed
    aggregate (append mode) — the semantics that bound state at scale.

    Spark filters late events with the PREVIOUS batch's watermark
    (`watermarkForLateEvents` lags eviction by one batch), so the drop
    needs three micro-batches: batch 0 sets max event time 12:00, batch 1
    promotes 11:50 to the late-event filter, batch 2's 10:01 row is then
    genuinely late and dropped.
    """
    import os
    import time as _time

    d = tmp_path / "late_src"
    batches = [
        [(1, "2024-01-01 10:00:30"), (2, "2024-01-01 12:00:00")],
        [(4, "2024-01-01 12:01:00")],
        [(3, "2024-01-01 10:01:00")],  # 2 h late vs watermark 11:50
    ]
    now = _time.time()
    for i, rows in enumerate(batches):
        bdf = spark.createDataFrame(rows, "id LONG, ts_s STRING").select(
            "id", F.col("ts_s").cast("timestamp").alias("ts")
        )
        bdf.coalesce(1).write.mode("append").parquet(str(d))
        # pin strictly increasing mtimes: the file source orders batches by
        # (modTime, path) and back-to-back writes can tie on modTime
        for p in d.iterdir():
            if p.name.startswith("part-") and p.stat().st_mtime > now - 1:
                os.utime(p, (now - 60 + i, now - 60 + i))

    schema = spark.read.parquet(str(d)).schema
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(d))
    )
    agg = (
        src.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 minute").alias("w"))
        .agg(F.count("*").alias("n"), F.sum("id").alias("id_sum"))
    )
    q = (
        agg.writeStream.format("memory")
        .outputMode("append")
        .queryName("late_agg")
        .option("checkpointLocation", str(tmp_path / "ck_late"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    rows = spark.sql("SELECT id_sum FROM late_agg").collect()
    id_sums = {r["id_sum"] for r in rows}
    # id=3's late row must NOT appear anywhere (its window was finalized)
    assert 3 not in id_sums and 4 not in id_sums
    # the on-time 10:00 window was finalized once the watermark passed it
    assert 1 in id_sums


def test_foreach_batch_join_against_materialized_stream(
    spark, events_batch, events_stream_dir, tmp_path
):
    """The foreachBatch stream↔stream pattern: stream B materializes to a
    parquet sink; stream A's micro-batches join against that sink and write
    through the idempotent batch writer. Result == the batch join."""
    from fluvii_spark.streaming.joins import foreach_batch_join_writer

    schema = events_batch.schema
    b_out = str(tmp_path / "b_out")
    a_out = str(tmp_path / "a_out")

    # stream B: per-user click counts, materialized as the "other side"
    b = (
        _read_stream(spark, events_stream_dir, schema)
        .filter(F.col("event_type") == "click")
        .select("user_id", "event_id")
    )
    qb = (
        b.writeStream.format("parquet")
        .option("path", b_out)
        .option("checkpointLocation", str(tmp_path / "ck_b"))
        .start()
    )
    qb.processAllAvailable()
    qb.stop()

    # stream A: purchases, joined per micro-batch against B's full sink
    a = (
        _read_stream(spark, events_stream_dir, schema)
        .filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("event_id").alias("purchase_id"))
    )
    qa = (
        a.writeStream.foreachBatch(
            foreach_batch_join_writer(
                b_out, on="user_id", sink_path=a_out, how="inner",
                broadcast_other=True,
            )
        )
        .option("checkpointLocation", str(tmp_path / "ck_a"))
        .start()
    )
    qa.processAllAvailable()
    qa.stop()

    got = spark.read.parquet(a_out).select("user_id", "purchase_id", "event_id")
    clicks = events_batch.filter(F.col("event_type") == "click").select(
        "user_id", "event_id"
    )
    purchases = events_batch.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id")
    )
    expected = purchases.join(clicks, "user_id")
    assert got.count() == expected.count()
    assert (
        got.exceptAll(expected).count() == 0
        and expected.exceptAll(got).count() == 0
    )


def test_streaming_dedup_within_watermark_matches_batch(spark, tmp_path):
    """dropDuplicatesWithinWatermark parity: duplicates arriving within the
    watermark horizon collapse to one row per key, matching the batch
    dropDuplicates on the same data."""
    import datetime as dt
    import os
    import time

    from fluvii_spark.streaming.windows import streaming_dedup

    base = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows1 = [(i, base + dt.timedelta(seconds=i)) for i in range(20)]
    # batch 2 repeats ids 0..9 at the same ts (dup within watermark) + new
    rows2 = [(i, base + dt.timedelta(seconds=i)) for i in range(10)] + [
        (100 + i, base + dt.timedelta(seconds=30 + i)) for i in range(5)
    ]
    staged = str(tmp_path / "staged")
    os.makedirs(staged)
    for i, rows in enumerate([rows1, rows2]):
        d = str(tmp_path / f"b{i}")
        spark.createDataFrame(rows, "event_id LONG, ts TIMESTAMP").coalesce(
            1
        ).write.parquet(d)
        part = next(f for f in os.listdir(d) if f.endswith(".parquet"))
        dst = os.path.join(staged, f"{i:02d}.parquet")
        os.rename(os.path.join(d, part), dst)
        t = time.time() - 120 + i * 10
        os.utime(dst, (t, t))

    schema = spark.read.parquet(staged).schema
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(staged)
    )
    out = streaming_dedup(src, ["event_id"], ts_col="ts", within="1 hour")
    q = (
        out.writeStream.format("memory")
        .outputMode("append")
        .queryName("dedup_wm")
        .option("checkpointLocation", str(tmp_path / "ck_wm"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got_ids = sorted(
        r["event_id"] for r in spark.sql("SELECT event_id FROM dedup_wm").collect()
    )
    expected_ids = sorted(set(i for i, _ in rows1) | set(i for i, _ in rows2))
    assert got_ids == expected_ids  # each key exactly once


def test_streaming_hourly_grain_feeds_anomaly_gate(
    spark, sf_dir, events_stream_dir, tmp_path
):
    """Continuous-aggregate pattern: streaming maintains the hourly count
    grain (windowed agg over the replayed stream); the 2-sigma anomaly gate
    (q112) then runs in batch ON THE GRAIN — never the raw events — and must
    equal the all-batch q112 on the same data."""
    from fluvii_spark.queries import registry

    schema = spark.read.parquet(events_stream_dir).schema
    src = _read_stream(spark, events_stream_dir, schema)
    hourly = (
        src.select(F.window("ts", "1 hour").alias("w"), "event_type")
        .groupBy("w", "event_type")
        .agg(F.count("*").alias("n"))
    )
    q = (
        hourly.writeStream.format("memory")
        .outputMode("complete")
        .queryName("hourly_grain")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    grain = (
        spark.table("hourly_grain")
        .select(F.col("w.start").alias("bucket"), "event_type", "n")
        .localCheckpoint()  # break lineage: stats below re-joins the grain
    )
    stats = grain.groupBy("event_type").agg(
        F.round(F.avg("n"), 6).alias("m"),
        F.round(F.stddev_samp("n"), 6).alias("s"),
    )
    stream_out = (
        grain.join(F.broadcast(stats), "event_type")
        .filter(F.abs(F.col("n") - F.col("m")) > 2 * F.col("s"))
        .select(
            "bucket",
            "event_type",
            F.col("n").cast("bigint").alias("n"),
            F.round((F.col("n") - F.col("m")) / F.col("s"), 6).alias("z"),
        )
    )
    batch = registry()["q112_rate_anomaly"].fn(spark, sf_dir)
    got = sorted(tuple(r) for r in stream_out.collect())
    want = sorted(tuple(r) for r in batch.collect())
    assert got == want and len(want) > 0


def test_interval_join_outer_keeps_keys(spark):
    """Regression: stream_stream_interval_join dropped the RIGHT key copy
    after an outer join, nulling the key for unmatched right rows (the left
    copy is NULL there). Keys must survive via coalesce on every side."""
    import datetime as dt

    from fluvii_spark.streaming.joins import stream_stream_interval_join

    base = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [("a", base, 1)], "k STRING, lts TIMESTAMP, lv INT"
    )
    right = spark.createDataFrame(
        [
            ("a", base + dt.timedelta(seconds=5), 10),   # in-window match
            ("b", base + dt.timedelta(seconds=5), 20),   # unmatched key
        ],
        "k STRING, rts TIMESTAMP, rv INT",
    )
    out = {
        r["k"]: (r["lv"], r["rv"])
        for r in stream_stream_interval_join(
            left, right, ["k"], "lts", "rts", 0, 60, how="fullOuter"
        ).collect()
    }
    assert out["a"] == (1, 10)
    assert out["b"] == (None, 20)  # key kept, left side NULL-padded
    assert None not in out  # no nulled-out keys


def test_interval_join_self_join_same_source(spark, tmp_path):
    """stream_stream_interval_join must work when BOTH sides derive from
    the SAME streaming source (the funnel self-join shape) — plan-alias
    qualification keeps Spark's ambiguous-self-join check out of it."""
    import os

    from pyspark.sql import functions as F

    from fluvii_spark.streaming.joins import stream_stream_interval_join

    src_dir = str(tmp_path / "ev")
    rows = [
        (1, 10, "view", "2024-01-01 00:00:00"),
        (2, 10, "purchase", "2024-01-01 00:30:00"),   # within 1h of view 1
        (3, 10, "purchase", "2024-01-01 02:00:00"),   # outside
        (4, 11, "view", "2024-01-01 01:00:00"),
        (5, 11, "purchase", "2024-01-01 01:10:00"),   # within
        (6, 12, "purchase", "2024-01-01 00:10:00"),   # no view at all
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    df.coalesce(1).write.parquet(src_dir)

    src = (
        spark.readStream.schema(spark.read.parquet(src_dir).schema)
        .parquet(src_dir)
    )
    views = src.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("v_ts"), F.col("event_id").alias("v_id")
    )
    buys = src.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts"), F.col("event_id").alias("p_id")
    )
    out = stream_stream_interval_join(
        views, buys, ["user_id"], "v_ts", "p_ts",
        lower_s=0, upper_s=3600, watermark="1 hour",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("self_ij")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(str(tmp_path), "ck"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r["user_id"], r["v_id"], r["p_id"])
        for r in spark.sql("select * from self_ij").collect()
    }
    assert got == {(10, 1, 2), (11, 4, 5)}
