"""Exactly-once output via the idempotent foreachBatch pattern: a replayed
batch replaces its own output instead of duplicating it."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from fluvii_spark.io.readers import load_table
from fluvii_spark.io.sinks import eos_file_sink, idempotent_batch_writer


def test_replayed_batch_does_not_duplicate(spark, sf_dir, tmp_path):
    """Simulate Spark replaying a failed batch: run the same batch writer
    twice (second run = retry after 'crash'); output must equal one run."""
    out = str(tmp_path / "out")
    ev = load_table(spark, sf_dir, "events").limit(100)
    writer = idempotent_batch_writer(out)
    writer(ev, batch_id=3)
    first = spark.read.parquet(out).count()
    writer(ev, batch_id=3)  # replay
    again = spark.read.parquet(out).count()
    assert first == again == 100
    # a different batch appends its own partition
    writer(ev.limit(40), batch_id=4)
    assert spark.read.parquet(out).count() == 140
    assert sorted(
        r["batch_id"]
        for r in spark.read.parquet(out).select("batch_id").distinct().collect()
    ) == [3, 4]


def test_eos_file_sink_stream_restart(spark, sf_dir, tmp_path):
    """Full stream + checkpoint restart through the EOS sink: every event
    exactly once even though the sink has no transaction log of its own."""
    src_dir = str(tmp_path / "src")
    staged = str(tmp_path / "staged")
    os.makedirs(staged)
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    ev.repartition(4).write.parquet(src_dir)
    parts = sorted(f for f in os.listdir(src_dir) if f.endswith(".parquet"))
    for f in parts[:2]:
        shutil.copy(os.path.join(src_dir, f), os.path.join(staged, f))

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = spark.read.parquet(src_dir).schema

    def run_once():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(staged)
        )
        q = eos_file_sink(stream, out, ckpt).start()
        q.processAllAvailable()
        q.stop()

    run_once()
    for f in parts[2:]:
        shutil.copy(os.path.join(src_dir, f), os.path.join(staged, f))
    run_once()

    total = spark.read.parquet(src_dir).count()
    got = spark.read.parquet(out)
    assert got.count() == total
    assert got.select("event_id").distinct().count() == total


def test_stamp_eos_headers_replay_stable_and_null_safe(spark):
    """The EOS guid must be a function of batch content: stamping the same
    batch twice yields identical guids (crash-replay = same bytes), NULL and
    absent headers columns survive, duplicate (key,value) rows get distinct
    guids, and an upstream tracing guid is replaced, not duplicated."""
    from pyspark.sql import functions as F

    from fluvii_spark.io.kafka import stamp_eos_headers

    rows = [
        ("k1", "v1", [("guid", bytearray(b"old")), ("h", bytearray(b"x"))]),
        ("k1", "v1", None),  # duplicate payload + NULL headers
        (None, "v2", None),  # NULL key
    ]
    df = spark.createDataFrame(
        rows,
        "key STRING, value STRING, "
        "headers ARRAY<STRUCT<key STRING, value BINARY>>",
    ).select(
        F.col("key").cast("binary"), F.col("value").cast("binary"), "headers"
    )

    def guid_map(out_df, expect_batch=b"7"):
        got = {}
        for r in out_df.collect():
            hdrs = {h["key"]: bytes(h["value"]) for h in r["headers"]}
            n_guid = sum(1 for h in r["headers"] if h["key"] == "guid")
            assert n_guid == 1  # upstream guid replaced, exactly one left
            assert hdrs["batch_id"] == expect_batch
            got.setdefault((bytes(r["key"] or b""), bytes(r["value"])), set()).add(
                hdrs["guid"]
            )
        return got

    a = guid_map(stamp_eos_headers(df, 7))
    b = guid_map(stamp_eos_headers(df, 7))
    assert a == b  # replay-stable
    assert len(a[(b"k1", b"v1")]) == 2  # duplicate rows stay distinct
    # the carried non-guid header survives on one of the k1 rows
    kept = stamp_eos_headers(df, 7).collect()
    assert any(
        any(h["key"] == "h" for h in r["headers"]) for r in kept
    )
    # a different batch id changes every guid
    c = guid_map(stamp_eos_headers(df, 8), expect_batch=b"8")
    assert all(c[k].isdisjoint(a[k]) for k in a)

    # absent headers column works too
    no_hdr = df.drop("headers")
    d = guid_map(stamp_eos_headers(no_hdr, 7))
    assert set(d) == set(a)
