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
