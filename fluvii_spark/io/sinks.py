"""Exactly-once sink patterns (SURVEY.md §7 hard part #1 — the reference's
core promise, ``/root/reference/README.md:552-566``).

Spark's checkpoint makes *state* exactly-once; output to sinks without their
own transaction log (Kafka, JDBC, plain object-store directories) is
at-least-once on batch replay. The fix is the idempotent ``foreachBatch``
pattern: make each micro-batch's write a deterministic, self-replacing unit
keyed on ``batchId`` — a replayed batch overwrites its own output instead of
appending a duplicate. This is the file-backed form (testable without a
broker); :func:`fluvii_spark.io.kafka.eos_kafka_sink_writer` is the Kafka
form (guid/batch-id headers for consumer-side dedup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def idempotent_batch_writer(path: str, file_format: str = "parquet"):
    """``foreachBatch`` function: write batch N to ``path/batch_id=N/``,
    replacing any previous (partial or complete) attempt of the same batch.

    Dynamic partition overwrite touches ONLY the replayed batch's partition
    — committed batches are never rewritten, so the sink converges to
    exactly-once output under any number of replays.
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .write.format(file_format)
            .mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .save(path)
        )

    return write_batch


def eos_file_sink(df: DataFrame, path: str, checkpoint_dir: str):
    """Streaming writer using the idempotent batch pattern."""
    return (
        df.writeStream.foreachBatch(idempotent_batch_writer(path))
        .option("checkpointLocation", checkpoint_dir)
    )
