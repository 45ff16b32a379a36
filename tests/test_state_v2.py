"""transformWithStateInPandas backend — runs only where protobuf (the
API's state-server protocol dependency) is installed."""

from __future__ import annotations

import pytest

pytest.importorskip(
    "google.protobuf",
    reason="transformWithStateInPandas needs protobuf; use the state.py "
    "backend where it's absent",
)

from pyspark.sql import functions as F

from fluvii_spark.io.readers import load_table
from fluvii_spark.streaming.state_v2 import streaming_keyed_fold_v2


def _mk_fold():
    def fold(txn):
        msg = txn.value()
        st = txn.read_table_entry() or {"n": 0, "s": 0.0}
        st = {"n": st["n"] + 1, "s": st["s"] + float(msg["value"])}
        txn.update_table_entry(st)
        txn.produce(
            {
                "user_id": msg["user_id"],
                "event_id": msg["event_id"],
                "running": st["s"],
            }
        )

    return fold


def test_v2_fold_matches_batch(spark, sf_dir, tmp_path):
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        d = str(tmp_path / "ev")
        ev = load_table(spark, sf_dir, "events").withColumn(
            "ts", F.col("ts").cast("timestamp")
        )
        ev.coalesce(2).write.parquet(d)
        schema = spark.read.parquet(d).schema
        src = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(d)
        )
        out = streaming_keyed_fold_v2(
            src,
            ["user_id"],
            _mk_fold(),
            "user_id BIGINT, event_id BIGINT, running DOUBLE",
            order_by=["ts", "event_id"],
        )
        q = (
            out.writeStream.format("memory")
            .outputMode("append")
            .queryName("v2_fold")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .start()
        )
        q.processAllAvailable()
        q.stop()
        n = spark.sql("SELECT count(*) c FROM v2_fold").collect()[0]["c"]
        assert n == spark.read.parquet(d).count()
        got = {
            r["user_id"]: r["m"]
            for r in spark.sql(
                "SELECT user_id, max(running) m FROM v2_fold GROUP BY user_id"
            ).collect()
        }
        exp = {
            r["user_id"]: r["s"]
            for r in spark.read.parquet(d)
            .groupBy("user_id")
            .agg(F.sum("value").alias("s"))
            .collect()
        }
        for u, s in exp.items():
            assert abs(got[u] - s) < 1e-6
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_v2_fold_with_ttl_starts_and_folds(spark, sf_dir, tmp_path):
    """Regression: ttl_ms requires timeMode='processingTime' — under the old
    hard-coded timeMode='none' Spark rejected the TTL'd value state at
    startup, so the documented native-TTL path could never run. With a TTL
    far beyond the test window, results must equal the no-TTL fold."""
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        d = str(tmp_path / "ev")
        ev = load_table(spark, sf_dir, "events").withColumn(
            "ts", F.col("ts").cast("timestamp")
        ).limit(200)
        ev.coalesce(1).write.parquet(d)
        schema = spark.read.parquet(d).schema
        src = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(d)
        )
        out = streaming_keyed_fold_v2(
            src,
            ["user_id"],
            _mk_fold(),
            "user_id BIGINT, event_id BIGINT, running DOUBLE",
            order_by=["ts", "event_id"],
            ttl_ms=3_600_000,  # 1h — never expires within the test
        )
        q = (
            out.writeStream.format("memory")
            .outputMode("append")
            .queryName("v2_fold_ttl")
            .option("checkpointLocation", str(tmp_path / "ck_ttl"))
            .start()
        )
        q.processAllAvailable()
        q.stop()
        n = spark.sql("SELECT count(*) c FROM v2_fold_ttl").collect()[0]["c"]
        assert n == spark.read.parquet(d).count()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
