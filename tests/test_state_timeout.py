"""State expiry: per-key processing-time timers close idle sessions and
bound state (no reference counterpart — its tables grow forever).

NOTE: with ProcessingTimeTimeout the engine keeps triggering timer-service
batches ("no new data but cleaning up state"), so ``processAllAvailable``
never returns — the test polls the sink with a deadline instead.
"""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import functions as F

from fluvii_spark.io.readers import load_table
from fluvii_spark.streaming.state import streaming_keyed_fold

OUT_SCHEMA = "user_id BIGINT, kind STRING, n BIGINT"


def _mk_fold():
    def fold(txn):
        st = txn.read_table_entry() or {"n": 0}
        st = {"n": st["n"] + 1}
        txn.update_table_entry(st)

    return fold


def _mk_on_timeout():
    def on_timeout(key, st):
        # close the session: emit a summary row, drop the state
        return None, [{"user_id": key, "kind": "closed", "n": st["n"]}]

    return on_timeout


def test_idle_keys_time_out_and_state_drops(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    staged = str(tmp_path / "staged")
    os.makedirs(staged)
    all_dir = str(tmp_path / "all")
    ev.coalesce(1).write.parquet(all_dir)
    f = next(x for x in os.listdir(all_dir) if x.endswith(".parquet"))
    shutil.copy(os.path.join(all_dir, f), os.path.join(staged, "b1.parquet"))

    schema = spark.read.parquet(all_dir).schema
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(staged)
    )
    out = streaming_keyed_fold(
        src,
        ["user_id"],
        _mk_fold(),
        OUT_SCHEMA,
        timeout_ms=100,
        on_timeout=_mk_on_timeout(),
    )
    q = (
        out.writeStream.format("memory")
        .outputMode("append")
        .queryName("ttl_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    n_users = ev.select("user_id").distinct().count()
    deadline = time.time() + 120
    try:
        while time.time() < deadline:
            n_closed = spark.sql(
                "SELECT count(*) c FROM ttl_stream WHERE kind = 'closed'"
            ).collect()[0]["c"]
            if n_closed >= n_users:
                break
            time.sleep(0.5)
    finally:
        q.stop()

    closed = spark.sql(
        "SELECT user_id, n FROM ttl_stream WHERE kind = 'closed'"
    ).collect()
    per_user = {
        r["user_id"]: r["n"]
        for r in ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    # every user's idle session closed EXACTLY once, with the full count
    # folded before expiry, and the state was dropped (no re-close)
    assert len(closed) == n_users, (len(closed), n_users)
    closed_map = {r["user_id"]: r["n"] for r in closed}
    assert closed_map == per_user


def test_keep_quiet_timeout_fires_once_per_key(spark, sf_dir, tmp_path):
    """on_timeout returning the SAME state object (identity) keeps the key
    but does NOT rewrite state or re-arm its timer (ADVICE r7): an idle,
    fully-flushed key fires its timer exactly once instead of once per
    timeout_ms forever — state-store churn that scales with the keyspace."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    staged = str(tmp_path / "staged")
    os.makedirs(staged)
    all_dir = str(tmp_path / "all")
    ev.coalesce(1).write.parquet(all_dir)
    f = next(x for x in os.listdir(all_dir) if x.endswith(".parquet"))
    shutil.copy(os.path.join(all_dir, f), os.path.join(staged, "b1.parquet"))

    def on_timeout(key, st):
        # emit a flush marker but KEEP the state untouched (identity)
        return st, [{"user_id": key, "kind": "flush", "n": st["n"]}]

    schema = spark.read.parquet(all_dir).schema
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(staged)
    )
    out = streaming_keyed_fold(
        src,
        ["user_id"],
        _mk_fold(),
        OUT_SCHEMA,
        timeout_ms=100,
        on_timeout=on_timeout,
    )
    q = (
        out.writeStream.format("memory")
        .outputMode("append")
        .queryName("quiet_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    n_users = ev.select("user_id").distinct().count()
    deadline = time.time() + 120
    try:
        while time.time() < deadline:
            n_flushed = spark.sql(
                "SELECT count(DISTINCT user_id) c FROM quiet_stream"
            ).collect()[0]["c"]
            if n_flushed >= n_users:
                break
            time.sleep(0.5)
        # every key has now timed out once; give the engine many more
        # timer periods — a re-armed timer would fire again and again
        time.sleep(2.0)
    finally:
        q.stop()

    rows = spark.sql(
        "SELECT user_id, count(*) c FROM quiet_stream GROUP BY user_id"
    ).collect()
    assert len(rows) == n_users
    repeats = {r["user_id"]: r["c"] for r in rows if r["c"] > 1}
    assert not repeats, f"timers re-fired for idle keys: {repeats}"
