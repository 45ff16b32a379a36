"""t1 smoke: streaming stateful parity — the Spark analogue of the
reference's integration test (tests/temp_integration/integration.py:97-122),
which asserts (a) exact output count (no loss, no duplication), (b) final
state per key equals the fold of every input, (c) consistency across
restart. Here the broker is replaced by a file-source replay of the events
table and the restart by a checkpoint stop/start."""

from __future__ import annotations

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from fluvii_spark.io.readers import load_table
from fluvii_spark.streaming import MapApp, TableApp, batch_keyed_fold
from fluvii_spark.streaming.windows import streaming_dedup, tumbling

START_BALANCE = 10000.0


def _make_running_balance():
    """Factory keeps the fold function's qualname under <locals> so
    cloudpickle serializes it by value — test modules aren't importable on
    Spark workers."""

    def running_balance(txn):
        # mirrors the reference's demo consumer semantics (examples/
        # fluvii_demo_current_2023/consumer/fluvii_consumer_ex.py:21-42):
        # per-key running balance folded from event values, one output/input
        msg = txn.value()
        st = txn.read_table_entry() or {"balance": START_BALANCE, "n": 0}
        st = {"balance": st["balance"] + float(msg["value"]), "n": st["n"] + 1}
        txn.update_table_entry(st)
        txn.produce(
            {
                "user_id": msg["user_id"],
                "event_id": msg["event_id"],
                "balance": st["balance"],
            }
        )

    return running_balance


running_balance = _make_running_balance()


OUT_SCHEMA = "user_id BIGINT, event_id BIGINT, balance DOUBLE"


@pytest.fixture(scope="module")
def stream_dir(spark, sf_dir, tmp_path_factory):
    """events split into 4 part files so the file source yields 4 batches."""
    d = str(tmp_path_factory.mktemp("events_stream"))
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    ev.repartition(4).write.mode("overwrite").parquet(d)
    return d


def _read_stream(spark, stream_dir, files_per_trigger=1):
    schema = spark.read.parquet(stream_dir).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(files_per_trigger))
        .parquet(stream_dir)
    )


def test_stateful_fold_matches_batch_and_counts(spark, sf_dir, stream_dir, tmp_path):
    """Exact output cardinality + final per-key state == batch fold."""
    src = _read_stream(spark, stream_dir)
    app = TableApp(
        src,
        running_balance,
        key_cols=["user_id"],
        output_schema=OUT_SCHEMA,
    )
    q = app.start(
        sink_format="memory",
        checkpoint_dir=str(tmp_path / "ckpt"),
        query_name="balance_stream",
    )
    q.processAllAvailable()
    q.stop()

    out = spark.sql("SELECT * FROM balance_stream")
    ev = spark.read.parquet(stream_dir)
    n_events = ev.count()
    # (a) no loss, no duplication: one output row per input row
    assert out.count() == n_events
    assert out.select("event_id").distinct().count() == n_events

    # (b) final balance per key == order-independent fold of all inputs
    expected = (
        ev.groupBy("user_id")
        .agg((F.lit(START_BALANCE) + F.sum("value")).alias("balance"))
        .collect()
    )
    # last emitted balance per key (max n == final) — balances are cumulative,
    # so the final state equals the batch fold regardless of fold order
    final_state = batch_keyed_fold(
        ev,
        ["user_id"],
        running_balance,
        OUT_SCHEMA,
        order_by=["ts", "event_id"],
        emit_state=True,
    ).collect()
    got = {int(r["key"]): json.loads(r["state"])["balance"] for r in final_state}
    for row in expected:
        assert got[row["user_id"]] == pytest.approx(row["balance"], rel=1e-9)


def test_checkpoint_restart_no_loss_no_dup(spark, sf_dir, stream_dir, tmp_path):
    """Reference EOS invariant across restart: stop the query mid-stream,
    restart on the same checkpoint with more data present, and the union of
    outputs has every event exactly once (integration.py:97-122 analogue)."""
    staged = str(tmp_path / "staged")
    os.makedirs(staged)
    parts = sorted(
        f for f in os.listdir(stream_dir) if f.endswith(".parquet")
    )
    assert len(parts) == 4
    # stage only the first two files
    for f in parts[:2]:
        shutil.copy(os.path.join(stream_dir, f), os.path.join(staged, f))

    ckpt = str(tmp_path / "ckpt2")
    out_dir = str(tmp_path / "out")

    def start(name):
        # file sink: the only built-in sink with checkpoint recovery AND
        # exactly-once output (memory sink refuses to recover)
        src = _read_stream(spark, staged)
        app = TableApp(
            src, running_balance, key_cols=["user_id"], output_schema=OUT_SCHEMA
        )
        return app.start(
            sink_format="parquet",
            checkpoint_dir=ckpt,
            query_name=name,
            path=out_dir,
        )

    q1 = start("restart_a")
    q1.processAllAvailable()
    q1.stop()
    n_first = spark.read.parquet(out_dir).count()
    assert n_first > 0

    # more data arrives while "down"
    for f in parts[2:]:
        shutil.copy(os.path.join(stream_dir, f), os.path.join(staged, f))

    q2 = start("restart_b")
    q2.processAllAvailable()
    q2.stop()

    total = spark.read.parquet(stream_dir).count()
    out_ids = spark.read.parquet(out_dir).select("event_id")
    # exactly-once across the restart: no loss, no duplication
    assert out_ids.count() == total
    assert out_ids.distinct().count() == total


def test_mapapp_filter_flatmap(spark, stream_dir, tmp_path):
    """T1 semantics: produce 0..n times per message (filter + flatMap)."""
    src = _read_stream(spark, stream_dir, files_per_trigger=4)

    def transform(df):
        pos = df.filter(F.col("value") > 0)
        return pos.select(
            "event_id",
            F.explode(F.array(F.lit("a"), F.lit("b"))).alias("tag"),
        )

    app = MapApp(src, transform)
    q = app.start(
        sink_format="memory",
        checkpoint_dir=str(tmp_path / "ckpt3"),
        query_name="mapapp",
    )
    q.processAllAvailable()
    q.stop()
    n_pos = (
        spark.read.parquet(stream_dir).filter(F.col("value") > 0).count()
    )
    assert (
        spark.sql("SELECT count(*) c FROM mapapp").collect()[0]["c"] == 2 * n_pos
    )


def test_streaming_tumbling_window_matches_batch(spark, stream_dir, tmp_path):
    """Windowed agg over the stream == same agg over the batch read."""
    src = _read_stream(spark, stream_dir, files_per_trigger=2)
    win = tumbling(
        src.withWatermark("ts", "1 hour"),
        "ts",
        "1 hour",
        group_cols=["event_type"],
        aggs={"n": "count(*)", "sum_value": "sum(value)"},
    )
    q = (
        win.writeStream.format("memory")
        .outputMode("complete")
        .queryName("win_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt4"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in spark.sql("SELECT * FROM win_stream").collect()
    }
    batch = tumbling(
        spark.read.parquet(stream_dir),
        "ts",
        "1 hour",
        group_cols=["event_type"],
        aggs={"n": "count(*)", "sum_value": "sum(value)"},
    ).collect()
    assert len(batch) == len(got)
    for r in batch:
        n, s = got[(r["window_start"], r["event_type"])]
        assert n == r["n"]
        assert s == pytest.approx(r["sum_value"], rel=1e-9)


def test_streaming_dedup_within_watermark(spark, stream_dir, tmp_path):
    src = _read_stream(spark, stream_dir, files_per_trigger=4)
    deduped = streaming_dedup(
        src, ["user_id", "event_type"], ts_col="ts", within="1 day"
    )
    q = (
        deduped.writeStream.format("memory")
        .outputMode("append")
        .queryName("dedup_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt5"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    n = spark.sql(
        "SELECT count(*) c FROM (SELECT DISTINCT user_id, event_type FROM dedup_stream)"
    ).collect()[0]["c"]
    n_exact = (
        spark.read.parquet(stream_dir)
        .select("user_id", "event_type")
        .distinct()
        .count()
    )
    # watermark dedup may keep re-occurrences across watermark windows, but
    # every distinct pair must appear and no pair may be lost
    assert n == n_exact


def test_rocksdb_state_store_provider(spark, stream_dir, tmp_path):
    """The scale state backend: same fold, RocksDB provider (disk-backed
    state + changelog checkpointing) — results identical to default."""
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        src = _read_stream(spark, stream_dir, files_per_trigger=2)
        app = TableApp(
            src, running_balance, key_cols=["user_id"], output_schema=OUT_SCHEMA
        )
        q = app.start(
            sink_format="memory",
            checkpoint_dir=str(tmp_path / "rck"),
            query_name="rocksdb_fold",
        )
        q.processAllAvailable()
        q.stop()
        n = spark.sql("SELECT count(*) c FROM rocksdb_fold").collect()[0]["c"]
        assert n == spark.read.parquet(stream_dir).count()
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_rate_source_smoke(spark, tmp_path):
    """SURVEY §2.2 'rate source for tests': MapApp over the built-in rate
    source — the broker-free generator for throughput smoke checks."""
    src = spark.readStream.format("rate").option("rowsPerSecond", "500").load()
    app = MapApp(src, lambda df: df.filter(F.col("value") % 2 == 0))
    q = app.start(
        sink_format="memory",
        checkpoint_dir=str(tmp_path / "rate_ck"),
        query_name="rate_smoke",
    )
    import time as _t

    deadline = _t.time() + 30
    n = 0
    while _t.time() < deadline:
        n = spark.sql("SELECT count(*) c FROM rate_smoke").collect()[0]["c"]
        if n >= 100:
            break
        _t.sleep(0.5)
    app.stop()
    assert n >= 100
    odd = spark.sql("SELECT count(*) c FROM rate_smoke WHERE value % 2 = 1")
    assert odd.collect()[0]["c"] == 0


def _make_order_probe():
    def order_probe(txn):
        # asserts the per-key order_by contract: each message's seq must be
        # exactly last+1; any chunk-local (non-total) sort shows up as bad>0
        msg = txn.value()
        st = txn.read_table_entry() or {"last": -1, "bad": 0}
        bad = st["bad"] + (0 if msg["seq"] == st["last"] + 1 else 1)
        txn.update_table_entry({"last": msg["seq"], "bad": bad})
        txn.produce({"k": msg["k"], "seq": msg["seq"], "bad": bad})

    return order_probe


def test_order_by_is_total_across_arrow_chunks(spark, tmp_path):
    """A key with more rows per micro-batch than the Arrow batch size arrives
    as MULTIPLE pandas chunks; order_by must still be a total order per key
    (regression: chunks used to be sorted independently)."""
    import random

    src_dir = str(tmp_path / "src")
    rows = [(1, s) for s in range(500)]
    random.Random(7).shuffle(rows)
    spark.createDataFrame(rows, "k INT, seq INT").coalesce(1).write.parquet(src_dir)

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "50")
    try:
        schema = spark.read.parquet(src_dir).schema
        src = spark.readStream.schema(schema).parquet(src_dir)
        app = TableApp(
            src,
            _make_order_probe(),
            key_cols=["k"],
            output_schema="k INT, seq INT, bad INT",
            order_by=["seq"],
        )
        q = app.start(
            sink_format="memory",
            checkpoint_dir=str(tmp_path / "ckpt"),
            query_name="order_probe",
        )
        q.processAllAvailable()
        q.stop()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)

    out = spark.sql("SELECT * FROM order_probe")
    assert out.count() == 500
    assert out.agg(F.max("bad")).collect()[0][0] == 0


def _make_null_prober():
    def null_prober(txn):
        msg = txn.value()
        txn.produce(
            {"k": msg["k"], "seq": msg["seq"], "saw": json.dumps(txn.read_table_entry())}
        )
        if msg["op"] == "store_none":
            txn.update_table_entry(None)
        elif msg["op"] == "delete":
            txn.delete_table_entry()
        elif msg["op"] == "set":
            txn.update_table_entry({"v": msg["seq"]})

    return null_prober


def test_none_state_is_storable_and_distinct_from_delete(spark, tmp_path):
    """update_table_entry(None) stores JSON null (reads back as None);
    delete_table_entry() removes the key (reads back as initial_state)."""
    import time

    staged = str(tmp_path / "staged")
    os.makedirs(staged)
    phases = [
        [(1, 0, "set"), (2, 0, "set")],
        [(1, 1, "store_none"), (2, 1, "delete")],
        [(1, 2, "noop"), (2, 2, "noop")],
    ]
    build = str(tmp_path / "build")
    for i, ph in enumerate(phases):
        d = os.path.join(build, str(i))
        spark.createDataFrame(ph, "k INT, seq INT, op STRING").coalesce(1).write.parquet(d)
        part = next(f for f in os.listdir(d) if f.endswith(".parquet"))
        dst = os.path.join(staged, f"{i:02d}.parquet")
        shutil.copy(os.path.join(d, part), dst)
        # FileStreamSource orders by (modTime, path): pin distinct mtimes
        t = time.time() - 300 + i * 10
        os.utime(dst, (t, t))

    schema = spark.read.parquet(staged).schema
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(staged)
    )
    app = TableApp(
        src,
        _make_null_prober(),
        key_cols=["k"],
        output_schema="k INT, seq INT, saw STRING",
        order_by=["seq"],
        initial_state={"init": True},
    )
    q = app.start(
        sink_format="memory",
        checkpoint_dir=str(tmp_path / "ckpt_null"),
        query_name="null_probe",
    )
    q.processAllAvailable()
    q.stop()

    saw = {
        (r["k"], r["seq"]): json.loads(r["saw"])
        for r in spark.sql("SELECT * FROM null_probe").collect()
    }
    assert saw[(1, 0)] == {"init": True} and saw[(2, 0)] == {"init": True}
    assert saw[(1, 1)] == {"v": 0} and saw[(2, 1)] == {"v": 0}
    # stored None reads back as None — NOT the initial state
    assert saw[(1, 2)] is None
    # deleted key reads back as the initial state
    assert saw[(2, 2)] == {"init": True}


def test_streaming_session_window_matches_batch(spark, stream_dir, tmp_path):
    """Session windows over the stream == same sessionization over the batch
    read (30-min gap merge per user)."""
    from fluvii_spark.streaming.windows import session

    src = _read_stream(spark, stream_dir, files_per_trigger=2)
    aggs = {"n": "count(*)", "sum_value": "sum(value)"}
    win = session(
        src.withWatermark("ts", "1 hour"), "ts", "30 minutes",
        group_cols=["user_id"], aggs=aggs,
    )
    q = (
        win.writeStream.format("memory")
        .outputMode("complete")
        .queryName("sess_stream")
        .option("checkpointLocation", str(tmp_path / "ck_sess"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = {
        (r["window_start"], r["window_end"], r["user_id"]): (r["n"], r["sum_value"])
        for r in spark.sql("SELECT * FROM sess_stream").collect()
    }
    batch = session(
        spark.read.parquet(stream_dir), "ts", "30 minutes",
        group_cols=["user_id"], aggs=aggs,
    )
    want = {
        (r["window_start"], r["window_end"], r["user_id"]): (r["n"], r["sum_value"])
        for r in batch.collect()
    }
    assert got == want
    assert len(got) > 0
