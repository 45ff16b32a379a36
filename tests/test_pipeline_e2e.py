"""Broker-less end-to-end message pipeline: the reference's full S1→T1→ST→K1
path — framed-Avro messages in, keyed stateful fold, framed-Avro messages
out — with files standing in for topics. Also: Avro logical types."""

from __future__ import annotations

import datetime as dt
import decimal
import json

from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from fluvii_spark.serde.avro_codec import AvroCodec
from fluvii_spark.serde.columns import (
    decode_framed_json,
    decode_framed_string_key,
    encode_framed,
)
from fluvii_spark.serde.wire import frame_header, parse_frame
from fluvii_spark.streaming.state import batch_keyed_fold

VALUE_SCHEMA = {
    "type": "record",
    "name": "Tx",
    "fields": [
        {"name": "account", "type": "string"},
        {"name": "amount", "type": "double"},
        {"name": "seq", "type": "long"},
    ],
}
OUT_AVRO_SCHEMA = {
    "type": "record",
    "name": "Balance",
    "fields": [
        {"name": "account", "type": "string"},
        {"name": "balance", "type": "double"},
        {"name": "seq", "type": "long"},
    ],
}


def test_full_message_pipeline(spark):
    """consume (framed Avro) → decode → stateful fold → encode → 'produce',
    then decode the produced messages and check the fold."""
    vc, kc = AvroCodec(VALUE_SCHEMA), AvroCodec("string")
    msgs = []
    for i in range(60):
        acct = f"acct{i % 4}"
        msgs.append(
            (
                frame_header(1) + kc.encode(acct),
                frame_header(7)
                + vc.encode({"account": acct, "amount": (i % 7) - 3.0, "seq": i}),
            )
        )
    topic_in = spark.createDataFrame(
        msgs,
        StructType(
            [StructField("key", BinaryType()), StructField("value", BinaryType())]
        ),
    )

    # --- consume: strip frame + decode (S1 equivalent) ---------------------
    decoded = topic_in.select(
        decode_framed_string_key("key").alias("account_key"),
        F.from_json(
            decode_framed_json("value", VALUE_SCHEMA),
            StructType(
                [
                    StructField("account", StringType()),
                    StructField("amount", DoubleType()),
                    StructField("seq", LongType()),
                ]
            ),
        ).alias("v"),
    ).select("account_key", "v.account", "v.amount", "v.seq")

    # --- transform: keyed running balance (T1 + ST1-ST2) -------------------
    def fold(txn):
        msg = txn.value()
        st = txn.read_table_entry() or {"balance": 0.0}
        st = {"balance": st["balance"] + msg["amount"]}
        txn.update_table_entry(st)
        txn.produce(
            {
                "account": msg["account"],
                "balance": st["balance"],
                "seq": msg["seq"],
            }
        )

    folded = batch_keyed_fold(
        decoded,
        ["account"],
        fold,
        "account STRING, balance DOUBLE, seq BIGINT",
        order_by=["seq"],
    )

    # --- produce: encode back to framed Avro (K1 equivalent) ---------------
    topic_out = folded.select(
        encode_framed(
            F.to_json(F.struct("account", "balance", "seq")), OUT_AVRO_SCHEMA, 9
        ).alias("value")
    )
    out_rows = topic_out.collect()
    assert len(out_rows) == 60  # one produced message per consumed message

    oc = AvroCodec(OUT_AVRO_SCHEMA)
    finals: dict[str, tuple[int, float]] = {}
    for r in out_rows:
        sid, body = parse_frame(bytes(r["value"]))
        assert sid == 9
        rec = oc.decode(body)
        prev = finals.get(rec["account"], (-1, None))
        if rec["seq"] > prev[0]:
            finals[rec["account"]] = (rec["seq"], rec["balance"])

    # final balance per account == plain sum of its amounts
    expected: dict[str, float] = {}
    for i in range(60):
        acct = f"acct{i % 4}"
        expected[acct] = expected.get(acct, 0.0) + ((i % 7) - 3.0)
    for acct, (_, bal) in finals.items():
        assert abs(bal - expected[acct]) < 1e-9


def test_avro_logical_types_roundtrip():
    schema = {
        "type": "record",
        "name": "L",
        "fields": [
            {
                "name": "price",
                "type": {
                    "type": "bytes",
                    "logicalType": "decimal",
                    "precision": 18,
                    "scale": 2,
                },
            },
            {"name": "day", "type": {"type": "int", "logicalType": "date"}},
            {
                "name": "at_ms",
                "type": {"type": "long", "logicalType": "timestamp-millis"},
            },
            {
                "name": "at_us",
                "type": {"type": "long", "logicalType": "timestamp-micros"},
            },
            {"name": "uid", "type": {"type": "string", "logicalType": "uuid"}},
        ],
    }
    c = AvroCodec(schema)
    rec = {
        "price": decimal.Decimal("12345.67"),
        "day": dt.date(2026, 8, 13),
        "at_ms": dt.datetime(2026, 8, 13, 12, 30, 1, 500000, tzinfo=dt.timezone.utc),
        "at_us": dt.datetime(2026, 8, 13, 12, 30, 1, 123456, tzinfo=dt.timezone.utc),
        "uid": "9f1f0f0a-aaaa-bbbb-cccc-000000000001",
    }
    got = c.decode(c.encode(rec))
    assert got["price"] == rec["price"]
    assert got["day"] == rec["day"]
    assert got["at_ms"] == rec["at_ms"]
    assert got["at_us"] == rec["at_us"]
    assert got["uid"] == rec["uid"]
    # negative decimal two's complement
    c2 = AvroCodec(
        {"type": "bytes", "logicalType": "decimal", "precision": 10, "scale": 3}
    )
    for v in ("−0.001", "-12.345", "0.000", "99999.999"):
        v = decimal.Decimal(v.replace("−", "-"))
        assert c2.decode(c2.encode(v)) == v


def test_avro_json_state_envelope_roundtrip():
    """The reference stores arbitrary JSON as state (sqlite.py:96); the map
    schema it uses in integration tests round-trips through the codec
    (tests/temp_integration/integration.py:17-23 schema shape)."""
    schema = {
        "type": "record",
        "name": "kafka_test",
        "fields": [
            {"name": "data", "type": {"type": "map", "values": "string"}}
        ],
    }
    c = AvroCodec(schema)
    rec = {"data": {"current": "-t3", "history": json.dumps([1, 2, 3])}}
    assert c.decode(c.encode(rec)) == rec


def test_streaming_training_data_pipeline_exactly_once(spark, tmp_path):
    """Streaming mirror of q88's batch pipeline: documents arrive as a
    stream; quality gate -> watermarked dedup on content -> idempotent EOS
    file sink, surviving a mid-stream restart with no loss/duplication."""
    import datetime as dt
    import os
    import time

    from pyspark.sql import functions as F

    from fluvii_spark.io.sinks import eos_file_sink
    from fluvii_spark.streaming.windows import streaming_dedup

    base = dt.datetime(2026, 2, 1, 9, 0, 0)
    # 40 docs; ids 20-29 are exact dup texts of 0-9; 10 docs are too short
    rows = []
    for i in range(20):
        text = f"doc body {'tok ' * 30}{i % 10}" if i < 10 else f"unique {'w ' * 25}{i}"
        rows.append((i, text, base + dt.timedelta(seconds=i)))
    for i in range(20, 30):
        rows.append((i, rows[i - 20][1], base + dt.timedelta(seconds=i)))  # dups
    for i in range(30, 40):
        rows.append((i, "too short", base + dt.timedelta(seconds=i)))

    staged = str(tmp_path / "staged")
    os.makedirs(staged)

    def stage(idx, chunk):
        d = str(tmp_path / f"b{idx}")
        spark.createDataFrame(
            chunk, "doc_id LONG, text STRING, ts TIMESTAMP"
        ).coalesce(1).write.parquet(d)
        part = next(f for f in os.listdir(d) if f.endswith(".parquet"))
        dst = os.path.join(staged, f"{idx:02d}.parquet")
        os.rename(os.path.join(d, part), dst)
        t = time.time() - 300 + idx * 10
        os.utime(dst, (t, t))

    stage(0, rows[:15])
    stage(1, rows[15:25])

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run(name):
        schema = spark.read.parquet(staged).schema
        src = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(staged)
        )
        gated = src.filter(F.size(F.split("text", " ")) >= 10)
        deduped = streaming_dedup(
            gated, ["text"], ts_col="ts", within="1 hour"
        )
        return (
            eos_file_sink(deduped, out, ckpt)
            .queryName(name)
            .start()
        )

    q1 = run("pipe_a")
    q1.processAllAvailable()
    q1.stop()

    stage(2, rows[25:40])  # more data arrives while "down"
    q2 = run("pipe_b")
    q2.processAllAvailable()
    q2.stop()

    got = spark.read.parquet(out)
    # quality gate drops the 10 short docs; dedup keeps first of each text:
    # ids 20-29 are dups of 0-9 -> exactly the 20 distinct long texts remain
    texts = [r["text"] for r in got.select("text").collect()]
    assert len(texts) == 20
    assert len(set(texts)) == 20
    kept_ids = sorted(r["doc_id"] for r in got.select("doc_id").collect())
    assert kept_ids == list(range(20))  # first arrival wins, exactly once
