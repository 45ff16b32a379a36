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
