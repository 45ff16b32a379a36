"""Spark-level serde: Confluent-framed Avro encode/decode as DataFrame
columns — the K1/S1 message path without a broker."""

from __future__ import annotations

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
from fluvii_spark.serde.wire import frame_header, strip_frame, wire_schema_id

VALUE_SCHEMA = {
    "type": "record",
    "name": "Tx",
    "fields": [
        {"name": "account", "type": "string"},
        {"name": "amount", "type": "double"},
        {"name": "n", "type": "long"},
    ],
}
KEY_SCHEMA = "string"  # the reference's hardcoded key schema (producer.py:62)


def _framed_rows(n=20, schema_id=7):
    vc, kc = AvroCodec(VALUE_SCHEMA), AvroCodec(KEY_SCHEMA)
    rows = []
    for i in range(n):
        val = {"account": f"acct{i % 3}", "amount": i * 1.5, "n": i}
        rows.append(
            (
                frame_header(1) + kc.encode(f"key{i}"),
                frame_header(schema_id) + vc.encode(val),
            )
        )
    return rows


def test_spark_decode_framed_messages(spark):
    df = spark.createDataFrame(
        _framed_rows(),
        StructType(
            [StructField("key", BinaryType()), StructField("value", BinaryType())]
        ),
    )
    decoded = df.select(
        wire_schema_id("value").alias("sid"),
        decode_framed_string_key("key").alias("k"),
        F.from_json(
            decode_framed_json("value", VALUE_SCHEMA),
            StructType(
                [
                    StructField("account", StringType()),
                    StructField("amount", DoubleType()),
                    StructField("n", LongType()),
                ]
            ),
        ).alias("v"),
    ).select("sid", "k", "v.account", "v.amount", "v.n")
    rows = {r["n"]: r for r in decoded.collect()}
    assert len(rows) == 20
    assert rows[3]["sid"] == 7
    assert rows[3]["k"] == "key3"
    assert rows[3]["account"] == "acct0"
    assert rows[3]["amount"] == 4.5


def test_spark_encode_decode_roundtrip(spark):
    data = [(i, f"acct{i}", float(i)) for i in range(10)]
    df = spark.createDataFrame(data, "n LONG, account STRING, amount DOUBLE")
    framed = df.select(
        encode_framed(
            F.to_json(F.struct("account", "amount", "n")), VALUE_SCHEMA, 99
        ).alias("value")
    )
    back = framed.select(
        wire_schema_id("value").alias("sid"),
        decode_framed_json("value", VALUE_SCHEMA).alias("j"),
    ).collect()
    assert all(r["sid"] == 99 for r in back)
    got = sorted(json.loads(r["j"])["n"] for r in back)
    assert got == list(range(10))


def test_strip_frame_matches_python(spark):
    vc = AvroCodec(KEY_SCHEMA)
    payload = frame_header(5) + vc.encode("hello")
    df = spark.createDataFrame(
        [(payload,)], StructType([StructField("value", BinaryType())])
    )
    body = df.select(strip_frame("value").alias("b")).collect()[0]["b"]
    assert bytes(body) == vc.encode("hello")


def test_decode_framed_json_logical_types(spark):
    """Regression: json.dumps had no default handler, so any schema using
    the codec's own supported logical types (decimal/date/timestamp) or a
    bytes primitive crashed the decode UDF with TypeError. Decimals render
    as exact strings, temporals as ISO-8601, bytes as latin-1."""
    import datetime as dt
    import decimal

    from fluvii_spark.serde.avro_codec import AvroCodec
    from fluvii_spark.serde.wire import frame_header

    schema = {
        "type": "record",
        "name": "LT",
        "fields": [
            {
                "name": "amount",
                "type": {
                    "type": "bytes",
                    "logicalType": "decimal",
                    "precision": 10,
                    "scale": 2,
                },
            },
            {
                "name": "day",
                "type": {"type": "int", "logicalType": "date"},
            },
            {"name": "blob", "type": "bytes"},
        ],
    }
    codec = AvroCodec(schema)
    payload = frame_header(9) + codec.encode(
        {
            "amount": decimal.Decimal("123.45"),
            "day": dt.date(2024, 2, 29),
            "blob": b"\x00\xff",
        }
    )
    df = spark.createDataFrame([(payload,)], "value BINARY")
    got = df.select(
        decode_framed_json("value", schema).alias("j")
    ).collect()[0]["j"]
    import json as _json

    d = _json.loads(got)
    assert d["amount"] == "123.45"
    assert d["day"] == "2024-02-29"
    assert d["blob"] == "\x00\xff".encode().decode("latin-1") or d["blob"] == "\x00ÿ"


def test_spark_avro_available_is_truthful(spark):
    """The probe must report whether to_avro actually ANALYZES, not whether
    the always-present Python wrapper imports (this container lacks the
    spark-avro datasource jar, so the answer here is False)."""
    from fluvii_spark.serde.columns import spark_avro_available

    ok = spark_avro_available(spark)
    try:
        from pyspark.sql import functions as F
        from pyspark.sql.avro.functions import to_avro

        spark.range(1).select(to_avro(F.struct(F.lit(1).alias("x"))))
        really = True
    except Exception:
        really = False
    assert ok == really
