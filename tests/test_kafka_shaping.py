"""Kafka message shaping without a broker: sink-side column preparation
(guid header injection, header inheritance, mmh3 partition parity) and
source-side normalization of Kafka-schema rows; AQE runtime coalescing."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from fluvii_spark.io.kafka import (
    mmh3_partition_col,
    murmur3_32,
    normalized_messages,
    prepare_kafka_output,
)

KAFKA_SCHEMA = StructType(
    [
        StructField("key", BinaryType()),
        StructField("value", BinaryType()),
        StructField("topic", StringType()),
        StructField("partition", IntegerType()),
        StructField("offset", LongType()),
        StructField("timestamp", TimestampType()),
        StructField(
            "headers",
            ArrayType(
                StructType(
                    [
                        StructField("key", StringType()),
                        StructField("value", BinaryType()),
                    ]
                )
            ),
        ),
    ]
)


def _kafka_rows(spark, n=10):
    import datetime as dt

    rows = [
        (
            f"k{i}".encode(),
            f"v{i}".encode(),
            "t1",
            i % 3,
            i,
            dt.datetime(2026, 1, 1, 0, 0, i),
            [("trace", b"abc"), ("src", f"s{i}".encode())],
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, KAFKA_SCHEMA)


def test_normalized_messages_header_map(spark):
    out = normalized_messages(_kafka_rows(spark)).collect()
    assert len(out) == 10
    r = next(x for x in out if x["offset"] == 3)
    assert r["headers"] == {"trace": "abc", "src": "s3"}
    assert bytes(r["key"]) == b"k3"


def test_prepare_kafka_output_guid_and_inheritance(spark):
    src = _kafka_rows(spark).select(
        F.col("key").cast("string").alias("k"),
        F.col("value").alias("v"),
        F.col("headers").alias("h"),
    )
    shaped = prepare_kafka_output(
        src,
        value_col="v",
        key_col="k",
        headers_col="h",
        topic="out_topic",
        num_partitions_for_mmh3=12,
    )
    rows = shaped.collect()
    assert set(shaped.columns) == {"key", "value", "headers", "topic", "partition"}
    guids = set()
    for r in rows:
        hdr = {h["key"]: bytes(h["value"]) for h in r["headers"]}
        # inherited headers survive (reference K2) + guid injected (K1)
        assert "trace" in hdr and "src" in hdr and "guid" in hdr
        guid = hdr["guid"].decode()
        uuid.UUID(guid)  # parses
        guids.add(guid)
        # partition matches the reference's mmh3 partitioner
        assert r["partition"] == murmur3_32(r["key"].encode("utf-8") if isinstance(r["key"], str) else bytes(r["key"])) % 12
        assert r["topic"] == "out_topic"
    assert len(guids) == len(rows)  # one fresh guid per message


def test_mmh3_partition_col_matches_python(spark):
    df = spark.createDataFrame(
        [(f"key-{i}",) for i in range(50)], "k STRING"
    ).withColumn("p", mmh3_partition_col("k", 7))
    for r in df.collect():
        assert r["p"] == murmur3_32(r["k"].encode()) % 7


def test_aqe_coalesces_shuffle_partitions(spark, sf_dir):
    """After execution, AQE's runtime plan must show coalesced shuffle reads
    for a small-output aggregation (32 static partitions would be waste)."""
    from fluvii_spark.io.readers import load_tables

    df = (
        load_tables(spark, sf_dir)
        .lineitem.groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("q"))
    )
    df.collect()  # execute so AQE finalizes the plan
    plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )
    assert "AQEShuffleRead" in plan, plan
    assert "coalesced" in plan.lower(), plan


def test_dump_produce_roundtrip_preserves_headers_and_partition(
    spark, tmp_path
):
    """A6 parity: a topic dump written to JSON and produced back must keep
    each message's headers (reference produces the full
    {key,value,headers,topic[,partition]} dict, fluvii_toolbox.py:209-229)
    and, with use_given_partitions, the explicit partition."""
    from fluvii_spark.io.kafka import produce_messages_frame

    dumped = normalized_messages(_kafka_rows(spark, n=6))
    path = str(tmp_path / "dump")
    dumped.write.json(path)

    back = spark.read.json(path)
    shaped = produce_messages_frame(
        back, use_given_partitions=True, binary_base64=True
    )
    assert set(shaped.columns) == {
        "key", "value", "topic", "headers", "partition"
    }
    # writer contract: headers is array<struct<key string, value binary>>
    htyp = shaped.schema["headers"].dataType
    assert htyp.simpleString() == "array<struct<key:string,value:binary>>"
    got = {
        bytes(r["key"]).decode(): (
            {h["key"]: bytes(h["value"]) for h in r["headers"]},
            r["partition"],
            r["topic"],
        )
        for r in shaped.collect()
    }
    for i in range(6):
        hdrs, part, topic = got[f"k{i}"]
        assert hdrs == {"trace": b"abc", "src": f"s{i}".encode()}
        assert part == i % 3
        assert topic == "t1"

    # topic override + partitions ignored unless opted in (reference flag)
    shaped2 = produce_messages_frame(back, topic_override="other")
    assert "partition" not in shaped2.columns
    assert shaped2.select("topic").distinct().collect()[0][0] == "other"


def test_produce_frame_with_empty_headers_dump(spark, tmp_path):
    """A dump where every message had empty headers infers a zero-field
    struct from JSON — the shaping must produce headerless messages, not
    crash building an array<null> of struct fields."""
    from fluvii_spark.io.kafka import produce_messages_frame

    rows = [(f"k{i}".encode(), f"v{i}".encode(), "t1", i % 3, i,
             __import__("datetime").datetime(2026, 1, 1), [])
            for i in range(3)]
    dumped = normalized_messages(spark.createDataFrame(rows, KAFKA_SCHEMA))
    path = str(tmp_path / "empty_hdrs")
    dumped.write.json(path)
    back = spark.read.json(path)
    shaped = produce_messages_frame(
        back, use_given_partitions=True, binary_base64=True
    )
    assert "headers" not in shaped.columns
    got = {bytes(r["key"]).decode(): r["partition"]
           for r in shaped.collect()}
    assert got == {"k0": 0, "k1": 1, "k2": 2}


def test_mmh3_partition_col_binary_keys_hash_raw_bytes(spark):
    """Regression: a BINARY key column went through str(b'...') and hashed
    the repr — breaking co-partitioning with reference-written topics.
    Raw bytes must hash identically to the utf-8 string they encode."""
    df = spark.createDataFrame(
        [(f"key-{i}".encode(),) for i in range(20)], "k BINARY"
    ).withColumn("p", mmh3_partition_col("k", 7))
    for r in df.collect():
        assert r["p"] == murmur3_32(bytes(r["k"])) % 7


def test_stamp_eos_headers_keyless_stream(spark):
    """Regression: keyless Kafka messages (legal — round-robin partitioning)
    crashed stamp_eos_headers on the missing `key` column; guids must still
    be replay-stable and occurrence-distinct per value."""
    from fluvii_spark.io.kafka import stamp_eos_headers

    df = spark.createDataFrame(
        [("v1",), ("v1",), ("v2",)], "value STRING"
    ).select(F.col("value").cast("binary").alias("value"))
    out1 = {
        (bytes(r["value"]), tuple(
            (h["key"], bytes(h["value"])) for h in r["headers"]
        ))
        for r in stamp_eos_headers(df, 7).collect()
    }
    out2 = {
        (bytes(r["value"]), tuple(
            (h["key"], bytes(h["value"])) for h in r["headers"]
        ))
        for r in stamp_eos_headers(df, 7).collect()
    }
    assert out1 == out2  # replay-stable
    guids = {hs for _, hs in out1}
    assert len(guids) == 3  # occurrence index separates the duplicate v1


def test_kafka_readers_set_parity_options(spark):
    """The stream/batch readers must pin reference-parity source options:
    read_committed isolation (the Kafka consumer default is
    read_uncommitted, so aborted transactional writes would surface as
    phantom duplicates) and includeHeaders (dumps silently lose headers
    without it). Reader options aren't introspectable through a public
    API without a broker, so this asserts the option calls in the source —
    a tripwire against their removal, paired with the live-broker smoke
    these readers get on a real cluster."""
    import inspect

    import fluvii_spark.io.kafka as K

    for fn in (K.kafka_stream_reader, K.kafka_batch_reader):
        src = inspect.getsource(fn)
        assert '"kafka.isolation.level", "read_committed"' in src, fn
        assert '"includeHeaders", "true"' in src, fn
