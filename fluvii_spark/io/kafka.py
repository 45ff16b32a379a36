"""Kafka sources & sinks (SURVEY.md §2.1 S1-S4, K1-K3, A6).

Reference semantics re-expressed on Spark's Kafka connector:

- S1/S2 single-poll + batch-bounded consume → one streaming read with
  ``maxOffsetsPerTrigger`` (micro-batch admission replaces the hand-rolled
  lag-triggered batch mode, ``fluvii/apps/transactions/consumer.py:60-69``);
- S3 offset-seek replay (``kafka_tools/topic_dumper.py:38-54``) →
  ``startingOffsets`` JSON built from the same ``{topic: {partition:
  offset|'earliest'|'latest'}}`` dict shape;
- S4 topic dump → bounded batch read + ``write.json``;
- K1 Avro keyed sink (``producer.py:151-182``): framed-Avro value, framed
  string key, guid header, optional mmh3-parity partition column;
- K3 exactly-once: Spark's Kafka sink is at-least-once per retried batch;
  end-to-end EOS uses ``foreachBatch`` + per-(batchId, guid) idempotent
  produce — documented on :func:`eos_kafka_sink_writer`.

The Kafka connector jar (spark-sql-kafka) may be absent in dev containers;
builders construct fully-specified readers/writers and fail only at
``.load()``/``.start()`` time with Spark's own missing-source error.
"""

from __future__ import annotations

import json
import struct
import sys
import uuid
from typing import Any

import pandas as pd  # module-level so pandas_udf type hints resolve
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # ship this module's helpers (murmur3_32) by value to executors
    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover
    pass

# ---------------------------------------------------------------------------
# murmur3-32 (x86) — byte-parity with the reference's partitioner
# ---------------------------------------------------------------------------


def murmur3_32(data: bytes, seed: int = 0) -> int:
    """Signed 32-bit murmur3_x86_32 — identical to ``mmh3.hash``.

    The reference partitions by ``mmh3.hash(str(key)) % partitions``
    (``fluvii/components/producer/producer.py:89-90``), which differs from
    the Kafka default (murmur2); this reimplementation (public algorithm,
    Austin Appleby) keeps co-partitioning parity with topics written by the
    reference.
    """
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed & 0xFFFFFFFF
    n = len(data)
    for i in range(0, n - n % 4, 4):
        (k,) = struct.unpack_from("<I", data, i)
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
        h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
        h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
    tail = data[n - n % 4 :]
    if tail:
        k = 0
        for i, b in enumerate(tail):
            k |= b << (8 * i)
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
    h ^= n
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    return h - (1 << 32) if h >= 1 << 31 else h


def mmh3_partition_col(key_col: Column | str, num_partitions: int) -> Column:
    """Partition column matching the reference's mmh3 partitioner.

    Python's ``%`` on a negative hash yields a non-negative partition —
    exactly what ``mmh3.hash(key) % partitions`` does in the reference.
    """

    @F.pandas_udf("int")
    def _part(s: pd.Series) -> pd.Series:
        def one(k):
            if k is None:
                return None
            # Kafka key columns are BINARY: hash the raw bytes the broker
            # sees (str(b'x') would hash the literal "b'x'" and break
            # co-partitioning with reference-written topics); str keys are
            # utf-8 encoded exactly as mmh3.hash(str) does in the reference
            b = bytes(k) if isinstance(k, (bytes, bytearray)) else str(k).encode("utf-8")
            return murmur3_32(b) % num_partitions

        return s.map(one)

    return _part(F.col(key_col) if isinstance(key_col, str) else key_col)


# ---------------------------------------------------------------------------
# offset-dict plumbing (S3)
# ---------------------------------------------------------------------------


def offsets_json(
    consume_topics_dict: dict[str, dict[int, Any] | str],
    partition_counts: dict[str, int] | None = None,
) -> str:
    """fluvii offset dict → Spark ``startingOffsets`` JSON.

    Accepts the reference's shape (``topic_dumper.py:12-17``):
    ``{"topic": {0: 100, 2: "earliest"}}`` or ``{"topic": "earliest"}``.
    Spark encodes earliest=-2, latest=-1 per partition.

    CAVEAT (Spark contract, not the reference's): specific startingOffsets
    must cover EVERY partition of a subscribed topic, or the Kafka source
    fails at load time. The reference's consumer fills unlisted partitions
    from broker metadata; here pass ``partition_counts={"topic": n}``
    (e.g. from ``toolbox.list_topics``) and unlisted partitions are filled
    with earliest — without it, a partial dict is passed through as-is and
    it is the caller's job that it is complete.
    """
    out: dict[str, dict[str, int]] = {}
    for topic, parts in consume_topics_dict.items():
        if isinstance(parts, str):
            # whole-topic earliest/latest must be expressed per-partition;
            # callers without partition counts should pass the string form
            # directly to starting_offsets= instead
            raise ValueError(
                "whole-topic earliest/latest: pass starting_offsets="
                f"'{parts}' rather than a dict"
            )
        enc: dict[str, int] = {}
        for p, off in parts.items():
            if off == "earliest":
                enc[str(p)] = -2
            elif off == "latest":
                enc[str(p)] = -1
            else:
                enc[str(p)] = int(off)
        if partition_counts and topic in partition_counts:
            for p in range(partition_counts[topic]):
                enc.setdefault(str(p), -2)  # earliest for unlisted
        out[topic] = enc
    return json.dumps(out)


# ---------------------------------------------------------------------------
# sources (S1-S4)
# ---------------------------------------------------------------------------

_AUTH_OPTION_KEYS = {
    "kafka.security.protocol",
    "kafka.sasl.mechanism",
    "kafka.sasl.jaas.config",
}


def kafka_stream_reader(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: list[str],
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
    extra_options: dict[str, str] | None = None,
):
    """Streaming source (S1/S2). ``max_offsets_per_trigger`` is the moral
    equivalent of the reference's ``batch_consume_max_count`` (config.py:26).
    """
    r = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", ",".join(topics))
        .option("startingOffsets", starting_offsets)
        # the reference reads committed data only (isolation.level=
        # read_committed, transactions/consumer.py:36); the Kafka consumer
        # DEFAULT is read_uncommitted, so set it explicitly or aborted
        # transactional writes would surface as phantom duplicates
        .option("kafka.isolation.level", "read_committed")
        # headers flow through the stream (K2 passthrough parity)
        .option("includeHeaders", "true")
        .option("failOnDataLoss", "false")
    )
    if max_offsets_per_trigger is not None:
        r = r.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    for k, v in (extra_options or {}).items():
        r = r.option(k, v)
    return r


def kafka_batch_reader(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: list[str] | None = None,
    consume_topics_dict: dict | None = None,
    starting_offsets: str | None = None,
    ending_offsets: str = "latest",
    extra_options: dict[str, str] | None = None,
):
    """Bounded batch source (S3/S4 replay + dump)."""
    if consume_topics_dict is not None:
        topics = list(consume_topics_dict)
        starting_offsets = offsets_json(consume_topics_dict)
    if starting_offsets is None:
        starting_offsets = "earliest"
    r = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", ",".join(topics or []))
        .option("startingOffsets", starting_offsets)
        .option("endingOffsets", ending_offsets)
        # reference parity on both fronts: committed reads only (its
        # consumer pins isolation.level=read_committed) and headers in the
        # source frame — without includeHeaders the dump path's
        # normalized_messages never sees a headers column and a
        # dump -> produce round-trip silently strips every header
        .option("kafka.isolation.level", "read_committed")
        .option("includeHeaders", "true")
    )
    for k, v in (extra_options or {}).items():
        r = r.option(k, v)
    return r


def normalized_messages(kafka_df: DataFrame) -> DataFrame:
    """Kafka source rows → the reference's message view.

    Matches the dict shape ``TopicDumperApp`` dumps
    (``kafka_tools/topic_dumper.py:63-75``): key/value/headers/topic/
    partition/offset/timestamp, with headers as a string map
    (``parse_headers``, ``fluvii/general_utils.py:4-15``).
    """
    cols = [
        F.col("key"),
        F.col("value"),
        F.col("topic"),
        F.col("partition"),
        F.col("offset"),
        F.col("timestamp"),
    ]
    if "headers" in kafka_df.columns:
        cols.append(
            F.map_from_entries(
                F.expr(
                    "transform(headers, h -> struct(h.key as key, "
                    "cast(h.value as string) as value))"
                )
            ).alias("headers")
        )
    return kafka_df.select(*cols)


# ---------------------------------------------------------------------------
# sinks (K1-K3)
# ---------------------------------------------------------------------------

# typed empty header list — plain array() is array<string> and breaks concat
_EMPTY_HEADERS = "cast(array() as array<struct<key:string,value:binary>>)"


def prepare_kafka_output(
    df: DataFrame,
    value_col: str,
    key_col: str | None = None,
    headers_col: str | None = None,
    topic: str | None = None,
    num_partitions_for_mmh3: int | None = None,
) -> DataFrame:
    """Shape a DataFrame for the Kafka sink with reference K1/K2 semantics:

    - key/headers pass through from the consumed message unless overridden
      (``producer.py:151-175``); a NULL headers value contributes an empty
      array (concat with NULL would otherwise null out the whole list);
    - a fresh ``guid`` header is injected per row (``producer.py:160-161``,
      uuid per message for tracing) — note uuid() re-seeds when a restarted
      query re-analyzes the plan, so this guid is NOT replay-stable; the EOS
      sink (:func:`eos_kafka_sink_writer`) replaces it with a deterministic
      one;
    - optional explicit mmh3 partition column for co-partitioning parity
      (otherwise Kafka's default partitioner applies).
    """
    out = df.withColumn(
        "_guid_hdr",
        F.expr("array(struct('guid' as key, cast(uuid() as binary) as value))"),
    )
    headers = (
        F.concat(
            F.coalesce(F.col(headers_col), F.expr(_EMPTY_HEADERS)),
            F.col("_guid_hdr"),
        )
        if headers_col
        else F.col("_guid_hdr")
    )
    cols = [F.col(value_col).alias("value"), headers.alias("headers")]
    if key_col:
        cols.insert(0, F.col(key_col).alias("key"))
    if topic:
        cols.append(F.lit(topic).alias("topic"))
    if key_col and num_partitions_for_mmh3:
        cols.append(
            mmh3_partition_col(key_col, num_partitions_for_mmh3).alias("partition")
        )
    return out.select(*cols)


def kafka_writer(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str | None = None,
    checkpoint_dir: str | None = None,
    extra_options: dict[str, str] | None = None,
):
    """Streaming Kafka sink (at-least-once; idempotent broker dedup on by
    default in Kafka ≥ 3.0 — parity with ``enable.idempotence=true``,
    ``producer.py:55-67``)."""
    w = (
        df.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("kafka.enable.idempotence", "true")
        .option("includeHeaders", "true")
    )
    if topic:
        w = w.option("topic", topic)
    if checkpoint_dir:
        w = w.option("checkpointLocation", checkpoint_dir)
    for k, v in (extra_options or {}).items():
        w = w.option(k, v)
    return w


def stamp_eos_headers(batch_df: DataFrame, batch_id: int) -> DataFrame:
    """Stamp replay-stable (guid, batch_id) headers onto one micro-batch.

    guid = sha2(batch_id | key | value | occurrence) — a function of batch
    CONTENT, so a crash-replayed batch regenerates identical guids (the EOS
    dedup contract); the occurrence index keeps legitimately-duplicate
    (key, value) rows distinct as a multiset. Any upstream tracing guid
    (``prepare_kafka_output``'s uuid) is replaced; NULL or absent headers
    columns contribute an empty list instead of nulling the result.
    """
    from pyspark.sql import Window

    if "headers" not in batch_df.columns:
        batch_df = batch_df.withColumn("headers", F.expr(_EMPTY_HEADERS))
    # keyless streams are legal Kafka (round-robin partitioning): guid
    # content and the occurrence multiset then key on value alone
    key_b64 = (
        F.coalesce(F.base64("key"), F.lit(""))
        if "key" in batch_df.columns
        else F.lit("")
    )
    occ_parts = (
        ["key", "value"] if "key" in batch_df.columns else ["value"]
    )
    occ = F.row_number().over(
        Window.partitionBy(*occ_parts).orderBy(F.lit(1))
    )
    guid = F.sha2(
        F.concat_ws(
            "|",
            F.lit(str(batch_id)),
            key_b64,
            F.base64("value"),
            F.col("_occ").cast("string"),
        ),
        256,
    )
    return (
        batch_df.withColumn("_occ", occ)
        .withColumn(
            "headers",
            F.concat(
                F.expr(
                    "filter(coalesce(headers, " + _EMPTY_HEADERS + "), "
                    "h -> h.key != 'guid')"
                ),
                F.array(
                    F.struct(
                        F.lit("guid").alias("key"),
                        guid.cast("binary").alias("value"),
                    ),
                    F.struct(
                        F.lit("batch_id").alias("key"),
                        F.lit(str(batch_id)).cast("binary").alias("value"),
                    ),
                ),
            ),
        )
        .drop("_occ")
    )


def eos_kafka_sink_writer(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint_dir: str,
):
    """End-to-end exactly-once-to-Kafka (K3) via ``foreachBatch``.

    The reference's EOS window: messages re-process on abort before the Kafka
    transaction commits (README.md:552-566). Spark's checkpoint gives
    exactly-once *state*; Kafka output is made effectively-once by stamping
    every row with (batchId, row-guid) headers so replayed batches produce
    byte-identical messages that downstream ``read_committed`` consumers
    dedup on guid.

    The guid is **deterministic**: sha2 over (batch_id, key, value,
    within-batch occurrence index). A crash-replayed batch — the EOS window
    itself — regenerates the exact same guids (a plan-seeded ``uuid()``
    would not: it re-seeds on restart, silently breaking the dedup; any
    tracing guid stamped upstream by :func:`prepare_kafka_output` is
    replaced here). The occurrence index (row_number over identical
    (key, value) pairs) keeps legitimately-duplicate messages distinct as a
    multiset while staying replay-stable.

    A broker-transactional variant would use a confluent-kafka producer
    inside ``foreachBatch`` (one transaction per batch); that path needs the
    confluent client deployed and is intentionally not the default.
    """
    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            stamp_eos_headers(batch_df, batch_id)
            .write.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("kafka.enable.idempotence", "true")
            .option("includeHeaders", "true")
            .option("topic", topic)
            .save()
        )

    return (
        df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
    )


# ---------------------------------------------------------------------------
# tooling (S4 dump / A6 bulk produce)
# ---------------------------------------------------------------------------


def dump_topics_to_json(
    spark: SparkSession,
    bootstrap_servers: str,
    consume_topics_dict: dict,
    path: str,
    transform_function=None,
    extra_options: dict[str, str] | None = None,
) -> None:
    """S4: bounded read of whole topics → JSON files (CLI ``topics consume``,
    ``fluvii/cli/commands/topics.py:85-97``). ``transform_function``
    (DataFrame → DataFrame) mirrors the reference's optional dump transform
    (``fluvii_toolbox.py:231-234``)."""
    df = kafka_batch_reader(
        spark,
        bootstrap_servers,
        consume_topics_dict=consume_topics_dict,
        extra_options=extra_options,
    ).load()
    out = normalized_messages(df)
    if transform_function is not None:
        out = transform_function(out)
    out.write.mode("overwrite").json(path)


def produce_messages_frame(
    df: DataFrame,
    topic_override: str | None = None,
    use_given_partitions: bool = False,
    binary_base64: bool = False,
) -> DataFrame:
    """Shape a dumped-message frame into the Kafka writer's column contract.

    The pure half of A6 bulk produce (testable without a broker): selects
    ``key``/``value`` (binary), ``topic`` (with override), ``headers``
    (string-map dump form → the writer's ``array<struct<key,value:binary>>``),
    and — when ``use_given_partitions`` — the explicit ``partition`` column,
    mirroring the reference's keyset
    (``fluvii/kafka_tools/fluvii_toolbox.py:209-229``). Headers whose value
    is NULL for a row (keys absent from that message) are dropped, so a
    dump→produce round-trip preserves exactly the headers each message had.

    ``binary_base64``: Spark's JSON writer base64-encodes binary columns, so
    a dump produced by :func:`dump_topics_to_json` reads back as base64
    strings — pass True to ``unbase64`` them back to the original bytes.
    Hand-authored JSON with plain-string keys/values keeps the default
    (UTF-8 cast), matching the reference's string-key produce path.
    """
    cols = []
    for name in ("key", "value"):
        if name in df.columns:
            src = F.unbase64(F.col(name).cast("string")) if binary_base64 \
                else F.col(name).cast("binary")
            cols.append(src.alias(name))
    if topic_override:
        cols.append(F.lit(topic_override).alias("topic"))
    elif "topic" in df.columns:
        cols.append(F.col("topic"))
    has_headers = "headers" in df.columns
    if has_headers:
        htyp = df.schema["headers"].dataType
        if isinstance(htyp, T.MapType):
            entries = F.map_entries("headers")
        elif isinstance(htyp, T.StructType) and htyp.fields:
            # spark.read.json infers a struct of observed header keys
            entries = F.array(
                *[
                    F.struct(
                        F.lit(fld.name).alias("key"),
                        F.col(f"headers.{fld.name}").alias("value"),
                    )
                    for fld in htyp.fields
                ]
            )
        else:
            # every dumped message had empty headers → JSON infers a
            # zero-field struct (or a degenerate scalar); producing
            # headerless messages is the faithful round-trip
            has_headers = False
    if has_headers:
        cols.append(
            F.expr(
                "filter(__hdr_entries, h -> h.value is not null)"
            ).alias("headers")
        )
        df = df.withColumn(
            "__hdr_entries",
            F.transform(
                entries,
                lambda h: F.struct(
                    h["key"].alias("key"),
                    h["value"].cast("string").cast("binary").alias("value"),
                ),
            ),
        )
    if use_given_partitions and "partition" in df.columns:
        cols.append(F.col("partition").cast("int").alias("partition"))
    return df.select(*cols)


def produce_from_json(
    spark: SparkSession,
    bootstrap_servers: str,
    path: str,
    topic_override: str | None = None,
    use_given_partitions: bool = False,
    binary_base64: bool = False,
    extra_options: dict[str, str] | None = None,
) -> None:
    """A6: bulk produce a JSON dump (list of {key,value,headers,topic
    [,partition]}) back to Kafka (``fluvii_toolbox.py:209-229``). Headers
    round-trip from the dump's string-map form; ``use_given_partitions``
    forwards each message's explicit partition like the reference flag;
    ``binary_base64=True`` for dumps written by :func:`dump_topics_to_json`
    (binary → base64 in JSON)."""
    out = produce_messages_frame(
        spark.read.json(path),
        topic_override=topic_override,
        use_given_partitions=use_given_partitions,
        binary_base64=binary_base64,
    )
    w = (
        out.write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
    )
    for k, v in (extra_options or {}).items():
        w = w.option(k, v)
    w.save()
