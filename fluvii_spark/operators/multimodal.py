"""Multimodal column support: opaque binary payloads + typed metadata.

No counterpart in the reference (fluvii values are Avro records —
``/root/reference/fluvii/components/producer/producer.py:136-140`` — with no
media handling). This module supplies the engine-side plumbing an LLM data
pipeline needs: a ``BINARY`` payload column, a metadata struct, and
Arrow-batched decode / feature-extract / resize / frame-sample stages over
``mapInPandas``.

The image/audio codecs are NOT in this container, so the decode kernels are
deterministic stubs behind ``FLUVII_SPARK_FAKE_DECODE`` (and raise
``NotImplementedError`` otherwise). Everything around them — schema,
partition sizing, Arrow batch shape, UDF signatures — is real and tested:
swapping a stub for Pillow/librosa changes one inner function, not the plan.

Scale notes: media blobs dominate row size, so the operators
``repartition`` by a target partition-byte budget before the Pandas stage
(keeps Arrow batches inside executor memory) and never collect.
"""

from __future__ import annotations

import hashlib
import math
import os
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from fluvii_spark.session import ensure_package_on_workers
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("mime", StringType()),
                    StructField("n_bytes", LongType()),
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("duration_ms", IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("sha256", StringType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def _fake_decode_allowed() -> bool:
    return os.environ.get("FLUVII_SPARK_FAKE_DECODE", "1") == "1"


def _byte_budget_repartition(df: DataFrame, target_partition_mb: int) -> DataFrame:
    """Widen partitioning so ~``target_partition_mb`` of payload lands in each
    partition — the Arrow batches a Pandas stage materializes then fit
    executor memory even with multi-MB media blobs.

    Sizing is metadata-only (optimized-plan ``sizeInBytes`` — payload bytes
    dominate media rows, so plan size ≈ payload size): no job runs. Only ever
    *increases* the partition count; a small corpus keeps its scan
    parallelism instead of collapsing to one partition.
    """
    try:
        est_bytes = int(
            str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        )
        need = max(1, math.ceil(est_bytes / (target_partition_mb * (1 << 20))))
        if need > df.rdd.getNumPartitions():
            return df.repartition(need)
        return df
    except AttributeError:
        # Spark Connect: no _jdf stats and no df.rdd — we can neither
        # estimate payload bytes nor read the current partition count.
        # Repartitioning blind could REDUCE parallelism on a large media
        # scan (shuffle.partitions < scan partitions), reintroducing the
        # giant-partition OOM this guard exists to prevent. Keep the
        # source parallelism untouched; Connect callers that know their
        # corpus is large should pre-repartition explicitly.
        return df


def _decode_features(payload: bytes, kind: str, n_features: int = 8) -> list[float]:
    """STUB decode: deterministic pseudo-features from the payload digest.

    Real pipelines replace this with Pillow / torchvision / librosa decode —
    the function contract (bytes → fixed-width float vector) is the real one.
    """
    if not _fake_decode_allowed():
        raise NotImplementedError(
            "media codecs not available in this environment; "
            "set FLUVII_SPARK_FAKE_DECODE=1 for the deterministic stub"
        )
    digest = hashlib.sha256(kind.encode() + payload).digest()
    return [
        int.from_bytes(digest[4 * i : 4 * i + 4], "big") / 2**32 for i in range(n_features)
    ]


def media_from_documents(docs: DataFrame, kind: str = "image") -> DataFrame:
    """Synthesize a media table from the documents fixture: the text bytes
    stand in for an encoded payload (the container has no codecs)."""
    payload = F.encode("text", "UTF-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(kind).alias("kind"),
        payload.alias("payload"),
        F.struct(
            F.lit(f"{kind}/x-fake").alias("mime"),
            F.octet_length("text").cast("long").alias("n_bytes"),
            F.lit(64).alias("width"),
            F.lit(64).alias("height"),
            F.lit(1000).alias("duration_ms"),
        ).alias("meta"),
    )


def extract_features(
    media: DataFrame, n_features: int = 8, target_partition_mb: int = 64
) -> DataFrame:
    """Arrow-batched decode + feature extraction over mapInPandas.

    Batches arrive as pandas frames (Arrow transfer); each row's payload is
    decoded independently — embarrassingly parallel, no shuffle. Partition
    count is sized from the payload byte budget so a partition's Arrow
    batches fit executor memory even with multi-MB media blobs.
    """
    ensure_package_on_workers(media.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "sha256": pdf["payload"].map(
                        lambda b: hashlib.sha256(bytes(b)).hexdigest()
                    ),
                    "features": [
                        _decode_features(bytes(p), k, n_features)
                        for p, k in zip(pdf["payload"], pdf["kind"])
                    ],
                }
            )
            yield out

    media = _byte_budget_repartition(media, target_partition_mb)
    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 250) -> DataFrame:
    """Video frame sampling plan: one output row per sampled frame offset.

    The decode itself is stubbed; the explode of frame offsets (the part that
    changes cardinality and therefore the plan) is real.
    """
    # duration_ms <= 0 (corrupt/zero-length video) would make
    # sequence(0, -1, step) an illegal-boundaries runtime error that kills
    # the whole job; filtering mirrors DuckDB's generate_series, which
    # returns empty for start > stop, and the NULL-duration drop
    return media.filter(
        (F.col("kind") == "video") & (F.col("meta.duration_ms") > 0)
    ).select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("meta.duration_ms") - 1, F.lit(every_ms))
        ).alias("frame_ms"),
        "payload",
    )


def resize(
    media: DataFrame, width: int, height: int, target_partition_mb: int = 64
) -> DataFrame:
    """Resize plan: payload → decoded image → scaled → re-encoded payload.

    The pixel kernel is STUBBED (no codecs in this environment) with a
    deterministic digest-seeded payload whose length scales with the target
    area — the Spark-side contract is the real one: Arrow-batched
    mapInPandas over (payload, meta), output schema identical to
    MEDIA_SCHEMA with updated (width, height, n_bytes), no shuffle, and
    byte-budget partitioning upstream exactly as extract_features.
    """
    ensure_package_on_workers(media.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def _resize_payload(p: bytes) -> bytes:
                if not _fake_decode_allowed():
                    raise NotImplementedError(
                        "media codecs not available; set "
                        "FLUVII_SPARK_FAKE_DECODE=1 for the stub"
                    )
                seed = hashlib.sha256(
                    b"resize:%dx%d:" % (width, height) + bytes(p)
                ).digest()
                # fake re-encode: digest-seeded bytes, length ∝ target area
                n = max(16, (width * height) // 64)
                return (seed * (n // len(seed) + 1))[:n]

            out = pdf.copy()
            out["payload"] = out["payload"].map(_resize_payload)
            metas = []
            for m, p in zip(out["meta"], out["payload"]):
                m = dict(m)
                m["width"], m["height"] = width, height
                m["n_bytes"] = len(p)
                metas.append(m)
            out["meta"] = metas
            yield out

    media = _byte_budget_repartition(media, target_partition_mb)
    return media.mapInPandas(run, schema=MEDIA_SCHEMA)
