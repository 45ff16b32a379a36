"""Batch readers.

The reference's only source is Kafka (SURVEY.md S1-S4,
``fluvii/components/consumer/consumer.py:74-81``); file sources are new
engine surface. The testdata loader below is the canonical entry for the
correctness harness tables (TESTDATA.md).

Scale notes:
- Plain ``spark.read.parquet`` keeps predicate pushdown / column pruning
  intact — do NOT cache or materialize here; callers express the full plan
  declaratively and Catalyst prunes the scan.
- ``events.parquet`` stores TIMESTAMP(NANOS) which Spark's parquet reader
  rejects; with ``spark.sql.legacy.parquet.nanosAsLong=true`` it arrives as
  a long which we convert to micros (``ts DIV 1000``) — identical to duckdb's
  nanos→micros truncation, keeping the oracle comparison exact.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from fluvii_spark.session import apply_runtime_confs

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def sf_from_dir(sf_dir: str) -> float | None:
    """Scale factor from an 'sf0.1'-style directory name; None when the
    name doesn't encode one (both bench harnesses report this field)."""
    base = os.path.basename(sf_dir.rstrip("/"))
    suffix = base.removeprefix("sf")
    if not suffix:  # bare 'sf' encodes no scale factor — don't invent one
        return None
    try:
        return float(suffix)
    except ValueError:
        return None


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table; normalizes the events nano-timestamp."""
    apply_runtime_confs(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F

        df = df.withColumn(
            "ts", F.expr("CAST(timestamp_micros(ts DIV 1000) AS TIMESTAMP_NTZ)")
        )
    return df


class Tables:
    """Lazy dict-style access: ``t.lineitem``, ``t['orders']``."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        self._spark = spark
        self._sf_dir = sf_dir
        self._cache: dict[str, DataFrame] = {}

    def __getitem__(self, name: str) -> DataFrame:
        if name not in self._cache:
            if name not in TABLES:
                raise KeyError(name)
            self._cache[name] = load_table(self._spark, self._sf_dir, name)
        return self._cache[name]

    def __getattr__(self, name: str) -> DataFrame:
        if name.startswith("_"):
            raise AttributeError(name)
        try:
            return self[name]
        except KeyError:
            # hasattr()/getattr(default)/inspect probes expect
            # AttributeError from attribute access, never KeyError
            raise AttributeError(name) from None


def load_tables(spark: SparkSession, sf_dir: str) -> Tables:
    return Tables(spark, sf_dir)


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view so users can
    ``spark.sql(...)`` directly — the SQL front door to the engine."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
