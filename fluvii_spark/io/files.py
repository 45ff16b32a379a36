"""Batch file sources & sinks (SURVEY.md §2.2 "Scans/Sinks" engine surface:
Parquet/ORC/JSON/CSV — all new relative to the reference, whose only file I/O is
the JSON topic dump, ``fluvii/kafka_tools/fluvii_toolbox.py:231-234``).

Thin, pushdown-preserving wrappers: no caching, no materialization — the
reader hands Catalyst the raw scan so pruning/pushdown stay intact; writers
expose the two decisions that matter at 100 TB (layout partitioning and
target file sizing) and nothing else.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_FORMATS = ("parquet", "orc", "json", "csv")


def read_files(
    spark: SparkSession,
    path: str,
    file_format: str = "parquet",
    schema: StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """Batch read. For JSON/CSV pass an explicit ``schema`` in production —
    inference scans the data twice and types drift between runs; parquet
    carries its own schema."""
    if file_format not in _FORMATS:
        raise ValueError(f"format must be one of {_FORMATS}, got {file_format!r}")
    r = spark.read.format(file_format)
    if schema is not None:
        r = r.schema(schema)
    if file_format == "csv":
        options.setdefault("header", "true")
    for k, v in options.items():
        r = r.option(k, v)
    return r.load(path)


def write_files(
    df: DataFrame,
    path: str,
    file_format: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    target_file_rows: int | None = None,
    cluster_by: list[str] | None = None,
    **options: str,
) -> None:
    """Batch write with layout control.

    - ``partition_by``: hive-style directory partitioning — the coarse
      pruning axis for downstream readers (date/tenant columns, low
      cardinality only: each distinct value is a directory);
    - ``target_file_rows``: repartition before writing so output files are
      uniformly sized — many tiny files (driver/file-index pressure) and
      few giant files (no read parallelism) are both failure modes at scale;
    - ``cluster_by``: range-partition + sort on these columns before the
      write, so each output file covers a DISJOINT range and its parquet
      min/max footer stats let readers skip whole files on range predicates
      — the fine pruning axis (high-cardinality sort keys: timestamps, ids)
      that directory partitioning can't provide.
    """
    if file_format not in _FORMATS:
        raise ValueError(f"format must be one of {_FORMATS}, got {file_format!r}")
    # sizing uses METADATA-ONLY estimates (operators/stats.py) — a df.count()
    # here would execute the entire upstream plan once for the count and
    # again for the write, doubling job cost at scale. The estimate sets
    # parallelism; the writer's maxRecordsPerFile (set below) is the HARD
    # per-file cap, so an over-estimate just means slightly smaller files —
    # the safe direction — and never many-rows-per-file blowups.
    from fluvii_spark.operators.stats import estimate_rows

    if cluster_by:
        if target_file_rows:
            n = estimate_rows(df)
            parts = max(1, (n + target_file_rows - 1) // target_file_rows)
            df = df.repartitionByRange(parts, *cluster_by)
        else:
            df = df.repartitionByRange(*cluster_by)
        df = df.sortWithinPartitions(*cluster_by)
    elif target_file_rows:
        n = estimate_rows(df)
        df = df.repartition(max(1, (n + target_file_rows - 1) // target_file_rows))
    if target_file_rows:
        options.setdefault("maxRecordsPerFile", str(target_file_rows))
    w = df.write.format(file_format).mode(mode)
    if file_format == "csv":
        options.setdefault("header", "true")
    if partition_by:
        w = w.partitionBy(*partition_by)
    for k, v in options.items():
        w = w.option(k, v)
    w.save(path)
