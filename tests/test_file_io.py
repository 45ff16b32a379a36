"""File source/sink wrappers: format roundtrips, partitioned layout with
pruning, file sizing."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from fluvii_spark.io.files import read_files, write_files
from fluvii_spark.io.readers import load_tables


def test_roundtrip_all_formats(spark, sf_dir, tmp_path):
    src = load_tables(spark, sf_dir).orders.select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    n = src.count()
    for fmt in ("parquet", "orc", "json", "csv"):
        p = str(tmp_path / fmt)
        write_files(src, p, fmt)
        back = read_files(spark, p, fmt, schema=src.schema)
        assert back.count() == n
        if fmt != "csv":  # csv loses exact double text in rare cases
            assert (
                back.agg(F.sum("o_orderkey")).collect()[0][0]
                == src.agg(F.sum("o_orderkey")).collect()[0][0]
            )


def test_partitioned_layout_prunes(spark, sf_dir, tmp_path):
    src = load_tables(spark, sf_dir).orders
    p = str(tmp_path / "by_status")
    write_files(src, p, "parquet", partition_by=["o_orderstatus"])
    dirs = {d for d in os.listdir(p) if d.startswith("o_orderstatus=")}
    assert len(dirs) >= 2
    pruned = read_files(spark, p, "parquet").filter(F.col("o_orderstatus") == "F")
    plan = pruned._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        pruned._jdf.queryExecution(), "formatted"
    )
    # partition filter must prune directories, not appear as a data filter
    assert "PartitionFilters" in plan and "o_orderstatus" in plan.split(
        "PartitionFilters"
    )[1].split("\n")[0]


def test_target_file_rows_controls_file_count(spark, sf_dir, tmp_path):
    src = load_tables(spark, sf_dir).orders
    n = src.count()
    p = str(tmp_path / "sized")
    write_files(src, p, "parquet", target_file_rows=max(1, n // 4))
    files = [f for f in os.listdir(p) if f.endswith(".parquet")]
    assert 3 <= len(files) <= 5, files


def test_bad_format_rejected(spark, tmp_path):
    try:
        read_files(spark, str(tmp_path), "avro")
        raise AssertionError("should raise")
    except ValueError as e:
        assert "format must be one of" in str(e)


def test_cluster_by_yields_disjoint_file_ranges(spark, sf_dir, tmp_path):
    """cluster_by range-partitions + sorts, so every output file covers a
    disjoint o_orderdate range — the layout whose parquet min/max footers
    let readers skip whole files on range predicates."""
    src = load_tables(spark, sf_dir).orders
    n = src.count()
    p = str(tmp_path / "clustered")
    write_files(
        src, p, "parquet", cluster_by=["o_orderdate"],
        target_file_rows=max(1, n // 4),
    )
    per_file = (
        read_files(spark, p, "parquet")
        .groupBy(F.input_file_name().alias("f"))
        .agg(F.min("o_orderdate").alias("lo"), F.max("o_orderdate").alias("hi"))
        .collect()
    )
    assert len(per_file) >= 3
    ranges = sorted((r["lo"], r["hi"]) for r in per_file)
    for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert lo1 <= hi1 <= lo2, ranges  # disjoint, ordered coverage
