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
