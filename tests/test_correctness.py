"""t2-style correctness: every registered query with an oracle hash-matches
duckdb on the same parquet tables (driver analogue, run at sf0.001 locally;
set FLUVII_SPARK_TEST_SF_DIR=/root/testdata/sf0.01 for the driver scale)."""

from __future__ import annotations

import pytest

from fluvii_spark.queries import registry
from tests.harness import compare

REG = registry()
WITH_ORACLE = sorted(name for name, q in REG.items() if q.oracle is not None)
ROWS_ONLY = sorted(name for name, q in REG.items() if q.oracle is None)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(name, spark, duck, sf_dir):
    q = REG[name]
    ok, msg = compare(q.fn(spark, sf_dir), duck, q.oracle)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(name, spark, sf_dir):
    q = REG[name]
    df = q.fn(spark, sf_dir)
    assert df.count() >= 0
