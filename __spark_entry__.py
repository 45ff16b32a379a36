"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query; ``queries()`` /
``oracle_sql()`` expose the full declared inventory (SURVEY.md §2.3 plus the
LLM-data ops) from :mod:`fluvii_spark.queries`.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from fluvii_spark.queries import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the end-to-end training-data pipeline (q88) — quality
    gate → normalize + dedup → stratified split → 512-token packing → stats,
    composed into ONE lazy plan from inventory operators."""
    return registry()["q88_pipeline_e2e"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (same column names/aliases)."""
    return {name: q.oracle for name, q in registry().items() if q.oracle is not None}
