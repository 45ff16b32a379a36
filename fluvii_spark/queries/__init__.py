"""Declared query inventory (SURVEY.md §2.3) + duckdb oracle SQL.

Each :class:`Query` pairs a PySpark callable ``(spark, sf_dir) -> DataFrame``
with the ANSI-SQL string a duckdb oracle runs on the same parquet tables.
Column names/aliases are identical on both sides — the driver's comparator
sorts columns by name before hashing values.

Determinism rules used throughout (see FIXTURES.md "Determinism notes"):
- money aggregates go through DECIMAL casts so sums are exact and
  order-independent, then CAST back to DOUBLE (identical in both engines);
- every ranking/top-k has a unique tie-break key;
- float outputs survive the driver's 6-dp rounding because per-value error
  is << 1e-6 by construction.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → non-SQL-expressible; driver does rows-only check
    description: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None,
    description: str = "",
    tags: tuple[str, ...] = (),
):
    """Decorator: add a query callable to the registry."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        _REGISTRY[name] = Query(name, fn, oracle, description, tags)
        return fn

    return deco


def registry() -> dict[str, Query]:
    # import side-effect populates _REGISTRY
    from fluvii_spark.queries import (  # noqa: F401
        llm,
        relational,
        relational_ext,
        relational_ext2,
        relational_ext3,
    )

    return dict(_REGISTRY)
