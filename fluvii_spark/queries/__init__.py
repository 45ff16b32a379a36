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


# Queries that already have a green driver-correctness row (CORRECTNESS_r01):
# the round-1 harness recorded exactly the first 50 dict entries, so ordering
# matters — registry() lists not-yet-driver-proven queries FIRST so a capped
# harness proves new ground each round, while a full run still covers all.
_R1_PROVEN = {
    *(f"q{i:02d}" for i in range(1, 48)),  # q01..q47
    "q57", "q59", "q60",
}


def _prefix(name: str) -> str:
    return name.split("_", 1)[0]


def registry() -> dict[str, Query]:
    # import side-effect populates _REGISTRY
    from fluvii_spark.queries import (  # noqa: F401
        llm,
        llm2,
        relational,
        relational_ext,
        relational_ext2,
        relational_ext3,
        relational_ext4,
    )

    items = sorted(
        _REGISTRY.items(),
        key=lambda kv: (_prefix(kv[0]) in _R1_PROVEN, kv[0]),
    )
    return dict(items)
