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


# Queries with a green driver-correctness row (rows+schema+hash all true) in
# CORRECTNESS_r01.json ∪ CORRECTNESS_r02.json. The driver harness records at
# most ~50 rows per round, so ordering matters — registry() lists
# not-yet-driver-proven queries FIRST so a capped harness proves new ground
# each round, while a full run still covers all. Exact set recomputed from the
# committed correctness artifacts for round 3 (q57's r1 row was
# `err: no_oracle` — NOT proven; q56/q58 failed in r2; q80–q99 never got a
# row because the old lexicographic sort placed q100+ ahead of them).
_DRIVER_PROVEN = {
    *(f"q{i:02d}" for i in range(1, 56)),   # q01..q55 (r1+r2)
    "q59", "q60",                            # r1
    *(f"q{i:02d}" for i in range(61, 80)),  # q61..q79 (r2)
    *(f"q{i}" for i in range(100, 121)),    # q100..q120 (r2)
}

# The 23 r1/r2 queries still awaiting a green driver row, in the order we
# want the driver to attempt them (numeric, so q80..q99 precede nothing
# important). Round-3 additions (q121+) are likewise unproven and sort right
# after these by name — 23 + 26 = 49 fits the driver's ~50-row cap.
# ROUND 4: recompute _DRIVER_PROVEN as the green-row union of
# CORRECTNESS_r01..r03 (q56-q58, q80-q99, q121-q146 should all be green in
# r03), refresh _UNPROVEN_ORDER to whatever remains, and keep new queries
# within the cap headroom.
_UNPROVEN_ORDER = ["q56", "q57", "q58", *(f"q{i}" for i in range(80, 100))]


def _prefix(name: str) -> str:
    return name.split("_", 1)[0]


def registry() -> dict[str, Query]:
    # import side-effect populates _REGISTRY
    from fluvii_spark.queries import (  # noqa: F401
        llm,
        llm2,
        llm3,
        relational,
        relational_ext,
        relational_ext2,
        relational_ext3,
        relational_ext4,
        relational_ext5,
    )

    rank = {p: i for i, p in enumerate(_UNPROVEN_ORDER)}
    items = sorted(
        _REGISTRY.items(),
        key=lambda kv: (
            _prefix(kv[0]) in _DRIVER_PROVEN,   # unproven first
            rank.get(_prefix(kv[0]), 10_000),    # in explicit numeric order
            kv[0],
        ),
    )
    return dict(items)
