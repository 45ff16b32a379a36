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
# CORRECTNESS_r01.json ∪ CORRECTNESS_r02.json ∪ CORRECTNESS_r03.json. The
# driver harness records at most ~50 rows per round, so ordering matters —
# registry() lists not-yet-driver-proven queries FIRST so a capped harness
# proves new ground each round, while a full run still covers all. After r3
# every registered query q01..q146 has a green row, BUT q118 and q120 were
# redefined in r3 *after* their last (r2) green row — their driver proof
# predates the current code, so they are deliberately re-queued for a fresh
# r4 row (VERDICT r3 "Next round" #1).
_DRIVER_PROVEN = {
    # r5 closed the backlog: every q01..q214 has a driver row postdating
    # its code (CORRECTNESS_r01..r05, VERDICT r5). Members of
    # _REPROOF_LAST below still sort in the needs-a-row tier.
    *(f"q{i:02d}" for i in range(1, 100)),  # q01..q99
    *(f"q{i}" for i in range(100, 215)),    # q100..q214
}

# Queries awaiting a FIRST green driver row against their current code, in
# driver-attempt order: the twelve r6 additions (each verified at sf0.001
# AND sf0.01 under both canonicalizers before registration). 12 first
# proofs + 5 deferred re-proofs = 17 against the ~50-row cap — all fit.
_UNPROVEN_ORDER: list[str] = [
    "q215", "q216", "q217", "q218", "q219", "q220", "q221", "q222",
    "q223", "q224", "q225", "q226", "q227", "q228", "q229", "q230",
    "q231", "q232", "q233", "q234", "q235", "q236", "q237", "q238",
    "q239", "q240", "q241", "q242", "q243", "q244", "q245",
]

# Deferred-tier re-proofs: queries whose expression or oracle changed in
# r6 AFTER their r5-green rows (ADVICE r5 fixes: q201 NULL-anchor path
# filter pinned on both sides; q211/q212 ride on _kmeans_assignment's
# empty-embedding filter now matching the oracle's unnest semantics;
# q60/q100 ride on the clusters memo going self-contained-checkpoint —
# identical values, changed plan). All re-verified green under both
# canonicalizers at sf0.001+sf0.01 before this queue landed; queued behind
# any first-proof tier.
_REPROOF_LAST: list[str] = ["q201", "q211", "q212", "q60", "q100"]


def _prefix(name: str) -> str:
    return name.split("_", 1)[0]


def registry() -> dict[str, Query]:
    # import side-effect populates _REGISTRY
    from fluvii_spark.queries import (  # noqa: F401
        llm,
        llm2,
        llm3,
        llm4,
        llm5,
        relational,
        relational_ext,
        relational_ext2,
        relational_ext3,
        relational_ext4,
        relational_ext5,
        relational_ext6,
        relational_ext7,
        relational_ext8,
        relational_ext9,
    )

    rank = {p: i for i, p in enumerate(_UNPROVEN_ORDER)}
    rank.update({p: 20_000 + i for i, p in enumerate(_REPROOF_LAST)})
    items = sorted(
        _REGISTRY.items(),
        key=lambda kv: (
            # needs-a-row tier first: never-proven OR stale-proof re-queues.
            # (A _REPROOF_LAST member still in _DRIVER_PROVEN must sort in
            # this tier too — leaving it in the proven tier put it at the
            # very END of the registry, past the driver's ~50-row cap, so
            # its stale proof could never refresh.)
            _prefix(kv[0]) in _DRIVER_PROVEN
            and _prefix(kv[0]) not in _REPROOF_LAST,
            rank.get(_prefix(kv[0]), 10_000),    # in explicit numeric order
            kv[0],
        ),
    )
    return dict(items)
