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
    *(f"q{i:02d}" for i in range(1, 100)),  # q01..q99 (r1..r4)
    *(f"q{i}" for i in range(100, 186)),    # q100..q185 (r2..r4)
} - {
    # Edited by r4's fifth review pass (zero-norm/ANSI guards across the
    # similarity family; q42 NULL-fingerprint row; q143 checkpoint) AFTER
    # their last green rows. All 13 re-verified green locally under both
    # canonicalizers, but per the bar they stay unproven until a fresh
    # driver row lands. Only 13 candidates against the ~50-row cap this
    # round — every one fits (VERDICT r4 "Next round" #2).
    "q30", "q38", "q39", "q42", "q57", "q107", "q116", "q140", "q143",
    "q146",
    # q124 was REDEFINED in r5 (NTILE-depth semantics derived from the
    # distributed rank, one lineitem pass — oracle rewritten to NTILE(8)
    # with the same tie-break): green locally under both canonicalizers at
    # sf0.001/sf0.01, re-queued for a fresh driver row.
    "q124",
}
# q186-q188 were never sampled (alphabetically last of r4's 42 additions
# under the cap) and are absent from _DRIVER_PROVEN by construction.

# Queries awaiting a green driver row against their *current* code, in the
# order the driver should attempt them: the three never-proven r4
# additions first, then the ten guard-touched similarity re-proofs, then
# the r5 q124 redefinition, then the twenty-six r5 additions (q189-q214,
# each verified at sf0.001 AND sf0.01 under both canonicalizers before
# registration). 40 first-proof candidates + 6 deferred re-proofs = 46
# against the ~50-row cap — all fit.
_UNPROVEN_ORDER = [
    "q186", "q187", "q188",
    "q30", "q38", "q39", "q42", "q57", "q107", "q116", "q140", "q143",
    "q146", "q124",
    "q189", "q190", "q191", "q192", "q193", "q194", "q195", "q196", "q197",
    "q198", "q199", "q200", "q201", "q202", "q203", "q204", "q205", "q206",
    "q207", "q208", "q209", "q210", "q211", "q212", "q213", "q214",
]

# Deferred-tier re-proofs: queries whose plan or oracle changed in r5
# AFTER their last green rows (q72 oracle floor-vs-// on pre-epoch
# timestamps; q181 right-side dedup per the as-of contract; q147 integer
# DIV register index; q178 dedup-not-agg; q69/q153 ride on the r5
# asof_join carry-struct rename `ts` -> `_asof_ts`, an expression change
# under their unchanged results). All re-verified green under both
# canonicalizers at sf0.001+sf0.01; queued behind the first-proof tier.
_REPROOF_LAST: list[str] = ["q72", "q147", "q178", "q181", "q69", "q153"]


def _prefix(name: str) -> str:
    return name.split("_", 1)[0]


def registry() -> dict[str, Query]:
    # import side-effect populates _REGISTRY
    from fluvii_spark.queries import (  # noqa: F401
        llm,
        llm2,
        llm3,
        llm4,
        relational,
        relational_ext,
        relational_ext2,
        relational_ext3,
        relational_ext4,
        relational_ext5,
        relational_ext6,
        relational_ext7,
        relational_ext8,
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
