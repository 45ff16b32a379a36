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
    *(f"q{i:02d}" for i in range(1, 100)),  # q01..q99 (r1+r2+r3)
    *(f"q{i}" for i in range(100, 147)),    # q100..q146 (r2+r3)
} - {
    "q118", "q120", "q135", "q34", "q106", "q105", "q124", "q125",
    # re-queued late in r4: the as-of operator now carries the matched
    # right row as one struct (q69) and pack_sequences packs float sizes
    # without int-truncation (q80) — results identical on this data (local
    # sweeps green under both canonicalizers) but the code changed after
    # their last green row, so their proofs need refreshing. The guard-only
    # touches (q38 empty-input, q43/q76 worker-shipping) don't alter any
    # expression and keep their rows.
    "q69", "q80",
    # q58's oracle gained the (ts, event_id) tie-break in its session-
    # numbering window late in r4 (its old form was nondeterministic on
    # equal-timestamp events) — same boundary semantics (verified: Spark
    # merges an exactly-gap event; the split stays strictly-greater), but
    # the oracle text changed after the r3 green row.
    "q58",
    # degenerate-input hardening late in r4 (zero-norm vectors crashed the
    # similarity family under ANSI; q42 emitted a NULL-fingerprint row its
    # oracle omits; q143 gained a checkpoint): results identical on the
    # fixtures — every one re-verified green at sf0.01 under both
    # canonicalizers plus a synthetic zero-vector edge suite
    # (tests/test_zero_vector_edges.py) — but expressions changed after
    # their green rows. They sort LAST (see _REPROOF_LAST): first-proof of
    # the r4 additions and the behavior-relevant re-proofs outrank these
    # guard-only refreshes under the ~50-row cap.
    "q30", "q38", "q39", "q42", "q57", "q107", "q116", "q140", "q143",
    "q146",
}

# Queries awaiting a green driver row against their *current* code, in the
# order the driver should attempt them: q118/q120 (redefined in r3 after
# their last green row), then the round-4 touch-ups (q135 zero-vector
# guard; q34/q106 auto df-cut now metadata-only; q105/q124/q125 ride on
# the refactored ranking scaffold — results identical per the 1/7/64-
# partition parity tests, re-proven for freshness). Round-4 additions
# (q147+) sort right after by name: 3 + 8 + 42 = 53 against the ~50-row
# cap — the alphabetically-last new queries (q186-q188) may slip to
# r5's budget; freshness of changed-code proofs outranks first-proof of
# additions whose full local evidence is committed.
_UNPROVEN_ORDER = [
    "q69", "q80", "q58",  # r4 changes after their green rows (see above)
    "q118", "q120", "q135", "q34", "q106", "q105", "q124", "q125",
]

# guard-only re-proofs: attempted only after everything above AND the new
# q147+ additions (which sort between by name)
_REPROOF_LAST = [
    "q30", "q38", "q39", "q42", "q57", "q107", "q116", "q140", "q143",
    "q146",
]


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
        relational_ext6,
        relational_ext7,
    )

    rank = {p: i for i, p in enumerate(_UNPROVEN_ORDER)}
    rank.update({p: 20_000 + i for i, p in enumerate(_REPROOF_LAST)})
    items = sorted(
        _REGISTRY.items(),
        key=lambda kv: (
            _prefix(kv[0]) in _DRIVER_PROVEN,   # unproven first
            rank.get(_prefix(kv[0]), 10_000),    # in explicit numeric order
            kv[0],
        ),
    )
    return dict(items)
