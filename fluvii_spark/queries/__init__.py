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
    # r8 closed the backlog a fourth time: every q01..q253 has a driver row
    # postdating its code (CORRECTNESS_r01..r08, VERDICT r8). Members of
    # _REPROOF_LAST below still sort in the needs-a-row tier.
    *(f"q{i:02d}" for i in range(1, 100)),  # q01..q99
    *(f"q{i}" for i in range(100, 254)),    # q100..q253
}

# Queries awaiting a FIRST green driver row against their current code, in
# driver-attempt order (each verified at sf0.001 AND sf0.01 under both
# canonicalizers before registration). r9: none — the inventory is
# complete at 253 and this round is proof-rotation + polish.
_UNPROVEN_ORDER: list[str] = []

# Deferred-tier re-proofs: queries whose expression or oracle changed
# AFTER their last green row. All re-verified green under both
# canonicalizers at sf0.001+sf0.01 before this queue landed; queued behind
# any first-proof tier. r11: q117 — the g=10 growth oracle caught its
# free-order BM25 SUM wobbling in the last ulp, which broke a replica
# score-tie cluster at the top-20 boundary differently per engine; both
# sides now add the <=3 per-term conditional aggregates in fixed
# BM25_TERMS order (bit-stable), re-verified at sf0.001+sf0.01 AND
# hash-matched at g=10 and g=20, but its r8 driver row predates the
# changed expression+oracle, so it needs a fresh row. q23 — the same
# rotation sweep caught DuckDB's native DECIMAL->DOUBLE cast landing one
# ulp off the correctly-rounded double once the scaled integer passes
# 2^53 (the scale-6 tax chain crosses that at ~9e9 totals); the oracle
# now routes the final cast through VARCHAR (string parsing is correctly
# rounded, matching Spark's BigDecimal path). Spark expression unchanged;
# oracle TEXT changed, so its r7 row predates the current oracle. q175 —
# its cross-year AVG of per-year ratios diverged one ulp across engines
# at g=10 (Spark's DECIMAL-division path vs the oracle's promoted
# division) exactly on a 6-dp rounding boundary; both sides now quantize
# each ratio to a 1e-12-grid BIGINT before the (order-free integer) sum
# with one final IEEE division chain. Re-verified sf0.001/sf0.01 and
# hash-matched g=10/g=20; expression+oracle changed, so its r10 row is
# stale. q235/q244 — two faces of the same class at g=10: q235's
# scale-12 decimal product sum needs the VARCHAR conversion route (the
# q23 class), and BOTH carried an in-engine ROUND(double, 6) which at
# 1e9+ magnitudes (double ulp ~5e-7, at the 6-dp grid) picks DIFFERENT
# doubles in Spark's BigDecimal rounding vs the oracle's
# multiply-round-divide; the in-engine round is dropped on both sides
# (the driver canonicalizer is the single rounder). Re-verified
# sf0.001/sf0.01 + g=10/g=20.
_REPROOF_LAST: list[str] = ["q117", "q23", "q175", "q235", "q244"]

# Proof-trail rotation (VERDICT r6 ask #3, continued per r7 #2 / r8 #1 /
# r9 #1): queries whose NEWEST driver row is r4/r5 — their code is
# unchanged and full sweeps re-prove them every round, so this is row
# staleness, not a correctness gap. They sort in a third tier, AFTER
# every needs-a-row query but BEFORE fresh-proven ones, oldest round
# first, so the driver's spare row budget (~cap minus
# first-proofs/re-proofs) refreshes the oldest artifacts each round. The
# list may exceed the per-round cap — the driver simply refreshes the
# prefix that fits and the rest roll to the next round. (r1 tier drained
# in r7; r2 in r8; r3 in r9; r4 in r10. Recomputed mechanically from
# CORRECTNESS_r01..r10 at the start of r11: 17 rows remain at r5, 50 at
# r6 — a ~50-row budget drains r5 entirely and refreshes the oldest ~33
# of the r6 tier.)
_AGE_ROTATION: list[str] = [
    # newest row r5 (17 queries)
    "q195", "q196", "q197", "q198", "q199", "q200", "q202", "q203",
    "q204", "q205", "q206", "q207", "q208", "q209", "q210", "q213",
    "q214",
    # newest row r6 (50 queries; the budget prefix refreshes first)
    "q01", "q02", "q03", "q04", "q05", "q06", "q07", "q08", "q09",
    "q60", "q100", "q101", "q102", "q103", "q104", "q105", "q201",
    "q211", "q212", "q215", "q216", "q217", "q218", "q219", "q220",
    "q221", "q222", "q223", "q224", "q225", "q226", "q227", "q228",
    "q229", "q230", "q231", "q232", "q233", "q234", "q236",
    "q237", "q238", "q239", "q240", "q241", "q242", "q243",
    "q245",
    # q235/q244 moved to _REPROOF_LAST (r11 rounding fixes) — a query may
    # appear in only one tier; the reproof tier already sorts earlier.
]


# Non-degeneracy gate waivers (VERDICT r6 ask #4): tools/drive_contract.py
# asserts every query's sf0.01 result is non-vacuous (>=2 rows, no all-NULL
# column, >=2 columns varying). Queries whose INTENDED shape trips a rule
# are waived here, each with the argument; an unwaived trip fails the
# sweep. The r7 gate rollout ALSO caught six genuinely vacuous forms that
# were fixed instead of waived (q20/q63/q71/q89/q164/q189 — see
# _REPROOF_LAST above).
_ONE_ROW = "intended single-row corpus summary (scalar analytics)"
DEGENERACY_WAIVERS: dict[str, str] = {
    # --- intended single-row summaries: the whole point is ONE scalar
    # row per corpus (the driver hash still pins every value) ---
    "q05_count_distinct": _ONE_ROW,
    "q26_case_when": _ONE_ROW + " (bucketed CASE counts in one row)",
    "q77_try_cast": _ONE_ROW + " (cast-failure tally)",
    "q104_kmv_merge": _ONE_ROW + " (merged-sketch estimate vs exact)",
    "q125_gini_revenue": _ONE_ROW,
    "q129_chi2_contingency": _ONE_ROW + " (test statistic)",
    "q132_data_profile": _ONE_ROW + " (8 profile fields of one corpus)",
    "q152_pareto_topshare": _ONE_ROW,
    "q160_degree_assortativity": _ONE_ROW + " (graph-level coefficient)",
    "q165_ks_distance": _ONE_ROW + " (two-sample statistic)",
    "q178_conversion_horizons": _ONE_ROW + " (4 horizon counts)",
    "q182_cdc_apply": _ONE_ROW + " (post-apply state checksum)",
    "q187_bootstrap_ci": _ONE_ROW + " (point estimate + CI bounds)",
    "q198_triangle_count": _ONE_ROW + " (graph-level count)",
    "q200_quality_auc": _ONE_ROW + " (ROC AUC)",
    "q204_mean_shift_changepoint": _ONE_ROW + " (argmax day + shift size)",
    "q208_theil_sen_trend": _ONE_ROW + " (median slope + intercept)",
    "q210_degree_powerlaw_fit": _ONE_ROW + " (alpha + xmin + n_tail)",
    "q213_hll_merge": _ONE_ROW + " (merge-losslessness bit check)",
    "q215_small_qty_revenue": _ONE_ROW + " (TPC-H Q17 shape)",
    "q216_top_supplier_quarter": _ONE_ROW + " (argmax row)",
    "q226_capped_sessions": _ONE_ROW + " (session rollup stats)",
    "q232_ann_label_mrr": _ONE_ROW + " (MRR@10)",
    "q235_disjunctive_revenue": _ONE_ROW + " (TPC-H Q19 shape)",
    "q237_time_to_third_purchase": _ONE_ROW + " (median latency)",
    "q239_simhash_fp_audit": _ONE_ROW + " (precision/recall of the index)",
    "q249_order_value_icc": _ONE_ROW + " (ANOVA variance components)",
    # --- constant-metric columns that are true data properties of the
    # synthetic corpus, not untested code paths ---
    "q102_kmv_distinct_sketch": (
        "exact_distinct==150 for every event type (every synthetic user "
        "triggers every type) and the KMV estimate is exact below k — "
        "both engines must still agree on all 15 cells"
    ),
    "q147_hll_distinct_sketch": (
        "same corpus property as q102: per-type distinct-user counts are "
        "all 150; the register pipeline is further pinned by q213's "
        "bit-losslessness check and the streaming-fold parity tests"
    ),
    "q174_referential_audit": (
        "orphans==0 for all 5 FK checks IS the correct audit verdict on "
        "referentially-consistent testdata; the join machinery is the "
        "surface, and any future fixture break flips the column"
    ),
    "q56_collect_sorted": (
        "every nation's customers span all 5 market segments, so the "
        "collected sorted segment list is identical per nation — the "
        "collect+sort surface (array ordering, dedup) is still exercised "
        "and hash-pinned"
    ),
    "q62_listagg": (
        "same corpus property as q56 via string aggregation (listagg/"
        "concat_ws ordering is the surface under test)"
    ),
    "q82_salted_distinct": (
        "n_distinct==150 users for every event type (every user triggers "
        "every type); the salted two-stage distinct plumbing is the "
        "surface, and its count must still equal the plain distinct"
    ),
}


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
    rank.update({p: 30_000 + i for i, p in enumerate(_AGE_ROTATION)})

    def tier(name: str) -> int:
        p = _prefix(name)
        # 0: needs a row (never-proven OR re-queued after a code change —
        #    a _REPROOF_LAST member still in _DRIVER_PROVEN must sort here
        #    too, else it lands past the driver's ~50-row cap and its
        #    stale proof never refreshes);
        # 1: age rotation (proven, but the newest row is old);
        # 2: proven with a fresh row.
        if p not in _DRIVER_PROVEN or p in _REPROOF_LAST:
            return 0
        if p in _AGE_ROTATION:
            return 1
        return 2

    items = sorted(
        _REGISTRY.items(),
        key=lambda kv: (
            tier(kv[0]),
            rank.get(_prefix(kv[0]), 10_000),    # in explicit numeric order
            kv[0],
        ),
    )
    return dict(items)
