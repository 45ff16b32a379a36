"""Round-5 relational additions (q195-q197): sliding-window distinct
counting, quantile-bucket mobility, and join-key skew auditing —
operational analytics over the events/lineitem tables with the package's
determinism rules (DECIMAL money, boundary comparisons on 6-dp-rounded
quantiles, exact integer cores).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fluvii_spark.io.readers import load_tables
from fluvii_spark.queries import register


@register(
    "q195_sliding_distinct_users",
    """
    WITH days AS (
      SELECT user_id, event_type,
             CAST(unnest(generate_series(CAST(ts AS DATE),
                                         CAST(ts AS DATE) + 6,
                                         INTERVAL 1 DAY)) AS DATE) AS day
      FROM events
    )
    SELECT day, event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM days GROUP BY day, event_type
    """,
    "trailing-7-day distinct active users per (day, event_type) — the "
    "sliding-window COUNT(DISTINCT) no window frame can express (frames "
    "can't deduplicate). Each event EXPLODES into the <=7 window-end days "
    "it contributes to (a constant 7x, map-side, no shuffle), then one "
    "hash aggregation counts distinct users per cell — at 100 TB this is "
    "a bounded fan-out + partial-aggregated shuffle, vs the quadratic "
    "self-join a range join would cost. Day d's row covers [d-6, d]; "
    "days beyond the data's end appear exactly as the trailing windows "
    "that still contain events, identically in both engines",
    ("relational", "window", "timeseries", "distinct"),
)
def q195(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    days = t.events.select(
        "user_id",
        "event_type",
        F.explode(
            F.sequence(
                F.to_date("ts"), F.date_add(F.to_date("ts"), 6)
            )
        ).alias("day"),
    )
    return days.groupBy("day", "event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("n_users")
    )


_DECILE_PS = [i / 10.0 for i in range(1, 10)]


@register(
    "q196_decile_transitions",
    f"""
    WITH spend AS (
      -- explicit floor(): DuckDB's // truncates toward zero while Spark's
      -- floor() floors, which diverges on pre-epoch timestamps
      SELECT CAST(floor((CAST(ts AS DATE) - DATE '2024-01-01') / 7.0)
               AS BIGINT) AS wk,
             user_id,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS spend
      FROM events GROUP BY 1, 2
    ),
    bounds AS (
      SELECT wk, unnest(quantile_cont(spend, {_DECILE_PS})) AS b
      FROM spend GROUP BY wk
    ),
    dec AS (
      SELECT s.wk, s.user_id,
             1 + COUNT(CASE WHEN s.spend > ROUND(b.b, 6) THEN 1 END)
               AS decile
      FROM spend s JOIN bounds b ON b.wk = s.wk
      GROUP BY s.wk, s.user_id, s.spend
    )
    SELECT CAST(a.decile AS BIGINT) AS from_decile,
           CAST(b.decile AS BIGINT) AS to_decile,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM dec a JOIN dec b ON b.user_id = a.user_id AND b.wk = a.wk + 1
    GROUP BY 1, 2
    """,
    "week-over-week user-spend decile mobility matrix — the cohort "
    "stickiness measurement behind retention pricing. Per-week decile "
    "BOUNDARIES come from grouped_exact_quantiles (distributed ranking, "
    "no per-week window funneling a week's users through one task) and "
    "are rounded to 6dp so the strictly-greater bucket predicate is "
    "bit-identical across engines (the proven q124-r4 pattern); spend "
    "sums stay DECIMAL until one final double cast. Users present in "
    "consecutive weeks join on (user, wk+1)",
    ("relational", "window", "stats", "timeseries"),
)
def q196(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fluvii_spark.operators.ranking import grouped_exact_quantiles

    t = load_tables(spark, sf_dir)
    spend = (
        t.events.select(
            F.floor(
                F.datediff(F.to_date("ts"), F.lit("2024-01-01")) / 7
            )
            .cast("bigint")
            .alias("wk"),
            "user_id",
            F.col("value").cast("decimal(18,6)").alias("v"),
        )
        .groupBy("wk", "user_id")
        .agg(F.sum("v").cast("double").alias("spend"))
        .localCheckpoint(eager=False)
    )
    bounds = grouped_exact_quantiles(
        spend.select("wk", "spend"), ["wk"], "spend", _DECILE_PS
    ).select("wk", F.col("quantile").alias("b"))
    dec = (
        spend.join(F.broadcast(bounds), "wk")
        .groupBy("wk", "user_id", "spend")
        .agg(
            (
                1
                + F.count(
                    F.when(F.col("spend") > F.round(F.col("b"), 6), 1)
                )
            ).alias("decile")
        )
    )
    a = dec.select("wk", "user_id", F.col("decile").alias("from_decile"))
    b = dec.select(
        (F.col("wk") - 1).alias("wk"),
        "user_id",
        F.col("decile").alias("to_decile"),
    )
    return (
        a.join(b, ["wk", "user_id"])
        .groupBy("from_decile", "to_decile")
        .agg(F.count("*").cast("bigint").alias("n_users"))
        .select(
            F.col("from_decile").cast("bigint").alias("from_decile"),
            F.col("to_decile").cast("bigint").alias("to_decile"),
            "n_users",
        )
    )


@register(
    "q197_join_key_skew_audit",
    """
    WITH per_key AS (
      SELECT 'l_orderkey' AS key_col, l_orderkey AS k, COUNT(*) AS c
      FROM lineitem GROUP BY 2
      UNION ALL
      SELECT 'l_partkey', l_partkey, COUNT(*) FROM lineitem GROUP BY 2
      UNION ALL
      SELECT 'l_suppkey', l_suppkey, COUNT(*) FROM lineitem GROUP BY 2
    )
    SELECT key_col,
           CAST(SUM(c) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           CAST(MAX(c) AS BIGINT) AS top_count,
           ROUND(CAST(MAX(c) AS DOUBLE) / SUM(c), 6) AS top_share,
           ROUND(CAST(MAX(c) AS DOUBLE) * COUNT(*) / SUM(c), 6)
             AS skew_ratio
    FROM per_key GROUP BY key_col
    """,
    "join-key skew audit over lineitem's three join keys: rows, distinct "
    "keys, the hottest key's count/share, and skew_ratio = hottest/mean "
    "(1.0 = perfectly uniform) — the number that decides whether a join "
    "needs salting or AQE skew handling BEFORE it runs (operators/skew.py "
    "is the remediation; this is the detector). Three map-side-combined "
    "aggregations over one logical scan, contracted to per-key counts "
    "before the final 3-row rollup; exact integer core, two final "
    "divisions",
    ("relational", "skew", "profile"),
)
def q197(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)

    def per_key(col: str) -> DataFrame:
        return (
            t.lineitem.groupBy(F.col(col).alias("k"))
            .agg(F.count("*").alias("c"))
            .select(F.lit(col).alias("key_col"), "k", "c")
        )

    keys = (
        per_key("l_orderkey")
        .unionByName(per_key("l_partkey"))
        .unionByName(per_key("l_suppkey"))
    )
    return keys.groupBy("key_col").agg(
        F.sum("c").cast("bigint").alias("n_rows"),
        F.count("*").cast("bigint").alias("n_distinct"),
        F.max("c").cast("bigint").alias("top_count"),
        F.round(F.max("c").cast("double") / F.sum("c"), 6).alias("top_share"),
        F.round(
            F.max("c").cast("double") * F.count("*") / F.sum("c"), 6
        ).alias("skew_ratio"),
    )
