"""Distributed exact order statistics.

Spark's windows need ``partitionBy`` to parallelize; a global
``row_number()`` funnels the whole relation through ONE task, and the
built-in exact ``percentile`` aggregate collects every value into one
aggregation buffer — both are the single-node tails that break at 100 TB.

The primitives here keep order statistics exact while staying distributed:

- :func:`distributed_row_number` — global rank = range-repartition (each
  partition holds a contiguous key range, in partition-id order) + per-
  partition ``row_number`` (parallel) + broadcast prefix-count offsets.
  The final rank values are INVARIANT to where the sampled range
  boundaries land (they only re-slice a fixed total order), so results
  are deterministic across cluster sizes and reruns.
- :func:`exact_quantiles` — exact interpolated quantiles from two order
  statistics per probe point: rank the column once, equi-join the 2·|ps|
  needed ranks (broadcast), interpolate. One range shuffle + one window
  per partition instead of an all-values-in-one-buffer aggregate.

No reference counterpart (fluvii has no relational layer — SURVEY.md
§2.2); this is engine infrastructure for q124/q125 and any exact
median/decile at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def distributed_row_number(
    df: DataFrame,
    order_cols: list[str | Column],
    num_partitions: int = 32,
    out_col: str = "rnk",
) -> DataFrame:
    """Global 1-based row_number over ``order_cols`` without a single-task
    window.

    Ties across ``order_cols`` get an arbitrary-but-stable order within
    their equal-key group (range partitioning keeps equal keys in one
    partition); pass a unique tie-break column for a fully deterministic
    assignment (q125 does), or rely on rank→value lookups being
    tie-invariant (q124 does: the value AT a rank is unique even when the
    rank WITHIN a tie group is not).
    """
    # sortWithinPartitions + monotonically_increasing_id is zipWithIndex in
    # DataFrame-land: the id packs (partitionId << 33) | rowIndexInPartition,
    # so local rank AND partition id come out of the ALREADY range-shuffled,
    # locally-sorted data with zero further shuffles — a window partitioned
    # by spark_partition_id would re-exchange the whole relation by
    # hash(_pid) just to regroup rows that are already colocated
    parts = (
        df.repartitionByRange(num_partitions, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_mid", F.monotonically_increasing_id())
        .withColumn("_pid", F.shiftrightunsigned("_mid", 33))
        .withColumn(
            "_lrn", (F.col("_mid") % F.lit(1 << 33) + F.lit(1)).cast("long")
        )
    )
    # the counts branch and the join branch must see the SAME partitioning:
    # column pruning makes the two exchange subtrees non-identical (no
    # ReusedExchange), and RangePartitioner's sampling depends on upstream
    # row order, which is not deterministic below a shuffle — two
    # independent executions could pick different boundaries, silently
    # corrupting rank = local + offset. localCheckpoint materializes the
    # shuffled+sorted partitions once; both branches read the same data.
    # Availability tradeoff (same as RDD.zipWithIndex): locally
    # checkpointed blocks die with their executor, so on a lossy cluster
    # swap this for df.checkpoint() against a reliable checkpoint dir —
    # correctness of the rank construction is identical either way.
    parts = parts.localCheckpoint(eager=False)
    counts = parts.groupBy("_pid").agg(F.count("*").alias("_cnt"))
    # the offsets window runs over <= num_partitions rows — driver-free tiny
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = counts.select(
        "_pid", F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)).alias("_off")
    )
    return (
        parts.join(F.broadcast(offs), "_pid")
        .withColumn(out_col, F.col("_lrn") + F.col("_off"))
        .drop("_mid", "_pid", "_lrn", "_off")
    )


def exact_quantiles(
    df: DataFrame,
    col: str,
    ps: list[float],
    round_dp: int = 6,
    num_partitions: int = 32,
) -> DataFrame:
    """1-row DataFrame with column ``q``: the exact interpolated quantiles
    of ``col`` at probe points ``ps``, ascending, rounded to ``round_dp``.

    Interpolation follows percentile_cont / Spark ``percentile``:
    pos = 1 + (n-1)p, value = x_lo + frac·(x_hi − x_lo) over the two
    adjacent order statistics. Only 2·|ps| ranked rows are ever joined
    out (broadcast probe table), so the expensive pass is the ranking
    shuffle — parallel — not a one-buffer percentile aggregate.
    """
    # percentile_cont / Spark percentile ignore NULLs; rank and count only
    # the non-null values or every quantile shifts on nullable columns
    vals = df.select(F.col(col).alias("x")).filter(F.col("x").isNotNull())
    ranked = distributed_row_number(vals, ["x"], num_partitions)
    n = vals.agg(F.count("*").alias("n"))
    ps_arr = F.array([F.lit(float(p)) for p in ps])
    t = n.select(F.explode(ps_arr).alias("p"), "n").select(
        "p", (F.lit(1) + (F.col("n") - 1) * F.col("p")).alias("pos")
    )
    t = t.select(
        "p",
        F.floor("pos").cast("bigint").alias("lo"),
        F.ceil("pos").cast("bigint").alias("hi"),
        (F.col("pos") - F.floor("pos")).alias("frac"),
    )
    probes = t.select(
        "p",
        "frac",
        F.explode(
            F.array(
                F.struct(F.col("lo").alias("r"), F.lit("lo").alias("w")),
                F.struct(F.col("hi").alias("r"), F.lit("hi").alias("w")),
            )
        ).alias("pr"),
    ).select("p", "frac", F.col("pr.r").alias("rnk"), F.col("pr.w").alias("w"))
    hits = (
        ranked.join(F.broadcast(probes), "rnk")
        .groupBy("p", "frac")
        .agg(
            F.max(F.when(F.col("w") == "lo", F.col("x"))).alias("x_lo"),
            F.max(F.when(F.col("w") == "hi", F.col("x"))).alias("x_hi"),
        )
    )
    b = hits.select(
        F.round(
            F.col("x_lo") + F.col("frac") * (F.col("x_hi") - F.col("x_lo")),
            round_dp,
        ).alias("b")
    )
    return b.agg(F.sort_array(F.collect_list("b")).alias("q"))


def grouped_exact_quantiles(
    df: DataFrame,
    group_cols: list[str],
    col: str,
    ps: list[float],
    round_dp: int = 6,
    num_partitions: int = 32,
) -> DataFrame:
    """Exact interpolated quantiles PER GROUP without per-group windows or
    per-group value buffers: ``(group_cols..., p, quantile)`` long form.

    Spark's exact ``percentile`` per group buffers every group value in
    one aggregation state, and a ``PARTITION BY group`` window puts each
    whole group through one task — both collapse when a handful of groups
    hold billions of rows (the q105/q127 situation). Here ONE distributed
    ranking over the composite ``(groups..., x)`` order assigns globally
    contiguous ranks per group; per-group base offsets and counts are a
    tiny broadcast aggregate, so each group's order statistics are plain
    global-rank lookups: rank = base − 1 + pos within the group.
    """
    vals = df.select(
        *group_cols, F.col(col).alias("x")
    ).filter(F.col(col).isNotNull())
    ranked = distributed_row_number(
        vals, [*group_cols, "x"], num_partitions
    )
    per_g = ranked.groupBy(*group_cols).agg(
        F.min("rnk").alias("base"), F.count("*").alias("n")
    )
    ps_arr = F.array([F.lit(float(p)) for p in ps])
    t = per_g.select(
        *group_cols,
        "base",
        "n",
        F.explode(ps_arr).alias("p"),
    ).select(
        *group_cols,
        "p",
        (F.lit(1) + (F.col("n") - 1) * F.col("p")).alias("pos"),
        "base",
    )
    t = t.select(
        *group_cols,
        "p",
        (F.col("base") - 1 + F.floor("pos")).cast("bigint").alias("lo"),
        (F.col("base") - 1 + F.ceil("pos")).cast("bigint").alias("hi"),
        (F.col("pos") - F.floor("pos")).alias("frac"),
    )
    probes = t.select(
        *group_cols,
        "p",
        "frac",
        F.explode(
            F.array(
                F.struct(F.col("lo").alias("r"), F.lit("lo").alias("w")),
                F.struct(F.col("hi").alias("r"), F.lit("hi").alias("w")),
            )
        ).alias("pr"),
    ).select(
        *group_cols,
        "p",
        "frac",
        F.col("pr.r").alias("rnk"),
        F.col("pr.w").alias("w"),
    )
    # global ranks are unique, so the probe join needs only rnk; the probe
    # rows carry their group columns through
    hits = (
        ranked.select("rnk", "x")
        .join(F.broadcast(probes), "rnk")
        .groupBy(*group_cols, "p", "frac")
        .agg(
            F.max(F.when(F.col("w") == "lo", F.col("x"))).alias("x_lo"),
            F.max(F.when(F.col("w") == "hi", F.col("x"))).alias("x_hi"),
        )
    )
    return hits.select(
        *group_cols,
        "p",
        F.round(
            F.col("x_lo") + F.col("frac") * (F.col("x_hi") - F.col("x_lo")),
            round_dp,
        ).alias("quantile"),
    )
