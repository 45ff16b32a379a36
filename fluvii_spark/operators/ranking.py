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

# ~1 range partition per this many rows when the caller lets the operator
# size itself (num_partitions=None). Rows through the prefix family are
# narrow (a handful of numeric/short-string order columns), so 4M rows is
# ~100-400 MB per partition — the guide's §2.2 sweet spot. Derived from
# metadata-only plan stats (no job); over-estimates err toward MORE
# partitions, the safe direction at scale.
_RANK_ROWS_PER_PARTITION = 4_000_000

# Parallelism floor: below this many rows a partition is pure task overhead
# (a 64k-row local sort is ~ms), so small relations stop fanning out to
# every core; above it the floor grows to the scheduler's core count so a
# CPU-heavy relation still uses the whole machine/cluster (measured r11:
# one partition over a 600k-row rank serialized q124 1.3 s → 1.9 s, while
# 32 partitions over a 10k-row rank cost q151/q220 ~0.3 s of task churn).
# 16k rather than 64k because the size-only row estimate undercounts
# narrow parquet projections several-fold (sizeInBytes/100 vs ~20-byte
# rows) — the lower threshold keeps genuinely large inputs fanned out.
_RANK_MIN_ROWS_PER_PARTITION = 16_384


def _resolve_partitions(
    df: DataFrame, num_partitions: int | None
) -> int:
    """Scale-adaptive partition count for the prefix family.

    A fixed count is wrong in both directions: 32 partitions over a few
    hundred-thousand local rows pays 32 tasks + a range-sampling pass per
    stage for no parallelism gain (each task is milliseconds), while 32 over
    100 TB would put TBs in one sort task. Deriving from the optimizer's
    row estimate keeps partitions ~100-400 MB at any scale. Partition count
    never changes ranking RESULTS — range boundaries only re-slice one
    fixed total order (see :func:`distributed_row_number`).
    """
    if num_partitions is not None:
        return num_partitions
    from fluvii_spark.operators.stats import estimate_rows, partitions_for_rows

    # Ceiling: sql.shuffle.partitions is the session's own scale dial (set
    # per deployment; cpus locally, thousands on a real cluster), and
    # size-only join estimates can overshoot by orders of magnitude
    # (Catalyst multiplies child sizes) — without the clamp a local query
    # could fan a 600k-row sort into 10k tasks. With the clamp the worst
    # case equals the pre-adaptive fixed default.
    try:
        ceiling = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    except Exception:  # "auto" or Connect without the conf — modest default
        ceiling = 200
    try:
        cores = int(df.sparkSession.sparkContext.defaultParallelism)
    except Exception:  # Connect — no SparkContext; lean on the ceiling only
        cores = ceiling
    est = estimate_rows(df)
    by_size = partitions_for_rows(
        est, rows_per_partition=_RANK_ROWS_PER_PARTITION
    )
    # enough partitions to keep every core busy once the relation is big
    # enough that per-partition work beats task overhead
    floor = min(
        max(1, cores),
        partitions_for_rows(
            est, rows_per_partition=_RANK_MIN_ROWS_PER_PARTITION
        ),
    )
    return min(max(by_size, floor), max(1, ceiling))


def _indexed_partitions(
    df: DataFrame, order_cols: list[str | Column], num_partitions: int | None
) -> DataFrame:
    """Shared scaffold of the prefix family (row_number / running sum /
    running max): range-shuffled, locally-sorted partitions with the
    partition id ``_pid`` and 1-based local rank ``_lrn`` extracted — and
    localCheckpointed so every consumer sees IDENTICAL partitions.

    sortWithinPartitions + monotonically_increasing_id is zipWithIndex in
    DataFrame-land: the id packs (partitionId << 33) | rowIndexInPartition,
    so local rank AND partition id come out of the ALREADY range-shuffled,
    locally-sorted data with zero further shuffles — a window partitioned
    by spark_partition_id would re-exchange the whole relation by
    hash(_pid) just to regroup rows that are already colocated.

    The checkpoint is load-bearing: the per-partition-totals branch and the
    join branch must see the SAME partitioning — column pruning makes the
    two exchange subtrees non-identical (no ReusedExchange), and
    RangePartitioner's sampling depends on upstream row order, which is not
    deterministic below a shuffle; two independent executions could pick
    different boundaries, silently corrupting prefix = local + offset.
    Availability tradeoff (same as RDD.zipWithIndex): locally checkpointed
    blocks die with their executor, so on a lossy cluster swap this for
    df.checkpoint() against a reliable checkpoint dir — correctness of the
    construction is identical either way.
    """
    parts = (
        df.repartitionByRange(_resolve_partitions(df, num_partitions), *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_mid", F.monotonically_increasing_id())
        .withColumn("_pid", F.shiftrightunsigned("_mid", 33))
        .withColumn(
            "_lrn", (F.col("_mid") % F.lit(1 << 33) + F.lit(1)).cast("long")
        )
        .drop("_mid")
    )
    return parts.localCheckpoint(eager=False)


# the offsets window in each prefix op runs over <= num_partitions rows —
# driver-free tiny; this frame is the only thing a global Window ever sees
def _offsets_window():
    return Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)


def distributed_row_number(
    df: DataFrame,
    order_cols: list[str | Column],
    num_partitions: int | None = None,
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
    parts = _indexed_partitions(df, order_cols, num_partitions)
    counts = parts.groupBy("_pid").agg(F.count("*").alias("_cnt"))
    offs = counts.select(
        "_pid",
        F.coalesce(F.sum("_cnt").over(_offsets_window()), F.lit(0)).alias(
            "_off"
        ),
    )
    return (
        parts.join(F.broadcast(offs), "_pid")
        .withColumn(out_col, F.col("_lrn") + F.col("_off"))
        .drop("_pid", "_lrn", "_off")
    )


def distributed_running_sum(
    df: DataFrame,
    order_cols: list[str | Column],
    value_col: str,
    num_partitions: int | None = None,
    out_col: str = "run_sum",
    rank_col: str | None = None,
) -> DataFrame:
    """Global running sum of ``value_col`` in ``order_cols`` order without a
    single-task window — the prefix-sum twin of
    :func:`distributed_row_number`.

    Same construction: range-repartition on the order columns (partition i
    holds keys strictly below partition i+1), local cumulative sum within
    each already-sorted partition, then add the broadcast prefix of
    *partition totals*. Exact for DECIMAL/integer values (addition is
    associative); for doubles the grouping changes summation order vs a
    serial scan, so cast money-like columns to DECIMAL first (the package
    determinism rule). Pass ``rank_col`` to also emit the global rank.

    Like :func:`distributed_row_number`, ties across ``order_cols`` get an
    arbitrary-but-stable order — include a unique tie-break column when
    per-row prefix values (not just per-distinct-key totals) must be
    deterministic. Every in-repo caller does (q152/q164/q165).
    """
    parts = _indexed_partitions(df, order_cols, num_partitions)
    w_local = (
        Window.partitionBy("_pid")
        .orderBy("_lrn")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    parts = parts.withColumn("_lsum", F.sum(value_col).over(w_local))
    totals = parts.groupBy("_pid").agg(
        F.sum(value_col).alias("_tot"), F.count("*").alias("_cnt")
    )
    w_off = _offsets_window()
    offs = totals.select(
        "_pid",
        F.coalesce(F.sum("_tot").over(w_off), F.lit(0)).alias("_soff"),
        F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)).alias("_coff"),
    )
    out = (
        parts.join(F.broadcast(offs), "_pid")
        .withColumn(out_col, F.col("_lsum") + F.col("_soff"))
    )
    if rank_col is not None:
        out = out.withColumn(rank_col, F.col("_lrn") + F.col("_coff"))
    return out.drop("_pid", "_lrn", "_lsum", "_soff", "_coff")


def distributed_running_max(
    df: DataFrame,
    order_cols: list[str | Column],
    value_col: str,
    num_partitions: int | None = None,
    out_col: str = "run_max",
    rank_col: str | None = None,
) -> DataFrame:
    """Global running MAX of ``value_col`` in ``order_cols`` order — the
    prefix-max member of the prefix family (:func:`distributed_row_number`,
    :func:`distributed_running_sum`).

    Same construction: range repartition + local cumulative max within each
    sorted partition + ``greatest`` with the broadcast prefix of preceding
    partitions' maxima. Max is associative and idempotent, so the result is
    exact for any type with a total order. The building block for
    "high-watermark so far" analytics (e.g. event-time watermark
    simulation over an ingest sequence).
    """
    parts = _indexed_partitions(df, order_cols, num_partitions)
    w_local = (
        Window.partitionBy("_pid")
        .orderBy("_lrn")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    parts = parts.withColumn("_lmax", F.max(value_col).over(w_local))
    totals = parts.groupBy("_pid").agg(
        F.max(value_col).alias("_pmax"), F.count("*").alias("_cnt")
    )
    w_off = _offsets_window()
    offs = totals.select(
        "_pid",
        F.max("_pmax").over(w_off).alias("_moff"),  # NULL for partition 0
        F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)).alias("_coff"),
    )
    out = parts.join(F.broadcast(offs), "_pid").withColumn(
        out_col,
        F.when(F.col("_moff").isNull(), F.col("_lmax")).otherwise(
            F.greatest(F.col("_lmax"), F.col("_moff"))
        ),
    )
    if rank_col is not None:
        out = out.withColumn(rank_col, F.col("_lrn") + F.col("_coff"))
    return out.drop("_pid", "_lrn", "_lmax", "_moff", "_coff")


def exact_quantiles(
    df: DataFrame,
    col: str,
    ps: list[float],
    round_dp: int = 6,
    num_partitions: int | None = None,
) -> DataFrame:
    """1-row DataFrame with column ``q``: the exact interpolated quantiles
    of ``col`` at probe points ``ps``, ascending, rounded to ``round_dp``.

    Interpolation follows percentile_cont / Spark ``percentile``:
    pos = 1 + (n-1)p, value = x_lo + frac·(x_hi − x_lo) over the two
    adjacent order statistics. Only 2·|ps| ranked rows are ever joined
    out (broadcast probe table), so the expensive pass is the ranking
    shuffle — parallel — not a one-buffer percentile aggregate.
    """
    # delegate to the grouped form with one constant group — a single
    # shared probe/interpolation implementation instead of two drifting
    # copies (collect_list skips NULL quantiles, so an empty/all-NULL
    # input yields an empty array, as before)
    g = grouped_exact_quantiles(
        df.select(F.col(col).alias("_eq_v")).withColumn("_eq_g", F.lit(1)),
        ["_eq_g"],
        "_eq_v",
        ps,
        round_dp,
        num_partitions,
        include_empty_groups=False,  # the global form never needs the
        # constant-group universe (a full distinct scan + extra join)
    )
    return g.agg(F.sort_array(F.collect_list("quantile")).alias("q"))


def grouped_exact_quantiles(
    df: DataFrame,
    group_cols: list[str],
    col: str,
    ps: list[float],
    round_dp: int = 6,
    num_partitions: int | None = None,
    broadcast_probes: bool = True,
    include_empty_groups: bool = True,
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

    Contract notes:
    - groups whose values are all NULL (or empty after the NULL filter)
      still appear, with ``quantile`` NULL per probe — matching the
      built-in per-group percentile's NULL result row (the universe costs
      one distinct + left join; pass ``include_empty_groups=False`` to
      skip it when absent groups may simply be dropped);
    - the probe table is |groups|·|ps|·2 rows and is broadcast by
      default — the operator targets the few-groups × billions-of-rows
      regime; pass ``broadcast_probes=False`` for high group cardinality
      (the probe join then shuffles like any equi-join);
    - internal columns use a ``_gq_`` prefix and outputs are ``p`` /
      ``quantile``; group columns may not collide with those names.
    """
    for g in group_cols:
        if g in ("p", "quantile") or g.startswith("_gq_"):
            raise ValueError(
                f"group column {g!r} collides with the operator's output/"
                "internal names ('p', 'quantile', '_gq_*') — rename it"
            )
    ps_arr = F.array([F.lit(float(p)) for p in ps])
    vals = df.select(
        *group_cols, F.col(col).alias("_gq_x")
    ).filter(F.col("_gq_x").isNotNull())
    ranked = distributed_row_number(
        vals, [*group_cols, "_gq_x"], num_partitions, out_col="_gq_rnk"
    )
    per_g = ranked.groupBy(*group_cols).agg(
        F.min("_gq_rnk").alias("_gq_base"), F.count("*").alias("_gq_n")
    )
    t = per_g.select(
        *group_cols,
        "_gq_base",
        "_gq_n",
        F.explode(ps_arr).alias("p"),
    ).select(
        *group_cols,
        "p",
        (F.lit(1) + (F.col("_gq_n") - 1) * F.col("p")).alias("_gq_pos"),
        "_gq_base",
    )
    t = t.select(
        *group_cols,
        "p",
        (F.col("_gq_base") - 1 + F.floor("_gq_pos"))
        .cast("bigint")
        .alias("_gq_lo"),
        (F.col("_gq_base") - 1 + F.ceil("_gq_pos"))
        .cast("bigint")
        .alias("_gq_hi"),
        (F.col("_gq_pos") - F.floor("_gq_pos")).alias("_gq_frac"),
    )
    probes = t.select(
        *group_cols,
        "p",
        "_gq_frac",
        F.explode(
            F.array(
                F.struct(F.col("_gq_lo").alias("r"), F.lit("lo").alias("w")),
                F.struct(F.col("_gq_hi").alias("r"), F.lit("hi").alias("w")),
            )
        ).alias("_gq_pr"),
    ).select(
        *group_cols,
        "p",
        "_gq_frac",
        F.col("_gq_pr.r").alias("_gq_rnk"),
        F.col("_gq_pr.w").alias("_gq_w"),
    )
    if broadcast_probes:
        probes = F.broadcast(probes)
    # global ranks are unique, so the probe join needs only _gq_rnk; the
    # probe rows carry their group columns through
    hits = (
        ranked.select("_gq_rnk", "_gq_x")
        .join(probes, "_gq_rnk")
        .groupBy(*group_cols, "p", "_gq_frac")
        .agg(
            F.max(F.when(F.col("_gq_w") == "lo", F.col("_gq_x"))).alias(
                "_gq_xlo"
            ),
            F.max(F.when(F.col("_gq_w") == "hi", F.col("_gq_x"))).alias(
                "_gq_xhi"
            ),
        )
    )
    computed = hits.select(
        *group_cols,
        "p",
        F.round(
            F.col("_gq_xlo")
            + F.col("_gq_frac") * (F.col("_gq_xhi") - F.col("_gq_xlo")),
            round_dp,
        ).alias("quantile"),
    )
    if not include_empty_groups:
        return computed
    # preserve all-NULL/empty groups with a NULL quantile per probe, like
    # the built-in per-group percentile does
    universe = (
        df.select(*group_cols)
        .distinct()
        .select(*group_cols, F.explode(ps_arr).alias("p"))
    )
    # null-safe equality on the group columns: groupBy treats NULL as a valid
    # group key, so a NULL-keyed group's computed quantile must match its
    # universe row (plain `=` would drop it and report quantile NULL).
    cond = [universe[c].eqNullSafe(computed[c]) for c in group_cols]
    cond.append(universe["p"] == computed["p"])
    return universe.join(computed, cond, "left").select(
        *[universe[c] for c in group_cols],
        universe["p"],
        computed["quantile"],
    )


def grouped_hist_cum(
    df: DataFrame, group_cols: list[str], col: str
) -> DataFrame:
    """Per-group value-counts histogram with cumulative ranks — the
    §2.3 "aggregate before you shuffle" contraction for LOW-CARDINALITY
    metrics (integer day gaps/latencies, token counts).

    One map-side-combinable ``groupBy(groups..., x).count()`` shrinks the
    relation to |groups|·|distinct x| rows BEFORE any wide shuffle, so
    billions of input rows never enter a range repartition at all; the
    per-group sorted histogram then answers any order-statistic lookup
    in-row. Only correct to prefer over :func:`grouped_exact_quantiles`
    when |distinct x| per group is bounded (the array is a per-group
    aggregation buffer again — exactly what the ranking path avoids for
    continuous metrics).

    Output: ``group_cols...``, ``_gq_h`` (array<struct<x, c>> ascending
    by x), ``_gq_cum`` (ascending cumulative counts: ``_gq_cum[i]`` =
    rank of the LAST occurrence of ``_gq_h[i].x`` in the sorted values),
    ``_gq_n`` (group row count). NULL values are excluded; all-NULL or
    empty groups are absent (``include_empty_groups=False`` semantics).
    """
    counts = (
        df.select(*group_cols, F.col(col).alias("_gq_x"))
        .filter(F.col("_gq_x").isNotNull())
        .groupBy(*group_cols, "_gq_x")
        .count()
    )
    hist = counts.groupBy(*group_cols).agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("_gq_x").alias("x"), F.col("count").alias("c")
                )
            )
        ).alias("_gq_h"),
        F.sum("count").alias("_gq_n"),
    )
    cum = F.aggregate(
        "_gq_h",
        F.struct(
            F.expr("CAST(array() AS ARRAY<BIGINT>)").alias("a"),
            F.lit(0).cast("bigint").alias("t"),
        ),
        lambda acc, e: F.struct(
            F.concat(acc["a"], F.array(acc["t"] + e["c"])).alias("a"),
            (acc["t"] + e["c"]).alias("t"),
        ),
        lambda acc: acc["a"],
    )
    return hist.withColumn("_gq_cum", cum)


def hist_value_at(rank: Column) -> Column:
    """The value holding global (1-based) ``rank`` within a
    :func:`grouped_hist_cum` row: the first histogram bin whose
    cumulative count reaches the rank (``_gq_cum`` is ascending, so the
    bin index is the number of bins strictly below the rank)."""
    idx = F.size(F.filter("_gq_cum", lambda c: c < rank)) + 1
    return F.element_at("_gq_h", idx)["x"]


def grouped_quantiles_lowcard(
    df: DataFrame,
    group_cols: list[str],
    col: str,
    ps: list[float],
    round_dp: int = 6,
) -> DataFrame:
    """Drop-in for :func:`grouped_exact_quantiles`
    (``include_empty_groups=False``) over LOW-CARDINALITY metrics:
    identical ``(group_cols..., p, quantile)`` output — same
    pos = 1 + (n−1)p order statistics, same interpolation, same
    rounding — but from the :func:`grouped_hist_cum` contraction instead
    of a distributed ranking, so the only shuffle is the partial-agg
    value-counts groupBy (|groups|·|distinct x| rows) and the probe
    lookups are in-row array reads instead of a broadcast rank join.
    """
    ps_arr = F.array([F.lit(float(p)) for p in ps])
    t = grouped_hist_cum(df, group_cols, col).select(
        *group_cols, "_gq_h", "_gq_cum", "_gq_n", F.explode(ps_arr).alias("p")
    )
    # identical arithmetic to grouped_exact_quantiles: bigint n, double p
    pos = F.lit(1) + (F.col("_gq_n") - 1) * F.col("p")
    lo = F.floor(pos).cast("bigint")
    hi = F.ceil(pos).cast("bigint")
    frac = pos - F.floor(pos)
    xlo = hist_value_at(lo)
    xhi = hist_value_at(hi)
    return t.select(
        *group_cols,
        "p",
        F.round(xlo + frac * (xhi - xlo), round_dp).alias("quantile"),
    )
