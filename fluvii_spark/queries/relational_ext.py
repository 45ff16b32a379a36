"""Extended relational inventory (q44+): window frames & rank family,
multiset ops, statistical aggregates, arg-max, grouping sets, pivot,
lateral explode, FILTER-clause aggs, HAVING, subqueries, ordered collect.

Same determinism rules as :mod:`fluvii_spark.queries.relational` — every
ranking has a unique tie-break, money math goes through DECIMAL, float
outputs are stable far below the 6-dp comparator rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fluvii_spark.io.readers import load_tables
from fluvii_spark.queries import register


@register(
    "q44_window_range_frame",
    """
    SELECT o_orderkey,
           SUM(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate
             RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS cum_price_range
    FROM orders
    """,
    "RANGE frame (peer rows share the cumulative value on order-date ties) — "
    "contrast with q17's ROWS frame",
    ("relational", "window"),
)
def q44(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return t.orders.select(
        "o_orderkey", F.sum("o_totalprice").over(w).alias("cum_price_range")
    )


@register(
    "q45_window_rank_family",
    """
    SELECT o_orderkey,
           NTILE(4)       OVER w AS quartile,
           DENSE_RANK()   OVER w AS drank,
           PERCENT_RANK() OVER w AS prank,
           CUME_DIST()    OVER w AS cdist
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    """,
    "rank family over a uniquely-ordered window (ntile/dense_rank/"
    "percent_rank/cume_dist) — this query's declared surface IS the "
    "built-in window functions; for few-key groups at extreme scale the "
    "same ranks come from operators/ranking.py distributed_row_number "
    "plus per-group offsets (the q105/q125 path)",
    ("relational", "window"),
)
def q45(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return t.orders.select(
        "o_orderkey",
        F.ntile(4).over(w).alias("quartile"),
        F.dense_rank().over(w).alias("drank"),
        F.percent_rank().over(w).alias("prank"),
        F.cume_dist().over(w).alias("cdist"),
    )


@register(
    "q46_window_first_last",
    """
    SELECT o_orderkey,
           FIRST_VALUE(o_totalprice) OVER w AS first_price,
           LAST_VALUE(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS last_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    "first/last value with explicit full frame for last (the classic "
    "default-frame trap, done right)",
    ("relational", "window"),
)
def q46(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return t.orders.select(
        "o_orderkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w_full).alias("last_price"),
    )


@register(
    "q47_multiset_ops",
    """
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT ALL
    SELECT s_nationkey FROM supplier
    """,
    "INTERSECT ALL keeps multiplicity (multiset semantics) — pairs with "
    "q20's distinct set ops",
    ("relational", "setops"),
)
def q47(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return t.customer.select(F.col("c_nationkey").alias("nationkey")).intersectAll(
        t.supplier.select(F.col("s_nationkey").alias("nationkey"))
    )


@register(
    "q48_stat_aggs",
    """
    SELECT l_returnflag,
           STDDEV_SAMP(l_quantity)                 AS sd_qty,
           VAR_SAMP(l_discount)                    AS var_disc,
           CORR(l_quantity, l_extendedprice)       AS corr_qty_price,
           COVAR_SAMP(l_quantity, l_extendedprice) AS covar_qty_price
    FROM lineitem GROUP BY l_returnflag
    """,
    "statistical aggregates (Welford-style single-pass in both engines)",
    ("relational", "agg", "stats"),
)
def q48(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return t.lineitem.groupBy("l_returnflag").agg(
        F.stddev_samp("l_quantity").alias("sd_qty"),
        F.var_samp("l_discount").alias("var_disc"),
        F.corr("l_quantity", "l_extendedprice").alias("corr_qty_price"),
        F.covar_samp("l_quantity", "l_extendedprice").alias("covar_qty_price"),
    )


@register(
    "q49_arg_max",
    """
    SELECT o_custkey,
           struct_extract(MAX({p: o_totalprice, k: o_orderkey}), 'k')
             AS top_orderkey
    FROM orders GROUP BY o_custkey
    """,
    "arg-max with a deterministic composite tie-break (price, then key)",
    ("relational", "agg"),
)
def q49(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return t.orders.groupBy("o_custkey").agg(
        F.expr(
            "max_by(o_orderkey, struct(o_totalprice, CAST(o_orderkey AS DOUBLE)))"
        ).alias("top_orderkey")
    )


@register(
    "q50_grouping_sets",
    """
    SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n,
           GROUPING(o_orderpriority) AS g_pri, GROUPING(o_orderstatus) AS g_st
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                            (o_orderstatus), ())
    """,
    "explicit GROUPING SETS (not derivable from rollup/cube) + GROUPING() "
    "disambiguation of real NULLs vs subtotal rows",
    ("relational", "agg"),
)
def q50(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    v = "q50_orders"
    t.orders.createOrReplaceTempView(v)
    return spark.sql(
        f"""
        SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n,
               CAST(GROUPING(o_orderpriority) AS TINYINT) AS g_pri,
               CAST(GROUPING(o_orderstatus) AS TINYINT) AS g_st
        FROM {v}
        GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                                (o_orderstatus), ())
        """
    )


@register(
    "q51_pivot",
    """
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS status_F,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS status_O,
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS status_P
    FROM orders GROUP BY o_orderpriority
    """,
    "pivot with a pinned value list (deterministic columns; oracle is the "
    "equivalent conditional aggregation)",
    ("relational", "agg"),
)
def q51(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    out = (
        t.orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
    )
    renamed = out.select(
        "o_orderpriority",
        F.coalesce("F", F.lit(0)).alias("status_F"),
        F.coalesce("O", F.lit(0)).alias("status_O"),
        F.coalesce("P", F.lit(0)).alias("status_P"),
    )
    return renamed


@register(
    "q52_posexplode",
    """
    SELECT dim, AVG(x) AS mean_x, COUNT(*) AS n
    FROM (
      SELECT generate_subscripts(embedding, 1) - 1 AS dim,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings
    )
    WHERE dim < 8 GROUP BY dim
    """,
    "lateral array explode with position (posexplode) → per-dimension stats",
    ("relational", "array"),
)
def q52(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t.embeddings.select(F.posexplode("embedding").alias("dim", "x"))
        .filter(F.col("dim") < 8)
        .groupBy("dim")
        .agg(
            F.avg(F.col("x").cast("double")).alias("mean_x"),
            F.count("*").alias("n"),
        )
    )


@register(
    "q53_filtered_agg",
    """
    SELECT l_returnflag,
           COUNT(*) FILTER (WHERE l_quantity > 25)        AS n_big,
           SUM(l_quantity) FILTER (WHERE l_discount = 0)  AS qty_no_disc,
           COUNT(*)                                       AS n_all
    FROM lineitem GROUP BY l_returnflag
    """,
    "FILTER-clause aggregates (conditional agg without CASE gymnastics)",
    ("relational", "agg"),
)
def q53(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return t.lineitem.groupBy("l_returnflag").agg(
        F.count_if(F.col("l_quantity") > 25).alias("n_big"),
        F.sum(F.when(F.col("l_discount") == 0, F.col("l_quantity"))).alias(
            "qty_no_disc"
        ),
        F.count("*").alias("n_all"),
    )


@register(
    "q54_having",
    """
    SELECT o_custkey, COUNT(*) AS n_orders
    FROM orders GROUP BY o_custkey
    HAVING COUNT(*) >= 3
    """,
    "HAVING = post-aggregation filter (planned as Filter over HashAggregate)",
    ("relational", "agg"),
)
def q54(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t.orders.groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
        .filter(F.col("n_orders") >= 3)
    )


@register(
    "q55_subquery_above_avg",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
    """,
    "scalar subquery in a predicate (planned as a broadcast of one row)",
    ("relational", "subquery"),
)
def q55(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    avg_df = t.orders.agg(F.avg("o_totalprice").alias("_avg"))
    return (
        t.orders.crossJoin(F.broadcast(avg_df))
        .filter(F.col("o_totalprice") > F.col("_avg"))
        .select("o_orderkey", "o_totalprice")
    )


@register(
    "q58_session_windows",
    """
    WITH ordered AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sessioned AS (
      SELECT user_id, ts,
             CAST(SUM(new_session) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS session_no
      FROM ordered
    )
    SELECT user_id, session_no,
           COUNT(*) AS n_events,
           CAST(date_diff('second', MIN(ts), MAX(ts)) AS BIGINT) AS span_s
    FROM sessioned
    GROUP BY user_id, session_no
    """,
    "session windows (30-min gap) in batch form; Spark uses the native "
    "session_window operator, the oracle derives identical sessions via "
    "gaps-and-islands (lag + running sum). BOUNDARY (verified "
    "empirically): Spark MERGES an event arriving exactly gap later — the "
    "session end is inclusive for merge purposes — so the oracle splits "
    "only on strictly-greater gaps; its running sum carries the "
    "(ts, event_id) tie-break so equal-timestamp events number "
    "deterministically",
    ("relational", "window", "session"),
)
def q58(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    ev = t.events
    sess = (
        ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.unix_timestamp(F.max("ts")).alias("_max"),
            F.unix_timestamp(F.min("ts")).alias("_min"),
        )
    )
    w = Window.partitionBy("user_id").orderBy(F.col("session_window.start"))
    return sess.select(
        "user_id",
        F.row_number().over(w).cast("bigint").alias("session_no"),
        "n_events",
        (F.col("_max") - F.col("_min")).cast("bigint").alias("span_s"),
    )


@register(
    "q56_collect_sorted",
    """
    SELECT n_nationkey,
           array_to_string(
             array_agg(DISTINCT c_mktsegment ORDER BY c_mktsegment), ','
           ) AS segments
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_nationkey
    """,
    "ordered distinct collect (sort_array(collect_set) ≡ array_agg DISTINCT "
    "ORDER BY), serialized to a joined string so the output is hashable by "
    "a pandas-based comparator (raw array cells crash pandas factorize — "
    "CORRECTNESS_r02 q56 err)",
    ("relational", "agg", "array"),
)
def q56(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t.customer.join(
            t.nation, F.col("c_nationkey") == F.col("n_nationkey")
        )
        .groupBy("n_nationkey")
        .agg(
            F.array_join(
                F.sort_array(F.collect_set("c_mktsegment")), ","
            ).alias("segments")
        )
    )
