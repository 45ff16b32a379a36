"""Relational query inventory Q01–Q29 (SURVEY.md §2.3).

The reference has NO relational operators — projection/filter/join/agg all
live in user ``app_function`` code (``/root/reference/fluvii/apps/
fluvii_app.py:41-43``; joins explicitly absent per ``README.md:596-598``).
This module is the Spark-built-in surface our engine exposes instead.

Scale notes (100 TB):
- every query is a single declarative plan → Catalyst does pushdown/pruning;
- dimension joins (region/nation/customer) rely on broadcast (Q11 pins it
  explicitly with ``F.broadcast``); fact-fact joins shuffle on join keys and
  AQE handles skew;
- aggregations are hash-agg with map-side partial aggregation (Spark default);
- top-k (Q18) plans TakeOrderedAndProject — no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fluvii_spark.io.readers import load_tables
from fluvii_spark.queries import register

# exact, order-independent money arithmetic — identical text on both sides
_REVENUE_DEC = "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"


@register(
    "q01_scan_project",
    "SELECT l_orderkey, l_quantity FROM lineitem",
    "scan + projection (column pruning reaches the parquet footer)",
    ("relational", "scan"),
)
def q01(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return t.lineitem.select("l_orderkey", "l_quantity")


@register(
    "q02_filter",
    """
    SELECT l_orderkey, l_shipdate, l_discount
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND l_discount BETWEEN 0.02 AND 0.06
    """,
    "predicate pushdown: range filters reach the parquet scan",
    ("relational", "filter"),
)
def q02(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return t.lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp_ntz"))
        & F.col("l_discount").between(0.02, 0.06)
    ).select("l_orderkey", "l_shipdate", "l_discount")


@register(
    "q03_agg_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           SUM(l_quantity) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           AVG(l_discount) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
    "TPC-H Q1-shaped hash aggregate with partial (map-side) agg",
    ("relational", "agg"),
)
def q03(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return t.lineitem.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty"),
        F.expr("CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)").alias(
            "sum_base_price"
        ),
        F.avg("l_discount").alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


@register(
    "q04_distinct",
    "SELECT DISTINCT o_orderpriority FROM orders",
    "distinct = hash aggregate on the projected column",
    ("relational", "agg"),
)
def q04(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return t.orders.select("o_orderpriority").distinct()


@register(
    "q05_count_distinct",
    "SELECT COUNT(DISTINCT l_partkey) AS cnt_partkeys FROM lineitem",
    "exact distinct count (expands to two-phase agg)",
    ("relational", "agg"),
)
def q05(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return t.lineitem.agg(F.count_distinct("l_partkey").alias("cnt_partkeys"))


@register(
    "q06_join_inner",
    """
    SELECT c.c_mktsegment, COUNT(*) AS n_orders
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    "inner equi-join; customer side broadcasts under AQE at small SF, "
    "shuffles on key at scale",
    ("relational", "join"),
)
def q06(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t.orders.join(t.customer, t.orders.o_custkey == t.customer.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_orders"))
    )


_Q07_ORACLE = """
    SELECT r.r_name,
           CAST(SUM({rev}) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
""".format(rev=_REVENUE_DEC)


def _q07_plan(t, region_df) -> DataFrame:
    rev = F.expr(f"CAST(SUM({_REVENUE_DEC}) AS DOUBLE)").alias("revenue")
    return (
        t.lineitem.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(t.nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(region_df, F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(rev)
    )


@register(
    "q07_join_multi",
    _Q07_ORACLE,
    "5-way star join: fact table joins up the dimension chain; revenue per region",
    ("relational", "join"),
)
def q07(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return _q07_plan(t, t.region)


@register(
    "q08_join_left_missing",
    """
    SELECT o.o_orderkey, o.o_orderstatus
    FROM orders o LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_orderkey IS NULL
    """,
    "left outer join → null-probe filter (orders with zero lineitems — "
    "non-empty in the testdata, so the outer path is actually exercised)",
    ("relational", "join"),
)
def q08(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t.orders.join(
            t.lineitem, t.orders.o_orderkey == t.lineitem.l_orderkey, "left"
        )
        .filter(F.col("l_orderkey").isNull())
        .select("o_orderkey", "o_orderstatus")
    )


@register(
    "q09_join_semi",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    "left-semi join (EXISTS)",
    ("relational", "join"),
)
def q09(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return t.customer.join(
        t.orders, t.customer.c_custkey == t.orders.o_custkey, "leftsemi"
    ).select("c_custkey", "c_name")


@register(
    "q10_join_anti",
    """
    SELECT o_orderkey, o_orderstatus FROM orders o
    WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
    """,
    "left-anti join (NOT EXISTS; orders without lineitems — non-empty)",
    ("relational", "join"),
)
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return t.orders.join(
        t.lineitem, t.orders.o_orderkey == t.lineitem.l_orderkey, "leftanti"
    ).select("o_orderkey", "o_orderstatus")


@register(
    "q11_join_broadcast",
    _Q07_ORACLE,
    "Q07 with region/nation/customer pinned as broadcast joins — at 100 TB the "
    "fact side streams, dimensions replicate to every executor (no shuffle)",
    ("relational", "join", "broadcast"),
)
def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    rev = F.expr(f"CAST(SUM({_REVENUE_DEC}) AS DOUBLE)").alias("revenue")
    return (
        t.lineitem.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t.customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t.region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(rev)
    )


@register(
    "q12_join_range",
    """
    SELECT p.p_brand, COUNT(*) AS n_lines, SUM(l.l_quantity) AS sum_qty
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey AND l.l_quantity < p.p_size
    GROUP BY p.p_brand
    """,
    "equi + theta (range) join condition; equi key drives the shuffle, the "
    "range predicate evaluates post-probe",
    ("relational", "join"),
)
def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    cond = (F.col("l_partkey") == F.col("p_partkey")) & (
        F.col("l_quantity") < F.col("p_size")
    )
    return (
        t.lineitem.join(t.part, cond)
        .groupBy("p_brand")
        .agg(F.count("*").alias("n_lines"), F.sum("l_quantity").alias("sum_qty"))
    )


@register(
    "q13_rollup",
    """
    SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n
    FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    """,
    "hierarchical grouping sets",
    ("relational", "agg"),
)
def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return t.orders.rollup("o_orderpriority", "o_orderstatus").agg(
        F.count("*").alias("n")
    )


@register(
    "q14_cube",
    """
    SELECT l_returnflag, l_linestatus, SUM(l_quantity) AS sum_qty
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    "full grouping-set lattice",
    ("relational", "agg"),
)
def q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return t.lineitem.cube("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty")
    )


@register(
    "q15_window_rank",
    """
    SELECT o_custkey, o_orderkey, o_orderdate FROM (
      SELECT o_custkey, o_orderkey, o_orderdate,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders) WHERE rn = 1
    """,
    "first order per customer via row_number (deterministic tie-break)",
    ("relational", "window"),
)
def q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        t.orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate")
    )


@register(
    "q16_window_lag",
    """
    SELECT o_orderkey, o_custkey, o_totalprice,
           LAG(o_totalprice) OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey) AS prev_price
    FROM orders
    """,
    "analytic lag over per-customer order history",
    ("relational", "window"),
)
def q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return t.orders.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
    )


@register(
    "q17_window_running_sum",
    """
    SELECT event_id, user_id,
           SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS running_sum
    FROM events
    """,
    "frame-bounded running sum (unique (ts,event_id) tie-break keeps the "
    "fp accumulation order identical in both engines)",
    ("relational", "window"),
)
def q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return t.events.select(
        "event_id", "user_id", F.sum("value").over(w).alias("running_sum")
    )


@register(
    "q18_topk",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    "top-k: Spark plans TakeOrderedAndProject (per-partition heap + merge), "
    "never a global sort",
    ("relational", "sort"),
)
def q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t.orders.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@register(
    "q19_union",
    """
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    "set union (distinct)",
    ("relational", "setop"),
)
def q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t.customer.select(F.col("c_nationkey").alias("nationkey"))
        .union(t.supplier.select(F.col("s_nationkey").alias("nationkey")))
        .distinct()
    )


@register(
    "q20_intersect_except",
    """
    WITH top10 AS (
        SELECT s_nationkey FROM supplier
        ORDER BY s_acctbal DESC, s_suppkey LIMIT 10)
    SELECT 'intersect' AS op, nationkey FROM (
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT SELECT s_nationkey FROM top10)
    UNION ALL
    SELECT 'except' AS op, nationkey FROM (
        SELECT c_nationkey AS nationkey FROM customer
        EXCEPT SELECT s_nationkey FROM top10)
    """,
    "intersect and except against the top-10-acctbal suppliers' nations, "
    "tagged and unioned into one result. The right side is a bounded "
    "ranked subset (unique tie-break on s_suppkey) so BOTH branches are "
    "non-empty at every SF — against all suppliers every customer nation "
    "intersected and the except branch was silently empty "
    "(degeneracy-gate catch, r7)",
    ("relational", "setop"),
)
def q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    cust = t.customer.select(F.col("c_nationkey").alias("nationkey"))
    supp = (
        t.supplier.orderBy(F.col("s_acctbal").desc(), "s_suppkey")
        .limit(10)
        .select(F.col("s_nationkey").alias("nationkey"))
    )
    # both set-ops in ONE pass: INTERSECT = distinct left keys present in
    # the (bounded, broadcast) right side, EXCEPT = the rest — a null-safe
    # membership join over the one distinct replaces two set-operators
    # that each re-scanned customer and re-ranked the supplier top-10
    # (4 scans → 2, two dedup shuffles → one). eqNullSafe matches the
    # set-operators' NULL-equals-NULL semantics.
    sn = supp.distinct().select(
        F.col("nationkey").alias("_snk"), F.lit(1).alias("_in")
    )
    return (
        cust.distinct()
        .join(
            F.broadcast(sn),
            F.col("nationkey").eqNullSafe(F.col("_snk")),
            "left",
        )
        .select(
            F.when(F.col("_in").isNotNull(), "intersect")
            .otherwise("except")
            .alias("op"),
            "nationkey",
        )
    )


@register(
    "q21_string_funcs",
    r"""
    SELECT p_partkey,
           UPPER(p_name) AS name_upper,
           SUBSTRING(p_type, 1, 5) AS type_prefix,
           REGEXP_EXTRACT(p_name, '^(\w+)', 1) AS first_word,
           CONCAT_WS('-', p_brand, p_type) AS brand_type
    FROM part
    """,
    "string functions: upper/substring/regexp_extract/concat_ws",
    ("relational", "scalar"),
)
def q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return t.part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
    )


@register(
    "q22_date_funcs",
    """
    SELECT CAST(DATE_TRUNC('month', o.o_orderdate) AS DATE) AS order_month,
           COUNT(DISTINCT o.o_orderkey) AS n_orders,
           AVG(DATEDIFF('day', CAST(o.o_orderdate AS DATE),
                               CAST(l.l_shipdate AS DATE))) AS avg_ship_delay_days
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY CAST(DATE_TRUNC('month', o.o_orderdate) AS DATE)
    """,
    "date functions: date_trunc bucketing + datediff in days",
    ("relational", "scalar"),
)
def q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t.orders.join(t.lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(F.date_trunc("month", "o_orderdate").cast("date").alias("order_month"))
        .agg(
            F.count_distinct("o_orderkey").alias("n_orders"),
            F.avg(
                F.datediff(F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date"))
            ).alias("avg_ship_delay_days"),
        )
    )


@register(
    "q23_math_decimal",
    f"""
    SELECT l_returnflag,
           CAST(CAST(SUM({_REVENUE_DEC} * (1 + CAST(l_tax AS DECIMAL(18,2))))
                     AS VARCHAR) AS DOUBLE)
             AS charged
    FROM lineitem GROUP BY l_returnflag
    """,
    "money arithmetic through DECIMAL (exact, order-independent), surfaced "
    "as DOUBLE. The oracle routes the final DECIMAL->DOUBLE through "
    "VARCHAR: DuckDB's native decimal cast divides the scaled integer in "
    "floating point and can land one ulp off the correctly-rounded "
    "double once the scaled integer exceeds 2^53 (this query's scale-6 "
    "chain crosses that at ~9e9; the r11 g=10 oracle caught the N-flag "
    "total off by one ulp at the 5th decimal), while string parsing is "
    "correctly rounded like Spark's BigDecimal.doubleValue()",
    ("relational", "scalar"),
)
def q23(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    charged = F.expr(
        f"CAST(SUM({_REVENUE_DEC} * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE)"
    ).alias("charged")
    return t.lineitem.groupBy("l_returnflag").agg(charged)


@register(
    "q24_array_funcs",
    """
    SELECT vec_id,
           LEN(embedding) AS dim,
           (CAST(embedding[1] AS DOUBLE) + CAST(embedding[2] AS DOUBLE)
            + CAST(embedding[3] AS DOUBLE) + CAST(embedding[4] AS DOUBLE)) / 4
             AS mean_first4
    FROM embeddings
    """,
    "array functions: size + element access (1-based in both engines)",
    ("relational", "scalar", "array"),
)
def q24(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    e = F.col("embedding")
    mean4 = (
        sum(F.element_at(e, i).cast("double") for i in range(1, 5)) / 4
    ).alias("mean_first4")
    return t.embeddings.select(
        "vec_id", F.size("embedding").cast("bigint").alias("dim"), mean4
    )


@register(
    "q25_json_funcs",
    """
    SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_value,
           COUNT(*) AS n
    FROM events GROUP BY 1
    """,
    "JSON extraction from the events.props string column",
    ("relational", "scalar", "json"),
)
def q25(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t.events.select(
            F.get_json_object("props", "$.k").cast("int").alias("k_value")
        )
        .groupBy("k_value")
        .agg(F.count("*").alias("n"))
    )


@register(
    "q26_case_when",
    """
    SELECT CASE WHEN value < 0 THEN 'debit' ELSE 'credit' END AS kind,
           COUNT(*) AS n
    FROM events GROUP BY 1
    """,
    "conditional expression",
    ("relational", "scalar"),
)
def q26(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    kind = F.when(F.col("value") < 0, "debit").otherwise("credit").alias("kind")
    return t.events.select(kind).groupBy("kind").agg(F.count("*").alias("n"))


@register(
    "q27_tumbling_window",
    """
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           event_type, COUNT(*) AS n
    FROM events GROUP BY 1, 2
    """,
    "tumbling event-time window, batch form (streaming form in "
    "fluvii_spark.streaming.windows over the same semantics)",
    ("relational", "streaming-batch"),
)
def q27(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t.events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )


@register(
    "q28_dedup",
    """
    SELECT DISTINCT user_id, event_type, value FROM events
    """,
    "exact dedup on a column subset (project → distinct keeps the result "
    "deterministic, unlike keep-first dropDuplicates)",
    ("relational", "dedup"),
)
def q28(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return t.events.select("user_id", "event_type", "value").dropDuplicates()


@register(
    "q29_stateful_running_balance",
    """
    WITH r AS (
      SELECT user_id, value,
             10000 + SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS running,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn_desc
      FROM events)
    SELECT user_id,
           MAX(CASE WHEN rn_desc = 1 THEN running END) AS final_balance,
           COUNT(CASE WHEN running < 0 THEN 1 END) AS n_overdrawn,
           COUNT(*) AS n_events
    FROM r GROUP BY user_id
    """,
    "batch form of the reference's stateful running-balance app "
    "(examples/fluvii_demo_current_2023/consumer/fluvii_consumer_ex.py:21-42: "
    "start 10000, fold event values per key). Streaming parity runs through "
    "fluvii_spark.streaming.table_app in the test suite.",
    ("stateful", "window"),
)
def q29(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_last = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    enriched = t.events.select(
        "user_id",
        (F.lit(10000) + F.sum("value").over(w_run)).alias("running"),
        F.row_number().over(w_last).alias("rn_desc"),
    )
    return enriched.groupBy("user_id").agg(
        F.max(F.when(F.col("rn_desc") == 1, F.col("running"))).alias("final_balance"),
        F.count(F.when(F.col("running") < 0, 1)).alias("n_overdrawn"),
        F.count("*").alias("n_events"),
    )
