"""Round-6 relational additions (q215-q226 except q218/q225 in llm5):
TPC-H-shaped decorrelations (Q17 small-quantity revenue, Q15 top supplier,
Q22 idle high-balance customers), weighted sampling without replacement
(A-ES exponential keys), a Lorenz revenue-concentration curve on the
distributed global rank, inter-order gap distributions, ship-delay
buckets, U-shaped multi-touch attribution, calendar-bucket dedup, and
dual-constraint (idle gap + duration cap) sessionization — all under the
package determinism rules (DECIMAL money sums, md5 uniforms instead of
rand(), single IEEE divisions, 6-dp-rounded boundary comparisons, unique
tie-breaks on every rank).

Reference parity: the reference (rh-marketingops/fluvii) is a Kafka
client library with no query layer; these queries are the beyond-reference
analytics surface, re-expressed Spark-first per SURVEY.md §2.3.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fluvii_spark.io.readers import load_tables
from fluvii_spark.queries import register


@register(
    "q215_small_qty_revenue",
    """
    WITH tgt AS (
      SELECT p_partkey FROM part WHERE p_brand = 'Brand#1' AND p_size < 15
    ),
    li AS (
      SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
      FROM lineitem l JOIN tgt ON tgt.p_partkey = l.l_partkey
    ),
    th AS (
      SELECT l_partkey,
             0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
                    / COUNT(*)) AS max_qty
      FROM li GROUP BY 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_small_lines,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
                 / 7.0, 6) AS avg_yearly_revenue
    FROM li JOIN th USING (l_partkey)
    WHERE CAST(l_quantity AS DOUBLE) < max_qty
    """,
    "TPC-H Q17-shaped small-quantity revenue: lines of target-brand parts "
    "below 20% of the part's average quantity. The correlated AVG subquery "
    "is decorrelated to a per-part window over ONE broadcast-pruned "
    "lineitem pass (no second scan, no per-row subquery): threshold = "
    "0.2 · (exact DECIMAL sum / count) — a single IEEE division and "
    "multiply, identical on both engines, so the boundary is deterministic",
    ("relational", "tpch", "decorrelation"),
)
def q215(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    tgt = t.part.filter(
        (F.col("p_brand") == "Brand#1") & (F.col("p_size") < 15)
    ).select("p_partkey")
    # tgt is a ~1% slice of part but part itself grows with the corpus —
    # no forced broadcast; AQE converts the pruned side when small
    li = t.lineitem.join(
        tgt, t.lineitem.l_partkey == tgt.p_partkey
    ).select("l_partkey", "l_quantity", "l_extendedprice")
    w = Window.partitionBy("l_partkey")
    th = F.lit(0.2) * (
        F.sum(F.col("l_quantity").cast("decimal(18,6)")).over(w).cast("double")
        / F.count("*").over(w)
    )
    small = li.withColumn("max_qty", th).filter(
        F.col("l_quantity").cast("double") < F.col("max_qty")
    )
    return small.agg(
        F.count("*").cast("bigint").alias("n_small_lines"),
        F.round(
            F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).cast(
                "double"
            )
            / 7.0,
            6,
        ).alias("avg_yearly_revenue"),
    )


@register(
    "q216_top_supplier_quarter",
    """
    WITH rev AS (
      SELECT l_suppkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                 * (1 - CAST(l_discount AS DECIMAL(18,6)))) AS total
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY 1
    ),
    m AS (SELECT MAX(total) AS mx FROM rev)
    SELECT s.s_suppkey, s.s_name,
           ROUND(CAST(r.total AS DOUBLE), 6) AS total_revenue
    FROM rev r JOIN m ON r.total = m.mx
    JOIN supplier s ON s.s_suppkey = r.l_suppkey
    """,
    "TPC-H Q15-shaped top supplier: highest discounted revenue in 1996Q1, "
    "ALL ties returned. The revenue view aggregates exact DECIMAL products "
    "(no float drift), the scalar max is a 1-row broadcast joined back on "
    "exact DECIMAL equality, and the supplier dimension is broadcast — "
    "one lineitem pass, no window over the full rollup",
    ("relational", "tpch", "topk"),
)
def q216(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    price = F.col("l_extendedprice").cast("decimal(18,6)")
    disc = F.col("l_discount").cast("decimal(18,6)")
    rev = (
        t.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(price * (F.lit(1) - disc)).alias("total"))
        # two consumers (global max + the top filter) — materialize the
        # supplier-bounded relation once instead of re-running the
        # filtered lineitem scan + aggregation for each
        .localCheckpoint(eager=False)
    )
    mx = rev.agg(F.max("total").alias("mx"))
    # broadcast the CONTRACTED side (max-revenue rows: ~1), never the
    # supplier dimension — suppliers grow with the corpus
    top = rev.join(F.broadcast(mx), rev.total == F.col("mx"))
    return (
        t.supplier.join(
            F.broadcast(top),
            F.col("s_suppkey") == F.col("l_suppkey"),
        )
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("total").cast("double"), 6).alias("total_revenue"),
        )
    )


@register(
    "q217_dormant_wealth",
    """
    WITH seg AS (
      SELECT c_mktsegment,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
               / COUNT(*) AS avg_bal
      FROM customer WHERE CAST(c_acctbal AS DOUBLE) > 0 GROUP BY 1
    ),
    last AS (
      SELECT o_custkey, MAX(CAST(o_orderdate AS DATE)) AS last_d
      FROM orders GROUP BY 1
    ),
    mx AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS m FROM orders),
    dormant AS (
      SELECT c.c_mktsegment, c.c_acctbal
      FROM customer c
      JOIN seg ON seg.c_mktsegment = c.c_mktsegment
      JOIN last ON last.o_custkey = c.c_custkey, mx
      WHERE CAST(c.c_acctbal AS DOUBLE) > seg.avg_bal
        AND datediff('day', last.last_d, mx.m) > 730
    )
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_dormant,
           ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE), 6)
             AS dormant_balance
    FROM dormant GROUP BY 1
    """,
    "TPC-H Q22-flavored dormant wealth: per market segment, customers "
    "above the segment's positive-balance average whose LAST order is "
    ">730 days before the corpus's latest order — the churned-high-value "
    "list a win-back campaign targets. The per-segment average (5 rows, "
    "exact DECIMAL sum + one IEEE division) and the 1-row max date "
    "broadcast; the last-order rollup contracts orders to one row per "
    "customer before the join; day arithmetic on exact DATEs",
    ("relational", "tpch", "churn"),
)
def q217(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    bal = F.col("c_acctbal").cast("double")
    # the duplicated customer scan stays: it is a dimension-table scan and
    # the interleaved A/B showed a checkpoint barrier buys nothing here
    cust = t.customer.select("c_custkey", "c_mktsegment", "c_acctbal")
    seg = (
        cust.filter(bal > 0)
        .groupBy("c_mktsegment")
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(18,6)")).cast("double")
                / F.count("*")
            ).alias("avg_bal")
        )
        .withColumnRenamed("c_mktsegment", "_seg")
    )
    # per-customer last order date, materialized once: the global max
    # order date is the max of the per-customer maxes (every order row
    # belongs to exactly one o_custkey group, NULL included), so deriving
    # it from `last` removes the second full orders scan the separate
    # 1-row aggregate paid
    last = (
        t.orders.groupBy("o_custkey")
        .agg(F.max(F.col("o_orderdate").cast("date")).alias("last_d"))
        .localCheckpoint(eager=False)
    )
    mx = last.agg(F.max("last_d").alias("m"))
    dormant = (
        cust.join(
            F.broadcast(seg), F.col("c_mktsegment") == F.col("_seg")
        )
        .filter(bal > F.col("avg_bal"))
        .join(last, F.col("o_custkey") == F.col("c_custkey"))
        .crossJoin(F.broadcast(mx))
        .filter(F.datediff(F.col("m"), F.col("last_d")) > 730)
    )
    return dormant.groupBy("c_mktsegment").agg(
        F.count("*").cast("bigint").alias("n_dormant"),
        F.round(
            F.sum(F.col("c_acctbal").cast("decimal(18,6)")).cast("double"), 6
        ).alias("dormant_balance"),
    )


@register(
    "q219_weighted_sample_aes",
    """
    WITH keyed AS (
      SELECT o_orderkey, o_totalprice,
             -ln(((('0x' || substr(md5('aes_' || CAST(o_orderkey AS VARCHAR)),
                    1, 8))::BIGINT) + 1) / 4294967296.0)
               / CAST(o_totalprice AS DOUBLE) AS k
      FROM orders WHERE CAST(o_totalprice AS DOUBLE) > 0
    ),
    ranked AS (
      SELECT o_orderkey, o_totalprice, k,
             ROW_NUMBER() OVER (ORDER BY ROUND(k, 12), o_orderkey) AS rn
      FROM keyed
    )
    SELECT CAST(rn AS BIGINT) AS sample_rank, o_orderkey,
           ROUND(CAST(o_totalprice AS DOUBLE), 6) AS weight
    FROM ranked WHERE rn <= 20
    """,
    "weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-ES): "
    "each order draws the exponential key -ln(u)/w with the md5-uniform "
    "u ∈ (0,1] (deterministic, no rand()) and the 20 smallest keys are the "
    "sample — inclusion probability proportional to o_totalprice, exactly "
    "the priority-sampling companion to q183. Ranking compares keys "
    "ROUNDED to 12 dp with the orderkey tie-break so a last-ulp libm ln() "
    "difference can never reorder engines; physically a TakeOrdered "
    "top-20, never a global sort",
    ("relational", "sampling"),
)
def q219(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("aes_"), F.col("o_orderkey").cast("string")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        + 1
    ) / F.lit(4294967296.0)
    k = -F.log(u) / F.col("o_totalprice").cast("double")
    keyed = (
        t.orders.filter(F.col("o_totalprice").cast("double") > 0)
        .select("o_orderkey", "o_totalprice", k.alias("k"))
        .orderBy(F.round("k", 12), "o_orderkey")
        .limit(20)
    )
    w = Window.orderBy(F.round("k", 12), "o_orderkey")
    return keyed.select(
        F.row_number().over(w).cast("bigint").alias("sample_rank"),
        "o_orderkey",
        F.round(F.col("o_totalprice").cast("double"), 6).alias("weight"),
    )


_LORENZ_K = 10


@register(
    "q220_lorenz_curve",
    f"""
    WITH cr AS (
      SELECT o_custkey,
             SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS rev
      FROM orders GROUP BY 1
    ),
    d AS (
      SELECT rev, NTILE({_LORENZ_K}) OVER (ORDER BY rev, o_custkey) AS decile
      FROM cr
    ),
    g AS (
      SELECT decile, COUNT(*) AS n_customers, SUM(rev) AS drev
      FROM d GROUP BY 1
    ),
    t AS (SELECT SUM(drev) AS total FROM g)
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(n_customers AS BIGINT) AS n_customers,
           ROUND(CAST(drev AS DOUBLE), 6) AS decile_revenue,
           ROUND(CAST(SUM(drev) OVER (ORDER BY decile) AS DOUBLE)
                 / CAST(t.total AS DOUBLE), 6) AS cum_share
    FROM g, t
    """,
    "Lorenz revenue-concentration curve: customers ranked by lifetime "
    "revenue into deciles, cumulative revenue share per decile (the curve "
    "behind q125's Gini). The decile is derived ARITHMETICALLY from the "
    "distributed global rank (range-repartition + per-partition offsets — "
    "the q124 pattern), so no single-partition NTILE window ever sees the "
    "per-customer rollup; the cumulative share runs over 10 rows",
    ("relational", "order-statistics", "distribution"),
)
def q220(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fluvii_spark.operators.ranking import distributed_row_number

    t = load_tables(spark, sf_dir)
    cr = t.orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias("rev")
    )
    ranked = distributed_row_number(cr, ["rev", "o_custkey"], out_col="rnk")
    tot = ranked.agg(F.count("*").alias("n_tot"))
    k = _LORENZ_K
    # NTILE(k) from the global rank (q124's arithmetic): q = n DIV k rows
    # per bucket, the first n MOD k buckets hold one extra row
    asn = ranked.crossJoin(F.broadcast(tot)).select(
        "rev",
        F.expr(
            f"CAST(CASE WHEN rnk <= (n_tot % {k}) * (n_tot DIV {k} + 1) "
            f"THEN (rnk - 1) DIV (n_tot DIV {k} + 1) + 1 "
            f"ELSE n_tot % {k} + (rnk - (n_tot % {k}) * (n_tot DIV {k} + 1) - 1) "
            f"DIV (n_tot DIV {k}) + 1 END AS BIGINT)"
        ).alias("decile"),
    )
    g = asn.groupBy("decile").agg(
        F.count("*").cast("bigint").alias("n_customers"),
        F.sum("rev").alias("drev"),
    )
    total = g.agg(F.sum("drev").alias("total"))
    wc = Window.orderBy("decile")  # 10 rows — contracted by construction
    return (
        g.crossJoin(F.broadcast(total))
        .select(
            "decile",
            "n_customers",
            F.round(F.col("drev").cast("double"), 6).alias("decile_revenue"),
            F.round(
                F.sum("drev").over(wc).cast("double")
                / F.col("total").cast("double"),
                6,
            ).alias("cum_share"),
        )
    )


_GAP_PS = (0.5, 0.9)


@register(
    "q221_interorder_gaps",
    """
    WITH seq AS (
      SELECT o_custkey,
             datediff('day',
                      lag(o_orderdate) OVER (PARTITION BY o_custkey
                                             ORDER BY o_orderdate, o_orderkey),
                      o_orderdate) AS gap,
             o_orderkey
      FROM orders
    ),
    j AS (
      SELECT c_mktsegment, gap, o_orderkey
      FROM seq JOIN customer ON c_custkey = o_custkey
      WHERE gap IS NOT NULL
    ),
    ranked AS (
      SELECT c_mktsegment, gap,
             row_number() OVER (PARTITION BY c_mktsegment
                                ORDER BY gap, o_orderkey) AS rn,
             COUNT(*) OVER (PARTITION BY c_mktsegment) AS n
      FROM j
    ),
    probes AS (SELECT unnest([0.5, 0.9]) AS p)
    SELECT r.c_mktsegment, pr.p,
           CAST(r.gap AS BIGINT) AS gap_days,
           CAST(r.n AS BIGINT) AS n_gaps
    FROM ranked r JOIN probes pr
      ON r.rn = CAST(ceiling(pr.p * r.n) AS BIGINT)
    """,
    "inter-order gap distribution: days between consecutive orders per "
    "customer, discrete p50/p90 per market segment — the repurchase-cadence "
    "statistic behind churn models. Gaps are exact integer day diffs from "
    "a per-customer lag window; the per-segment discrete percentiles come "
    "from a per-segment value-counts histogram (grouped_hist_cum: the "
    "gap at rank ceil(p·n) is an in-row cumulative-count lookup; integer "
    "day gaps keep the histogram bounded at any corpus scale)",
    ("relational", "quantile", "timeseries"),
)
def q221(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fluvii_spark.operators.ranking import grouped_hist_cum, hist_value_at

    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = t.orders.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(
            F.col("o_orderdate"), F.lag("o_orderdate").over(w)
        ).alias("gap"),
    ).filter(F.col("gap").isNotNull())
    j = seq.join(
        t.customer.select("c_custkey", "c_mktsegment"),
        seq.o_custkey == F.col("c_custkey"),
    ).select("c_mktsegment", "gap")
    # the oracle ranks (gap, o_orderkey) but SELECTS only the gap at rank
    # ceil(p·n), so the orderkey tiebreak cannot change the output value —
    # the gap holding any rank is fully determined by the per-segment gap
    # value counts. Gaps are integer days (bounded distinct values at any
    # corpus scale), so the §2.3 contraction replaces the distributed
    # ranking + broadcast rank probe: one map-side-combinable
    # groupBy(segment, gap).count(), then in-row cumulative-rank lookups.
    probes = grouped_hist_cum(j, ["c_mktsegment"], "gap").select(
        "c_mktsegment",
        "_gq_h",
        "_gq_cum",
        "_gq_n",
        F.explode(F.array(*[F.lit(p) for p in _GAP_PS])).alias("p"),
    )
    target = F.ceil(F.col("p") * F.col("_gq_n")).cast("bigint")
    return probes.select(
        "c_mktsegment",
        "p",
        hist_value_at(target).cast("bigint").alias("gap_days"),
        F.col("_gq_n").cast("bigint").alias("n_gaps"),
    )


@register(
    "q222_ship_delay_buckets",
    """
    WITH d AS (
      SELECT o.o_orderpriority,
             datediff('day', o.o_orderdate, l.l_shipdate) AS delay
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ),
    b AS (
      SELECT o_orderpriority,
             CASE WHEN delay <= 7 THEN '0-7'
                  WHEN delay <= 30 THEN '8-30'
                  WHEN delay <= 90 THEN '31-90'
                  ELSE '>90' END AS bucket,
             COUNT(*) AS n
      FROM d GROUP BY 1, 2
    ),
    t AS (SELECT o_orderpriority, SUM(n) AS tot FROM b GROUP BY 1)
    SELECT b.o_orderpriority, b.bucket, CAST(b.n AS BIGINT) AS n_lines,
           ROUND(CAST(b.n AS DOUBLE) / t.tot, 6) AS share
    FROM b JOIN t USING (o_orderpriority)
    """,
    "order-to-ship delay buckets per order priority — the SLA conformance "
    "report: integer day diffs bucketed 0-7/8-30/31-90/>90, share within "
    "priority. One lineitem⋈orders equi-join (shuffle on orderkey), "
    "map-side-combined bucket counts (≤20 cells), per-priority totals "
    "joined broadcast; all boundaries are exact integers",
    ("relational", "timeseries", "operational"),
)
def q222(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    d = t.lineitem.join(
        t.orders.select("o_orderkey", "o_orderdate", "o_orderpriority"),
        F.col("o_orderkey") == F.col("l_orderkey"),
    ).select(
        "o_orderpriority",
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).alias("delay"),
    )
    b = d.groupBy(
        "o_orderpriority",
        F.when(F.col("delay") <= 7, "0-7")
        .when(F.col("delay") <= 30, "8-30")
        .when(F.col("delay") <= 90, "31-90")
        .otherwise(">90")
        .alias("bucket"),
    ).agg(F.count("*").alias("n"))
    # per-priority total as a window over the ~|priorities|·4-row
    # aggregate instead of a second aggregation + join-back, which
    # re-executed b's whole corpus-join lineage (the before-plan carries
    # the lineitem⋈orders subtree twice). sum(n) OVER the priority
    # partition is the same bigint total the join attached; partitions
    # are schema-bounded (one per priority), so no skew risk.
    return b.select(
        "o_orderpriority",
        "bucket",
        F.col("n").cast("bigint").alias("n_lines"),
        F.round(
            F.col("n").cast("double")
            / F.sum("n").over(Window.partitionBy("o_orderpriority")),
            6,
        ).alias("share"),
    )


@register(
    "q223_u_shaped_attribution",
    """
    WITH p AS (
      SELECT user_id, ts, event_id,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events WHERE event_type = 'purchase'
    ),
    conv AS (SELECT user_id, ts AS cts, event_id AS cid FROM p WHERE rn = 1),
    touches AS (
      SELECT e.user_id, e.event_type,
             ROW_NUMBER() OVER (PARTITION BY e.user_id
                                ORDER BY e.ts, e.event_id) AS pos,
             COUNT(*) OVER (PARTITION BY e.user_id) AS n
      FROM events e JOIN conv c ON c.user_id = e.user_id
      WHERE (e.ts < c.cts OR (e.ts = c.cts AND e.event_id < c.cid))
        AND e.event_type <> 'purchase'
    ),
    cred AS (
      SELECT event_type,
             CAST(ROUND(CASE WHEN n = 1 THEN 1.0
                             WHEN pos = 1 OR pos = n THEN 0.4
                             ELSE 0.2 / (n - 2) END, 6)
                  AS DECIMAL(18,6)) AS credit
      FROM touches
    )
    SELECT event_type AS channel,
           CAST(COUNT(*) AS BIGINT) AS n_touches,
           ROUND(CAST(SUM(credit) AS DOUBLE), 6) AS credit
    FROM cred GROUP BY 1
    """,
    "U-shaped (position-based 40/20/40) multi-touch attribution — the "
    "third member of the family (q130 first-touch, q205 linear): first and "
    "last pre-conversion touches get 0.4 each, the middle splits 0.2. "
    "Per-event credits are 6-dp-rounded into exact DECIMAL before the "
    "cross-row sum, so the aggregate is order-independent; journeys use "
    "one user-partitioned window pass with the (ts, event_id) tie-break",
    ("relational", "attribution", "funnel"),
)
def q223(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    wp = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # first purchase per user as min(struct(ts, event_id)) — unique key,
    # so the hash aggregation picks exactly the window's rn=1 row with
    # map-side partial aggregation instead of a sort window
    conv = (
        t.events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min(F.struct("ts", "event_id")).alias("_m"))
        .select(
            F.col("user_id").alias("_uid"),
            F.col("_m.ts").alias("cts"),
            F.col("_m.event_id").alias("cid"),
        )
    )
    touches = (
        t.events.join(conv, F.col("user_id") == F.col("_uid"))
        .filter(
            (
                (F.col("ts") < F.col("cts"))
                | (
                    (F.col("ts") == F.col("cts"))
                    & (F.col("event_id") < F.col("cid"))
                )
            )
            & (F.col("event_type") != "purchase")
        )
        .select(
            "user_id",
            "event_type",
            F.row_number().over(wp).alias("pos"),
            F.count("*").over(Window.partitionBy("user_id")).alias("n"),
        )
    )
    credit = (
        F.round(
            F.when(F.col("n") == 1, F.lit(1.0))
            .when((F.col("pos") == 1) | (F.col("pos") == F.col("n")), 0.4)
            .otherwise(F.lit(0.2) / (F.col("n") - 2)),
            6,
        )
    ).cast("decimal(18,6)")
    return (
        touches.select(F.col("event_type").alias("channel"), credit.alias("c"))
        .groupBy("channel")
        .agg(
            F.count("*").cast("bigint").alias("n_touches"),
            F.round(F.sum("c").cast("double"), 6).alias("credit"),
        )
    )


@register(
    "q224_daily_first_dedup",
    """
    WITH r AS (
      SELECT CAST(ts AS DATE) AS day,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type,
                                             CAST(ts AS DATE)
                                ORDER BY ts, event_id) AS rn
      FROM events
    )
    SELECT day, CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(CASE WHEN rn = 1 THEN 1 END) AS BIGINT) AS n_kept,
           ROUND(1.0 - CAST(COUNT(CASE WHEN rn = 1 THEN 1 END) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS dup_share
    FROM r GROUP BY 1
    """,
    "calendar-bucket keep-first dedup: first event per (user, type, day) "
    "survives — the batch shape of a streaming daily-notification "
    "suppression rule, and the calendar-keyed sibling of q64's plain "
    "keep-first. One composite-key window (bounded partitions: one user's "
    "one type on one day), per-day reduction ratios",
    ("relational", "dedup", "window"),
)
def q224(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    day = F.col("ts").cast("date")
    w = Window.partitionBy("user_id", "event_type", day).orderBy(
        "ts", "event_id"
    )
    r = t.events.select(
        day.alias("day"), F.row_number().over(w).alias("rn")
    )
    kept = F.count(F.when(F.col("rn") == 1, 1))
    return r.groupBy("day").agg(
        F.count("*").cast("bigint").alias("n_events"),
        kept.cast("bigint").alias("n_kept"),
        F.round(
            F.lit(1.0) - kept.cast("double") / F.count("*").cast("double"), 6
        ).alias("dup_share"),
    )


@register(
    "q226_capped_sessions",
    """
    WITH e AS (
      -- whole-second epochs (floor, not round): Spark's unix_timestamp
      -- truncates to seconds while duckdb epoch() keeps the fraction and
      -- CAST(double AS BIGINT) ROUNDS — both the 30-min gap boundary and
      -- the span would drift by ±1s without this pin
      SELECT user_id, ts, event_id,
             CAST(FLOOR(epoch(ts)) AS BIGINT) AS ep
      FROM events
    ),
    s AS (
      SELECT user_id, ts, event_id, ep,
             CASE WHEN lag(ep) OVER w IS NULL
                       OR ep - lag(ep) OVER w > 1800
                  THEN 1 ELSE 0 END AS brk
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    g AS (
      SELECT user_id, ts, event_id, ep,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM s
    ),
    c AS (
      SELECT user_id, sid, ep,
             (ep - MIN(ep) OVER (PARTITION BY user_id, sid)) // 1800
               AS chunk
      FROM g
    ),
    f AS (
      SELECT user_id, sid, chunk, COUNT(*) AS n_events,
             MAX(ep) - MIN(ep) AS span_s
      FROM c GROUP BY 1, 2, 3
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
           ROUND(CAST(SUM(n_events) AS DOUBLE) / COUNT(*), 6)
             AS avg_events,
           CAST(MAX(span_s) AS BIGINT) AS max_span_s,
           CAST(COUNT(CASE WHEN chunk > 0 THEN 1 END) AS BIGINT)
             AS n_cap_chunks
    FROM f
    """,
    "dual-constraint sessionization: 30-min idle gap AND a 30-min hard cap "
    "(continuously-active sessions split into 30-min chunks — the rule real analytics "
    "pipelines add so a bot's week-long click stream can't form one "
    "session). Two window passes over the user-partitioned stream (gap "
    "islands, then chunk = elapsed DIV 1800 within session), exact "
    "integer epoch arithmetic throughout; the cap is assignment by "
    "arithmetic, not another gaps-and-islands scan",
    ("relational", "session", "window"),
)
def q226(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    ep = F.unix_timestamp("ts")  # NTZ under UTC session tz == epoch(ts)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = t.events.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.lag("ts").over(w).isNull()
            | ((ep - F.unix_timestamp(F.lag("ts").over(w))) > 1800),
            1,
        )
        .otherwise(0)
        .alias("brk"),
    )
    g = s.select(
        "user_id",
        "ts",
        "event_id",
        F.sum("brk")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("sid"),
    )
    ws = Window.partitionBy("user_id", "sid")
    c = g.select(
        "user_id",
        "sid",
        ep.alias("ep"),
        ((ep - F.min(ep).over(ws)) / F.lit(1800))
        .cast("bigint")
        .alias("chunk"),
    )
    f = c.groupBy("user_id", "sid", "chunk").agg(
        F.count("*").alias("n_events"),
        (F.max("ep") - F.min("ep")).alias("span_s"),
    )
    return f.agg(
        F.count("*").cast("bigint").alias("n_sessions"),
        F.round(
            F.sum("n_events").cast("double") / F.count("*"), 6
        ).alias("avg_events"),
        F.max("span_s").cast("bigint").alias("max_span_s"),
        F.count(F.when(F.col("chunk") > 0, 1))
        .cast("bigint")
        .alias("n_cap_chunks"),
    )


@register(
    "q227_large_orders",
    """
    WITH oq AS (
      SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,6))) AS tq
      FROM lineitem GROUP BY 1
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 150
    )
    SELECT c.c_custkey, c.c_name, o.o_orderkey,
           CAST(o.o_orderdate AS DATE) AS o_orderdate,
           ROUND(CAST(oq.tq AS DOUBLE), 6) AS total_qty
    FROM oq JOIN orders o ON o.o_orderkey = oq.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY total_qty DESC, o.o_orderkey LIMIT 20
    """,
    "TPC-H Q18-shaped large-volume orders: per-order quantity rollup with "
    "a HAVING gate (exact DECIMAL sum — no float boundary), survivors "
    "joined back to orders and customer. The rollup contracts lineitem "
    "before any dimension join; TakeOrdered 20 with the orderkey tie-break",
    ("relational", "tpch", "having"),
)
def q227(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    oq = (
        t.lineitem.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("tq"))
        .filter(F.col("tq") > 150)
    )
    return (
        # the HAVING-gated rollup contracts the join long before customer;
        # no forced broadcast of a dimension that grows with the corpus —
        # AQE converts the contracted side when it is in fact small
        oq.join(t.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            t.customer.select("c_custkey", "c_name"),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            F.round(F.col("tq").cast("double"), 6).alias("total_qty"),
        )
        .orderBy(F.col("total_qty").desc(), "o_orderkey")
        .limit(20)
    )


@register(
    "q228_supplier_variety",
    """
    WITH sup AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    excl AS (SELECT s_suppkey FROM supplier
             WHERE CAST(s_acctbal AS DOUBLE) < 0)
    SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
           CAST(COUNT(DISTINCT s.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM sup s JOIN part p ON p.p_partkey = s.l_partkey
    WHERE p.p_brand <> 'Brand#1' AND p.p_size IN (1, 5, 9, 13, 17)
      AND s.l_suppkey NOT IN (SELECT s_suppkey FROM excl)
    GROUP BY 1, 2, 3
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p_size LIMIT 20
    """,
    "TPC-H Q16-shaped supplier variety: distinct suppliers per "
    "(brand, type, size) over the observed part-supplier relation, "
    "excluding negative-balance suppliers (the complaints stand-in; the "
    "schema has no partsupp, so supply = shipped-at-least-once). The "
    "exclusion NOT IN decorrelates to a broadcast ANTI join (s_suppkey is "
    "non-null — NOT IN's NULL trap can't fire); TakeOrdered 20 on the "
    "unique group key",
    ("relational", "tpch", "anti-join"),
)
def q228(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    sup = t.lineitem.select("l_partkey", "l_suppkey").distinct()
    excl = t.supplier.filter(
        F.col("s_acctbal").cast("double") < 0
    ).select("s_suppkey")
    tgt = t.part.filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 5, 9, 13, 17)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        # tgt (~10% of part) and excl (~half of supplier) both GROW with
        # the corpus — no forced broadcasts; AQE converts when small
        sup.join(tgt, F.col("p_partkey") == F.col("l_partkey"))
        .join(
            excl,
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", F.col("p_size").cast("bigint").alias("p_size"))
        .agg(
            F.count_distinct("l_suppkey").cast("bigint").alias("supplier_cnt")
        )
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
        .limit(20)
    )


@register(
    "q229_duplicate_invoices",
    """
    SELECT a.o_orderkey AS id_a, b.o_orderkey AS id_b, a.o_custkey,
           CAST(a.o_orderdate AS DATE) AS order_day,
           ROUND(ABS(CAST(a.o_totalprice AS DOUBLE)
                     - CAST(b.o_totalprice AS DOUBLE)), 6) AS amount_gap
    FROM orders a JOIN orders b
      ON b.o_custkey = a.o_custkey
     AND CAST(b.o_orderdate AS DATE) = CAST(a.o_orderdate AS DATE)
     AND b.o_orderkey > a.o_orderkey
    """,
    "duplicate-invoice detection: order pairs from the same customer on "
    "the SAME calendar day (the double-submission audit), reporting the "
    "amount gap. Self-join strictly on the (custkey, day) equi-key — "
    "fan-out bounded per customer-day, never a cross join; id_a < id_b "
    "dedup built into the join condition",
    ("relational", "dedup", "audit"),
)
def q229(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    a = t.orders.select(
        F.col("o_orderkey").alias("id_a"),
        "o_custkey",
        F.col("o_totalprice").alias("_tp_a"),
        F.col("o_orderdate").cast("date").alias("order_day"),
    )
    b = t.orders.select(
        F.col("o_orderkey").alias("id_b"),
        F.col("o_custkey").alias("_ck_b"),
        F.col("o_totalprice").alias("_tp_b"),
        F.col("o_orderdate").cast("date").alias("_d_b"),
    )
    return a.join(
        b,
        (F.col("_ck_b") == F.col("o_custkey"))
        & (F.col("_d_b") == F.col("order_day"))
        & (F.col("id_b") > F.col("id_a")),
    ).select(
        "id_a",
        "id_b",
        "o_custkey",
        "order_day",
        F.round(
            F.abs(
                F.col("_tp_a").cast("double") - F.col("_tp_b").cast("double")
            ),
            6,
        ).alias("amount_gap"),
    )


@register(
    "q230_price_iqr_fences",
    """
    WITH v AS (
      SELECT p.p_brand, CAST(l.l_extendedprice AS DOUBLE) AS x,
             l.l_orderkey, l.l_linenumber
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    ranked AS (
      SELECT p_brand, x,
             row_number() OVER (PARTITION BY p_brand
                                ORDER BY x, l_orderkey, l_linenumber) AS rn,
             COUNT(*) OVER (PARTITION BY p_brand) AS n
      FROM v
    ),
    qs AS (
      SELECT p_brand, MAX(n) AS n,
             MAX(CASE WHEN rn = CAST(ceiling(0.25 * n) AS BIGINT)
                      THEN x END) AS q1,
             MAX(CASE WHEN rn = CAST(ceiling(0.75 * n) AS BIGINT)
                      THEN x END) AS q3
      FROM ranked GROUP BY 1
    ),
    f AS (
      SELECT p_brand, n, q1, q3,
             q1 - 1.5 * (q3 - q1) AS lo, q3 + 1.5 * (q3 - q1) AS hi
      FROM qs
    )
    SELECT f.p_brand, CAST(f.n AS BIGINT) AS n_lines,
           ROUND(f.q1, 6) AS q1, ROUND(f.q3, 6) AS q3,
           CAST(COUNT(CASE WHEN v.x < f.lo OR v.x > f.hi THEN 1 END)
                AS BIGINT) AS n_outliers
    FROM v JOIN f USING (p_brand)
    GROUP BY 1, 2, 3, 4
    """,
    "Tukey IQR fences per brand: discrete Q1/Q3 (actual observed values at "
    "rank ceil(p·n) — dyadic p, exact boundary), fences q1±1.5·IQR, "
    "outlier share — the robust-outlier companion to z-score (q110), MAD "
    "(q91) and winsorizing (q113). Ranks come from distributed_row_number "
    "+ per-group offsets (never 25 single-task windows); fences return as "
    "a 25-row broadcast against the line scan",
    ("relational", "quantile", "outliers"),
)
def q230(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fluvii_spark.operators.ranking import distributed_row_number

    t = load_tables(spark, sf_dir)
    # the full part projection grows with the corpus — no forced
    # broadcast (AQE converts when it is in fact small); the 25-row
    # fences relation below IS broadcast
    v = t.lineitem.join(
        t.part.select("p_partkey", "p_brand"),
        F.col("p_partkey") == F.col("l_partkey"),
    ).select(
        "p_brand",
        F.col("l_extendedprice").cast("double").alias("x"),
        "l_orderkey",
        "l_linenumber",
    )
    ranked = distributed_row_number(
        v, ["p_brand", "x", "l_orderkey", "l_linenumber"], out_col="rnk"
    )
    grp = ranked.groupBy(F.col("p_brand").alias("_b")).agg(
        F.min("rnk").alias("base"), F.count("*").alias("n")
    )
    qs = (
        ranked.join(
            F.broadcast(grp), F.col("p_brand") == F.col("_b")
        )
        .groupBy("p_brand")
        .agg(
            F.max("n").alias("n"),
            F.max(
                F.when(
                    F.col("rnk")
                    == F.ceil(0.25 * F.col("n")) + F.col("base") - 1,
                    F.col("x"),
                )
            ).alias("q1"),
            F.max(
                F.when(
                    F.col("rnk")
                    == F.ceil(0.75 * F.col("n")) + F.col("base") - 1,
                    F.col("x"),
                )
            ).alias("q3"),
        )
    )
    f = qs.select(
        F.col("p_brand").alias("_fb"),
        "n",
        "q1",
        "q3",
        (F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))).alias("lo"),
        (F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))).alias("hi"),
    )
    # outlier counting reads the RANKED relation (a 1:1 projection of v
    # plus rnk), not v — all three consumers then share the ranking's
    # range exchange via ReusedExchange instead of re-running the
    # corpus lineitem⋈part join for the final pass
    return (
        ranked.join(F.broadcast(f), F.col("p_brand") == F.col("_fb"))
        .groupBy("p_brand", "n", "q1", "q3")
        .agg(
            F.count(
                F.when((F.col("x") < F.col("lo")) | (F.col("x") > F.col("hi")), 1)
            )
            .cast("bigint")
            .alias("n_outliers")
        )
        .select(
            "p_brand",
            F.col("n").cast("bigint").alias("n_lines"),
            F.round("q1", 6).alias("q1"),
            F.round("q3", 6).alias("q3"),
            "n_outliers",
        )
    )


@register(
    "q233_rare_category_collapse",
    """
    WITH c AS (SELECT p_type, COUNT(*) AS n FROM part GROUP BY 1),
    t AS (SELECT SUM(n) AS total FROM c),
    lab AS (
      SELECT CASE WHEN CAST(n AS DOUBLE) / t.total >= 0.02 THEN p_type
                  ELSE 'OTHER' END AS category,
             n, t.total
      FROM c, t
    )
    SELECT category, CAST(SUM(n) AS BIGINT) AS n_parts,
           ROUND(CAST(SUM(n) AS DOUBLE) / MAX(total), 6) AS share
    FROM lab GROUP BY 1
    """,
    "rare-category collapse: part types below a 2% share fold into "
    "'OTHER' — the cardinality-control transform every feature pipeline "
    "applies before one-hot/embedding. One hash aggregate contracts to "
    "|types| rows; the 1-row total broadcasts back; the 2% boundary is a "
    "single identical IEEE division on both engines",
    ("relational", "categorical"),
)
def q233(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    c = t.part.groupBy("p_type").agg(F.count("*").alias("n"))
    tot = c.agg(F.sum("n").alias("total"))
    lab = c.crossJoin(F.broadcast(tot)).select(
        F.when(
            F.col("n").cast("double") / F.col("total") >= 0.02,
            F.col("p_type"),
        )
        .otherwise("OTHER")
        .alias("category"),
        "n",
        "total",
    )
    return lab.groupBy("category").agg(
        F.sum("n").cast("bigint").alias("n_parts"),
        F.round(
            F.sum("n").cast("double") / F.max("total"), 6
        ).alias("share"),
    )


@register(
    "q234_session_entropy",
    """
    WITH c AS (
      SELECT user_id,
             COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS c1,
             COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS c2,
             COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS c3,
             COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS c4,
             COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS c5,
             COUNT(*) AS n
      FROM events GROUP BY 1
    ),
    h AS (
      SELECT user_id,
             CAST(ROUND(
               0 - (CASE WHEN c1 = 0 THEN 0 ELSE (CAST(c1 AS DOUBLE)/n)
                         * ln(CAST(c1 AS DOUBLE)/n) END
                  + CASE WHEN c2 = 0 THEN 0 ELSE (CAST(c2 AS DOUBLE)/n)
                         * ln(CAST(c2 AS DOUBLE)/n) END
                  + CASE WHEN c3 = 0 THEN 0 ELSE (CAST(c3 AS DOUBLE)/n)
                         * ln(CAST(c3 AS DOUBLE)/n) END
                  + CASE WHEN c4 = 0 THEN 0 ELSE (CAST(c4 AS DOUBLE)/n)
                         * ln(CAST(c4 AS DOUBLE)/n) END
                  + CASE WHEN c5 = 0 THEN 0 ELSE (CAST(c5 AS DOUBLE)/n)
                         * ln(CAST(c5 AS DOUBLE)/n) END), 6)
               AS DECIMAL(18,6)) AS ent
      FROM c
    )
    SELECT CAST(FLOOR(CAST(ent AS DOUBLE) / 0.05) AS BIGINT) AS ent_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           ROUND(CAST(SUM(ent) AS DOUBLE) / COUNT(*), 6) AS avg_entropy
    FROM h GROUP BY 1
    """,
    "behavioral diversity: per-user Shannon entropy of the event-type "
    "distribution, bucketed at 0.05 nats — bots cluster at 0 (one action "
    "repeated), engaged humans spread out. The 5 entropy terms are a "
    "FIXED-ORDER in-row expression (never a cross-row float sum), per-user "
    "entropy is 6-dp-rounded into DECIMAL before the bucket aggregate, and "
    "the bucket edge divides identically-derived doubles on both engines",
    ("relational", "entropy", "behavior"),
)
def q234(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    cnt = [
        F.count(F.when(F.col("event_type") == et, 1)).alias(f"c{i+1}")
        for i, et in enumerate(
            ["click", "error", "purchase", "signup", "view"]
        )
    ]
    c = t.events.groupBy("user_id").agg(*cnt, F.count("*").alias("n"))

    def term(col: str):
        p = F.col(col).cast("double") / F.col("n")
        return F.when(F.col(col) == 0, F.lit(0.0)).otherwise(p * F.log(p))

    ent = F.round(
        F.lit(0)
        - (
            term("c1") + term("c2") + term("c3") + term("c4") + term("c5")
        ),
        6,
    ).cast("decimal(18,6)")
    h = c.select(ent.alias("ent"))
    return h.groupBy(
        F.floor(F.col("ent").cast("double") / 0.05)
        .cast("bigint")
        .alias("ent_bucket")
    ).agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.round(F.sum("ent").cast("double") / F.count("*"), 6).alias(
            "avg_entropy"
        ),
    )


@register(
    "q235_disjunctive_revenue",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                         * (1 - CAST(l_discount AS DECIMAL(18,6))))
                     AS VARCHAR) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND CAST(l_quantity AS DOUBLE) BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           AND CAST(l_quantity AS DOUBLE) BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 35
           AND CAST(l_quantity AS DOUBLE) BETWEEN 20 AND 30)
    """,
    "TPC-H Q19-shaped disjunctive bracket revenue: an OR of three "
    "(brand, size-range, quantity-range) brackets across the join — the "
    "predicate shape that stresses CNF conversion and partial pushdown "
    "(Catalyst pushes the extractable common conjuncts to each scan). "
    "Exact DECIMAL revenue, one join, one 1-row aggregate",
    ("relational", "tpch", "pushdown"),
)
def q235(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    qty = F.col("l_quantity").cast("double")
    bracket = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & qty.between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & qty.between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#15")
            & F.col("p_size").between(1, 35)
            & qty.between(20, 30)
        )
    )
    price = F.col("l_extendedprice").cast("decimal(18,6)")
    disc = F.col("l_discount").cast("decimal(18,6)")
    return (
        t.lineitem.join(t.part, F.col("p_partkey") == F.col("l_partkey"))
        .filter(bracket)
        .agg(
            F.count("*").cast("bigint").alias("n_lines"),
            # no in-engine 6dp round: at 1e9+ magnitudes the double's ulp
            # reaches the 6dp grid and Spark's BigDecimal rounding vs the
            # oracle's multiply-round-divide pick DIFFERENT doubles (r11
            # g=10 catch); the shared driver canonicalizer is the single
            # rounder, fed the correctly-rounded cast on both engines
            # (the oracle routes its scale-12 sum through VARCHAR — the
            # q23 conversion class)
            F.sum(price * (F.lit(1) - disc)).cast("double").alias("revenue"),
        )
    )


@register(
    "q236_event_debounce",
    """
    WITH e AS (
      SELECT user_id, event_type, ts, event_id,
             CAST(FLOOR(epoch(ts)) AS BIGINT) AS ep
      FROM events
    ),
    s AS (
      SELECT event_type, ep,
             lag(ep) OVER (PARTITION BY user_id, event_type
                           ORDER BY ts, event_id) AS prev_ep
      FROM e
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(CASE WHEN prev_ep IS NULL OR ep - prev_ep > 3600
                           THEN 1 END) AS BIGINT) AS n_kept,
           ROUND(CAST(COUNT(CASE WHEN prev_ep IS NOT NULL
                                      AND ep - prev_ep <= 3600
                            THEN 1 END) AS DOUBLE) / COUNT(*), 6)
             AS debounced_share
    FROM s GROUP BY 1
    """,
    "lag-debounce audit: per event type, how many events land within an "
    "hour of the user's PREVIOUS raw event of the same type — the "
    "rapid-repeat share a notification/ingest debounce rule would drop. "
    "One composite-key window on floor-truncated whole-second epochs "
    "(the q226 engine pin); lag-based (vs chain-based) semantics "
    "documented: the gap is to the previous RAW event, not previous kept",
    ("relational", "dedup", "window"),
)
def q236(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    ep = F.unix_timestamp("ts")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    s = t.events.select(
        "event_type",
        ep.alias("ep"),
        F.lag(ep).over(w).alias("prev_ep"),
    )
    kept = F.count(
        F.when(
            F.col("prev_ep").isNull()
            | ((F.col("ep") - F.col("prev_ep")) > 3600),
            1,
        )
    )
    dropped = F.count(
        F.when(
            F.col("prev_ep").isNotNull()
            & ((F.col("ep") - F.col("prev_ep")) <= 3600),
            1,
        )
    )
    return s.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_events"),
        kept.cast("bigint").alias("n_kept"),
        F.round(dropped.cast("double") / F.count("*"), 6).alias(
            "debounced_share"
        ),
    )


@register(
    "q237_time_to_third_purchase",
    """
    WITH p AS (
      SELECT user_id, ts,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS k
      FROM events WHERE event_type = 'purchase'
    ),
    f AS (
      SELECT user_id,
             MIN(CASE WHEN k = 1 THEN ts END) AS t1,
             MIN(CASE WHEN k = 3 THEN ts END) AS t3
      FROM p WHERE k <= 3 GROUP BY 1
    ),
    d AS (
      SELECT datediff('day', t1, t3) AS days FROM f WHERE t3 IS NOT NULL
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           ROUND(CAST(SUM(CAST(days AS BIGINT)) AS DOUBLE) / COUNT(*), 6)
             AS avg_days,
           CAST(MIN(days) AS BIGINT) AS min_days,
           CAST(MAX(days) AS BIGINT) AS max_days
    FROM d
    """,
    "activation velocity: days from a user's first to their third "
    "purchase — the time-to-habit metric growth teams track. One "
    "user-partitioned rank window pruned to k<=3, conditional-min pivot, "
    "exact integer day arithmetic with a single IEEE division for the "
    "mean",
    ("relational", "funnel", "window"),
)
def q237(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    p = (
        t.events.filter(F.col("event_type") == "purchase")
        .select("user_id", "ts", F.row_number().over(w).alias("k"))
        .filter(F.col("k") <= 3)
    )
    f = p.groupBy("user_id").agg(
        F.min(F.when(F.col("k") == 1, F.col("ts"))).alias("t1"),
        F.min(F.when(F.col("k") == 3, F.col("ts"))).alias("t3"),
    )
    d = f.filter(F.col("t3").isNotNull()).select(
        F.datediff(F.col("t3"), F.col("t1")).alias("days")
    )
    return d.agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.round(
            F.sum(F.col("days").cast("bigint")).cast("double")
            / F.count("*"),
            6,
        ).alias("avg_days"),
        F.min("days").cast("bigint").alias("min_days"),
        F.max("days").cast("bigint").alias("max_days"),
    )


@register(
    "q238_inventory_aging",
    """
    WITH last AS (
      SELECT l_partkey, MAX(CAST(l_shipdate AS DATE)) AS last_ship
      FROM lineitem GROUP BY 1
    ),
    mx AS (SELECT MAX(CAST(l_shipdate AS DATE)) AS m FROM lineitem),
    age AS (
      SELECT p.p_brand, datediff('day', last.last_ship, mx.m) AS age_days
      FROM part p JOIN last ON last.l_partkey = p.p_partkey, mx
    )
    SELECT p_brand,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(COUNT(CASE WHEN age_days <= 30 THEN 1 END) AS BIGINT)
             AS fresh_30d,
           CAST(COUNT(CASE WHEN age_days > 365 THEN 1 END) AS BIGINT)
             AS stale_1y,
           CAST(MAX(age_days) AS BIGINT) AS max_age_days
    FROM age GROUP BY 1
    """,
    "inventory aging per brand: days since each part last shipped, "
    "against the corpus's latest ship date — fresh/stale shelf buckets. "
    "The last-ship rollup contracts lineitem to one row per part BEFORE "
    "the dimension join; the 1-row max date broadcasts; exact DATE "
    "arithmetic",
    ("relational", "timeseries", "operational"),
)
def q238(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    # global max ship date = max of the per-part maxes (every lineitem
    # row belongs to exactly one l_partkey group, NULL included), so one
    # fact scan feeds both; the part-bounded relation materializes once
    last = (
        t.lineitem.groupBy("l_partkey")
        .agg(F.max(F.col("l_shipdate").cast("date")).alias("last_ship"))
        .localCheckpoint(eager=False)
    )
    mx = last.agg(F.max("last_ship").alias("m"))
    age = (
        t.part.join(last, F.col("l_partkey") == F.col("p_partkey"))
        .crossJoin(F.broadcast(mx))
        .select(
            "p_brand",
            F.datediff(F.col("m"), F.col("last_ship")).alias("age_days"),
        )
    )
    return age.groupBy("p_brand").agg(
        F.count("*").cast("bigint").alias("n_parts"),
        F.count(F.when(F.col("age_days") <= 30, 1))
        .cast("bigint")
        .alias("fresh_30d"),
        F.count(F.when(F.col("age_days") > 365, 1))
        .cast("bigint")
        .alias("stale_1y"),
        F.max("age_days").cast("bigint").alias("max_age_days"),
    )


@register(
    "q241_brand_leaderboard_volatility",
    """
    WITH mb AS (
      SELECT date_trunc('month', o.o_orderdate) AS month, p.p_brand,
             SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))) AS rev
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1, 2
    ),
    r AS (
      SELECT month, p_brand,
             ROW_NUMBER() OVER (PARTITION BY month
                                ORDER BY rev DESC, p_brand) AS rnk
      FROM mb
    ),
    d AS (
      SELECT p_brand, rnk,
             lag(rnk) OVER (PARTITION BY p_brand ORDER BY month) AS prev
      FROM r
    )
    SELECT p_brand,
           CAST(COUNT(prev) AS BIGINT) AS n_months,
           CAST(SUM(ABS(rnk - prev)) AS BIGINT) AS total_rank_moves,
           CAST(MAX(ABS(rnk - prev)) AS BIGINT) AS max_jump,
           CAST(COUNT(CASE WHEN rnk <= 3 THEN 1 END) AS BIGINT)
             AS months_in_top3
    FROM d GROUP BY 1
    """,
    "brand leaderboard volatility: monthly revenue rank per brand, total "
    "absolute rank movement month-over-month, biggest jump, and months "
    "spent in the top 3 — the stability diagnostic behind 'is this "
    "leaderboard signal or noise'. The month×brand rollup contracts to "
    "≤ months·25 rows BEFORE any window (exact DECIMAL revenue, unique "
    "brand tie-break); both windows run on that contracted relation",
    ("relational", "window", "ranking"),
)
def q241(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    mb = (
        t.lineitem.join(
            t.orders.select("o_orderkey", "o_orderdate"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(
            t.part.select("p_partkey", "p_brand"),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .groupBy(
            F.date_trunc("month", "o_orderdate").alias("month"), "p_brand"
        )
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).alias(
                "rev"
            )
        )
    )
    wr = Window.partitionBy("month").orderBy(
        F.col("rev").desc(), "p_brand"
    )
    r = mb.select(
        "month", "p_brand", F.row_number().over(wr).alias("rnk")
    )
    wl = Window.partitionBy("p_brand").orderBy("month")
    d = r.select(
        "p_brand", "rnk", F.lag("rnk").over(wl).alias("prev")
    )
    move = F.abs(F.col("rnk") - F.col("prev"))
    return d.groupBy("p_brand").agg(
        F.count("prev").cast("bigint").alias("n_months"),
        F.sum(move).cast("bigint").alias("total_rank_moves"),
        F.max(move).cast("bigint").alias("max_jump"),
        F.count(F.when(F.col("rnk") <= 3, 1))
        .cast("bigint")
        .alias("months_in_top3"),
    )


@register(
    "q242_basket_size_economics",
    """
    WITH ob AS (
      SELECT l_orderkey, COUNT(*) AS n_lines,
             SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS rev
      FROM lineitem GROUP BY 1
    )
    SELECT CAST(n_lines AS BIGINT) AS n_lines,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(CAST(SUM(rev) AS DOUBLE), 6) AS revenue,
           ROUND(CAST(SUM(rev) AS DOUBLE) / COUNT(*), 6)
             AS avg_order_value
    FROM ob GROUP BY 1
    """,
    "basket-size economics: orders and revenue by lines-per-order — the "
    "distribution behind minimum-basket and bundling decisions (do "
    "7-line orders earn more per order than 1-line ones). One lineitem "
    "rollup contracts to one row per order, then a ≤7-cell histogram; "
    "exact DECIMAL sums, one IEEE division per cell",
    ("relational", "histogram", "operational"),
)
def q242(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    ob = t.lineitem.groupBy("l_orderkey").agg(
        F.count("*").alias("n_lines"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).alias("rev"),
    )
    return ob.groupBy(
        F.col("n_lines").cast("bigint").alias("n_lines")
    ).agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.round(F.sum("rev").cast("double"), 6).alias("revenue"),
        F.round(
            F.sum("rev").cast("double") / F.count("*"), 6
        ).alias("avg_order_value"),
    )


@register(
    "q243_brand_share_shift",
    """
    WITH half AS (
      SELECT p.p_brand,
             CASE WHEN EXTRACT(month FROM l.l_shipdate) <= 6
                  THEN 'H1' ELSE 'H2' END AS h,
             SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))) AS rev
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1, 2
    ),
    tot AS (SELECT h, SUM(rev) AS trev FROM half GROUP BY 1),
    sh AS (
      SELECT half.p_brand, half.h,
             CAST(half.rev AS DOUBLE) / CAST(tot.trev AS DOUBLE) AS share
      FROM half JOIN tot USING (h)
    )
    SELECT p_brand,
           ROUND(MAX(CASE WHEN h = 'H1' THEN share END), 6) AS h1_share,
           ROUND(MAX(CASE WHEN h = 'H2' THEN share END), 6) AS h2_share,
           ROUND(MAX(CASE WHEN h = 'H2' THEN share END)
                 - MAX(CASE WHEN h = 'H1' THEN share END), 6)
             AS share_shift
    FROM sh GROUP BY 1
    """,
    "seasonal brand share shift: each brand's revenue share in "
    "first-half vs second-half ship months and the delta — the "
    "mix-shift report behind assortment planning. The brand×half rollup "
    "contracts to ≤50 rows; the 2-row half totals broadcast back; shares "
    "are single IEEE divisions of exact DECIMAL sums, pivoted with "
    "conditional MAX",
    ("relational", "share", "pivot"),
)
def q243(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    half = (
        t.lineitem.join(
            t.part.select("p_partkey", "p_brand"),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .groupBy(
            "p_brand",
            F.when(F.month("l_shipdate") <= 6, "H1")
            .otherwise("H2")
            .alias("h"),
        )
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).alias(
                "rev"
            )
        )
    )
    # per-half total as a window over the |brands|·2-row aggregate instead
    # of a second aggregation + join-back that re-executed half's
    # lineitem⋈part lineage (the before-plan scanned both tables twice).
    # sum(rev) OVER the half partition is the same decimal total the join
    # attached; two schema-bounded partitions, no skew risk.
    sh = half.select(
        "p_brand",
        "h",
        (
            F.col("rev").cast("double")
            / F.sum("rev").over(Window.partitionBy("h")).cast("double")
        ).alias("share"),
    )
    h1 = F.max(F.when(F.col("h") == "H1", F.col("share")))
    h2 = F.max(F.when(F.col("h") == "H2", F.col("share")))
    return sh.groupBy("p_brand").agg(
        F.round(h1, 6).alias("h1_share"),
        F.round(h2, 6).alias("h2_share"),
        F.round(h2 - h1, 6).alias("share_shift"),
    )


@register(
    "q244_new_vs_returning_revenue",
    """
    WITH first_m AS (
      SELECT o_custkey,
             MIN(CAST(date_trunc('month', o_orderdate) AS DATE)) AS fm
      FROM orders GROUP BY 1
    ),
    m AS (
      SELECT CAST(date_trunc('month', o.o_orderdate) AS DATE) AS month,
             CASE WHEN CAST(date_trunc('month', o.o_orderdate) AS DATE) = f.fm
                  THEN 'new' ELSE 'returning' END AS cohort,
             CAST(o.o_totalprice AS DECIMAL(18,6)) AS rev
      FROM orders o JOIN first_m f ON f.o_custkey = o.o_custkey
    )
    SELECT month, cohort,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(CAST(SUM(rev) AS VARCHAR) AS DOUBLE) AS revenue
    FROM m GROUP BY 1, 2
    """,
    "new vs returning revenue per month: an order is 'new' when it lands "
    "in its customer's first-ever order month — the acquisition-vs-"
    "retention revenue split (q90's cohort retention counts users; this "
    "splits the money). The first-month rollup contracts orders to one "
    "row per customer, joined back on custkey; exact DECIMAL revenue, "
    "calendar-bounded output",
    ("relational", "cohort", "timeseries"),
)
def q244(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    # date_trunc returns TIMESTAMP in Spark but DATE in duckdb — pin DATE
    month = F.date_trunc("month", "o_orderdate").cast("date")
    first_m = t.orders.groupBy(F.col("o_custkey").alias("_ck")).agg(
        F.min(month).alias("fm")
    )
    m = t.orders.join(
        first_m, F.col("_ck") == F.col("o_custkey")
    ).select(
        month.alias("month"),
        F.when(month == F.col("fm"), "new")
        .otherwise("returning")
        .alias("cohort"),
        F.col("o_totalprice").cast("decimal(18,6)").alias("rev"),
    )
    return m.groupBy("month", "cohort").agg(
        F.count("*").cast("bigint").alias("n_orders"),
        # no in-engine 6dp round — see q235: at 4.4e9 monthly cells the
        # double's ulp (~5e-7) reaches the 6dp grid and the two engines'
        # round implementations pick different doubles; the driver
        # canonicalizer is the single rounder
        F.sum("rev").cast("double").alias("revenue"),
    )


@register(
    "q245_error_rate_wilson",
    """
    WITH h AS (
      SELECT CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour,
             COUNT(*) AS n,
             COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS e
      FROM events GROUP BY 1
    )
    SELECT hour, CAST(n AS BIGINT) AS n_events, CAST(e AS BIGINT) AS n_errors,
           ROUND(CAST(e AS DOUBLE) / n, 6) AS error_rate,
           ROUND((CAST(e AS DOUBLE) / n + 3.8416 / (2 * n)
                  - 1.96 * sqrt((CAST(e AS DOUBLE) / n)
                                * (1 - CAST(e AS DOUBLE) / n) / n
                                + 3.8416 / (4.0 * n * n)))
                 / (1 + 3.8416 / n), 6) AS wilson_lo,
           ROUND((CAST(e AS DOUBLE) / n + 3.8416 / (2 * n)
                  + 1.96 * sqrt((CAST(e AS DOUBLE) / n)
                                * (1 - CAST(e AS DOUBLE) / n) / n
                                + 3.8416 / (4.0 * n * n)))
                 / (1 + 3.8416 / n), 6) AS wilson_hi
    FROM h
    """,
    "error rate per hour-of-day with 95% Wilson score bounds — the SLO "
    "readout that distinguishes 'one bad hour' from 'a real regression' "
    "by carrying the denominator's uncertainty (q187's bootstrap is the "
    "resampling approach; Wilson is the closed form). 24 contracted "
    "cells; the interval is a fixed IEEE expression of exact integer "
    "counts evaluated identically on both engines (z=1.96, z²=3.8416 as "
    "literals)",
    ("relational", "operational", "statistics"),
)
def q245(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    h = t.events.groupBy(
        F.hour(F.col("ts").cast("timestamp")).cast("bigint").alias("hour")
    ).agg(
        F.count("*").alias("n"),
        F.count(F.when(F.col("event_type") == "error", 1)).alias("e"),
    )
    p = F.col("e").cast("double") / F.col("n")
    z2 = F.lit(3.8416)
    center = p + z2 / (2 * F.col("n"))
    rad = F.lit(1.96) * F.sqrt(
        p * (1 - p) / F.col("n")
        + z2 / (F.lit(4.0) * F.col("n") * F.col("n"))
    )
    denom = 1 + z2 / F.col("n")
    return h.select(
        "hour",
        F.col("n").cast("bigint").alias("n_events"),
        F.col("e").cast("bigint").alias("n_errors"),
        F.round(p, 6).alias("error_rate"),
        F.round((center - rad) / denom, 6).alias("wilson_lo"),
        F.round((center + rad) / denom, 6).alias("wilson_hi"),
    )


@register(
    "q247_returned_item_ranking",
    """
    SELECT c.c_custkey, c.c_name, n.n_name,
           ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))
                          * (1 - CAST(l.l_discount AS DECIMAL(18,6))))
                 AS DOUBLE), 2) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1996-07-01'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
    "TPC-H Q10 shape: top-20 customers by revenue lost to returned items "
    "in a two-quarter window — the returned-flag filter pushes to the "
    "lineitem scan, the date filter to the orders scan, nation broadcasts, "
    "revenue is the DECIMAL-exact order-independent sum, and the ranking "
    "is TakeOrdered-20 with the c_custkey tie-break",
    ("relational", "tpch", "join", "topk"),
)
def q247(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    rev = (
        F.col("l_extendedprice").cast("decimal(18,6)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(18,6)"))
    )
    return (
        t.lineitem.filter(F.col("l_returnflag") == "R")
        .join(
            t.orders.filter(
                (F.col("o_orderdate") >= "1996-01-01")
                & (F.col("o_orderdate") < "1996-07-01")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(t.nation),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(rev).cast("double"), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "q248_local_supplier_revenue",
    """
    SELECT n.n_name,
           ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))
                          * (1 - CAST(l.l_discount AS DECIMAL(18,6))))
                 AS DOUBLE), 2) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region rg ON n.n_regionkey = rg.r_regionkey
    WHERE rg.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1 ORDER BY revenue DESC
    """,
    "TPC-H Q5 shape: revenue by nation from LOCAL-supplier line items "
    "(customer and supplier share a nation) within one region and a "
    "two-year window — the classic 6-table snowflake join whose "
    "region/nation dims broadcast and whose c_nationkey = s_nationkey "
    "equality rides the supplier join as a residual conjunct; "
    "DECIMAL-exact revenue, deterministic order (revenue DESC over "
    "distinct per-nation sums)",
    ("relational", "tpch", "join"),
)
def q248(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    rev = (
        F.col("l_extendedprice").cast("decimal(18,6)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(18,6)"))
    )
    asia_nations = (
        t.nation.join(
            F.broadcast(t.region.filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        ).select("n_nationkey", "n_name")
    )
    return (
        t.lineitem.join(
            t.orders.filter(
                (F.col("o_orderdate") >= "1996-01-01")
                & (F.col("o_orderdate") < "1998-01-01")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            t.supplier,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(
            F.broadcast(asia_nations),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(F.round(F.sum(rev).cast("double"), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc())
    )


@register(
    "q249_order_value_icc",
    """
    WITH g AS (
      SELECT o_custkey, COUNT(*) AS n_i, AVG(o_totalprice) AS m_i,
             VAR_SAMP(o_totalprice) AS v_i
      FROM orders GROUP BY o_custkey
    ),
    tot AS (SELECT COUNT(*) AS n, AVG(o_totalprice) AS gm FROM orders),
    s AS (
      SELECT COUNT(*) AS a, SUM(n_i) AS n,
             SUM(n_i * (m_i - (SELECT gm FROM tot))
                     * (m_i - (SELECT gm FROM tot))) AS ssb,
             SUM(COALESCE(v_i, 0) * (n_i - 1)) AS ssw,
             SUM(CAST(n_i AS DOUBLE) * n_i) AS sn2
      FROM g
    )
    SELECT CAST(a AS BIGINT) AS n_customers,
           CAST(n AS BIGINT) AS n_orders,
           ROUND((ssb / NULLIF(a - 1, 0))
                 / NULLIF(ssw / NULLIF(n - a, 0), 0), 6) AS msb_msw_ratio,
           ROUND(((ssb / NULLIF(a - 1, 0)) - (ssw / NULLIF(n - a, 0)))
                 / NULLIF((ssb / NULLIF(a - 1, 0))
                    + (((n - sn2 / n) / NULLIF(a - 1, 0)) - 1)
                      * (ssw / NULLIF(n - a, 0)), 0),
                 6) AS icc
    FROM s
    """,
    "one-way random-effects variance decomposition (ANOVA / intraclass "
    "correlation) of order value by customer: between-group and "
    "within-group mean squares from per-customer (count, mean, variance) "
    "partials plus the unbalanced-design group-size correction "
    "k0 = (N - SUM(n_i^2)/N)/(a-1), ICC = (MSB-MSW)/(MSB+(k0-1)*MSW) — "
    "the statistic that decides whether per-customer or global modeling "
    "of order value is warranted. Two aggregations total (per-group, "
    "then global over a group frame), no windows; the grand mean is a "
    "broadcast scalar",
    ("relational", "stats"),
)
def q249(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    g = t.orders.groupBy("o_custkey").agg(
        F.count("*").alias("n_i"),
        F.avg("o_totalprice").alias("m_i"),
        F.var_samp("o_totalprice").alias("v_i"),
    )
    tot = t.orders.agg(F.avg("o_totalprice").alias("gm"))
    s = (
        g.crossJoin(F.broadcast(tot))
        .agg(
            F.count("*").alias("a"),
            F.sum("n_i").alias("n"),
            F.sum(
                F.col("n_i")
                * (F.col("m_i") - F.col("gm"))
                * (F.col("m_i") - F.col("gm"))
            ).alias("ssb"),
            F.sum(
                F.coalesce(F.col("v_i"), F.lit(0.0)) * (F.col("n_i") - 1)
            ).alias("ssw"),
            F.sum(F.col("n_i").cast("double") * F.col("n_i")).alias("sn2"),
        )
    )
    # degenerate-corpus guards (ADVICE r8): with one customer (a==1) or
    # one order per customer (n==a) the denominators are 0 — Spark's
    # non-ANSI divide would yield NULL while DuckDB's IEEE divide yields
    # inf/nan, so BOTH sides NULLIF the denominators (and the ICC
    # denominator) to agree on NULL for every degenerate shape
    am1 = F.nullif(F.col("a") - F.lit(1), F.lit(0))
    nma = F.nullif(F.col("n") - F.col("a"), F.lit(0))
    msb = F.col("ssb") / am1
    msw = F.col("ssw") / nma
    k0 = (F.col("n") - F.col("sn2") / F.col("n")) / am1
    return s.select(
        F.col("a").cast("bigint").alias("n_customers"),
        F.col("n").cast("bigint").alias("n_orders"),
        F.round(msb / F.nullif(msw, F.lit(0)), 6).alias("msb_msw_ratio"),
        F.round(
            (msb - msw) / F.nullif(msb + (k0 - 1) * msw, F.lit(0)), 6
        ).alias("icc"),
    )


@register(
    "q250_funnel_subsequences",
    """
    WITH seq AS (
      SELECT user_id, event_type, ts, event_id FROM events
      WHERE event_type IN ('view', 'click', 'purchase')
    ),
    s1 AS (
      SELECT *, COUNT(CASE WHEN event_type = 'view' THEN 1 END)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             AS views_before
      FROM seq
    ),
    s2 AS (
      SELECT *, COALESCE(
               SUM(CASE WHEN event_type = 'click' THEN views_before END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS pairs_before
      FROM s1
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN pairs_before
                    ELSE 0 END) AS BIGINT) AS n_paths
    FROM s2 GROUP BY user_id
    HAVING SUM(CASE WHEN event_type = 'purchase' THEN pairs_before
               ELSE 0 END) > 0
    ORDER BY n_paths DESC, user_id LIMIT 50
    """,
    "ordered-subsequence counting: per user, the number of "
    "view -> click -> purchase SUBSEQUENCES (not just first-occurrence "
    "funnels like q89 — every ordered triple counts), computed by the "
    "classic dynamic program as two stacked strictly-preceding window "
    "prefix sums (views before each click, view-click pairs before each "
    "purchase) — zero self-joins, so the work is linear in events where "
    "the naive triple join is cubic; top-50 with a total-order tie-break "
    "so the LIMIT is engine-stable",
    ("relational", "window", "funnel"),
)
def q250(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    seq = t.events.filter(
        F.col("event_type").isin("view", "click", "purchase")
    ).select("user_id", "event_type", "ts", "event_id")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    s1 = seq.withColumn(
        "views_before",
        F.count(F.when(F.col("event_type") == "view", 1)).over(w),
    )
    s2 = s1.withColumn(
        "pairs_before",
        F.coalesce(
            F.sum(
                F.when(F.col("event_type") == "click", F.col("views_before"))
            ).over(w),
            F.lit(0),
        ),
    )
    n_paths = F.sum(
        F.when(F.col("event_type") == "purchase", F.col("pairs_before"))
        .otherwise(0)
    )
    return (
        s2.groupBy("user_id")
        .agg(n_paths.alias("_np"))
        .filter(F.col("_np") > 0)
        .select(
            F.col("user_id").cast("bigint").alias("user_id"),
            F.col("_np").cast("bigint").alias("n_paths"),
        )
        .orderBy(F.col("n_paths").desc(), "user_id")
        .limit(50)
    )


@register(
    "q252_daily_ohlc",
    """
    WITH e AS (
      SELECT CAST(ts AS DATE) AS day, ts, event_id, value FROM events
      WHERE value IS NOT NULL
    ),
    r AS (
      SELECT *,
             row_number() OVER (PARTITION BY day
                                ORDER BY ts, event_id) AS rf,
             row_number() OVER (PARTITION BY day
                                ORDER BY ts DESC, event_id DESC) AS rl
      FROM e
    )
    SELECT day,
           ROUND(MAX(CASE WHEN rf = 1 THEN value END), 6) AS open,
           ROUND(MAX(value), 6) AS high,
           ROUND(MIN(value), 6) AS low,
           ROUND(MAX(CASE WHEN rl = 1 THEN value END), 6) AS close,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 2) AS volume
    FROM r GROUP BY day ORDER BY day
    """,
    "OHLC time-bucket aggregation (the financial candlestick rollup, and "
    "the general first/last-in-bucket pattern): per day, the OPEN (first "
    "value by (ts, event_id) — the composite order makes ties "
    "deterministic), HIGH/LOW, CLOSE (last value), count, and volume. "
    "Open/close come from rank-1 markers folded into the same "
    "aggregation as the min/max — one window pass + one groupBy, both "
    "partitioned by day, so no bucket ever funnels through a global "
    "sort; days are calendar-bounded at any corpus scale",
    ("relational", "timeseries", "window"),
)
def q252(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    e = t.events.filter(F.col("value").isNotNull()).select(
        F.col("ts").cast("timestamp").cast("date").alias("day"),
        "ts",
        "event_id",
        "value",
    )
    w_f = Window.partitionBy("day").orderBy("ts", "event_id")
    w_l = Window.partitionBy("day").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    r = e.withColumn("rf", F.row_number().over(w_f)).withColumn(
        "rl", F.row_number().over(w_l)
    )
    return (
        r.groupBy("day")
        .agg(
            F.round(
                F.max(F.when(F.col("rf") == 1, F.col("value"))), 6
            ).alias("open"),
            F.round(F.max("value"), 6).alias("high"),
            F.round(F.min("value"), 6).alias("low"),
            F.round(
                F.max(F.when(F.col("rl") == 1, F.col("value"))), 6
            ).alias("close"),
            F.count("*").cast("bigint").alias("n_events"),
            F.round(F.sum("value"), 2).alias("volume"),
        )
        .orderBy("day")
    )


@register(
    "q253_median_polish",
    """
    WITH cells AS (
      SELECT n.n_name AS nation,
             CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) * 10
               + CAST(EXTRACT(quarter FROM o.o_orderdate) AS BIGINT)
               AS qtr,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
               AS v
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1, 2
    ),
    s1r AS (SELECT nation, quantile_cont(v, 0.5) AS m FROM cells GROUP BY 1),
    p1 AS (SELECT c.nation, c.qtr, c.v - s1r.m AS v, s1r.m AS re
           FROM cells c JOIN s1r ON s1r.nation = c.nation),
    s1c AS (SELECT qtr, quantile_cont(v, 0.5) AS m FROM p1 GROUP BY 1),
    p2 AS (SELECT p1.nation, p1.qtr, p1.v - s1c.m AS v, p1.re, s1c.m AS ce
           FROM p1 JOIN s1c ON s1c.qtr = p1.qtr),
    s2r AS (SELECT nation, quantile_cont(v, 0.5) AS m FROM p2 GROUP BY 1),
    p3 AS (SELECT p2.nation, p2.qtr, p2.v - s2r.m AS v,
                  p2.re + s2r.m AS re, p2.ce
           FROM p2 JOIN s2r ON s2r.nation = p2.nation),
    s2c AS (SELECT qtr, quantile_cont(v, 0.5) AS m FROM p3 GROUP BY 1),
    p4 AS (SELECT p3.nation, p3.qtr, p3.v - s2c.m AS v,
                  p3.re, p3.ce + s2c.m AS ce
           FROM p3 JOIN s2c ON s2c.qtr = p3.qtr)
    SELECT nation, qtr,
           ROUND(re, 6) AS nation_effect,
           ROUND(ce, 6) AS quarter_effect,
           ROUND(v, 6) AS residual
    FROM p4
    ORDER BY ABS(ROUND(v, 6)) DESC, nation, qtr LIMIT 15
    """,
    "Tukey MEDIAN POLISH of the nation x quarter revenue matrix: two "
    "unrolled row/column sweeps subtract per-row then per-column medians "
    "(quantile_cont interpolation on both engines) from the contracted "
    "cell matrix, accumulating nation and quarter effects; output is the "
    "15 largest-|residual| cells — the robust two-way decomposition that "
    "surfaces nation-quarter interactions additive effects can't "
    "explain. The matrix is CONTRACTED before any median (<=25 nations x "
    "calendar quarters at ANY corpus scale), so every sweep is a "
    "broadcast join over ~700 rows; the only data-sized work is the "
    "initial rollup",
    ("relational", "stats", "robust"),
)
def q253(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    cells = (
        t.orders.join(
            t.customer, F.col("o_custkey") == F.col("c_custkey")
        )
        .join(
            F.broadcast(t.nation),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(
            F.col("n_name").alias("nation"),
            (
                F.year("o_orderdate").cast("bigint") * 10
                + F.quarter("o_orderdate").cast("bigint")
            ).alias("qtr"),
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
            .cast("double")
            .alias("v")
        )
        .withColumn("re", F.lit(0.0))
        .withColumn("ce", F.lit(0.0))
        # nation x quarter cells are schema/calendar-bounded (~700 rows);
        # without this cut each sweep below consumes its input twice
        # (median + join-back) and the corpus join's lineage re-executes
        # up to 2^4 times across the four unrolled sweeps
        .localCheckpoint(eager=False)
    )

    def sweep(df, key, eff_col):
        med = df.groupBy(key).agg(
            F.percentile("v", F.lit(0.5)).alias("_m")
        )
        return (
            df.join(F.broadcast(med), key)
            .withColumn("v", F.col("v") - F.col("_m"))
            .withColumn(eff_col, F.col(eff_col) + F.col("_m"))
            .drop("_m")
            .localCheckpoint(eager=False)
        )

    out = cells
    for _ in range(2):  # two row/column sweeps, unrolled
        out = sweep(out, "nation", "re")
        out = sweep(out, "qtr", "ce")
    return (
        out.select(
            "nation",
            "qtr",
            F.round("re", 6).alias("nation_effect"),
            F.round("ce", 6).alias("quarter_effect"),
            F.round("v", 6).alias("residual"),
        )
        .orderBy(F.abs(F.col("residual")).desc(), "nation", "qtr")
        .limit(15)
    )
