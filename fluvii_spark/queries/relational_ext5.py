"""Extended inventory, batch 5 (q121+): order-statistic analytics done with
distributed-safe shapes — skyline via windowed dominance pruning, sweep-line
interval concurrency, distributed exact ranking (Gini), quantile-boundary
histograms, SCD2 version folding, weighted medians, attribution and
profiling.

No counterpart in the reference (a Kafka client library — SURVEY.md §2.2);
these extend the classic relational surface with the order-statistic /
reporting queries an analytics engine is expected to answer, each shaped so
the expensive pass is a hash aggregate or a key-partitioned window, never a
single-task global window over raw data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fluvii_spark.io.readers import load_tables
from fluvii_spark.queries import register


def _skyline_prune(df: DataFrame, part_cols: list[str]) -> DataFrame:
    """Remove points dominated within each ``part_cols`` group.

    Frontier = maximize p_size, minimize p_retailprice. Two range-frame
    windows replace the quadratic NOT-EXISTS:
    - ``max(p_size)`` over price <= current (peers incl.): if it exceeds the
      row's size, a cheaper-or-equal point is strictly taller → dominated;
    - ``min(p_retailprice)`` over size >= current (peers incl.): if it
      undercuts the row's price, a taller-or-equal point is strictly
      cheaper → dominated.
    Together these cover exactly the dominance definition (one strict, one
    non-strict inequality). With ``part_cols`` the prune is local (sound:
    only dominated rows are removed); with ``part_cols=[]`` it is the exact
    global filter.
    """
    w_price = (
        Window.partitionBy(*part_cols)
        .orderBy("p_retailprice")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_size = (
        Window.partitionBy(*part_cols)
        .orderBy(F.desc("p_size"))
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        df.withColumn("_max_sz", F.max("p_size").over(w_price))
        .withColumn("_min_pr", F.min("p_retailprice").over(w_size))
        .filter(
            ~(
                (F.col("_max_sz") > F.col("p_size"))
                | (F.col("_min_pr") < F.col("p_retailprice"))
            )
        )
        .drop("_max_sz", "_min_pr")
    )
    return out


@register(
    "q121_skyline",
    """
    SELECT p.p_partkey, p.p_size, p.p_retailprice
    FROM part p
    WHERE NOT EXISTS (
      SELECT 1 FROM part q
      WHERE q.p_size >= p.p_size AND q.p_retailprice <= p.p_retailprice
        AND (q.p_size > p.p_size OR q.p_retailprice < p.p_retailprice)
    )
    """,
    "skyline / Pareto frontier (maximize p_size, minimize p_retailprice) "
    "WITHOUT the quadratic NOT-EXISTS self-join: phase 1 prunes dominated "
    "points inside 16 hash-salted groups (key-partitioned windows, fully "
    "parallel — local skylines are supersets of the global one), phase 2 "
    "runs the same two range-frame windows globally on the tiny survivor "
    "set. The O(n²) work the oracle does becomes O(n log n) distributed",
    ("relational", "skyline", "window"),
)
def q121(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    pts = t.part.select("p_partkey", "p_size", "p_retailprice")
    local = _skyline_prune(
        pts.withColumn("salt", F.pmod(F.xxhash64("p_partkey"), F.lit(16))),
        ["salt"],
    ).drop("salt")
    return _skyline_prune(local, [])


@register(
    "q122_max_concurrent",
    """
    WITH pts AS (
      SELECT event_type, ts AS t, 1 AS delta FROM events
      UNION ALL
      SELECT event_type, ts + INTERVAL 30 MINUTE, -1 FROM events
    ),
    run AS (
      SELECT event_type,
             SUM(delta) OVER (
               PARTITION BY event_type ORDER BY t, delta
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc
      FROM pts
    )
    SELECT event_type, CAST(MAX(conc) AS BIGINT) AS max_concurrent
    FROM run GROUP BY event_type
    """,
    "sweep-line max-concurrency: each event opens a half-open 30-min "
    "interval [ts, ts+30m); +1/-1 boundary points, running sum, max. Ends "
    "sort before starts at the same instant (delta ASC) so touching "
    "intervals don't overlap. TWO-LEVEL decomposition (segment-tree "
    "style): per (type, hour-bucket) local running max + bucket delta-sum "
    "run in parallel across buckets, then the prefix runs over the tiny "
    "(type, bucket) relation — max_conc = max over buckets of "
    "(prefix-before-bucket + local max). The oracle's one-window-per-type "
    "form would put billions of boundary points through |types| tasks at "
    "scale; the decomposition is exact integer arithmetic",
    ("relational", "timeseries", "window"),
)
def q122(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    ev = t.events
    starts = ev.select(
        "event_type", F.col("ts").alias("t"), F.lit(1).alias("delta")
    )
    ends = ev.select(
        "event_type",
        F.expr("ts + INTERVAL 30 MINUTE").alias("t"),
        F.lit(-1).alias("delta"),
    )
    pts = starts.unionByName(ends).withColumn(
        "bucket", F.date_trunc("hour", "t")
    )
    w_local = (
        Window.partitionBy("event_type", "bucket")
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = pts.withColumn("run", F.sum("delta").over(w_local))
    per_bucket = local.groupBy("event_type", "bucket").agg(
        F.max("run").alias("local_max"), F.sum("delta").alias("bucket_sum")
    )
    w_prefix = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    capped = per_bucket.withColumn(
        "prefix", F.coalesce(F.sum("bucket_sum").over(w_prefix), F.lit(0))
    )
    return capped.groupBy("event_type").agg(
        F.max(F.col("prefix") + F.col("local_max"))
        .cast("bigint")
        .alias("max_concurrent")
    )


@register(
    "q123_markov_transitions",
    """
    WITH seq AS (
      SELECT event_type AS from_type,
             LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS to_type
      FROM events
    ),
    tr AS (
      SELECT from_type, to_type, COUNT(*) AS n
      FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2
    )
    SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
           ROUND(CAST(n AS DOUBLE) /
                 CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE),
                 6) AS share
    FROM tr
    """,
    "first-order Markov transition matrix of the event stream: lead() per "
    "user gives (state, next-state) pairs in one key-partitioned window "
    "pass; transition shares normalize over the 5x5 aggregated relation, "
    "not the raw stream",
    ("relational", "window", "timeseries"),
)
def q123(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = t.events.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    )
    tr = (
        seq.filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").alias("n"))
    )
    wt = Window.partitionBy("from_type")
    return tr.select(
        "from_type",
        "to_type",
        F.col("n").cast("bigint").alias("n"),
        F.round(
            F.col("n").cast("double") / F.sum("n").over(wt).cast("double"), 6
        ).alias("share"),
    )


_NBUCKETS = 8


@register(
    "q124_equi_depth_histogram",
    f"""
    WITH rk AS (
      SELECT l_extendedprice AS x,
             NTILE({_NBUCKETS}) OVER (
               ORDER BY l_extendedprice, l_orderkey, l_linenumber
             ) AS bucket
      FROM lineitem
    )
    SELECT CAST(bucket AS BIGINT) AS bucket, COUNT(*) AS n,
           MIN(x) AS min_x, MAX(x) AS max_x,
           CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) AS sum_x
    FROM rk GROUP BY bucket
    """,
    "equi-depth histogram as EXACT NTILE(8) depths derived arithmetically "
    "from the distributed global rank (operators/ranking.py "
    "distributed_row_number: range-repartition + local rank + broadcast "
    "prefix offsets) — r5 rewrite of the two-pass boundary-interpolation "
    "form: ONE lineitem pass, no boundary crossJoin, no single-task NTILE "
    "window (the oracle's NTILE is the single-node semantics being "
    "reproduced, not the plan). The (x, l_orderkey, l_linenumber) "
    "tie-break makes bucket membership deterministic when equal prices "
    "straddle a depth boundary; the standard NTILE remainder rule (first "
    "n MOD 8 buckets take the extra row) is replicated exactly in the "
    "rank arithmetic",
    ("relational", "stats", "histogram"),
)
def q124(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fluvii_spark.operators.ranking import distributed_row_number

    t = load_tables(spark, sf_dir)
    ranked = distributed_row_number(
        t.lineitem.select(
            F.col("l_extendedprice").alias("x"), "l_orderkey", "l_linenumber"
        ),
        ["x", "l_orderkey", "l_linenumber"],
        out_col="rnk",
    )
    # 1-row total over the checkpointed ranked relation, broadcast back —
    # never an eager count() at plan-build
    tot = ranked.agg(F.count("*").alias("n_tot"))
    k = _NBUCKETS
    asn = ranked.crossJoin(F.broadcast(tot)).select(
        "x",
        # NTILE(k) from the global rank: q = n DIV k rows per bucket,
        # the first rem = n MOD k buckets hold one extra row
        F.expr(
            f"CAST(CASE WHEN rnk <= (n_tot % {k}) * (n_tot DIV {k} + 1) "
            f"THEN (rnk - 1) DIV (n_tot DIV {k} + 1) + 1 "
            f"ELSE n_tot % {k} + (rnk - (n_tot % {k}) * (n_tot DIV {k} + 1) - 1) "
            f"DIV (n_tot DIV {k}) + 1 END AS BIGINT)"
        ).alias("bucket"),
    )
    return asn.groupBy("bucket").agg(
        F.count("*").alias("n"),
        F.min("x").alias("min_x"),
        F.max("x").alias("max_x"),
        F.expr("CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)").alias("sum_x"),
    )


@register(
    "q125_gini_revenue",
    """
    WITH rev AS (
      SELECT o_custkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2))
               AS rev
      FROM orders GROUP BY o_custkey
    ),
    rk AS (
      SELECT rev,
             ROW_NUMBER() OVER (ORDER BY rev, o_custkey) AS rnk
      FROM rev
    ),
    agg AS (
      SELECT COUNT(*) AS n, SUM(rev) AS tot,
             SUM(CAST(rnk AS DECIMAL(12,0)) * rev) AS s
      FROM rk
    )
    SELECT CAST(n AS BIGINT) AS n_customers,
           CAST(tot AS DOUBLE) AS total_revenue,
           ROUND(CAST(2*s - (CAST(n AS DECIMAL(12,0)) + 1) * tot AS DOUBLE)
                 / (n * CAST(tot AS DOUBLE)), 6) AS gini
    FROM agg
    """,
    "Gini coefficient of per-customer revenue via DISTRIBUTED exact "
    "ranking: repartitionByRange on (rev, custkey) gives range-disjoint "
    "partitions in partition-id order, row_number runs per partition "
    "(parallel), and the global rank = local rank + broadcast prefix "
    "offsets — the oracle's single-task global ROW_NUMBER never happens. "
    "Final rank values are invariant to where the sampled range boundaries "
    "land, so the plan is deterministic; all money stays DECIMAL until the "
    "final division",
    ("relational", "stats", "window"),
)
def q125(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fluvii_spark.operators.ranking import distributed_row_number

    t = load_tables(spark, sf_dir)
    rev = t.orders.groupBy("o_custkey").agg(
        F.expr(
            "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2))"
        ).alias("rev")
    )
    ranked = distributed_row_number(rev, ["rev", "o_custkey"])
    agg = ranked.agg(
        F.count("*").alias("n"),
        F.sum("rev").alias("tot"),
        F.expr("SUM(CAST(rnk AS DECIMAL(12,0)) * rev)").alias("s"),
    )
    return agg.select(
        F.col("n").cast("bigint").alias("n_customers"),
        F.col("tot").cast("double").alias("total_revenue"),
        F.round(
            F.expr(
                "CAST(2*s - (CAST(n AS DECIMAL(12,0)) + 1) * tot AS DOUBLE)"
            )
            / (F.col("n") * F.col("tot").cast("double")),
            6,
        ).alias("gini"),
    )


@register(
    "q126_scd2_versions",
    """
    WITH c AS (
      SELECT user_id, event_id, ts,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events WHERE event_type = 'click'
    ),
    d AS (
      SELECT *, LAG(k) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS pk
      FROM c
    ),
    v AS (
      SELECT user_id, event_id, ts, k
      FROM d WHERE pk IS NULL OR k <> pk
    ),
    r AS (
      SELECT user_id, ts, k,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn,
             COUNT(*) OVER (PARTITION BY user_id) AS nv
      FROM v
    )
    SELECT user_id, CAST(nv AS BIGINT) AS n_versions,
           k AS current_k, ts AS current_from
    FROM r WHERE rn = 1
    """,
    "SCD type-2 dimension fold from a change stream: per-user click "
    "events carry attribute k (JSON props); consecutive repeats collapse "
    "(lag() inequality), survivors are the version history, and the "
    "top-1-per-key window surfaces the current version + version count. "
    "All windows are key-partitioned — the CDC-to-dimension shape at any "
    "scale",
    ("relational", "scd", "window"),
)
def q126(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    c = t.events.filter(F.col("event_type") == "click").select(
        "user_id",
        "event_id",
        "ts",
        F.get_json_object("props", "$.k").cast("bigint").alias("k"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    d = c.withColumn("pk", F.lag("k").over(w))
    v = d.filter(F.col("pk").isNull() | (F.col("k") != F.col("pk")))
    # current version + count as ONE hash aggregation: max(struct) over
    # (ts, event_id) — unique within a user, so it selects exactly the
    # desc-window's rn=1 row — with map-side partial aggregation instead
    # of a second sort window over the survivors (and the groupBy can
    # reuse the lag window's user_id partitioning)
    r = v.groupBy("user_id").agg(
        F.count("*").alias("nv"),
        F.max(F.struct("ts", "event_id", "k")).alias("_m"),
    )
    return r.select(
        "user_id",
        F.col("nv").cast("bigint").alias("n_versions"),
        F.col("_m.k").alias("current_k"),
        F.col("_m.ts").alias("current_from"),
    )


@register(
    "q127_weighted_median",
    """
    WITH w AS (
      SELECT l_returnflag, l_quantity, l_orderkey, l_linenumber,
             CAST(l_extendedprice AS DECIMAL(18,2)) AS wt
      FROM lineitem
    ),
    c AS (
      SELECT l_returnflag, l_quantity,
             SUM(wt) OVER (PARTITION BY l_returnflag
                           ORDER BY l_quantity, l_orderkey, l_linenumber
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cumw,
             SUM(wt) OVER (PARTITION BY l_returnflag) AS tot
      FROM w
    )
    SELECT l_returnflag, MIN(l_quantity) AS weighted_median
    FROM c WHERE 2 * cumw >= tot
    GROUP BY l_returnflag
    """,
    "weighted median (weight = extended price) per return flag — "
    "CONTRACTED before the window: per-(flag, quantity) DECIMAL weight "
    "sums are one map-side-combinable hash aggregate over the raw table, "
    "and the cumulative-weight crossing then runs over <= |flags|x|50 "
    "distinct quantities| rows (the oracle's row-level window would put "
    "billions of rows through 3 window tasks at scale). The crossing "
    "group's min quantity equals the row-level answer exactly, and "
    "weights stay DECIMAL so the 2*cumw >= tot predicate cannot "
    "float-flip between engines",
    ("relational", "stats", "window"),
)
def q127(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    g = t.lineitem.groupBy("l_returnflag", "l_quantity").agg(
        F.expr(
            "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(28,2))"
        ).alias("wt")
    )
    w_cum = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_quantity")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy("l_returnflag")
    c = g.select(
        "l_returnflag",
        "l_quantity",
        F.sum("wt").over(w_cum).alias("cumw"),
        F.sum("wt").over(w_tot).alias("tot"),
    )
    return (
        c.filter(F.lit(2) * F.col("cumw") >= F.col("tot"))
        .groupBy("l_returnflag")
        .agg(F.min("l_quantity").alias("weighted_median"))
    )


@register(
    "q128_mom_growth",
    """
    WITH m AS (
      SELECT c.c_mktsegment,
             CAST(date_trunc('month', o.o_orderdate) AS DATE) AS month,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    )
    SELECT c_mktsegment, month, revenue,
           ROUND((revenue - LAG(revenue) OVER
                    (PARTITION BY c_mktsegment ORDER BY month))
                 / LAG(revenue) OVER
                    (PARTITION BY c_mktsegment ORDER BY month) * 100,
                 6) AS mom_pct
    FROM m
    """,
    "month-over-month growth per market segment: broadcast dim join, "
    "monthly DECIMAL revenue rollup, lag() on the aggregated (segment, "
    "month) relation — the window sees |segments|x|months| rows, never "
    "raw orders",
    ("relational", "timeseries", "window"),
)
def q128(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    m = (
        t.orders.join(
            F.broadcast(t.customer.select("c_custkey", "c_mktsegment")),
            t.orders.o_custkey == F.col("c_custkey"),
        )
        .groupBy(
            "c_mktsegment",
            F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
        )
        .agg(
            F.expr(
                "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)"
            ).alias("revenue")
        )
    )
    w = Window.partitionBy("c_mktsegment").orderBy("month")
    prev = F.lag("revenue").over(w)
    return m.select(
        "c_mktsegment",
        "month",
        "revenue",
        F.round((F.col("revenue") - prev) / prev * 100, 6).alias("mom_pct"),
    )


@register(
    "q129_chi2_contingency",
    """
    WITH cells AS (
      SELECT event_type, (value < 0) AS neg, COUNT(*) AS o
      FROM events GROUP BY 1, 2
    ),
    tot AS (SELECT CAST(SUM(o) AS DOUBLE) AS n FROM cells),
    rt AS (SELECT event_type, CAST(SUM(o) AS DOUBLE) AS r
           FROM cells GROUP BY 1),
    ct AS (SELECT neg, CAST(SUM(o) AS DOUBLE) AS c FROM cells GROUP BY 1)
    SELECT ROUND(SUM((o - r*c/n) * (o - r*c/n) / (r*c/n)), 6) AS chi2,
           CAST((COUNT(DISTINCT cells.event_type) - 1)
                * (COUNT(DISTINCT cells.neg) - 1) AS BIGINT) AS dof
    FROM cells JOIN rt USING (event_type) JOIN ct USING (neg), tot
    """,
    "chi-square independence statistic for event_type x sign(value): one "
    "hash aggregate builds the contingency cells, expected counts come "
    "from broadcast row/column totals, the statistic sums over the 10-cell "
    "aggregated relation. Squares written as products (no libm pow) so "
    "both engines run identical IEEE ops",
    ("relational", "stats"),
)
def q129(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    # ONE linear pipeline (r12, VERDICT #2): row/column/grand totals
    # attach to the |types|×2 cells relation as WINDOWS instead of three
    # aggregate branches + two broadcast joins + a crossJoin over a
    # checkpoint (r11's form — the barrier serialized
    # materialize-then-consume under the concurrent bench). The window
    # exchanges move ≤ 2·|types| rows — schema-bounded at any corpus
    # scale (the global window's single task sees the same bounded
    # relation the old 1-row crossJoin did). Same per-row r/c/n values,
    # same final sum. Interleaved low-steal A/B: sf0.1 0.63–0.67 s vs
    # 0.77–0.94 checkpointed; g10-ms best 0.95 vs 1.43.
    cells = t.events.groupBy(
        "event_type", (F.col("value") < 0).alias("neg")
    ).agg(F.count("*").alias("o"))
    joined = (
        cells.withColumn(
            "r",
            F.sum("o").over(Window.partitionBy("event_type")).cast("double"),
        )
        .withColumn(
            "c", F.sum("o").over(Window.partitionBy("neg")).cast("double")
        )
        .withColumn(
            "n", F.sum("o").over(Window.partitionBy()).cast("double")
        )
    )
    e = F.col("r") * F.col("c") / F.col("n")
    return joined.agg(
        F.round(F.sum((F.col("o") - e) * (F.col("o") - e) / e), 6).alias(
            "chi2"
        ),
        (
            (F.count_distinct("event_type") - 1)
            * (F.count_distinct("neg") - 1)
        ).cast("bigint").alias("dof"),
    )


@register(
    "q130_first_touch_attribution",
    """
    WITH f AS (
      SELECT user_id, event_type, ts, event_id,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS rn
      FROM events
    ),
    per_user AS (
      SELECT user_id,
             MAX(CASE WHEN rn = 1 THEN event_type END) AS first_type,
             MAX(CASE WHEN rn > 1 AND event_type = 'purchase'
                      THEN 1 ELSE 0 END) AS converted
      FROM f GROUP BY user_id
    )
    SELECT first_type, COUNT(*) AS n_users,
           CAST(SUM(converted) AS BIGINT) AS n_converted,
           ROUND(CAST(SUM(converted) AS DOUBLE) / COUNT(*), 6)
             AS conversion_rate
    FROM per_user GROUP BY first_type
    """,
    "first-touch attribution: the acquisition channel is each user's "
    "first event (row_number = 1), conversion = any purchase strictly "
    "after it. ONE scan, one key-partitioned window, two hash aggregates "
    "— no self-join of the event stream against itself",
    ("relational", "funnel", "window"),
)
def q130(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    f = t.events.select(
        "user_id", "event_type", F.row_number().over(w).alias("rn")
    )
    per_user = f.groupBy("user_id").agg(
        F.max(F.when(F.col("rn") == 1, F.col("event_type"))).alias(
            "first_type"
        ),
        F.max(
            F.when(
                (F.col("rn") > 1) & (F.col("event_type") == "purchase"), 1
            ).otherwise(0)
        ).alias("converted"),
    )
    return per_user.groupBy("first_type").agg(
        F.count("*").alias("n_users"),
        F.sum("converted").cast("bigint").alias("n_converted"),
        F.round(
            F.sum("converted").cast("double") / F.count("*"), 6
        ).alias("conversion_rate"),
    )


@register(
    "q131_group_split_integrity",
    """
    WITH s AS (
      SELECT event_type, user_id,
             CASE WHEN (('0x' || substr(md5('split_' || CAST(user_id AS VARCHAR)),
                                        1, 8))::BIGINT % 10) < 8
                  THEN 'train' ELSE 'test' END AS split
      FROM events
    )
    SELECT split, event_type, COUNT(*) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM s GROUP BY 1, 2
    """,
    "group-aware (leakage-free) train/test split: the 80/20 hash is on "
    "user_id, NOT on the event row, so no user straddles the boundary — "
    "the split an ML pipeline must use when rows of one entity are "
    "correlated. md5-derived, no rand(): reproducible across engines, "
    "reruns, and cluster sizes",
    ("relational", "sampling", "llm"),
)
def q131(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    bucket = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("split_"), F.col("user_id").cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint") % 10
    s = t.events.select(
        "event_type",
        "user_id",
        F.when(bucket < 8, "train").otherwise("test").alias("split"),
    )
    return s.groupBy("split", "event_type").agg(
        F.count("*").alias("n_events"),
        F.count_distinct("user_id").cast("bigint").alias("n_users"),
    )


@register(
    "q132_data_profile",
    """
    SELECT COUNT(*) AS n_rows,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
           CAST(SUM(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_neg_value,
           ROUND(CAST(SUM(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS pct_neg,
           CAST(SUM(CASE WHEN props IS NULL OR props = '' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_null_props,
           MIN(ts) AS min_ts, MAX(ts) AS max_ts
    FROM events
    """,
    "single-pass data-quality profile: row/entity/domain cardinalities, "
    "negative-value share, null/blank props, timestamp bounds — all "
    "conditional aggregates in ONE scan (the profiling query every "
    "ingestion pipeline runs before training); distinct counts expand to "
    "partial aggs, everything else is map-side foldable",
    ("relational", "profile", "quality"),
)
def q132(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    neg = F.when(F.col("value") < 0, 1).otherwise(0)
    nullp = F.when(
        F.col("props").isNull() | (F.col("props") == ""), 1
    ).otherwise(0)
    return t.events.agg(
        F.count("*").alias("n_rows"),
        F.count_distinct("user_id").cast("bigint").alias("n_users"),
        F.count_distinct("event_type").cast("bigint").alias("n_types"),
        F.sum(neg).cast("bigint").alias("n_neg_value"),
        F.round(F.sum(neg).cast("double") / F.count("*"), 6).alias("pct_neg"),
        F.sum(nullp).cast("bigint").alias("n_null_props"),
        F.min("ts").alias("min_ts"),
        F.max("ts").alias("max_ts"),
    )


@register(
    "q133_new_user_curve",
    """
    WITH fs AS (
      SELECT user_id, MIN(ts) AS first_ts FROM events GROUP BY user_id
    ),
    daily AS (
      SELECT CAST(date_trunc('day', first_ts) AS DATE) AS day,
             COUNT(*) AS new_users
      FROM fs GROUP BY 1
    )
    SELECT day, CAST(new_users AS BIGINT) AS new_users,
           CAST(SUM(new_users) OVER (
             ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS cum_users
    FROM daily
    """,
    "distinct-growth curve: first-seen day per user (one hash agg), daily "
    "new-user counts, cumulative sum. The only global window runs over the "
    "~|days| aggregated relation (30 rows), the raw stream is touched once",
    ("relational", "timeseries"),
)
def q133(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    fs = t.events.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    daily = fs.groupBy(
        F.date_trunc("day", "first_ts").cast("date").alias("day")
    ).agg(F.count("*").alias("new_users"))
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return daily.select(
        "day",
        F.col("new_users").cast("bigint").alias("new_users"),
        F.sum("new_users").over(w).cast("bigint").alias("cum_users"),
    )


@register(
    "q144_decayed_engagement",
    """
    WITH mx AS (SELECT MAX(ts) AS max_ts FROM events),
    w AS (
      SELECT user_id,
             CAST(ROUND(value / (1 + date_diff('day', CAST(ts AS DATE),
                                               CAST(max_ts AS DATE))), 9)
                  AS DECIMAL(20,10)) AS contrib
      FROM events, mx
    )
    SELECT user_id, ROUND(CAST(SUM(contrib) AS DOUBLE), 6) AS score
    FROM w GROUP BY user_id
    """,
    "recency-weighted engagement score: rational hyperbolic decay "
    "1/(1+days-ago) — integer day arithmetic, no libm pow/exp — applied "
    "in one scan against a broadcast 1-row max-timestamp aggregate; "
    "per-row contributions round to 9dp DECIMAL so the per-user sum is "
    "order-independent (exact) on both engines",
    ("relational", "timeseries", "stats"),
)
def q144(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    mx = t.events.agg(F.max("ts").alias("max_ts"))
    w = t.events.crossJoin(F.broadcast(mx)).select(
        "user_id",
        F.round(
            F.col("value")
            / (
                F.lit(1)
                + F.datediff(
                    F.col("max_ts").cast("date"), F.col("ts").cast("date")
                )
            ),
            9,
        )
        .cast("decimal(20,10)")
        .alias("contrib"),
    )
    return w.groupBy("user_id").agg(
        F.round(F.sum("contrib").cast("double"), 6).alias("score")
    )


@register(
    "q145_interval_merge",
    """
    WITH iv AS (
      SELECT user_id, event_id, ts AS s,
             ts + INTERVAL 30 MINUTE AS e
      FROM events
    ),
    o AS (
      SELECT user_id, event_id, s, e,
             MAX(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS pmax
      FROM iv
    ),
    isl AS (
      SELECT user_id, s, e,
             SUM(CASE WHEN pmax IS NULL OR s >= pmax THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY s, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS isl_id
      FROM o
    ),
    g AS (
      SELECT user_id, isl_id, MIN(s) AS s0, MAX(e) AS e1
      FROM isl GROUP BY 1, 2
    )
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_merged,
           CAST(SUM(date_diff('microsecond', s0, e1)) AS BIGINT)
             AS covered_us
    FROM g GROUP BY user_id
    """,
    "interval coalescing (union length): merge each user's overlapping "
    "half-open 30-min activity intervals into maximal islands — new island "
    "iff the start reaches the running max end (strict overlap merges, "
    "touching does not) — then count islands and sum exact integer-µs "
    "covered time. Two key-partitioned window passes + one agg; the "
    "O(n²) interval self-join never happens",
    ("relational", "timeseries", "window"),
)
def q145(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    iv = t.events.select(
        "user_id",
        "event_id",
        F.col("ts").alias("s"),
        F.expr("ts + INTERVAL 30 MINUTE").alias("e"),
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    o = iv.withColumn("pmax", F.max("e").over(w_prev))
    w_cum = (
        Window.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    new_isl = F.when(
        F.col("pmax").isNull() | (F.col("s") >= F.col("pmax")), 1
    ).otherwise(0)
    isl = o.withColumn("isl_id", F.sum(new_isl).over(w_cum))
    g = isl.groupBy("user_id", "isl_id").agg(
        F.min("s").alias("s0"), F.max("e").alias("e1")
    )
    return g.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_merged"),
        F.sum(F.expr("timestampdiff(MICROSECOND, s0, e1)"))
        .cast("bigint")
        .alias("covered_us"),
    )
