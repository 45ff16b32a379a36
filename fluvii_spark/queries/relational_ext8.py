"""Round-5 relational additions (q195-q213 except q200/q203/q209/q211/
q212 in llm4): sliding-window distinct counting, quantile-bucket
mobility, join-key skew auditing, graph analytics (triangles, PageRank,
degree power-law), market-basket rules, path mining, time-series
diagnostics (ACF, change-point, Theil-Sen robust trend), multi-touch
attribution, latency quantiles, and lossless HLL sketch merging —
operational analytics over the star schema with the package's
determinism rules (DECIMAL money, exact integer moment cores with one
final IEEE division, boundary comparisons on 6-dp-rounded values,
unique tie-breaks on every rank/top-k).
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fluvii_spark.io.readers import load_tables
from fluvii_spark.queries import register

# Shared graph relations, memoized per (session, sf_dir) with the
# queries.llm persist-memo pattern: the part co-purchase edge list is the
# expensive common prefix of q198 (triangles) and q210 (power-law fit),
# and the distinct order-brand basket relation is the common prefix of
# q199 (basket lift) and q207 (PageRank). One builder per relation;
# separate locks so the basket build never queues behind the heavier
# edge build (the llm.py lock-split lesson).
_EDGES_CACHE: dict[tuple, DataFrame] = {}
_OB_CACHE: dict[tuple, DataFrame] = {}
_EDGES_LOCK = threading.Lock()
_OB_LOCK = threading.Lock()


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct part co-purchase edges ``(u, v)`` with ``u < v`` — two
    parts sharing an order. Persisted once per (session, dataset)."""
    from fluvii_spark.queries.llm import _memo_key, _memo_swap

    key = _memo_key(spark, sf_dir)
    with _EDGES_LOCK:
        cached = _EDGES_CACHE.get(key)
        if cached is not None:
            return cached
        t = load_tables(spark, sf_dir)
        li = t.lineitem.select("l_orderkey", "l_partkey")
        # per-order set contraction instead of the row-level self-join:
        # collect each order's distinct parts (bounded — order size is a
        # schema constant at any corpus scale), emit the u<v pairs in-row
        # from the sorted array, then one global distinct. Same edge set as
        # the self-join (sorted-array pairs ARE the x<y pairs), one join
        # fewer: the self-join shuffled lineitem by orderkey TWICE and
        # SMJ'd; this shuffles it once into a bounded-size aggregation
        # (measured r11: 3.2 s → 1.6 s solo at sf0.1 for the edge build).
        parts = li.groupBy("l_orderkey").agg(
            F.sort_array(F.collect_set("l_partkey")).alias("ps")
        )
        e = (
            parts.select(
                F.explode(
                    F.expr(
                        "flatten(transform(ps, (x, i) ->"
                        " transform(slice(ps, i + 2, size(ps)),"
                        " y -> struct(x as u, y as v))))"
                    )
                ).alias("p")
            )
            .select("p.u", "p.v")
            .distinct()
            .persist()
        )
        return _memo_swap(_EDGES_CACHE, key, e)


def _order_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct ``(o, b)`` order-brand membership rows. Persisted once
    per (session, dataset)."""
    from fluvii_spark.queries.llm import _memo_key, _memo_swap

    key = _memo_key(spark, sf_dir)
    with _OB_LOCK:
        cached = _OB_CACHE.get(key)
        if cached is not None:
            return cached
        from fluvii_spark.operators.stats import fan_out_scan

        t = load_tables(spark, sf_dir)
        # fan_out: the lineitem side of the brand join is the map side of
        # the distinct; parallelize an under-partitioned scan (q199
        # 1.50 s -> 1.15 s solo at sf0.1; no-op at cluster scale)
        ob = (
            fan_out_scan(t.lineitem).join(
                t.part, t.part.p_partkey == t.lineitem.l_partkey
            )
            .select(
                F.col("l_orderkey").alias("o"), F.col("p_brand").alias("b")
            )
            .distinct()
            .persist()
        )
        return _memo_swap(_OB_CACHE, key, ob)


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
    # include_empty_groups=False: spend is a SUM over non-null decimals —
    # never NULL per (wk, user) row — so no wk group is all-NULL and the
    # universe re-scan of the checkpointed spend relation is pure overhead.
    bounds = grouped_exact_quantiles(
        spend.select("wk", "spend"),
        ["wk"],
        "spend",
        _DECILE_PS,
        include_empty_groups=False,
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
    w = Window.partitionBy("user_id").orderBy("wk")
    return (
        dec.select(
            "user_id",
            "wk",
            F.lag("wk").over(w).alias("pwk"),
            F.lag("decile").over(w).alias("from_decile"),
            F.col("decile").alias("to_decile"),
        )
        .filter(F.col("pwk") == F.col("wk") - 1)
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

    # MEASURED AND REJECTED (r11 opt): a single-pass form (in-row explode
    # of each row's three (key_col, key) memberships → one grouped count)
    # was oracle-equal but ran +0.3 s warm interleaved (old {1.26, 0.87,
    # 1.13} vs new {1.31, 1.34, 1.42}): the three branch shuffles
    # parallelize inside one job locally while the exploded form pushes
    # 3× rows through one serial shuffle. Scan count (3→1) would favor it
    # on a real multi-split fact table — revisit on a grown corpus.
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


@register(
    "q198_triangle_count",
    """
    WITH edges AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM lineitem a JOIN lineitem b
        ON b.l_orderkey = a.l_orderkey AND b.l_partkey > a.l_partkey
    ),
    deg AS (
      SELECT node, COUNT(*) AS d FROM (
        SELECT u AS node FROM edges UNION ALL SELECT v FROM edges
      ) GROUP BY node
    ),
    dir_e AS (
      SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND e.u < e.v)
                  THEN e.u ELSE e.v END AS s,
             CASE WHEN da.d < db.d OR (da.d = db.d AND e.u < e.v)
                  THEN e.v ELSE e.u END AS t
      FROM edges e JOIN deg da ON da.node = e.u JOIN deg db ON db.node = e.v
    ),
    tri AS (
      SELECT COUNT(*) AS n_tri
      FROM dir_e e1 JOIN dir_e e2 ON e2.s = e1.t
      JOIN dir_e e3 ON e3.s = e1.s AND e3.t = e2.t
    ),
    agg AS (
      SELECT (SELECT COUNT(*) FROM deg) AS n_nodes,
             (SELECT COUNT(*) FROM edges) AS n_edges,
             (SELECT SUM((d * (d - 1)) // 2) FROM deg) AS n_wedges,
             (SELECT n_tri FROM tri) AS n_triangles
    )
    SELECT CAST(n_nodes AS BIGINT) AS n_nodes,
           CAST(n_edges AS BIGINT) AS n_edges,
           CAST(n_wedges AS BIGINT) AS n_wedges,
           CAST(n_triangles AS BIGINT) AS n_triangles,
           CASE WHEN n_wedges > 0
                THEN ROUND(3.0 * n_triangles / n_wedges, 6)
                ELSE 0.0 END AS clustering_coeff
    FROM agg
    """,
    "exact triangle count + global clustering coefficient of the "
    "part co-purchase graph (edge = two parts in the same order). "
    "Degree-ordered orientation (edge points from the (deg, id)-smaller "
    "endpoint) bounds every out-neighborhood by O(sqrt(m)), so the "
    "wedge join e1.t = e2.s shuffles O(m^1.5) candidate wedges worst "
    "case instead of sum(deg^2) — the standard distributed triangle "
    "recipe. All equi-joins on node/edge keys, exact integer counts, "
    "clustering = 3*tri/wedges in one guarded final division",
    ("relational", "graph"),
)
def q198(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _copurchase_edges(spark, sf_dir)
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
        .localCheckpoint(eager=False)
    )
    da = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    db = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    fwd = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    dir_e = (
        e.join(da, "u")
        .join(db, "v")
        .select(
            F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("s"),
            F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("t"),
        )
    )
    # edge-iterator with out-adjacency arrays instead of materializing the
    # oriented wedge relation (sf0.1: 1.2M edges -> ~35M wedges; the
    # wedge+probe join shuffles all of them, while per-edge
    # array_intersect of the two out-neighborhoods does the same
    # arithmetic in one codegen stage). Orientation caps |N+| at
    # O(sqrt(m)), so adjacency payloads stay bounded; each triangle is
    # counted exactly once at its (deg,id)-minimal edge. Edges whose head
    # has no out-neighbors contribute 0, so the inner join dropping them
    # is exact. The (s, t, ns) relation comes from EXPLODING the
    # adjacency rows (the exploded pairs ARE dir_e, with ns already on
    # the row) instead of joining dir_e back to adj on s — one shuffle
    # join and the dir_e multi-consumer checkpoint both disappear; the
    # array payload crosses the network once either way (the t-join).
    adj = (
        dir_e.groupBy("s")
        .agg(F.collect_list("t").alias("nbrs"))
        .localCheckpoint(eager=False)  # 2 consumers (explode + t-side)
    )
    adj_t = adj.select(F.col("s").alias("t"), F.col("nbrs").alias("nt"))
    tri = (
        adj.select("s", F.col("nbrs").alias("ns"), F.explode("nbrs").alias("t"))
        .join(adj_t, "t")
        .agg(
            F.coalesce(
                F.sum(F.size(F.array_intersect("ns", "nt"))), F.lit(0)
            ).alias("n_triangles")
        )
    )
    nodes = deg.agg(
        F.count("*").alias("n_nodes"),
        F.sum(F.expr("(d * (d - 1)) DIV 2")).alias("n_wedges"),
    )
    edges_n = e.agg(F.count("*").alias("n_edges"))
    return (
        nodes.crossJoin(F.broadcast(edges_n))
        .crossJoin(F.broadcast(tri))
        .select(
            F.col("n_nodes").cast("bigint").alias("n_nodes"),
            F.col("n_edges").cast("bigint").alias("n_edges"),
            F.col("n_wedges").cast("bigint").alias("n_wedges"),
            F.col("n_triangles").cast("bigint").alias("n_triangles"),
            F.when(
                F.col("n_wedges") > 0,
                F.round(
                    F.lit(3.0) * F.col("n_triangles") / F.col("n_wedges"), 6
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("clustering_coeff"),
        )
    )


@register(
    "q199_basket_lift",
    """
    WITH ob AS (
      SELECT DISTINCT l.l_orderkey AS o, p.p_brand AS b
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    n AS (SELECT COUNT(DISTINCT o) AS n_orders FROM ob),
    s AS (SELECT b, COUNT(*) AS c FROM ob GROUP BY b),
    pair AS (
      SELECT a.b AS brand_a, bb.b AS brand_b, COUNT(*) AS c_ab
      FROM ob a JOIN ob bb ON bb.o = a.o AND bb.b > a.b
      GROUP BY 1, 2
    )
    SELECT p.brand_a, p.brand_b,
           CAST(p.c_ab AS BIGINT) AS n_co,
           ROUND(CAST(p.c_ab AS DOUBLE) / n.n_orders, 6) AS support,
           ROUND(CAST(p.c_ab AS DOUBLE) / sa.c, 6) AS confidence,
           ROUND(CAST(p.c_ab AS DOUBLE) * n.n_orders
                 / (CAST(sa.c AS DOUBLE) * sb.c), 6) AS lift
    FROM pair p
    JOIN s sa ON sa.b = p.brand_a
    JOIN s sb ON sb.b = p.brand_b, n
    """,
    "market-basket association rules at brand granularity: for every "
    "brand pair co-occurring in an order, support / confidence(a->b) / "
    "lift from exact basket counts. The per-order self-join fans out at "
    "most C(brands_per_order, 2) pairs (order size is bounded), "
    "contracts immediately to per-pair counts; per-brand supports and "
    "the scalar order total join back as broadcasts (brand catalog and "
    "1-row aggregates — bounded at any corpus scale). Exact integer "
    "core, three final divisions",
    ("relational", "basket", "statistics"),
)
def q199(spark: SparkSession, sf_dir: str) -> DataFrame:
    ob = _order_brands(spark, sf_dir)
    n = ob.agg(F.countDistinct("o").alias("n_orders"))
    s = ob.groupBy("b").agg(F.count("*").alias("c"))
    # per-order set contraction instead of the ob self-join (the q198
    # edge-builder pattern): one shuffle by order, C(brands_per_order, 2)
    # in-row pair expansion (order size is schema-bounded), then the pair
    # count — the self-join shuffled the persisted ob twice by o and fed
    # the join output through the same aggregation
    pairs = ob.groupBy("o").agg(
        F.sort_array(F.collect_set("b")).alias("bs")
    ).select(
        F.explode(
            F.expr(
                "flatten(transform(bs, (x, i) -> "
                "transform(slice(bs, i + 2, size(bs) - i - 1), "
                "y -> struct(x AS brand_a, y AS brand_b))))"
            )
        ).alias("p")
    )
    pair = (
        pairs.select("p.brand_a", "p.brand_b")
        .groupBy("brand_a", "brand_b")
        .agg(F.count("*").alias("c_ab"))
    )
    sa = s.select(F.col("b").alias("brand_a"), F.col("c").alias("ca"))
    sb = s.select(F.col("b").alias("brand_b"), F.col("c").alias("cb"))
    return (
        pair.join(F.broadcast(sa), "brand_a")
        .join(F.broadcast(sb), "brand_b")
        .crossJoin(F.broadcast(n))
        .select(
            "brand_a",
            "brand_b",
            F.col("c_ab").cast("bigint").alias("n_co"),
            F.round(
                F.col("c_ab").cast("double") / F.col("n_orders"), 6
            ).alias("support"),
            F.round(F.col("c_ab").cast("double") / F.col("ca"), 6).alias(
                "confidence"
            ),
            F.round(
                F.col("c_ab").cast("double")
                * F.col("n_orders")
                / (F.col("ca").cast("double") * F.col("cb")),
                6,
            ).alias("lift"),
        )
    )


@register(
    "q201_event_path_trigrams",
    """
    WITH seq AS (
      SELECT event_type,
             lead(event_type, 1) OVER w AS e2,
             lead(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_type || '>' || e2 || '>' || e3 AS path,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences
    FROM seq
    WHERE event_type IS NOT NULL AND e2 IS NOT NULL AND e3 IS NOT NULL
    GROUP BY 1
    ORDER BY n_occurrences DESC, path
    LIMIT 20
    """,
    "top-20 per-user event-type trigram paths — the sequential pattern "
    "mining behind funnel discovery (which 3-step journeys actually "
    "happen). One user-partitioned window (two leads over the "
    "(ts, event_id)-ordered stream — deterministic under the unique "
    "event_id tie-break), map-side-combined counts, TakeOrdered 20 with "
    "the path string as the unique tie-break",
    ("relational", "funnel", "window", "topk"),
)
def q201(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = t.events.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    return (
        # event_type must be filtered too: concat_ws SKIPS NULL args while
        # the oracle's || propagates NULL — a NULL anchor would yield
        # 'e2>e3' here but a dropped NULL path there. The filter sits AFTER
        # the window on both sides so lead() still sees the full stream.
        seq.filter(
            F.col("event_type").isNotNull()
            & F.col("e2").isNotNull()
            & F.col("e3").isNotNull()
        )
        .select(
            F.concat_ws(">", "event_type", "e2", "e3").alias("path")
        )
        .groupBy("path")
        .agg(F.count("*").cast("bigint").alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), "path")
        .limit(20)
    )


@register(
    "q202_revenue_acf",
    """
    WITH daily AS (
      SELECT CAST(l_shipdate AS DATE) AS day,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) * 1000000
                  AS BIGINT) AS y
      FROM lineitem GROUP BY 1
    ),
    ks AS (SELECT CAST(unnest(generate_series(1, 7)) AS INTEGER) AS k),
    m AS (
      SELECT ks.k, COUNT(*) AS n,
             SUM(CAST(a.y AS HUGEINT)) AS sx,
             SUM(CAST(b.y AS HUGEINT)) AS sy,
             SUM(CAST(a.y AS HUGEINT) * a.y) AS sxx,
             SUM(CAST(b.y AS HUGEINT) * b.y) AS syy,
             SUM(CAST(a.y AS HUGEINT) * b.y) AS sxy
      FROM daily a JOIN ks ON true
      JOIN daily b ON b.day = a.day + ks.k
      GROUP BY ks.k
    )
    SELECT CAST(k AS BIGINT) AS lag_days, CAST(n AS BIGINT) AS n_pairs,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                    * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6) AS acf
    FROM m
    WHERE n > 1 AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
    """,
    "autocorrelation of daily shipped revenue at lags 1..7 days — the "
    "weekly-seasonality diagnostic for forecast models. Daily revenue "
    "is an exact DECIMAL sum scaled to integer micro-units, so every "
    "Pearson moment is EXACT integer arithmetic (HUGEINT / "
    "DECIMAL(38,0) — magnitudes argued in-code) and engines divide "
    "bit-identical numbers once at the end (q160's recipe, lifted to "
    "money). The lag join is a 7x bounded fan-out equi-join on the "
    "calendar-contracted daily relation",
    ("relational", "timeseries", "statistics"),
)
def q202(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    # y fits BIGINT (sf0.1: ~8e12 micro-units/day). Moments go through
    # DECIMAL(38,0): y^2 ~ 6e25, summed over <1e4 days ~ 1.5e29; n*sxx and
    # sx^2 ~ 3e32 — inside 38 digits, so Spark's DECIMAL arithmetic is
    # exact (no rescale-rounding), matching DuckDB HUGEINT exactly.
    # Envelope: headroom through ~sf10 (daily revenue 100x -> moments
    # ~3e36 < 1e38); beyond that, rescale the unit (cents instead of
    # micro-dollars buys 8 more digits) before reaching for double
    # moments — exactness is the cross-engine contract here.
    daily = (
        t.lineitem.groupBy(
            F.to_date("l_shipdate").alias("day")
        )
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(18,6)"))
                * 1000000
            )
            .cast("bigint")
            .alias("y")
        )
        .localCheckpoint(eager=False)
    )
    ks = F.explode(F.array(*[F.lit(k) for k in range(1, 8)])).alias("k")
    a = daily.select("day", F.col("y").alias("ya")).select(
        "day", "ya", ks
    )
    b = daily.select(
        F.col("day").alias("day_b"), F.col("y").alias("yb")
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    m = (
        a.join(b, F.col("day_b") == F.date_add(F.col("day"), F.col("k")))
        .groupBy("k")
        .agg(
            F.count("*").alias("n"),
            F.sum(dec("ya")).alias("sx"),
            F.sum(dec("yb")).alias("sy"),
            F.sum(dec("ya") * F.col("ya")).alias("sxx"),
            F.sum(dec("yb") * F.col("yb")).alias("syy"),
            F.sum(dec("ya") * F.col("yb")).alias("sxy"),
        )
    )
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return (
        m.filter((F.col("n") > 1) & (vx > 0) & (vy > 0))
        .select(
            F.col("k").cast("bigint").alias("lag_days"),
            F.col("n").cast("bigint").alias("n_pairs"),
            F.round(
                cov.cast("double")
                / (F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double"))),
                6,
            ).alias("acf"),
        )
    )


@register(
    "q204_mean_shift_changepoint",
    """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, COUNT(*) AS c FROM events GROUP BY 1
    ),
    ser AS (
      SELECT day, c,
             ROW_NUMBER() OVER (ORDER BY day) AS i,
             SUM(c) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS rc
      FROM daily
    ),
    tot AS (SELECT COUNT(*) AS nd, SUM(c) AS tc FROM daily),
    cand AS (
      SELECT s.day, s.i, t.nd - s.i AS n_after,
             s.rc / CAST(s.i AS DOUBLE) AS mb,
             (t.tc - s.rc) / CAST(t.nd - s.i AS DOUBLE) AS ma
      FROM ser s, tot t WHERE s.i < t.nd
    )
    SELECT day AS split_day,
           CAST(i AS BIGINT) AS n_days_before,
           CAST(n_after AS BIGINT) AS n_days_after,
           ROUND(mb, 6) AS mean_before,
           ROUND(ma, 6) AS mean_after,
           ROUND(ABS(ma - mb), 6) AS abs_shift
    FROM cand
    ORDER BY ABS(ma - mb) DESC, day
    LIMIT 1
    """,
    "single change-point detector on daily event volume: the split day "
    "maximizing |mean(after) - mean(before)|, scanned via running "
    "sums over the calendar-contracted daily series (bounded by the "
    "time span, not the corpus — the window task holds days, never "
    "events). Counts and prefix sums are exact integers; each candidate "
    "mean is one IEEE division of exact integers, so the argmax "
    "comparison is on bit-identical doubles; earliest-day tie-break",
    ("relational", "timeseries", "anomaly"),
)
def q204(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    daily = t.events.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").alias("c")
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ser = daily.select(
        "day",
        F.row_number().over(Window.orderBy("day")).alias("i"),
        F.sum("c").over(w).alias("rc"),
    )
    tot = daily.agg(
        F.count("*").alias("nd"), F.sum("c").alias("tc")
    )
    mb = F.col("rc") / F.col("i").cast("double")
    ma = (F.col("tc") - F.col("rc")) / (
        F.col("nd") - F.col("i")
    ).cast("double")
    return (
        ser.crossJoin(F.broadcast(tot))
        .filter(F.col("i") < F.col("nd"))
        .select(
            F.col("day").alias("split_day"),
            F.col("i").cast("bigint").alias("n_days_before"),
            (F.col("nd") - F.col("i")).cast("bigint").alias("n_days_after"),
            F.round(mb, 6).alias("mean_before"),
            F.round(ma, 6).alias("mean_after"),
            F.round(F.abs(ma - mb), 6).alias("abs_shift"),
            F.abs(ma - mb).alias("_shift_raw"),
        )
        .orderBy(F.col("_shift_raw").desc(), "split_day")
        .limit(1)
        .drop("_shift_raw")
    )


@register(
    "q205_linear_attribution",
    """
    WITH fp AS (
      SELECT user_id, ts AS fts, event_id AS fid FROM (
        SELECT user_id, ts, event_id,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events WHERE event_type = 'purchase') WHERE rn = 1
    ),
    touch AS (
      SELECT e.user_id, e.event_type
      FROM events e JOIN fp ON fp.user_id = e.user_id
      WHERE e.ts < fp.fts OR (e.ts = fp.fts AND e.event_id < fp.fid)
    ),
    per_user AS (
      SELECT user_id, event_type, COUNT(*) AS c,
             SUM(COUNT(*)) OVER (PARTITION BY user_id) AS n
      FROM touch GROUP BY user_id, event_type
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           ROUND(SUM(c / CAST(n AS DOUBLE)), 6) AS credit
    FROM per_user GROUP BY event_type
    """,
    "linear (equal-credit) multi-touch attribution: every event before "
    "a user's FIRST purchase shares 1/n of that conversion, summed per "
    "event type — the fair-share companion to q130's first-touch. The "
    "first purchase is one key-partitioned window (unique (ts, "
    "event_id) tie-break); touches join back on user_id with a strict "
    "tuple comparison; credits contract to per-(user, type) counts "
    "before the per-user window, so the widest shuffled relation is "
    "bounded by users x event types",
    ("relational", "funnel", "attribution"),
)
def q205(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    wp = Window.partitionBy("user_id").orderBy("ts", "event_id")
    fp = (
        t.events.filter(F.col("event_type") == "purchase")
        .select(
            "user_id", "ts", "event_id",
            F.row_number().over(wp).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("ts").alias("fts"),
            F.col("event_id").alias("fid"),
        )
    )
    touch = t.events.join(fp, "user_id").filter(
        (F.col("ts") < F.col("fts"))
        | ((F.col("ts") == F.col("fts")) & (F.col("event_id") < F.col("fid")))
    )
    wu = Window.partitionBy("user_id")
    per_user = (
        touch.groupBy("user_id", "event_type")
        .agg(F.count("*").alias("c"))
        .withColumn("n", F.sum("c").over(wu))
    )
    return per_user.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.round(
            F.sum(F.col("c") / F.col("n").cast("double")), 6
        ).alias("credit"),
    )


_LATENCY_PS = [i / 10.0 for i in range(1, 10)]


@register(
    "q206_ship_latency_quantiles",
    f"""
    WITH lat AS (
      SELECT o.o_orderpriority AS priority,
             CAST(CAST(l.l_shipdate AS DATE) - CAST(o.o_orderdate AS DATE)
                  AS DOUBLE) AS latency
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ),
    qs AS (
      SELECT priority,
             unnest([{', '.join(str(p) for p in _LATENCY_PS)}]) AS p,
             unnest(quantile_cont(latency,
                    [{', '.join(str(p) for p in _LATENCY_PS)}])) AS quantile
      FROM lat GROUP BY priority
    )
    SELECT priority, p, ROUND(quantile, 6) AS quantile FROM qs
    """,
    "order-to-ship latency deciles per order priority — the SLA "
    "distribution behind fulfillment dashboards. Latency is exact "
    "integer day arithmetic (bounded distinct values), so deciles come "
    "from the value-counts contraction (grouped_quantiles_lowcard: "
    "map-side groupBy(priority, latency).count() + in-row cumulative "
    "rank lookups — no range shuffle of the joined rows), matching "
    "DuckDB quantile_cont's 1+(n-1)p interpolation",
    ("relational", "quantile", "order-statistics"),
)
def q206(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fluvii_spark.operators.ranking import grouped_quantiles_lowcard

    t = load_tables(spark, sf_dir)
    lat = (
        t.lineitem.join(
            t.orders,
            t.orders.o_orderkey == t.lineitem.l_orderkey,
        )
        .select(
            F.col("o_orderpriority").alias("priority"),
            F.datediff(
                F.to_date("l_shipdate"), F.to_date("o_orderdate")
            )
            .cast("double")
            .alias("latency"),
        )
    )
    # latency is integer day arithmetic (bounded distinct values at ANY
    # corpus scale — it is a calendar-window width, not a row count), so
    # the §2.3 value-counts contraction applies: the joined relation
    # collapses map-side to |priority|·|distinct days| rows before its
    # only shuffle, instead of range-repartitioning every joined row
    # through the ranking path. Result-identical to
    # grouped_exact_quantiles (same order statistics, interpolation,
    # rounding — operator contract + test_ranking equivalence test).
    return grouped_quantiles_lowcard(
        lat, ["priority"], "latency", _LATENCY_PS
    ).select("priority", "p", "quantile")


_PR_ITER_SQL = """
    p{i} AS (
      SELECT e.v AS node,
             0.15 / n.nn + 0.85 * SUM(p.pr * e.w / o.ow) AS pr
      FROM ew e
      JOIN p{j} p ON p.node = e.u
      JOIN outw o ON o.u = e.u
      CROSS JOIN n
      GROUP BY e.v, n.nn
    )"""


@register(
    "q207_pagerank_brands",
    f"""
    WITH ob AS (
      SELECT DISTINCT l.l_orderkey AS o, p.p_brand AS b
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    ew AS (
      SELECT a.b AS u, bb.b AS v, COUNT(*) AS w
      FROM ob a JOIN ob bb ON bb.o = a.o AND bb.b <> a.b
      GROUP BY 1, 2
    ),
    outw AS (SELECT u, SUM(w) AS ow FROM ew GROUP BY u),
    n AS (SELECT COUNT(*) AS nn FROM outw),
    p0 AS (SELECT u AS node, 1.0 / n.nn AS pr FROM outw CROSS JOIN n),
    {_PR_ITER_SQL.format(i=1, j=0)},
    {_PR_ITER_SQL.format(i=2, j=1)},
    {_PR_ITER_SQL.format(i=3, j=2)}
    SELECT node AS brand, ROUND(pr, 6) AS pagerank FROM p3
    """,
    "3 synchronous PageRank iterations (damping 0.85, uniform start) on "
    "the weighted brand co-purchase graph — the iterative-algorithm "
    "pattern: each iteration is one equi-join of the edge list against "
    "the current rank vector plus a hash aggregation, the classic "
    "join-agg PageRank step (no driver-side loops over collected data; "
    "the rank relation stays distributed and is re-derived, not "
    "mutated). Edges are symmetric co-occurrence counts so every node "
    "has out-links (no dangling mass); per-edge contribution "
    "(pr * w) / ow is identical IEEE arithmetic in both engines, "
    "in-sums differ by ulps against the 6-dp gate",
    ("relational", "graph", "iterative"),
)
def q207(spark: SparkSession, sf_dir: str) -> DataFrame:
    ob = _order_brands(spark, sf_dir)
    # per-order set contraction (q198/q199 pattern) instead of the ob
    # self-join: one shuffle by order, in-row ordered-pair expansion
    # (brands per order are distinct and schema-bounded), then the
    # per-(u,v) weight count
    ew = (
        ob.groupBy("o")
        .agg(F.collect_set("b").alias("bs"))
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(bs, x -> "
                    "transform(filter(bs, y -> y != x), "
                    "y -> struct(x AS u, y AS v))))"
                )
            ).alias("p")
        )
        .groupBy(F.col("p.u").alias("u"), F.col("p.v").alias("v"))
        .agg(F.count("*").alias("w"))
        .localCheckpoint(eager=False)
    )
    outw = ew.groupBy("u").agg(F.sum("w").alias("ow"))
    n = outw.agg(F.count("*").alias("nn"))
    pr = (
        outw.select(F.col("u").alias("node"))
        .crossJoin(F.broadcast(n))
        .select("node", (F.lit(1.0) / F.col("nn")).alias("pr"))
    )
    # outw and pr are node-cardinality relations (25 brands — bounded by
    # the brand DOMAIN at any corpus scale): broadcast them so each
    # iteration is a map-side join over the edge list, not a SortMergeJoin
    # shuffle of both sides (plan audit showed SMJ x6 without the hints)
    rate = ew.join(F.broadcast(outw), "u")  # u, v, w, ow
    for _ in range(3):
        pr = (
            rate.join(
                F.broadcast(pr.withColumnRenamed("node", "u")), "u"
            )
            .crossJoin(F.broadcast(n))
            .groupBy("v", "nn")
            .agg(
                F.sum(
                    F.col("pr") * F.col("w") / F.col("ow")
                ).alias("s")
            )
            .select(
                F.col("v").alias("node"),
                (F.lit(0.15) / F.col("nn") + F.lit(0.85) * F.col("s")).alias(
                    "pr"
                ),
            )
        )
    return pr.select(
        F.col("node").alias("brand"), F.round("pr", 6).alias("pagerank")
    )


@register(
    "q208_theil_sen_trend",
    """
    WITH daily AS (
      SELECT CAST(l_shipdate AS DATE) AS day,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) * 1000000
                  AS BIGINT) AS y
      FROM lineitem GROUP BY 1
    ),
    base AS (SELECT MIN(day) AS d0 FROM daily),
    xy AS (SELECT day - b.d0 AS x, y FROM daily, base b),
    slopes AS (
      SELECT CAST(b.y - a.y AS DOUBLE) / (b.x - a.x) AS slope
      FROM xy a JOIN xy b ON b.x > a.x
    ),
    med AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
             ROUND(quantile_cont(slope, 0.5), 6) AS m
      FROM slopes
    ),
    icpt AS (
      SELECT ROUND(quantile_cont(xy.y - med.m * xy.x, 0.5), 6) AS b0
      FROM xy, med
    )
    SELECT med.n_pairs, med.m AS slope_micro_per_day,
           icpt.b0 AS intercept_micro
    FROM med, icpt
    """,
    "Theil-Sen robust trend of daily shipped revenue: the exact median "
    "of all pairwise day-to-day slopes, plus the median-residual "
    "intercept — the outlier-proof alternative to q159's OLS. The "
    "all-pairs slope relation is O(days^2) BY DEFINITION of the "
    "estimator and days are calendar-bounded, so the broadcast "
    "nested-loop enumeration is a bounded fan-out, not a corpus-scale "
    "cross join; each slope is one IEEE division of exact integer "
    "micro-unit deltas (bit-identical across engines), and both medians "
    "run through the distributed exact-quantile operator (the 6-dp "
    "rounded median feeds the residual pass on BOTH sides)",
    ("relational", "timeseries", "statistics", "robust"),
)
def q208(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fluvii_spark.operators.ranking import grouped_exact_quantiles

    t = load_tables(spark, sf_dir)
    daily = (
        t.lineitem.groupBy(F.to_date("l_shipdate").alias("day"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(18,6)"))
                * 1000000
            )
            .cast("bigint")
            .alias("y")
        )
    )
    d0 = daily.agg(F.min("day").alias("d0"))
    xy = (
        daily.crossJoin(F.broadcast(d0))
        .select(F.datediff("day", "d0").alias("x"), "y")
        .localCheckpoint(eager=False)
    )
    # spread the day relation across the session's shuffle-partition count
    # BEFORE the broadcast nested-loop enumeration: the stream side is a
    # ~2.5k-row aggregate that AQE coalesces into one partition, which
    # would run the whole O(days²) pair enumeration + division in a single
    # task. Hash-repartitioning the tiny side is a negligible shuffle and
    # fans the enumeration across the cluster; the pair SET is unchanged.
    # The explicit count (the session's own scale dial) is required — a
    # bare repartition(col) is a 125 KB exchange AQE would coalesce
    # straight back to one partition.
    try:
        _n_slices = max(
            1, int(spark.conf.get("spark.sql.shuffle.partitions"))
        )
    except Exception:  # "auto"/unset — modest fixed fan-out
        _n_slices = 200
    a = xy.repartition(_n_slices, F.col("x")).select(
        F.col("x").alias("xa"), F.col("y").alias("ya")
    )
    b = xy.select(F.col("x").alias("xb"), F.col("y").alias("yb"))
    # try_divide, not `/`: the downstream quantile operator's
    # slope-IS-NOT-NULL filter gets merged into the BNLJ join condition,
    # where Catalyst may evaluate it BEFORE the xb > xa conjunct — under
    # ANSI mode a plain division then aborts on the xb == xa pairs the
    # condition would have discarded. try_divide is inert on every
    # surviving pair (divisor > 0 by the join condition), so results are
    # bit-identical to the oracle's plain division.
    slopes = (
        a.join(F.broadcast(b), F.col("xb") > F.col("xa"))
        .select(
            F.try_divide(
                (F.col("yb") - F.col("ya")).cast("double"),
                F.col("xb") - F.col("xa"),
            ).alias("slope")
        )
        # PERSISTED (r12): the median's repartitionByRange SAMPLES its
        # input, so the un-persisted O(days²) enumeration ran twice
        # (sampling pass + shuffle map). The cached relation is ONE
        # double per pair and days² is calendar-bounded (~3M rows at ANY
        # corpus scale), so the memory is fixed. Cold-pass A/B 5.63 →
        # 2.05 s (median-only span), warm interleaved neutral
        # (0.17–0.35 s both ways). r11's localCheckpoint attempt at this
        # site regressed (2.66→4.00) — the lineage cut is what hurt, not
        # the materialization; plain persist keeps stats and lineage.
        # Value-counts contraction before the shuffle was checked and is
        # DEAD here: 3,121,182 of 3,121,251 slopes are distinct.
        .persist()
    )
    # days are distinct, so the pair count is exactly C(n_days, 2) — a
    # 1-row aggregate instead of a second enumeration of the O(days^2)
    # slope relation just to count it. Counted on the CHECKPOINTED xy
    # relation (same rows as daily), not on daily, whose lineage would
    # re-run the full lineitem scan + aggregation just for this count.
    n_pairs = xy.agg(
        F.expr("(count(*) * (count(*) - 1)) DIV 2")
        .cast("bigint")
        .alias("n_pairs")
    )
    # slope median through the distributed rank-probe operator. Measured
    # alternative (r11): the built-in one-buffer `percentile` aggregate —
    # despite the slope relation being calendar-bounded — is 2.7× SLOWER
    # solo at sf0.1 (11.4 s vs 4.3 s): its final merge collects a ~3.2M-
    # entry value-counts map into ONE task, serializing exactly the work
    # the range-partitioned ranking spreads across the cluster. Rejected.
    # med is referenced twice (residual pass + final row); checkpointing
    # the 1-row relation keeps the slope pipeline from running twice.
    med = (
        grouped_exact_quantiles(
            slopes.withColumn("g", F.lit(1)),
            ["g"],
            "slope",
            [0.5],
            include_empty_groups=False,
        )
        .select(F.col("quantile").alias("m"))
        .localCheckpoint(eager=False)
    )
    resid = xy.crossJoin(F.broadcast(med)).select(
        (F.col("y") - F.col("m") * F.col("x")).alias("r")
    )
    # the residual relation is one row per DAY (calendar-bounded at any
    # corpus scale), so the single-task exact percentile is the right
    # tool here — spinning the distributed range-rank machinery for
    # ~2.4k rows costs more in fixed stage latency than it saves. Same
    # 1+(n-1)p interpolation as quantile_cont; rounded like the operator.
    icpt = resid.agg(
        F.round(F.percentile("r", F.lit(0.5)), 6).alias("b0")
    )
    return (
        n_pairs.crossJoin(F.broadcast(med))
        .crossJoin(F.broadcast(icpt))
        .select(
            "n_pairs",
            F.col("m").alias("slope_micro_per_day"),
            F.col("b0").alias("intercept_micro"),
        )
    )


@register(
    "q210_degree_powerlaw_fit",
    """
    WITH edges AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM lineitem a JOIN lineitem b
        ON b.l_orderkey = a.l_orderkey AND b.l_partkey > a.l_partkey
    ),
    deg AS (
      SELECT node, COUNT(*) AS d FROM (
        SELECT u AS node FROM edges UNION ALL SELECT v FROM edges
      ) GROUP BY node
    ),
    hist AS (SELECT d, COUNT(*) AS cnt FROM deg GROUP BY d),
    pts AS (
      SELECT LN(CAST(d AS DOUBLE)) AS lx, LN(CAST(cnt AS DOUBLE)) AS ly
      FROM hist
    ),
    m AS (
      SELECT COUNT(*) AS n, SUM(lx) AS sx, SUM(ly) AS sy,
             SUM(lx * lx) AS sxx, SUM(lx * ly) AS sxy, SUM(ly * ly) AS syy
      FROM pts
    )
    SELECT CAST(n AS BIGINT) AS n_points,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
           ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n,
                 6) AS intercept,
           ROUND((n * sxy - sx * sy) * (n * sxy - sx * sy)
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
    FROM m
    WHERE n > 1 AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
    """,
    "log-log OLS fit of the part co-purchase degree distribution "
    "(ln count-of-degree vs ln degree): slope ~ -alpha is the power-law "
    "exponent, r2 the fit quality — the graph-shape diagnostic that "
    "says whether hub-aware strategies (q198's orientation, salting) "
    "are worth it. The histogram contracts nodes to distinct-degree "
    "rows (bounded by max degree) before any float; each ln runs on "
    "identical integer-valued doubles in both engines, the moment sums "
    "differ by ulps against the 6-dp gate, and slope/intercept/r2 are "
    "closed-form expressions of those sums",
    ("relational", "graph", "statistics"),
)
def q210(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _copurchase_edges(spark, sf_dir)
    # r12 audit (VERDICT #4): the plan is a linear agg chain (deg → hist
    # → one global moment agg; 3 Exchanges, nothing duplicated) — the
    # only cut found was the endpoint union, which scanned the persisted
    # edge relation TWICE (two InMemoryTableScans feeding a Union). The
    # in-row explode emits the same two endpoint rows per edge from ONE
    # pass over the cache — at 100 TB the edge cache spills to disk, so
    # this halves the disk re-read. Map-side partial aggregation applies
    # identically either way.
    deg = (
        e.select(F.explode(F.array("u", "v")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    hist = deg.groupBy("d").agg(F.count("*").alias("cnt"))
    pts = hist.select(
        F.log(F.col("d").cast("double")).alias("lx"),
        F.log(F.col("cnt").cast("double")).alias("ly"),
    )
    m = pts.agg(
        F.count("*").alias("n"),
        F.sum("lx").alias("sx"),
        F.sum("ly").alias("sy"),
        F.sum(F.col("lx") * F.col("lx")).alias("sxx"),
        F.sum(F.col("lx") * F.col("ly")).alias("sxy"),
        F.sum(F.col("ly") * F.col("ly")).alias("syy"),
    )
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return (
        m.filter((F.col("n") > 1) & (vx > 0) & (vy > 0))
        .select(
            F.col("n").cast("bigint").alias("n_points"),
            F.round(cov / vx, 6).alias("slope"),
            F.round(
                (F.col("sy") - cov / vx * F.col("sx")) / F.col("n"), 6
            ).alias("intercept"),
            F.round(cov * cov / (vx * vy), 6).alias("r2"),
        )
    )


def _q213_oracle() -> str:
    from fluvii_spark.queries.relational_ext6 import (
        HLL_ALPHA,
        HLL_DIV,
        HLL_M,
        HLL_W,
    )

    return f"""
    WITH pairs AS (SELECT DISTINCT event_type, user_id FROM events),
    hashed AS (
      SELECT event_type,
             (('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT)
               AS h
      FROM pairs
    ),
    per_type AS (
      SELECT event_type, h // {HLL_DIV} AS idx,
             MAX(CASE WHEN h % {HLL_DIV} = 0 THEN {HLL_W + 1}
                 ELSE instr(lpad(bin(h % {HLL_DIV}), {HLL_W}, '0'), '1')
                 END) AS m_j
      FROM hashed GROUP BY 1, 2
    ),
    merged AS (
      SELECT idx, MAX(m_j) AS m_j FROM per_type GROUP BY idx
    ),
    direct AS (
      SELECT h // {HLL_DIV} AS idx,
             MAX(CASE WHEN h % {HLL_DIV} = 0 THEN {HLL_W + 1}
                 ELSE instr(lpad(bin(h % {HLL_DIV}), {HLL_W}, '0'), '1')
                 END) AS m_j
      FROM (SELECT DISTINCT h FROM hashed) GROUP BY 1
    ),
    est AS (
      SELECT
        (SELECT ROUND({HLL_ALPHA} * {HLL_M * HLL_M}
                / (SUM(1.0 / (CAST(1 AS BIGINT) << m_j))
                   + ({HLL_M} - COUNT(*)) * 1.0), 6) FROM merged)
          AS merged_estimate,
        (SELECT ROUND({HLL_ALPHA} * {HLL_M * HLL_M}
                / (SUM(1.0 / (CAST(1 AS BIGINT) << m_j))
                   + ({HLL_M} - COUNT(*)) * 1.0), 6) FROM direct)
          AS direct_estimate
    )
    SELECT (SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) FROM pairs)
             AS n_sketches,
           (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM pairs)
             AS exact_union,
           merged_estimate, direct_estimate,
           CAST(merged_estimate = direct_estimate AS BIGINT)
             AS merge_lossless
    FROM est
    """


@register(
    "q213_hll_merge",
    _q213_oracle(),
    "HLL sketch MERGE: per-event-type HLL register vectors combined by "
    "register-wise MAX into one union sketch, next to the sketch built "
    "directly on the union — they must be EQUAL (register-max merge is "
    "lossless, the property that makes HLL state mergeable across "
    "partitions/streams/days at 100 TB), and the oracle hash-checks both "
    "estimates plus the equality flag. Same md5 32-bit split and "
    "dyadic-rational register sum as q147 (exactly representable in any "
    "order), KMV-merge's q104 counterpart on the HLL side; merging is "
    "one groupBy(idx) MAX over n_types x m register rows — O(m) state "
    "per sketch, constant shuffle",
    ("relational", "sketch"),
)
def q213(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fluvii_spark.operators.text import md5_hash64
    from fluvii_spark.queries.relational_ext6 import (
        HLL_ALPHA,
        HLL_DIV,
        HLL_M,
        HLL_W,
    )

    t = load_tables(spark, sf_dir)
    pairs = (
        t.events.select("event_type", "user_id")
        .distinct()
        .localCheckpoint(eager=False)
    )
    hashed = pairs.select(
        "event_type", md5_hash64(F.col("user_id").cast("string")).alias("h")
    )
    rank_word = F.col("h") % HLL_DIV
    rho = F.when(rank_word == 0, F.lit(HLL_W + 1)).otherwise(
        F.instr(F.lpad(F.bin(rank_word), HLL_W, "0"), "1")
    )
    per_type = (
        hashed.select(
            "event_type",
            F.expr(f"h DIV {HLL_DIV}").alias("idx"),
            rho.alias("rho"),
        )
        .groupBy("event_type", "idx")
        .agg(F.max("rho").alias("m_j"))
    )
    merged = per_type.groupBy("idx").agg(F.max("m_j").alias("m_j"))
    direct = (
        hashed.select("h").distinct()
        .select(F.expr(f"h DIV {HLL_DIV}").alias("idx"), rho.alias("m_j"))
        .groupBy("idx")
        .agg(F.max("m_j").alias("m_j"))
    )

    def estimate(regs: DataFrame, name: str) -> DataFrame:
        return regs.agg(
            F.round(
                F.lit(HLL_ALPHA * HLL_M * HLL_M)
                / (
                    F.sum(
                        F.expr("1.0 / shiftleft(cast(1 as bigint), m_j)")
                    )
                    + (HLL_M - F.count("*")) * F.lit(1.0)
                ),
                6,
            ).alias(name)
        )

    counts = pairs.agg(
        F.countDistinct("event_type").cast("bigint").alias("n_sketches"),
        F.countDistinct("user_id").cast("bigint").alias("exact_union"),
    )
    return (
        counts.crossJoin(F.broadcast(estimate(merged, "merged_estimate")))
        .crossJoin(F.broadcast(estimate(direct, "direct_estimate")))
        .select(
            "n_sketches",
            "exact_union",
            "merged_estimate",
            "direct_estimate",
            (F.col("merged_estimate") == F.col("direct_estimate"))
            .cast("bigint")
            .alias("merge_lossless"),
        )
    )


@register(
    "q214_waiting_suppliers",
    """
    WITH late AS (
      SELECT l.l_orderkey, l.l_suppkey
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE CAST(l.l_shipdate AS DATE) - CAST(o.o_orderdate AS DATE) > 90
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier s
    JOIN late l1 ON l1.l_suppkey = s.s_suppkey
    WHERE EXISTS (
            SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
            SELECT 1 FROM late l3
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s.s_suppkey, s.s_name
    ORDER BY numwait DESC, s.s_suppkey
    LIMIT 20
    """,
    "TPC-H Q21's shape on the reduced schema: suppliers whose item was "
    "the ONLY late one (ship lag > 90 days) in a multi-supplier order — "
    "the classic EXISTS + NOT-EXISTS double self-join stress test. The "
    "ORACLE keeps the textbook correlated form; the Spark plan is the "
    "scalable aggregate REWRITE — one per-order contraction computing "
    "(distinct suppliers, distinct late suppliers) replaces both "
    "correlated subqueries, so lineitem is scanned twice total and "
    "never self-joined row-to-row: late item qualifies iff n_supp >= 2 "
    "and n_late_supp = 1. Hash-equality of the two formulations is the "
    "semantic proof the rewrite is exact. Exact integer counts, "
    "(numwait DESC, s_suppkey) unique tie-break",
    ("relational", "join", "subquery", "tpch"),
)
def q214(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    li = t.lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
    dated = li.join(
        t.orders.select("o_orderkey", "o_orderdate"),
        li.l_orderkey == F.col("o_orderkey"),
    ).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
            > 90
        ).alias("is_late"),
    )
    # contract to per-(order, supplier) late-row counts FIRST (§2.3):
    # n_supp == countDistinct(supplier) == rows of this relation per
    # order, n_late_supp == countDistinct(late supplier) == rows with
    # n_late > 0, and each qualifying supplier's late line-rows are its
    # n_late — so the countDistinct EXPAND (2x every line row through the
    # per-order aggregation) and the line-granularity join-back of
    # per_order both collapse into a window over the bounded-size
    # per-(order, supplier) relation (order membership is a schema
    # constant at any corpus scale; no skew, no corpus-level second pass).
    ps = dated.groupBy("l_orderkey", "l_suppkey").agg(
        F.count(F.when(F.col("is_late"), 1)).alias("n_late")
    )
    w = Window.partitionBy("l_orderkey")
    qualifying = (
        ps.withColumn("n_supp", F.count("*").over(w))
        .withColumn(
            "n_late_supp",
            F.sum((F.col("n_late") > 0).cast("int")).over(w),
        )
        .filter(
            (F.col("n_late") > 0)
            & (F.col("n_supp") >= 2)
            & (F.col("n_late_supp") == 1)
        )
    )
    return (
        qualifying.join(
            F.broadcast(t.supplier.select("s_suppkey", "s_name")),
            qualifying.l_suppkey == F.col("s_suppkey"),
        )
        .groupBy("s_suppkey", "s_name")
        .agg(F.sum("n_late").cast("bigint").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_suppkey")
        .limit(20)
    )
