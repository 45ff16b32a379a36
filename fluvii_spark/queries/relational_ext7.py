"""Extended inventory, batch 7 (q183+, round 4): weighted sampling without
replacement, survival analysis, LM-quality filtering, exact integer
allocation, deterministic bootstrap, and training-mixture planning.

No counterpart in the reference (a Kafka client library — SURVEY.md §2.2);
determinism rules follow FIXTURES.md (md5-derived uniforms, DECIMAL/integer
arithmetic before any float, IEEE-exact single divisions where the output
must be bit-identical, 6-dp-tolerant float aggregates elsewhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fluvii_spark.io.readers import load_tables
from fluvii_spark.queries import register

def _md5_u32(prefix: str, col):
    """First 8 hex chars of md5(prefix || col) as a BIGINT in [0, 2^32)."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(prefix), col.cast("string"))), 1, 8),
            16,
            10,
        )
        .cast("long")
    )


@register(
    "q183_priority_sample_topk",
    """
    WITH keyed AS (
      SELECT o_orderkey, o_totalprice,
             (('0x' || substr(md5('ps_' || CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT)
               AS h,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS w
      FROM orders
    )
    SELECT o_orderkey, o_totalprice,
           CAST(h AS DOUBLE) / CAST(w AS DOUBLE) AS sample_key
    FROM keyed
    ORDER BY sample_key, o_orderkey
    LIMIT 64
    """,
    "weighted sampling WITHOUT replacement (priority / sequential-Poisson "
    "sampling, Ohlsson 1998; Duffield-Lund-Thorup priorities): each row gets "
    "key = u/w with u a deterministic md5 uniform and w the price in integer "
    "cents; the k smallest keys are an unbiased weighted sample. Both h "
    "(< 2^32) and w (integer cents) are exactly representable doubles, so "
    "the single IEEE division yields BIT-IDENTICAL keys in both engines — "
    "no libm, no pow(u, 1/w). At 100 TB: orderBy+limit compiles to "
    "TakeOrderedAndProject — per-partition top-k heaps then a k-row merge, "
    "never a global sort",
    ("relational", "sampling"),
)
def q183(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    keyed = t.orders.select(
        "o_orderkey",
        "o_totalprice",
        _md5_u32("ps_", F.col("o_orderkey")).alias("h"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("w"),
    )
    return (
        keyed.select(
            "o_orderkey",
            "o_totalprice",
            (F.col("h").cast("double") / F.col("w").cast("double")).alias(
                "sample_key"
            ),
        )
        .orderBy("sample_key", "o_orderkey")
        .limit(64)
    )


@register(
    "q184_kaplan_meier",
    """
    WITH cust AS (
      SELECT o_custkey,
             date_diff('day', CAST(MIN(o_orderdate) AS DATE),
                       CAST(MAX(o_orderdate) AS DATE)) AS dur,
             CASE WHEN MAX(o_orderdate) < TIMESTAMP '2001-01-01'
                  THEN 1 ELSE 0 END AS ev
      FROM orders GROUP BY o_custkey
    ),
    per_t AS (
      SELECT dur AS t, COUNT(*) AS n_at_t, SUM(ev) AS d
      FROM cust GROUP BY dur
    ),
    risk AS (
      SELECT t, d,
             SUM(n_at_t) OVER (ORDER BY t DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_risk
      FROM per_t
    )
    SELECT t, CAST(d AS BIGINT) AS d_events, CAST(n_risk AS BIGINT) AS n_risk,
           EXP(SUM(LN(1.0 - CAST(d AS DOUBLE) / n_risk)) OVER (ORDER BY t
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS survival
    FROM risk
    WHERE d > 0 AND d < n_risk
    """,
    "Kaplan-Meier product-limit survival estimator over customer lifetimes "
    "(duration = days between first and last order; censored if still "
    "active at the 2001-01-01 cutoff). S(t) = prod_{t_i<=t}(1 - d_i/n_i) "
    "computed as exp of a cumulative ln-sum in event-time order — identical "
    "summation order in both engines, per-term libm error ~1e-16 << the "
    "6-dp gate. Rows with d=0 contribute ln(1)=0 so pre-filtering them is "
    "exact; d=n_risk can only be the maximum event time (everyone at risk "
    "dies), excluded so DuckDB's ln(0) never fires and Spark's NULL-log "
    "never diverges. At 100 TB: two hash aggregations contract the input "
    "to one row per distinct duration (bounded by the observation span in "
    "days, ~thousands) before any window — the global windows run on that "
    "contracted relation, never on raw orders",
    ("relational", "survival"),
)
def q184(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    cutoff = F.lit("2001-01-01 00:00:00").cast("timestamp")
    cust = t.orders.groupBy("o_custkey").agg(
        F.datediff(
            F.max("o_orderdate").cast("date"), F.min("o_orderdate").cast("date")
        ).alias("dur"),
        F.when(F.max("o_orderdate") < cutoff, 1).otherwise(0).alias("ev"),
    )
    per_t = cust.groupBy(F.col("dur").alias("t")).agg(
        F.count("*").alias("n_at_t"), F.sum("ev").alias("d")
    )
    w_desc = Window.orderBy(F.desc("t")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = per_t.select(
        "t", "d", F.sum("n_at_t").over(w_desc).alias("n_risk")
    )
    w_asc = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        risk.filter((F.col("d") > 0) & (F.col("d") < F.col("n_risk")))
        .select(
            "t",
            F.col("d").cast("bigint").alias("d_events"),
            F.col("n_risk").cast("bigint").alias("n_risk"),
            F.exp(
                F.sum(
                    F.log(
                        F.lit(1.0)
                        - F.col("d").cast("double") / F.col("n_risk")
                    )
                ).over(w_asc)
            ).alias("survival"),
        )
    )


@register(
    "q185_unigram_logprob",
    """
    WITH toks AS (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
      FROM documents
    ),
    clean AS (SELECT * FROM toks WHERE token <> ''),
    dt AS (
      SELECT doc_id, lang, token, COUNT(*) AS tf
      FROM clean GROUP BY 1, 2, 3
    ),
    vocab AS (SELECT token, SUM(tf) AS cnt FROM dt GROUP BY token),
    tot AS (SELECT SUM(cnt) AS n FROM vocab),
    doc_nll AS (
      SELECT d.doc_id, d.lang,
             SUM(d.tf * -LN(CAST(v.cnt AS DOUBLE) / n)) / SUM(d.tf) AS nll
      FROM dt d JOIN vocab v USING (token) CROSS JOIN tot
      GROUP BY d.doc_id, d.lang
    )
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           AVG(nll) AS avg_nll, MIN(nll) AS min_nll, MAX(nll) AS max_nll
    FROM doc_nll GROUP BY lang
    """,
    "unigram language-model scoring — the perplexity-style quality filter "
    "used in C4/CCNet-class pipelines: train a unigram LM on the corpus "
    "itself (token counts / total), score each document by its tf-weighted "
    "mean negative log-probability, aggregate per language. Per-token ln "
    "differs <= 1 ulp between engines; per-doc weighted-mean error ~1e-14 "
    "<< the 6-dp gate. At 100 TB: the explode contracts IMMEDIATELY into "
    "per-(doc, token) term frequencies, localCheckpointed once for its two "
    "consumers (vocab aggregation and the per-doc scoring join), so the "
    "full-corpus explode runs exactly once; the LM 'model' stays a "
    "distributed relation, never collected; the 1-row total is a broadcast "
    "scalar join (no eager count)",
    ("llm", "text", "quality"),
)
def q185(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    clean = (
        t.documents.select(
            "doc_id", "lang", F.explode(F.split("text", " ")).alias("token")
        )
        .filter(F.col("token") != "")
    )
    # contract to (doc, token) term frequencies BEFORE fanning out to the
    # two consumers, and checkpoint so the corpus explode runs exactly once
    # (same multi-consumer pattern as q120's elems)
    dt = (
        clean.groupBy("doc_id", "lang", "token")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=False)
    )
    vocab = dt.groupBy("token").agg(F.sum("tf").alias("cnt"))
    tot = vocab.agg(F.sum("cnt").alias("n"))
    doc_nll = (
        dt.join(vocab, "token")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id", "lang")
        .agg(
            (
                F.sum(
                    F.col("tf")
                    * -F.log(F.col("cnt").cast("double") / F.col("n"))
                )
                / F.sum("tf")
            ).alias("nll")
        )
    )
    return doc_nll.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.avg("nll").alias("avg_nll"),
        F.min("nll").alias("min_nll"),
        F.max("nll").alias("max_nll"),
    )


@register(
    "q186_largest_remainder_alloc",
    """
    WITH rev AS (
      SELECT n.n_name,
             CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS cents
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY n.n_name
    ),
    tot AS (SELECT SUM(cents) AS total FROM rev),
    base AS (
      SELECT n_name, cents,
             (1000 * cents) // total AS floor_alloc,
             (1000 * cents) % total AS rem
      FROM rev CROSS JOIN tot
    ),
    short AS (SELECT 1000 - SUM(floor_alloc) AS leftover FROM base),
    ranked AS (
      SELECT b.n_name, b.cents, b.floor_alloc, s.leftover,
             ROW_NUMBER() OVER (ORDER BY b.rem DESC, b.n_name) AS rnk
      FROM base b CROSS JOIN short s
    )
    SELECT n_name, CAST(cents AS BIGINT) AS rev_cents,
           CAST(floor_alloc + CASE WHEN rnk <= leftover THEN 1 ELSE 0 END
                AS BIGINT) AS seats
    FROM ranked
    """,
    "largest-remainder (Hamilton) apportionment: allocate 1000 integer "
    "budget units across nations proportional to revenue, floors first, "
    "then the leftover units to the largest fractional remainders "
    "(tie-break n_name). ALL arithmetic is exact BIGINT (integer cents; "
    "1000*cents fits BIGINT up to ~$9.2e16 total revenue — widen to "
    "DECIMAL(38,0) beyond); quotas compared via integer div/mod, so both "
    "engines agree bit-for-bit with zero float ops. The output provably "
    "sums to exactly 1000. At 100 TB: the star join (broadcast dims) runs "
    "ONCE; total, leftover and remainder ranks are whole-frame windows "
    "over the 25-row aggregate, never re-derivations of the fact scan",
    ("relational", "allocation"),
)
def q186(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    rev = (
        t.orders.join(
            F.broadcast(t.customer), t.orders.o_custkey == t.customer.c_custkey
        )
        .join(
            F.broadcast(t.nation),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(
            F.sum(
                (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast(
                    "bigint"
                )
            )
            .cast("bigint")
            .alias("cents")
        )
    )
    # the star join runs ONCE: total, leftover, and remainder ranks are all
    # windows over the 25-row aggregate (whole-frame windows on a contracted
    # relation — never the fact table), not separate re-derivations of rev
    w_all = Window.partitionBy()
    ranked = (
        rev.withColumn("total", F.sum("cents").over(w_all))
        .select(
            "n_name",
            "cents",
            F.expr("(1000 * cents) DIV total").alias("floor_alloc"),
            ((F.lit(1000) * F.col("cents")) % F.col("total")).alias("rem"),
        )
        .withColumn(
            "leftover", F.lit(1000) - F.sum("floor_alloc").over(w_all)
        )
        .withColumn(
            "rnk",
            F.row_number().over(Window.orderBy(F.desc("rem"), "n_name")),
        )
    )
    return ranked.select(
        "n_name",
        F.col("cents").cast("bigint").alias("rev_cents"),
        (
            F.col("floor_alloc")
            + F.when(F.col("rnk") <= F.col("leftover"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("seats"),
    )


@register(
    "q187_bootstrap_ci",
    """
    WITH digests AS (
      SELECT g.g, md5('bs' || CAST(g.g AS VARCHAR) || '_'
                 || CAST(o_orderkey AS VARCHAR)) AS hx,
             CAST(o_totalprice AS DECIMAL(18,2)) AS p
      FROM orders CROSS JOIN generate_series(0, 7) AS g(g)
    ),
    reps AS (
      SELECT g * 4 + l.l AS b, substr(hx, 1 + 8 * l.l, 8) AS hs, p
      FROM digests CROSS JOIN generate_series(0, 3) AS l(l)
    ),
    mult AS (
      SELECT b,
             CASE WHEN hs < '5e2d58d8' THEN 0 WHEN hs < 'bc5ab1b0' THEN 1
                  WHEN hs < 'eb715e1f' THEN 2 WHEN hs < 'fb239797' THEN 3
                  WHEN hs < 'ff1025f5' THEN 4 ELSE 5 END AS m,
             p
      FROM reps
    ),
    means AS (
      SELECT b, CAST(SUM(m * p) AS DOUBLE) / SUM(m) AS rep_mean
      FROM mult GROUP BY b
    ),
    ranked AS (
      SELECT rep_mean, ROW_NUMBER() OVER (ORDER BY rep_mean, b) AS r
      FROM means
    ),
    pt AS (
      SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(*) AS point_mean
      FROM orders
    )
    SELECT pt.point_mean,
           MAX(CASE WHEN r = 2 THEN rep_mean END) AS ci_lo,
           MAX(CASE WHEN r = 31 THEN rep_mean END) AS ci_hi,
           CAST(32 AS BIGINT) AS n_reps
    FROM ranked CROSS JOIN pt
    GROUP BY pt.point_mean
    """,
    "deterministic Poisson bootstrap (Chamandy et al., the standard "
    "single-pass bootstrap for massive data): 32 resample replicas where "
    "each row's multiplicity in replica b is Poisson(1) via the inverse "
    "CDF of an md5 uniform — no rand(), identical multiplicities in both "
    "engines. Every digest is consumed fully: 4 independent 32-bit "
    "uniforms per md5 (8 digests cover all 32 replicas), quartering the "
    "per-row hash cost vs one digest per replica. Replica means are "
    "exact-DECIMAL weighted sums divided once (bit-identical doubles); "
    "the ~94% CI is rank-selected from the 32 sorted means. At 100 TB: "
    "the 32x explode contracts immediately in map-side partial "
    "aggregation (32 groups), so the shuffle carries 32 rows per "
    "partition, not 32x the data",
    ("relational", "stats", "sampling"),
)
def q187(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fluvii_spark.operators.stats import fan_out_scan

    t = load_tables(spark, sf_dir)
    # the 8 md5 digests/row + 32-lane explode are all MAP-side work before
    # the 32-group partial aggregation — a single-row-group orders scan
    # would run the whole hash chain on one task (no-op at cluster scale)
    orders = fan_out_scan(t.orders)
    digests = orders.select(
        "o_orderkey",
        F.col("o_totalprice").cast("decimal(18,2)").alias("p"),
        F.explode(F.sequence(F.lit(0), F.lit(7))).alias("g"),
    ).select(
        "g",
        "p",
        F.md5(
            F.concat(
                F.lit("bs"),
                F.col("g").cast("string"),
                F.lit("_"),
                F.col("o_orderkey").cast("string"),
            )
        ).alias("hx"),
    )
    # the lane explode happens AFTER the md5 projection, so each digest is
    # computed once and sliced four ways — 8 digests serve 32 replicas
    lanes = digests.select(
        "g", "p", "hx", F.explode(F.sequence(F.lit(0), F.lit(3))).alias("l")
    )
    # hex-order trick: fixed-width lowercase hex compares lexicographically
    # exactly like the integer it encodes, so the inverse-CDF thresholds are
    # 8-char hex literals (floor(T * 2^32) + 1) — no conv(), no division
    reps = lanes.select(
        (F.col("g") * 4 + F.col("l")).alias("b"),
        "p",
        F.expr("substring(hx, 1 + 8 * l, 8)").alias("hs"),
    )
    mult = reps.select(
        "b",
        "p",
        F.when(F.col("hs") < "5e2d58d8", 0)
        .when(F.col("hs") < "bc5ab1b0", 1)
        .when(F.col("hs") < "eb715e1f", 2)
        .when(F.col("hs") < "fb239797", 3)
        .when(F.col("hs") < "ff1025f5", 4)
        .otherwise(5)
        .alias("m"),
    )
    means = mult.groupBy("b").agg(
        (
            F.sum(F.col("m") * F.col("p")).cast("double") / F.sum("m")
        ).alias("rep_mean")
    )
    ranked = means.withColumn(
        "r", F.row_number().over(Window.orderBy("rep_mean", "b"))
    )
    pt = t.orders.agg(
        (
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
            / F.count("*")
        ).alias("point_mean")
    )
    return (
        ranked.crossJoin(F.broadcast(pt))
        .groupBy("point_mean")
        .agg(
            F.max(F.when(F.col("r") == 2, F.col("rep_mean"))).alias("ci_lo"),
            F.max(F.when(F.col("r") == 31, F.col("rep_mean"))).alias("ci_hi"),
            F.lit(32).cast("bigint").alias("n_reps"),
        )
    )


@register(
    "q188_mixture_epochs",
    """
    WITH src AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(len(list_filter(string_split(text, ' '),
                                      x -> x <> ''))) AS BIGINT) AS tokens
      FROM documents GROUP BY source
    ),
    tot AS (SELECT SUM(sqrt(CAST(tokens AS DOUBLE))) AS z FROM src)
    SELECT source, n_docs, tokens,
           sqrt(CAST(tokens AS DOUBLE)) / z AS target_share,
           1000000.0 * sqrt(CAST(tokens AS DOUBLE)) / z
             / CAST(tokens AS DOUBLE) AS epochs
    FROM src CROSS JOIN tot
    """,
    "training-mixture planning: per-source token inventory -> target "
    "mixture share (temperature-style sqrt upweighting of small sources, "
    "tau=2, as in multilingual LM sampling) -> epochs each source must "
    "repeat to fill a 1M-token budget at its share. sqrt is IEEE-exact; "
    "the 20-term share normalizer is float-summed (error ~1e-16 << 6-dp "
    "gate). The epochs column is exactly the over-sampling factor a data "
    "loader needs per source. At 100 TB: one scan, one hash aggregation "
    "to |sources| rows, 1-row broadcast scalar join — token counting uses "
    "codegen'd array HOFs, no Python",
    ("llm", "sampling"),
)
def q188(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    toks = F.size(
        F.filter(F.split("text", " "), lambda x: x != F.lit(""))
    )
    src = t.documents.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(toks).cast("bigint").alias("tokens"),
    )
    tot = src.agg(F.sum(F.sqrt(F.col("tokens").cast("double"))).alias("z"))
    share = F.sqrt(F.col("tokens").cast("double")) / F.col("z")
    return src.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "tokens",
        share.alias("target_share"),
        (F.lit(1000000.0) * share / F.col("tokens").cast("double")).alias(
            "epochs"
        ),
    )
