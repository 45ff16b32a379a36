"""Extended inventory, batch 6 (q147+, round 4): second-precision sketch
parity, plus further analytics coverage.

No counterpart in the reference (a Kafka client library — SURVEY.md §2.2);
determinism rules follow FIXTURES.md (md5-derived hashes, integer/dyadic
arithmetic before any float, 6-dp rounding on float outputs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fluvii_spark.io.readers import load_tables
from fluvii_spark.operators.text import md5_hash64
from fluvii_spark.queries import register

# HLL layout: b=6 index bits -> m=64 registers; the remaining w=26 hash bits
# feed the leading-zero rank. alpha_64 = 0.709 (Flajolet et al. 2007).
HLL_B = 6
HLL_M = 1 << HLL_B          # 64 registers
HLL_W = 32 - HLL_B          # 26 rank bits
HLL_DIV = 1 << HLL_W        # 2^26 splits index | rank
HLL_ALPHA = 0.709


@register(
    "q147_hll_distinct_sketch",
    f"""
    WITH pairs AS (SELECT DISTINCT event_type, user_id FROM events),
    hashed AS (
      SELECT event_type,
             (('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT)
               AS h
      FROM pairs
    ),
    regs AS (
      SELECT event_type, h // {HLL_DIV} AS idx,
             MAX(CASE WHEN h % {HLL_DIV} = 0 THEN {HLL_W + 1}
                 ELSE instr(lpad(bin(h % {HLL_DIV}), {HLL_W}, '0'), '1')
                 END) AS m_j
      FROM hashed GROUP BY 1, 2
    ),
    sums AS (
      SELECT event_type,
             SUM(1.0 / (CAST(1 AS BIGINT) << m_j))
               + ({HLL_M} - COUNT(*)) * 1.0 AS z
      FROM regs GROUP BY event_type
    ),
    exact AS (
      SELECT event_type, COUNT(DISTINCT user_id) AS exact_distinct
      FROM events GROUP BY event_type
    )
    SELECT s.event_type,
           CAST(e.exact_distinct AS BIGINT) AS exact_distinct,
           ROUND({HLL_ALPHA} * {HLL_M * HLL_M} / s.z, 6) AS hll_estimate
    FROM sums s JOIN exact e USING (event_type)
    """,
    f"HyperLogLog distinct-count sketch (m={HLL_M} registers) next to the "
    "exact answer — the second sketch precision alongside q102's KMV. The "
    "md5-derived 32-bit hash splits into a 6-bit register index and a "
    "26-bit rank word whose leading-zero count comes from STRING ops on "
    "the zero-padded binary form (instr of first '1'), so both engines run "
    "identical integer arithmetic — no libm log2. The register sum is a "
    "<= 64-term sum of dyadic rationals with exponents >= -27, exactly "
    "representable in a double in ANY order, so the ORACLE CHECKS THE "
    "SKETCH ITSELF bit-for-bit. At 100 TB: per-group state is m=64 bytes, "
    "mergeable by register-max — the groupBy is two hash aggregates, no "
    "window, no shuffle beyond the group keys",
    ("relational", "sketch"),
)
def q147(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    pairs = t.events.select("event_type", "user_id").distinct()
    hashed = pairs.select(
        "event_type",
        md5_hash64(F.col("user_id").cast("string")).alias("h"),
    )
    rank_word = F.col("h") % HLL_DIV
    rho = F.when(rank_word == 0, F.lit(HLL_W + 1)).otherwise(
        F.instr(F.lpad(F.bin(rank_word), HLL_W, "0"), "1")
    )
    regs = (
        hashed.select(
            "event_type",
            # integer DIV, not float /: h < 2^32 is exact in a double
            # today, but a wider hash would silently floor wrong (q151's
            # documented contract)
            F.expr(f"h DIV {HLL_DIV}").alias("idx"),
            rho.alias("rho"),
        )
        .groupBy("event_type", "idx")
        .agg(F.max("rho").alias("m_j"))
    )
    sums = regs.groupBy("event_type").agg(
        (
            F.sum(F.expr("1.0 / shiftleft(cast(1 as bigint), m_j)"))
            + (HLL_M - F.count("*")) * F.lit(1.0)
        ).alias("z")
    )
    exact = t.events.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("bigint").alias("exact_distinct")
    )
    return sums.join(exact, "event_type").select(
        "event_type",
        "exact_distinct",
        F.round(F.lit(HLL_ALPHA) * (HLL_M * HLL_M) / F.col("z"), 6).alias(
            "hll_estimate"
        ),
    )


KMV_K = 64
KMV_SALTS = 32


@register(
    "q148_kmv_intersection",
    f"""
    WITH pairs AS (SELECT DISTINCT event_type, user_id FROM events),
    hashed AS (
      SELECT event_type, user_id,
             (('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT)
               / 4294967296.0 AS h
      FROM pairs
    ),
    sk_rows AS (
      SELECT event_type, user_id, h FROM (
        SELECT event_type, user_id, h,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY h, user_id) AS rn
        FROM hashed
      ) WHERE rn <= {KMV_K}
    ),
    est AS (
      SELECT event_type, COUNT(*) AS n_kept, MAX(h) AS h_k FROM sk_rows
      GROUP BY event_type
    ),
    tp AS (
      SELECT a.event_type AS ta, b.event_type AS tb
      FROM (SELECT DISTINCT event_type FROM events) a
      JOIN (SELECT DISTINCT event_type FROM events) b
        ON a.event_type < b.event_type
    ),
    u_rows AS (
      SELECT DISTINCT tp.ta, tp.tb, s.user_id, s.h
      FROM tp JOIN sk_rows s
        ON s.event_type = tp.ta OR s.event_type = tp.tb
    ),
    u_ranked AS (
      SELECT ta, tb, h,
             row_number() OVER (PARTITION BY ta, tb
                                ORDER BY h, user_id) AS rn
      FROM u_rows
    ),
    est_u AS (
      SELECT ta, tb, COUNT(*) AS n_kept, MAX(h) AS h_k FROM u_ranked
      WHERE rn <= {KMV_K} GROUP BY ta, tb
    ),
    exact_i AS (
      SELECT tp.ta, tp.tb, COUNT(*) AS exact_inter
      FROM tp
      JOIN pairs pa ON pa.event_type = tp.ta
      JOIN pairs pb ON pb.event_type = tp.tb AND pb.user_id = pa.user_id
      GROUP BY tp.ta, tp.tb
    )
    SELECT e.ta, e.tb,
           CAST(COALESCE(x.exact_inter, 0) AS BIGINT) AS exact_inter,
           ROUND(
             (CASE WHEN ea.n_kept < {KMV_K} THEN CAST(ea.n_kept AS DOUBLE)
                   ELSE ({KMV_K} - 1) / ea.h_k END)
             + (CASE WHEN eb.n_kept < {KMV_K} THEN CAST(eb.n_kept AS DOUBLE)
                     ELSE ({KMV_K} - 1) / eb.h_k END)
             - (CASE WHEN e.n_kept < {KMV_K} THEN CAST(e.n_kept AS DOUBLE)
                     ELSE ({KMV_K} - 1) / e.h_k END),
             6) AS kmv_inter_estimate
    FROM est_u e
    JOIN est ea ON ea.event_type = e.ta
    JOIN est eb ON eb.event_type = e.tb
    LEFT JOIN exact_i x ON x.ta = e.ta AND x.tb = e.tb
    """,
    f"KMV set-INTERSECTION estimate via inclusion-exclusion, completing "
    "the sketch algebra (q102 build, q104 union-merge, q147 HLL second "
    f"precision): |A∩B| ≈ est(A) + est(B) − est(A∪B), where est(A∪B) "
    "merges the two k-min sets and re-truncates to k. All arithmetic on "
    "md5-derived doubles with identical expression trees, so the oracle "
    "checks the estimator bit-for-bit. Scale shape: the per-type k-min "
    "build is TWO-LEVEL (k smallest per (type, salt) shard, then k "
    "smallest of the ≤ salts·k survivors) so no raw-relation window ever "
    "sees a whole type's rows in one task; every later stage operates on "
    "≤ k·|types| sketch rows",
    ("relational", "sketch"),
)
def q148(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    # pairs has THREE consumers (the sketch path, the exact-intersection
    # pass, and the type-pair relation) and a distinct's exchange is not
    # plan-reused across differently-projected consumers — un-checkpointed,
    # the events scan + corpus-wide distinct executed 4× (9 parquet scans
    # in the before-plan). One materialization feeds all consumers; at any
    # scale the removed work is three extra corpus scans + distincts.
    pairs = (
        t.events.select("event_type", "user_id")
        .distinct()
        .localCheckpoint(eager=False)
    )
    hashed = pairs.withColumn(
        "h",
        md5_hash64(F.col("user_id").cast("string")) / F.lit(4294967296.0),
    )
    # two-level exact k-min: the k smallest of a set are always within the
    # union of each shard's k smallest, so local top-k per (type, salt)
    # bounds every window partition; the global pass ranks ≤ salts*k rows
    local = (
        hashed.withColumn("salt", F.pmod("user_id", F.lit(KMV_SALTS)))
        .withColumn(
            "lrn",
            F.row_number().over(
                Window.partitionBy("event_type", "salt").orderBy(
                    "h", "user_id"
                )
            ),
        )
        .filter(F.col("lrn") <= KMV_K)
    )
    sk_rows = (
        local.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("event_type").orderBy("h", "user_id")
            ),
        )
        .filter(F.col("rn") <= KMV_K)
        .select("event_type", "user_id", "h")
        # ≤ |types|·K rows, consumed by est AND u_rows: a lazy checkpoint
        # of this tiny relation keeps the two ranking windows over the
        # corpus from executing twice
        .localCheckpoint(eager=False)
    )
    est = sk_rows.groupBy("event_type").agg(
        F.count("*").alias("n_kept"), F.max("h").alias("h_k")
    )
    # same type set as events' distinct event_type: every non-empty type
    # keeps at least its rn=1 row through BOTH k-min windows (NULL-user
    # rows included — row_number ranks NULL h too), so the distinct types
    # of sk_rows equal the distinct types of pairs. Reading them off the
    # ≤|types|·K checkpoint instead of the corpus-sized pairs checkpoint
    # drops pairs' third consumer (r12, VERDICT #2 — one less corpus
    # cache pass at scale).
    types = sk_rows.select("event_type").distinct()
    tp = (
        types.alias("a")
        .join(
            types.alias("b"),
            F.col("a.event_type") < F.col("b.event_type"),
        )
        .select(
            F.col("a.event_type").alias("ta"),
            F.col("b.event_type").alias("tb"),
        )
    )
    u_rows = (
        F.broadcast(tp)
        .join(
            sk_rows,
            (F.col("event_type") == F.col("ta"))
            | (F.col("event_type") == F.col("tb")),
        )
        .select("ta", "tb", "user_id", "h")
        .distinct()
    )
    est_u = (
        u_rows.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("ta", "tb").orderBy("h", "user_id")
            ),
        )
        .filter(F.col("rn") <= KMV_K)
        .groupBy("ta", "tb")
        .agg(F.count("*").alias("n_kept"), F.max("h").alias("h_k"))
    )
    # exact intersection by per-user set contraction (the q198 edge-builder
    # pattern) instead of the pairs⋈pairs self-join that shuffled the
    # corpus-sized pairs relation twice and SMJ'd: collect each user's
    # distinct types (bounded by |event types|, a schema constant), expand
    # the sorted x<y pairs in-row, count per pair. The NULL-user filter
    # matches the oracle's equi-join semantics (NULL = NULL never joins),
    # so the counts are identical by construction.
    exact_i = (
        pairs.where(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(F.sort_array(F.collect_set("event_type")).alias("ts"))
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ts, (x, i) ->"
                    " transform(slice(ts, i + 2, size(ts)),"
                    " y -> struct(x as ta, y as tb))))"
                )
            ).alias("p")
        )
        .groupBy("p.ta", "p.tb")
        .agg(F.count("*").alias("exact_inter"))
        .select(F.col("ta"), F.col("tb"), "exact_inter")
    )

    def kmv_est(n_kept, h_k):
        return F.when(n_kept < KMV_K, n_kept.cast("double")).otherwise(
            F.lit(KMV_K - 1) / h_k
        )

    ea = est.select(
        F.col("event_type").alias("ta"),
        F.col("n_kept").alias("na"),
        F.col("h_k").alias("ha"),
    )
    eb = est.select(
        F.col("event_type").alias("tb"),
        F.col("n_kept").alias("nb"),
        F.col("h_k").alias("hb"),
    )
    return (
        est_u.join(F.broadcast(ea), "ta")
        .join(F.broadcast(eb), "tb")
        .join(exact_i, ["ta", "tb"], "left")
        .select(
            "ta",
            "tb",
            F.coalesce(F.col("exact_inter"), F.lit(0))
            .cast("bigint")
            .alias("exact_inter"),
            F.round(
                kmv_est(F.col("na"), F.col("ha"))
                + kmv_est(F.col("nb"), F.col("hb"))
                - kmv_est(F.col("n_kept"), F.col("h_k")),
                6,
            ).alias("kmv_inter_estimate"),
        )
    )


SAMPLE_PER_LANG = 20


@register(
    "q149_per_group_sample",
    f"""
    WITH ranked AS (
      SELECT lang, doc_id,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents
    )
    SELECT lang, CAST(rn AS BIGINT) AS sample_rank,
           CAST(doc_id AS BIGINT) AS doc_id
    FROM ranked WHERE rn <= {SAMPLE_PER_LANG}
    """,
    f"deterministic fixed-size sample per group (cap {SAMPLE_PER_LANG} "
    "docs per language): rank by md5(doc_id) — a uniform, seedless, "
    "replay-stable permutation — and keep the first n per lang. The "
    "training-data 'cap each domain' operator, without rand() so retries "
    "and both engines agree exactly. Per-lang ranks come from DISTRIBUTED "
    "ranking over the composite (lang, md5, doc_id) order minus broadcast "
    "per-lang base offsets (operators/ranking.py) — the oracle's "
    "PARTITION BY lang window would funnel each language through one task "
    "at 100 TB",
    ("llm", "sampling"),
)
def q149(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fluvii_spark.operators.ranking import distributed_row_number

    t = load_tables(spark, sf_dir)
    keyed = t.documents.select(
        "lang",
        F.md5(F.col("doc_id").cast("string")).alias("hkey"),
        "doc_id",
    )
    ranked = distributed_row_number(keyed, ["lang", "hkey", "doc_id"])
    base = ranked.groupBy("lang").agg(F.min("rnk").alias("base"))
    return (
        ranked.join(F.broadcast(base), "lang")
        .withColumn("rn", F.col("rnk") - F.col("base") + 1)
        .filter(F.col("rn") <= SAMPLE_PER_LANG)
        .select(
            "lang",
            F.col("rn").cast("bigint").alias("sample_rank"),
            F.col("doc_id").cast("bigint").alias("doc_id"),
        )
    )


TOKEN_QS = [0.25, 0.5, 0.75]


@register(
    "q150_token_quantiles_by_lang",
    """
    WITH counts AS (
      SELECT lang,
             CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tokens
      FROM documents
    ),
    qs AS (
      SELECT lang,
             unnest([0.25, 0.5, 0.75]) AS p,
             unnest(quantile_cont(n_tokens, [0.25, 0.5, 0.75])) AS quantile
      FROM counts GROUP BY lang
    )
    SELECT lang, p, ROUND(quantile, 6) AS quantile FROM qs
    """,
    "whitespace-token-count quartiles per language — the sequence-length "
    "profile that sizes packing and truncation budgets. Exact interpolated "
    "quantiles via the value-counts contraction "
    "(grouped_quantiles_lowcard: token counts are bounded small integers, "
    "so one map-side groupBy(lang, n).count() replaces the ranking "
    "shuffle; order statistics are in-row cumulative lookups), checked "
    "against DuckDB's quantile_cont which shares the pos = 1+(n-1)p "
    "interpolation rule",
    ("llm", "quantile", "order-statistics"),
)
def q150(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fluvii_spark.operators.ranking import grouped_quantiles_lowcard

    t = load_tables(spark, sf_dir)
    counts = t.documents.select(
        "lang",
        F.size(F.split(F.col("text"), " ")).cast("double").alias("n_tokens"),
    )
    # whitespace-token counts are small integers bounded by document
    # length (a schema property, not a corpus property), so the §2.3
    # value-counts contraction applies: the scan collapses map-side to
    # |lang|·|distinct lengths| rows before its only shuffle instead of
    # range-repartitioning every document row. Result-identical to
    # grouped_exact_quantiles (operator contract + test_ranking).
    return grouped_quantiles_lowcard(counts, ["lang"], "n_tokens", TOKEN_QS)


@register(
    "q151_rfm_segments",
    """
    WITH rfm AS (
      SELECT o_custkey,
             MAX(o_orderdate) AS last_order,
             COUNT(*) AS freq,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary
      FROM orders GROUP BY o_custkey
    ),
    n AS (SELECT COUNT(*) AS n FROM rfm),
    b AS (
      SELECT o_custkey, freq, monetary,
             ((row_number() OVER (ORDER BY last_order, o_custkey) - 1) * 4)
               // n.n + 1 AS r_bucket,
             ((row_number() OVER (ORDER BY freq, o_custkey) - 1) * 4)
               // n.n + 1 AS f_bucket,
             ((row_number() OVER (ORDER BY monetary, o_custkey) - 1) * 4)
               // n.n + 1 AS m_bucket
      FROM rfm, n
    )
    SELECT CAST(r_bucket AS BIGINT) AS r_bucket,
           CAST(f_bucket AS BIGINT) AS f_bucket,
           CAST(m_bucket AS BIGINT) AS m_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND(CAST(SUM(monetary) AS DOUBLE), 2) AS segment_revenue
    FROM b GROUP BY 1, 2, 3
    """,
    "RFM (recency/frequency/monetary) customer segmentation: quartile "
    "bucket per dimension via the RANK-based rule bucket = "
    "floor((rn-1)*4/n)+1 — pure integer arithmetic, no value-boundary "
    "float membership flips, unique (metric, custkey) tie-breaks. Each of "
    "the three global ranks is a distributed_row_number pass (range "
    "repartition + broadcast offsets), never a single-task global window; "
    "monetary sums are DECIMAL-exact before the final 2-dp rounding",
    ("relational", "segmentation", "order-statistics"),
)
def q151(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fluvii_spark.operators.ranking import distributed_row_number

    t = load_tables(spark, sf_dir)
    rfm = t.orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count("*").alias("freq"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("monetary"),
    )
    rfm = rfm.localCheckpoint(eager=False)  # three rank passes, one scan
    # customer count as a broadcast scalar, not an eager .count() job at
    # plan-build time (the package rule: no jobs before execution)
    n_row = rfm.agg(F.count("*").alias("_n"))

    def bucket(order_cols: list[str], name: str) -> DataFrame:
        ranked = distributed_row_number(rfm, order_cols, out_col="_rnk")
        return ranked.crossJoin(F.broadcast(n_row)).select(
            "o_custkey",
            # integer DIV, as the docstring promises and the oracle's //
            # computes — double division + cast is value-equal at sane
            # cardinalities but is not the "pure integer arithmetic"
            # contract, and is fragile under refactoring
            (F.expr("((_rnk - 1) * 4) DIV _n") + 1).alias(name),
        )

    r = bucket(["last_order", "o_custkey"], "r_bucket")
    f_ = bucket(["freq", "o_custkey"], "f_bucket")
    m = bucket(["monetary", "o_custkey"], "m_bucket")
    return (
        rfm.join(r, "o_custkey")
        .join(f_, "o_custkey")
        .join(m, "o_custkey")
        .groupBy("r_bucket", "f_bucket", "m_bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_customers"),
            F.round(F.sum("monetary").cast("double"), 2).alias(
                "segment_revenue"
            ),
        )
        .select(
            F.col("r_bucket").cast("bigint").alias("r_bucket"),
            F.col("f_bucket").cast("bigint").alias("f_bucket"),
            F.col("m_bucket").cast("bigint").alias("m_bucket"),
            "n_customers",
            "segment_revenue",
        )
    )


@register(
    "q152_pareto_topshare",
    """
    WITH spend AS (
      SELECT o_custkey,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS s
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT s,
             row_number() OVER (ORDER BY s DESC, o_custkey) AS rn,
             SUM(s) OVER (ORDER BY s DESC, o_custkey
                          ROWS UNBOUNDED PRECEDING) AS cum
      FROM spend
    ),
    tot AS (SELECT SUM(s) AS total, COUNT(*) AS n FROM spend)
    SELECT CAST(MIN(rn) AS BIGINT) AS top_customers,
           CAST(MAX(tot.n) AS BIGINT) AS all_customers,
           ROUND(CAST(MIN(rn) AS DOUBLE) / MAX(tot.n) * 100, 6)
             AS top_pct
    FROM ranked, tot WHERE 5 * cum >= 4 * tot.total
    """,
    "Pareto concentration: the smallest top-N customers (by total spend) "
    "covering >= 80% of revenue. The running revenue total in spend-desc "
    "order comes from distributed_running_sum (range repartition + local "
    "cumsum + broadcast partition-total prefix — the prefix-sum twin of "
    "distributed_row_number, exact on DECIMAL), and the 80% gate is the "
    "integer-exact predicate 5*cum >= 4*total, so no float boundary "
    "decides membership",
    ("relational", "order-statistics"),
)
def q152(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fluvii_spark.operators.ranking import distributed_running_sum

    t = load_tables(spark, sf_dir)
    spend = t.orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("s")
    )
    spend = spend.localCheckpoint(eager=False)
    ranked = distributed_running_sum(
        spend,
        [F.col("s").desc(), F.col("o_custkey")],
        "s",
        out_col="cum",
        rank_col="rn",
    )
    tot = spend.agg(
        F.sum("s").alias("total"), F.count("*").alias("n_cust")
    )
    hit = (
        ranked.crossJoin(F.broadcast(tot))
        .filter(F.lit(5) * F.col("cum") >= F.lit(4) * F.col("total"))
        .agg(
            F.min("rn").cast("bigint").alias("top_customers"),
            F.max("n_cust").cast("bigint").alias("all_customers"),
        )
    )
    return hit.select(
        "top_customers",
        "all_customers",
        F.round(
            F.col("top_customers").cast("double")
            / F.col("all_customers")
            * 100,
            6,
        ).alias("top_pct"),
    )


ASOF_FWD_TOL_S = 24 * 3600  # 1 day


@register(
    "q153_asof_forward",
    f"""
    WITH l AS (SELECT user_id, ts, event_id FROM events
               WHERE event_type = 'view'),
         r AS (SELECT user_id, ts, MAX(event_id) AS purchase_id FROM events
               WHERE event_type = 'purchase' GROUP BY user_id, ts)
    SELECT l.event_id, l.user_id,
           CASE WHEN epoch_us(r.ts) - epoch_us(l.ts)
                     <= {ASOF_FWD_TOL_S * 1_000_000}
                THEN r.purchase_id END AS right_purchase_id
    FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND r.ts >= l.ts
    """,
    "FORWARD as-of join with tolerance: each view matched to the user's "
    "EARLIEST purchase at-or-after it, voided beyond 24h — the "
    "time-to-conversion primitive. Same one-shuffle union+last() window "
    "strategy as the backward q69, ordered descending (operators/asof.py "
    "direction='forward'); oracle is DuckDB's native ASOF JOIN with >= "
    "plus an identical integer-microsecond tolerance gate",
    ("relational", "join", "asof"),
)
def q153(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fluvii_spark.operators.asof import asof_join

    t = load_tables(spark, sf_dir)
    ev = t.events
    left = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id"
    )
    right = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("purchase_id"))
    )
    return asof_join(
        left,
        right,
        ["user_id"],
        "ts",
        "ts",
        right_payload=["purchase_id"],
        tolerance_s=ASOF_FWD_TOL_S,
        direction="forward",
    ).select("event_id", "user_id", "right_purchase_id")


@register(
    "q154_except_all_multiset",
    """
    WITH a AS (SELECT user_id, event_type FROM events
               WHERE value >= 50),
         b AS (SELECT user_id, event_type FROM events
               WHERE event_type IN ('view', 'click')),
         d AS (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM d GROUP BY event_type
    """,
    "EXCEPT ALL multiset difference (bag semantics: each b-occurrence "
    "cancels ONE a-occurrence, surviving duplicates keep their "
    "multiplicity) — the set-op q20 doesn't cover (its EXCEPT is "
    "distinct-based). Spark's exceptAll plans the same "
    "count-difference-and-replicate shape both engines use; grouped "
    "counts summarize the surviving bag",
    ("relational", "setops"),
)
def q154(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    a = t.events.filter(F.col("value") >= 50).select("user_id", "event_type")
    b = t.events.filter(
        F.col("event_type").isin("view", "click")
    ).select("user_id", "event_type")
    return (
        a.exceptAll(b)
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.count_distinct("user_id").cast("bigint").alias("n_users"),
        )
    )


NOVELTY_N = 3


@register(
    "q155_shingle_novelty",
    f"""
    WITH toks AS (
      SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents
    ),
    idx AS (
      SELECT doc_id, lang, w,
             unnest(generate_series(1, len(w) - 2)) AS i
      FROM toks WHERE len(w) >= 3
    ),
    sh AS (
      SELECT DISTINCT doc_id, lang,
             w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
      FROM idx
    ),
    first_owner AS (
      SELECT shingle, MIN(doc_id) AS owner FROM sh GROUP BY shingle
    ),
    per_doc AS (
      SELECT s.doc_id, s.lang,
             COUNT(*) AS n_shingles,
             COUNT(CASE WHEN f.owner = s.doc_id THEN 1 END) AS n_novel
      FROM sh s JOIN first_owner f USING (shingle)
      GROUP BY s.doc_id, s.lang
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_shingles) AS BIGINT) AS total_shingles,
           CAST(SUM(n_novel) AS BIGINT) AS novel_shingles,
           ROUND(CAST(SUM(n_novel) AS DOUBLE) / SUM(n_shingles), 6)
             AS novelty_rate
    FROM per_doc GROUP BY lang
    """,
    f"corpus novelty curve: per language, the share of each document's "
    f"distinct {NOVELTY_N}-gram shingles whose FIRST owner (min doc_id "
    "over the whole corpus) is the document itself — the dataset-ordering "
    "diagnostic for dedup planning (low novelty = the tail re-treads the "
    "head). One shingle-explode feeding two hash aggregates (per-doc "
    "shingle counts; first-owner counts per owner) joined at DOC "
    "granularity — the join never touches the exploded relation, no "
    "pairing, no window; the integer novel/total counts divide once per "
    "lang at the end",
    ("llm", "dedup", "text"),
)
def q155(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fluvii_spark.operators.stats import fan_out_scan

    t = load_tables(spark, sf_dir)
    # parallel 3-gram explode when the scan is under-partitioned
    # (2.3 s → 1.1 s solo at sf0.1; no-op at cluster scale)
    sh = (
        fan_out_scan(t.documents).select(
            "doc_id",
            "lang",
            F.explode(
                # CASE guard (the word_shingles pattern): sequence(1, 0)
                # counts DOWN to [1, 0] and slice(.., 0, 3) is a runtime
                # error — a single <=2-token document would abort the job
                F.expr(
                    "CASE WHEN size(split(text, ' ')) >= 3 THEN"
                    " transform(sequence(1, size(split(text, ' ')) - 2),"
                    " i -> concat_ws(' ', slice(split(text, ' '), i, 3)))"
                    " ELSE array() END"
                )
            ).alias("shingle"),
        )
        .distinct()
    )
    first_owner = sh.groupBy("shingle").agg(F.min("doc_id").alias("owner"))
    # n_novel per doc is just a count over first_owner grouped by owner, so
    # the join happens at DOC granularity (|docs| rows), never at shingle
    # granularity — the shingle-level equi-join back would shuffle the whole
    # exploded relation a second time for values two tiny aggregates carry.
    per_doc_counts = sh.groupBy("doc_id", "lang").agg(
        F.count("*").alias("n_shingles")
    )
    novel_counts = first_owner.groupBy(
        F.col("owner").alias("doc_id")
    ).agg(F.count("*").alias("n_novel"))
    per_doc = per_doc_counts.join(novel_counts, "doc_id", "left").select(
        "doc_id",
        "lang",
        "n_shingles",
        F.coalesce(F.col("n_novel"), F.lit(0)).alias("n_novel"),
    )
    return per_doc.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_shingles").cast("bigint").alias("total_shingles"),
        F.sum("n_novel").cast("bigint").alias("novel_shingles"),
        F.round(
            F.sum("n_novel").cast("double") / F.sum("n_shingles"), 6
        ).alias("novelty_rate"),
    )


@register(
    "q156_tokenizer_fertility",
    r"""
    WITH m AS (
      SELECT lang,
             CAST(strlen(text) AS BIGINT) AS n_bytes,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws,
             CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+'))
                  AS BIGINT) AS n_re
      FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
           CAST(SUM(n_ws) AS BIGINT) AS ws_tokens,
           CAST(SUM(n_re) AS BIGINT) AS re_tokens,
           ROUND(CAST(SUM(n_bytes) AS DOUBLE) / SUM(n_ws), 6)
             AS bytes_per_ws_token,
           ROUND(CAST(SUM(n_re) AS DOUBLE) / SUM(n_ws), 6)
             AS fertility
    FROM m GROUP BY lang
    """,
    "tokenizer fertility profile per language: bytes per whitespace token "
    "and the ratio of BPE-ish regex tokens ([A-Za-z0-9]+ runs — identical "
    "semantics in Java regex and DuckDB RE2) to whitespace tokens — the "
    "number that converts a byte budget into a token budget per language. "
    "Pure per-row expressions + one hash aggregate: whole-stage-codegen "
    "all the way, integer sums divided once per group",
    ("llm", "text", "tokenization"),
)
def q156(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    m = t.documents.select(
        "lang",
        # octet_length = BYTES, matching duckdb strlen; F.length counts
        # CHARACTERS and diverges on any multi-byte UTF-8 text
        F.octet_length("text").cast("bigint").alias("n_bytes"),
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_ws"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[A-Za-z0-9]+"), 0))
        .cast("bigint")
        .alias("n_re"),
    )
    return m.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_bytes").cast("bigint").alias("total_bytes"),
        F.sum("n_ws").cast("bigint").alias("ws_tokens"),
        F.sum("n_re").cast("bigint").alias("re_tokens"),
        F.round(
            F.sum("n_bytes").cast("double") / F.sum("n_ws"), 6
        ).alias("bytes_per_ws_token"),
        F.round(F.sum("n_re").cast("double") / F.sum("n_ws"), 6).alias(
            "fertility"
        ),
    )


CTX_LEN = 128


@register(
    "q157_context_window_yield",
    f"""
    WITH m AS (
      SELECT lang,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok // {CTX_LEN}) AS BIGINT) AS full_windows,
           CAST(SUM(n_tok % {CTX_LEN}) AS BIGINT) AS leftover_tokens,
           CAST(COUNT(CASE WHEN n_tok < {CTX_LEN} THEN 1 END) AS BIGINT)
             AS short_docs,
           ROUND(CAST(SUM(n_tok // {CTX_LEN}) * {CTX_LEN} AS DOUBLE)
                 / SUM(n_tok), 6) AS yield_rate
    FROM m GROUP BY lang
    """,
    f"context-window yield: with a {CTX_LEN}-token window and "
    "no-cross-document packing, how many full windows each language "
    "yields, how many tokens fall off as leftovers, and the share of the "
    "corpus that survives (the truncate-vs-pack planning number feeding "
    "q80's packer). Integer floor/mod arithmetic per row + one hash "
    "aggregate; the single division per group happens after exact integer "
    "sums",
    ("llm", "packing", "tokenization"),
)
def q157(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    m = t.documents.select(
        "lang",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tok"),
    )
    return m.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.expr(f"n_tok DIV {CTX_LEN}")).cast("bigint").alias(
            "full_windows"
        ),
        F.sum(F.col("n_tok") % CTX_LEN).cast("bigint").alias(
            "leftover_tokens"
        ),
        F.count(F.when(F.col("n_tok") < CTX_LEN, 1))
        .cast("bigint")
        .alias("short_docs"),
        F.round(
            (F.sum(F.expr(f"n_tok DIV {CTX_LEN}")) * CTX_LEN).cast("double")
            / F.sum("n_tok"),
            6,
        ).alias("yield_rate"),
    )


DISC_PS = [0.25, 0.5, 0.75]


@register(
    "q158_percentile_disc",
    """
    WITH v AS (
      SELECT event_type, value, event_id FROM events
      WHERE value IS NOT NULL
    ),
    ranked AS (
      SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM v
    ),
    probes AS (SELECT unnest([0.25, 0.5, 0.75]) AS p)
    SELECT r.event_type, pr.p, r.value AS value_disc
    FROM ranked r JOIN probes pr
      ON r.rn = CAST(ceiling(pr.p * r.n) AS BIGINT)
    """,
    "DISCRETE percentiles (percentile_disc semantics: the actual value at "
    "rank ceil(p*n), never interpolated) per event type — the companion "
    "to q150's continuous quantiles, needed when the statistic must be an "
    "observed value (latency SLOs, price points). Rank ceil(p*n) is exact "
    "integer-adjacent arithmetic (p dyadic, p*n exact in a double). Ranks "
    "come from distributed_row_number + broadcast per-group offsets, not "
    "a few-key global window; the probe join touches 3 rows per group",
    ("relational", "quantile", "order-statistics"),
)
def q158(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fluvii_spark.operators.ranking import distributed_row_number

    t = load_tables(spark, sf_dir)
    v = t.events.filter(F.col("value").isNotNull()).select(
        "event_type", "value", "event_id"
    )
    ranked = distributed_row_number(v, ["event_type", "value", "event_id"])
    # break lineage ambiguity: the probe side re-aggregates the SAME ranked
    # frame, so give its columns fresh names before the self-join
    grp = ranked.groupBy("event_type").agg(
        F.min("rnk").alias("base"), F.count("*").alias("n")
    )
    probes = (
        grp.select(
            F.col("event_type").alias("_et"),
            "base",
            F.explode(F.array(*[F.lit(p) for p in DISC_PS])).alias("p"),
            F.col("n"),
        )
        .select(
            "_et",
            "p",
            (F.ceil(F.col("p") * F.col("n")) + F.col("base") - 1).alias(
                "_target"
            ),
        )
    )
    return (
        ranked.join(
            F.broadcast(probes),
            (F.col("event_type") == F.col("_et"))
            & (F.col("rnk") == F.col("_target")),
        )
        .select(
            "event_type",
            "p",
            F.col("value").alias("value_disc"),
        )
    )


@register(
    "q159_trend_slope",
    """
    WITH daily AS (
      SELECT event_type,
             epoch_us(ts) // 86400000000 AS day,
             SUM(CAST(value AS DECIMAL(18,6))) AS y
      FROM events GROUP BY 1, 2
    ),
    rebased AS (
      SELECT event_type,
             day - MIN(day) OVER (PARTITION BY event_type) AS x, y
      FROM daily
    ),
    s AS (
      SELECT event_type,
             COUNT(*) AS n,
             SUM(x) AS sx,
             SUM(y) AS sy,
             SUM(x * x) AS sxx,
             SUM(x * y) AS sxy
      FROM rebased GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope_per_day
    FROM s WHERE n * sxx - sx * sx > 0
    """,
    "daily revenue trend: exact closed-form OLS slope per event type over "
    "the day index. x is a small rebased integer, y a DECIMAL-exact daily "
    "sum, so every moment (Sx, Sy, Sxx, Sxy) is exact integer/decimal "
    "arithmetic — order-independent across both engines — and the single "
    "double division happens on bit-identical numerators. Two hash "
    "aggregates over the daily relation; the rebase window runs per type "
    "over |days| rows, not the raw stream",
    ("relational", "timeseries", "regression"),
)
def q159(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    daily = (
        t.events.select(
            "event_type",
            F.expr(
                "unix_micros(cast(ts as timestamp)) DIV 86400000000"
            ).alias("day"),
            F.col("value").cast("decimal(18,6)").alias("v"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("v").alias("y"))
    )
    rebased = daily.join(
        F.broadcast(
            daily.groupBy("event_type").agg(F.min("day").alias("day0"))
        ),
        "event_type",
    ).select(
        "event_type", (F.col("day") - F.col("day0")).alias("x"), "y"
    )
    s = rebased.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    denom = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return s.filter(denom > 0).select(
        "event_type",
        F.col("n").cast("bigint").alias("n_days"),
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
                "double"
            )
            / denom.cast("double"),
            6,
        ).alias("slope_per_day"),
    )


@register(
    "q160_degree_assortativity",
    """
    WITH edges AS (
      SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem
    ),
    dp AS (SELECT p, COUNT(*) AS deg_p FROM edges GROUP BY p),
    ds AS (SELECT s, COUNT(*) AS deg_s FROM edges GROUP BY s),
    e AS (
      SELECT dp.deg_p AS x, ds.deg_s AS y
      FROM edges JOIN dp USING (p) JOIN ds USING (s)
    ),
    m AS (
      SELECT COUNT(*) AS n,
             SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
             SUM(CAST(x AS HUGEINT) * x) AS sxx,
             SUM(CAST(y AS HUGEINT) * y) AS syy,
             SUM(CAST(x AS HUGEINT) * y) AS sxy
      FROM e
    )
    SELECT CAST(n AS BIGINT) AS n_edges,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                    * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6)
             AS assortativity
    FROM m
    """,
    "degree assortativity of the part-supplier bipartite graph: Pearson "
    "correlation, over edges, between the part's degree and the "
    "supplier's degree — do well-connected parts ship via well-connected "
    "suppliers? Every moment is an exact integer sum (degrees are "
    "counts) carried in 128-bit/DECIMAL(38,0) — int64 moments overflow "
    "once Σdeg² exceeds 2^63, which the g=10 growth corpus already "
    "triggers (caught r9; q225/q202's recipe applied) — the only floats "
    "are two IEEE-correctly-rounded sqrts and one division on "
    "bit-identical inputs. Plan: one distinct pass + two count-windows "
    "attach both endpoint degrees in place — one corpus scan, no joins, "
    "no adjacency materialization beyond degrees",
    ("relational", "graph"),
)
def q160(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    # the degree-table form (groupBy + join-back) gives edges THREE
    # consumers and the distinct's exchange is not plan-reused across
    # them — the lineitem scan + corpus-wide distinct ran three times
    # (6 parquet scans in the uncut plan). Two count-windows over the
    # ONE distinct relation compute the same per-edge degrees with a
    # single scan and no join; per-key partitions are schema-bounded
    # (suppliers-per-part / parts-per-supplier ratios), not corpus-hot
    edges = t.lineitem.select(
        F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s")
    ).distinct()
    e = edges.withColumn(
        "x", F.count("*").over(Window.partitionBy("p"))
    ).withColumn("y", F.count("*").over(Window.partitionBy("s")))
    # moments in DECIMAL(38,0) (duck: HUGEINT): Σdeg² over the edge list
    # passes 2^63 long before 100 TB — the g=10 growth corpus already
    # aborts the int64 form with ARITHMETIC_OVERFLOW — while the final
    # n·Σxy − Σx·Σy products stay ≪ 1e38 at any real scale; both engines
    # convert the identical exact integers to double exactly once
    dx = F.col("x").cast("decimal(38,0)")
    dy = F.col("y").cast("decimal(38,0)")
    m = e.agg(
        F.count("*").cast("decimal(38,0)").alias("n"),
        F.sum(dx).alias("sx"),
        F.sum(dy).alias("sy"),
        F.sum(dx * F.col("x")).alias("sxx"),
        F.sum(dy * F.col("y")).alias("syy"),
        F.sum(dx * F.col("y")).alias("sxy"),
    )
    return m.select(
        F.col("n").cast("bigint").alias("n_edges"),
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
                "double"
            )
            / (
                F.sqrt(
                    (
                        F.col("n") * F.col("sxx")
                        - F.col("sx") * F.col("sx")
                    ).cast("double")
                )
                * F.sqrt(
                    (
                        F.col("n") * F.col("syy")
                        - F.col("sy") * F.col("sy")
                    ).cast("double")
                )
            ),
            6,
        ).alias("assortativity"),
    )


@register(
    "q161_char_gini_impurity",
    """
    WITH chars AS (
      SELECT lang, unnest(string_split_regex(text, '')) AS ch
      FROM documents
    ),
    filtered AS (SELECT lang, ch FROM chars WHERE ch <> ''),
    cnt AS (
      SELECT lang, ch, COUNT(*) AS c FROM filtered GROUP BY lang, ch
    ),
    tot AS (SELECT lang, SUM(c) AS n,
                   SUM(CAST(c AS HUGEINT) * c) AS ss
            FROM cnt GROUP BY lang)
    SELECT lang, CAST(n AS BIGINT) AS n_chars,
           ROUND(1.0 - CAST(ss AS DOUBLE) / (CAST(n AS DOUBLE) * n), 6)
             AS gini_impurity
    FROM tot
    """,
    "character-distribution Gini impurity per language (1 − Σp²): the "
    "entropy-like diversity score that needs NO logarithm — Σc² and N are "
    "exact integer sums, so both engines divide bit-identical values once. "
    "Scripts with few distinct characters (or boilerplate-heavy corpora) "
    "score low; the language-ID/quality feature exposed as its own "
    "profile. Char explode → two hash aggregates, codegen throughout",
    ("llm", "text", "quality"),
)
def q161(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    chars = t.documents.select(
        "lang", F.explode(F.split(F.col("text"), "")).alias("ch")
    ).filter(F.col("ch") != "")
    cnt = chars.groupBy("lang", "ch").agg(F.count("*").alias("c"))
    # Σc² in DECIMAL(38,0)/HUGEINT: per-(lang, char) counts grow linearly
    # with corpus bytes, so c² passes 2^63 at real scale (same int64
    # hazard the g=10 corpus exposed in q160); Σc stays comfortably long
    tot = cnt.groupBy("lang").agg(
        F.sum("c").alias("n"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c")).alias("ss"),
    )
    return tot.select(
        "lang",
        F.col("n").cast("bigint").alias("n_chars"),
        F.round(
            F.lit(1.0)
            - F.col("ss").cast("double")
            / (F.col("n").cast("double") * F.col("n")),
            6,
        ).alias("gini_impurity"),
    )


@register(
    "q162_burstiness",
    """
    WITH daily AS (
      SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             COUNT(*) AS c
      FROM events GROUP BY 1, 2
    ),
    m AS (
      SELECT event_type, COUNT(*) AS n, SUM(c) AS s,
             SUM(CAST(c AS HUGEINT) * c) AS ss
      FROM daily GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           ROUND(CAST(n * ss - CAST(s AS HUGEINT) * s AS DOUBLE)
                 / (CAST(n AS DOUBLE) * s),
                 6) AS burstiness
    FROM m WHERE s > 0
    """,
    "traffic burstiness per event type: the index of dispersion "
    "(variance-to-mean ratio of daily counts, (n·Σc² − (Σc)²)/(n·Σc)) — "
    "1.0 for Poisson arrivals, higher = bursty. All moments are exact "
    "integer sums over the daily rollup; one double division at the end. "
    "The capacity-planning companion to q112's anomaly gate",
    ("relational", "timeseries"),
)
def q162(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    daily = (
        t.events.select(
            "event_type",
            F.expr(
                "unix_micros(cast(ts as timestamp)) DIV 86400000000"
            ).alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count("*").alias("c"))
    )
    # daily counts grow linearly with the corpus: Σc² and (Σc)² pass
    # 2^63 at real scale, so the moments ride DECIMAL(38,0)/HUGEINT
    # (q160's r9 recipe); n is calendar-bounded and stays long
    m = daily.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("c").alias("s"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c")).alias("ss"),
    )
    sd = F.col("s").cast("decimal(38,0)")
    return m.filter(F.col("s") > 0).select(
        "event_type",
        F.col("n").cast("bigint").alias("n_days"),
        F.round(
            (
                F.col("n").cast("decimal(38,0)") * F.col("ss") - sd * sd
            ).cast("double")
            / (F.col("n").cast("double") * F.col("s")),
            6,
        ).alias("burstiness"),
    )


@register(
    "q163_hapax_ratio",
    """
    WITH toks AS (
      SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents
    ),
    cnt AS (
      SELECT lang, w, COUNT(*) AS c FROM toks WHERE w <> ''
      GROUP BY lang, w
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS vocab_size,
           CAST(COUNT(CASE WHEN c = 1 THEN 1 END) AS BIGINT) AS hapax_count,
           ROUND(CAST(COUNT(CASE WHEN c = 1 THEN 1 END) AS DOUBLE)
                 / COUNT(*), 6) AS hapax_ratio
    FROM cnt GROUP BY lang
    """,
    "hapax legomena ratio per language: the share of vocabulary occurring "
    "exactly once — the classic corpus-maturity statistic (high hapax = "
    "sparse coverage, expect OOV pain; near-zero = heavy duplication). "
    "Token explode → per-(lang, token) count → one conditional aggregate; "
    "integer counts divide once per lang",
    ("llm", "text", "vocabulary"),
)
def q163(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    toks = t.documents.select(
        "lang", F.explode(F.split(F.col("text"), " ")).alias("w")
    ).filter(F.col("w") != "")
    cnt = toks.groupBy("lang", "w").agg(F.count("*").alias("c"))
    hap = F.count(F.when(F.col("c") == 1, 1))
    return cnt.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("vocab_size"),
        hap.cast("bigint").alias("hapax_count"),
        F.round(hap.cast("double") / F.count("*"), 6).alias("hapax_ratio"),
    )


# the synthetic corpus draws from a ~31-word vocabulary at EVERY SF, so
# probe ranks must sit inside it — k=100/1000 joined nothing and left a
# one-point "curve" (degeneracy-gate catch, r7)
COVERAGE_KS = [5, 10, 20]


@register(
    "q164_vocab_coverage_curve",
    f"""
    WITH toks AS (
      SELECT unnest(string_split(text, ' ')) AS w FROM documents
    ),
    cnt AS (
      SELECT w, COUNT(*) AS c FROM toks WHERE w <> '' GROUP BY w
    ),
    ranked AS (
      SELECT c, row_number() OVER (ORDER BY c DESC, w) AS rn,
             SUM(c) OVER (ORDER BY c DESC, w ROWS UNBOUNDED PRECEDING)
               AS cum
      FROM cnt
    ),
    tot AS (SELECT SUM(c) AS total FROM cnt),
    ks AS (SELECT unnest([5, 10, 20]) AS k)
    SELECT ks.k AS top_k,
           CAST(r.cum AS BIGINT) AS tokens_covered,
           ROUND(CAST(r.cum AS DOUBLE) / tot.total, 6) AS coverage
    FROM ks JOIN ranked r ON r.rn = ks.k, tot
    """,
    "vocabulary coverage curve: what share of all corpus tokens the top-k "
    "most frequent words cover, at k = 5/10/20 (inside the corpus's ~31-word vocabulary) — the Zipf head weight "
    "that sizes tokenizer vocabularies and stopword lists. The "
    "frequency-descending running total comes from distributed_running_sum "
    "(range repartition + broadcast partition prefixes, integer-exact), "
    "probed at 3 ranks; no global single-task window touches the "
    "vocabulary relation",
    ("llm", "text", "vocabulary", "order-statistics"),
)
def q164(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fluvii_spark.operators.ranking import distributed_running_sum

    t = load_tables(spark, sf_dir)
    cnt = (
        t.documents.select(
            F.explode(F.split(F.col("text"), " ")).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )
    cnt = cnt.localCheckpoint(eager=False)
    ranked = distributed_running_sum(
        cnt,
        [F.col("c").desc(), F.col("w")],
        "c",
        out_col="cum",
        rank_col="rn",
    )
    tot = cnt.agg(F.sum("c").alias("total"))
    ks = spark.range(1).select(
        F.explode(F.array(*[F.lit(k) for k in COVERAGE_KS])).alias("top_k")
    )
    return (
        ranked.join(F.broadcast(ks), F.col("rn") == F.col("top_k"))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("top_k").cast("int").alias("top_k"),
            F.col("cum").cast("bigint").alias("tokens_covered"),
            F.round(F.col("cum").cast("double") / F.col("total"), 6).alias(
                "coverage"
            ),
        )
    )


@register(
    "q165_ks_distance",
    """
    WITH a AS (SELECT value, event_id FROM events
               WHERE event_type = 'view' AND value IS NOT NULL),
         b AS (SELECT value, event_id FROM events
               WHERE event_type = 'purchase' AND value IS NOT NULL),
    merged AS (
      SELECT value, event_id, 1 AS ia, 0 AS ib FROM a
      UNION ALL
      SELECT value, event_id, 0, 1 FROM b
    ),
    ranked AS (
      SELECT SUM(ia) OVER w AS ca, SUM(ib) OVER w AS cb
      FROM merged
      WINDOW w AS (ORDER BY value, event_id, ia ROWS UNBOUNDED PRECEDING)
    ),
    n AS (SELECT (SELECT COUNT(*) FROM a) AS na,
                 (SELECT COUNT(*) FROM b) AS nb)
    SELECT CAST(n.na AS BIGINT) AS n_a, CAST(n.nb AS BIGINT) AS n_b,
           ROUND(CAST(MAX(abs(n.nb * ranked.ca - n.na * ranked.cb))
                      AS DOUBLE) / (n.na * n.nb), 6) AS ks_distance
    FROM ranked, n GROUP BY n.na, n.nb
    """,
    "two-sample Kolmogorov-Smirnov distance between the value "
    "distributions of two event types: D = max |ECDF_a − ECDF_b|, "
    "computed as the integer-exact max of |n_b·c_a − n_a·c_b| over the "
    "merged order (one distributed_running_sum pass on the sample-a "
    "indicator; c_b = global rank − c_a), divided once by n_a·n_b. The "
    "drift-detection statistic for training-data distribution shift, with "
    "no single-task window over the merged relation",
    ("relational", "statistics", "drift"),
)
def q165(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fluvii_spark.operators.ranking import distributed_running_sum

    t = load_tables(spark, sf_dir)
    ev = t.events.filter(F.col("value").isNotNull())
    a = ev.filter(F.col("event_type") == "view").select(
        "value", "event_id", F.lit(1).alias("ia")
    )
    b = ev.filter(F.col("event_type") == "purchase").select(
        "value", "event_id", F.lit(0).alias("ia")
    )
    merged = a.unionByName(b)
    ranked = distributed_running_sum(
        merged,
        ["value", "event_id", F.col("ia").asc()],
        "ia",
        out_col="ca",
        rank_col="rn",
    )
    counts = merged.agg(
        F.sum("ia").alias("na"),
        (F.count("*") - F.sum("ia")).alias("nb"),
    )
    return (
        ranked.crossJoin(F.broadcast(counts))
        .select(
            "na",
            "nb",
            F.abs(
                F.col("nb") * F.col("ca")
                - F.col("na") * (F.col("rn") - F.col("ca"))
            ).alias("d_int"),
        )
        .groupBy("na", "nb")
        .agg(F.max("d_int").alias("dmax"))
        .select(
            F.col("na").cast("bigint").alias("n_a"),
            F.col("nb").cast("bigint").alias("n_b"),
            F.round(
                F.col("dmax").cast("double") / (F.col("na") * F.col("nb")),
                6,
            ).alias("ks_distance"),
        )
    )


FRAME_EVERY_MS = 250


@register(
    "q166_frame_sample",
    f"""
    SELECT CAST(doc_id AS BIGINT) AS media_id,
           CAST(unnest(generate_series(0, 999, {FRAME_EVERY_MS})) AS INT)
             AS frame_ms,
           sha256(text) AS payload_sha
    FROM documents
    """,
    "video frame-sampling plan (multimodal pipeline stage 3 of 4): one "
    "output row per sampled frame offset from the typed media metadata "
    "(duration_ms), payload carried alongside for the downstream decode — "
    "the cardinality-changing explode is the real plan, the codec is the "
    "documented stub. Oracle regenerates the frame grid with "
    "generate_series and checks the payload digest per frame row",
    ("llm", "multimodal"),
)
def q166(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fluvii_spark.operators.multimodal import (
        frame_sample,
        media_from_documents,
    )

    docs = load_tables(spark, sf_dir).documents
    frames = frame_sample(
        media_from_documents(docs, kind="video"), every_ms=FRAME_EVERY_MS
    )
    return frames.select(
        F.col("media_id").cast("bigint").alias("media_id"),
        F.col("frame_ms").cast("int").alias("frame_ms"),
        F.sha2("payload", 256).alias("payload_sha"),
    )


RESIZE_W = RESIZE_H = 32


@register(
    "q167_resize_contract",
    f"""
    SELECT CAST(doc_id AS BIGINT) AS media_id,
           CAST({RESIZE_W} AS INT) AS width,
           CAST({RESIZE_H} AS INT) AS height,
           CAST(16 AS BIGINT) AS n_bytes,
           substr(sha256('resize:{RESIZE_W}x{RESIZE_H}:' || text), 1, 32)
             AS payload_hex
    FROM documents
    """,
    "image resize plan (multimodal pipeline stage 4 of 4): Arrow-batched "
    "mapInPandas over (payload, meta) re-encoding to the target "
    "resolution, output schema = media schema with updated "
    "width/height/n_bytes, no shuffle, byte-budget partitioning upstream. "
    "The pixel kernel is the documented digest stub, which makes the "
    "CONTRACT oracle-checkable: the re-encoded payload must equal the "
    "first 16 bytes of sha256('resize:WxH:' || payload), which the oracle "
    "recomputes in SQL and compares as hex — proving the Python stage "
    "transforms bytes and metadata exactly as declared",
    ("llm", "multimodal"),
)
def q167(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fluvii_spark.operators.multimodal import (
        media_from_documents,
        resize,
    )

    docs = load_tables(spark, sf_dir).documents
    resized = resize(
        media_from_documents(docs, kind="image"), RESIZE_W, RESIZE_H
    )
    return resized.select(
        F.col("media_id").cast("bigint").alias("media_id"),
        F.col("meta.width").cast("int").alias("width"),
        F.col("meta.height").cast("int").alias("height"),
        F.col("meta.n_bytes").cast("bigint").alias("n_bytes"),
        F.lower(F.hex("payload")).alias("payload_hex"),
    )


BAL_CAP = 1000.0


@register(
    "q168_capped_running_balance",
    f"""
    WITH ev AS (
      SELECT user_id, ts, event_id, value FROM events
      WHERE value IS NOT NULL
    ),
    folded AS (
      SELECT user_id,
             COUNT(*) AS n_events,
             list_reduce(
               list_prepend(CAST(0.0 AS DOUBLE),
                            list(value ORDER BY ts, event_id)),
               (acc, x) -> least(greatest(acc + x, 0.0), {BAL_CAP})
             ) AS final_balance
      FROM ev GROUP BY user_id
    )
    SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
           ROUND(final_balance, 6) AS final_balance
    FROM folded
    """,
    "CLAMPED running balance per user (floor 0, cap 1000): a non-linear "
    "per-row recurrence no window frame can express — the batch twin of "
    "the reference's per-message stateful fold (fluvii_table_app), done "
    "ENGINE-SIDE as F.aggregate over the time-ordered value array "
    "(whole-stage codegen, no Python). Both engines fold the identical "
    "IEEE op sequence in the identical order, so results are "
    "bit-deterministic. Per-user arrays are bounded by per-key activity — "
    "the same state-size bound the streaming fold carries",
    ("relational", "stateful", "fold"),
)
def q168(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    ev = t.events.filter(F.col("value").isNotNull()).select(
        "user_id", "ts", "event_id", "value"
    )
    arr = (
        ev.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "value"))
            ).alias("seq"),
        )
    )
    fold = F.aggregate(
        F.transform(F.col("seq"), lambda s: s["value"]),
        F.lit(0.0),
        lambda acc, x: F.least(
            F.greatest(acc + x, F.lit(0.0)), F.lit(BAL_CAP)
        ),
    )
    return arr.select(
        "user_id",
        F.col("n_events").cast("bigint").alias("n_events"),
        F.round(fold, 6).alias("final_balance"),
    )


@register(
    "q169_linear_interpolate",
    """
    WITH daily AS (
      SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
               / COUNT(value) AS v
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    spine AS (
      SELECT event_type,
             unnest(generate_series(MIN(day), MAX(day))) AS day
      FROM daily GROUP BY event_type
    ),
    joined AS (
      SELECT s.event_type, s.day, d.v FROM spine s
      LEFT JOIN daily d USING (event_type, day)
    ),
    ctx AS (
      SELECT event_type, day, v,
             last_value(v IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY day
               ROWS UNBOUNDED PRECEDING) AS pv,
             last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
               OVER (PARTITION BY event_type ORDER BY day
                     ROWS UNBOUNDED PRECEDING) AS pd,
             first_value(v IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY day
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
               OVER (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS nd
      FROM joined
    )
    SELECT event_type, CAST(day AS BIGINT) AS day,
           CAST(v IS NULL AS BOOLEAN) AS interpolated,
           ROUND(CASE
             WHEN v IS NOT NULL THEN v
             WHEN pv IS NULL THEN nv
             WHEN nv IS NULL THEN pv
             ELSE pv + (nv - pv) * (day - pd) / (nd - pd)
           END, 6) AS value_filled
    FROM ctx
    """,
    "time-series gap filling with LINEAR interpolation: build each event "
    "type's full daily spine, then fill missing days from the previous/"
    "next known points (pv + (nv−pv)·(day−pd)/(nd−pd); edges forward/"
    "backward-fill). The four context columns are ignore-nulls window "
    "lookups over the DAILY rollup (|days| rows per type, never the raw "
    "stream); daily means divide DECIMAL-exact sums so both engines "
    "interpolate bit-identical endpoints",
    ("relational", "timeseries"),
)
def q169(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    daily = (
        t.events.filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.expr(
                "unix_micros(cast(ts as timestamp)) DIV 86400000000"
            ).alias("day"),
            F.col("value").cast("decimal(18,6)").alias("v_dec"),
        )
        .groupBy("event_type", "day")
        .agg(
            (
                F.sum("v_dec").cast("double") / F.count("v_dec")
            ).alias("v")
        )
    )
    spine = daily.groupBy("event_type").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    ).select(
        "event_type",
        F.explode(F.sequence("d0", "d1")).alias("day"),
    )
    joined = spine.join(daily, ["event_type", "day"], "left")
    w_back = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    day_if_v = F.when(F.col("v").isNotNull(), F.col("day"))
    ctx = joined.select(
        "event_type",
        "day",
        "v",
        F.last("v", ignorenulls=True).over(w_back).alias("pv"),
        F.last(day_if_v, ignorenulls=True).over(w_back).alias("pd"),
        F.first("v", ignorenulls=True).over(w_fwd).alias("nv"),
        F.first(day_if_v, ignorenulls=True).over(w_fwd).alias("nd"),
    )
    filled = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .otherwise(
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * (F.col("day") - F.col("pd"))
            / (F.col("nd") - F.col("pd"))
        )
    )
    return ctx.select(
        "event_type",
        F.col("day").cast("bigint").alias("day"),
        F.col("v").isNull().alias("interpolated"),
        F.round(filled, 6).alias("value_filled"),
    )


SESSION_GAP_US = 30 * 60 * 1_000_000


@register(
    "q170_session_conversion",
    f"""
    WITH e AS (
      SELECT user_id, event_type, epoch_us(ts) AS t, event_id
      FROM events
    ),
    marked AS (
      SELECT user_id, event_type, t, event_id,
             CASE WHEN t - lag(t) OVER w > {SESSION_GAP_US}
                  OR lag(t) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
    ),
    sess AS (
      SELECT user_id, event_type, t, event_id,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY t, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked
    ),
    per_session AS (
      SELECT user_id, sid,
             COUNT(*) AS n_events,
             MIN(CASE WHEN event_type = 'view' THEN t END) AS first_view,
             MAX(CASE WHEN event_type = 'click' THEN t END) AS last_click
      FROM sess GROUP BY user_id, sid
    ),
    bucketed AS (
      SELECT CASE WHEN n_events = 1 THEN '1'
                  WHEN n_events <= 3 THEN '2-3' ELSE '4+' END AS depth,
             CASE WHEN first_view IS NOT NULL AND last_click > first_view
                  THEN 1 ELSE 0 END AS converted
      FROM per_session
    )
    SELECT depth, CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(converted) AS BIGINT) AS n_converted,
           ROUND(CAST(SUM(converted) AS DOUBLE) / COUNT(*), 6)
             AS conversion_rate
    FROM bucketed GROUP BY depth
    """,
    "session-scoped conversion by session depth: 30-min-gap sessionization "
    "(gaps-and-islands running sum per user), then per session a view "
    "followed by a later click counts as converted; report rate by "
    "session-size bucket. Complements the user-scoped funnels (q89/q119) "
    "with the session-scoped variant; both windows are per-user "
    "(key-partitioned over that user's events), aggregation collapses to "
    "one row per session before the tiny bucket rollup — integer-µs "
    "comparisons throughout",
    ("relational", "sessionization", "funnel"),
)
def q170(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    e = t.events.select(
        "user_id",
        "event_type",
        F.expr("unix_micros(cast(ts as timestamp))").alias("t"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    marked = e.withColumn(
        "new_s",
        F.when(
            (F.col("t") - F.lag("t").over(w) > SESSION_GAP_US)
            | F.lag("t").over(w).isNull(),
            1,
        ).otherwise(0),
    )
    sess = marked.withColumn(
        "sid",
        F.sum("new_s").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    per_session = sess.groupBy("user_id", "sid").agg(
        F.count("*").alias("n_events"),
        F.min(F.when(F.col("event_type") == "view", F.col("t"))).alias(
            "first_view"
        ),
        F.max(F.when(F.col("event_type") == "click", F.col("t"))).alias(
            "last_click"
        ),
    )
    bucketed = per_session.select(
        F.when(F.col("n_events") == 1, "1")
        .when(F.col("n_events") <= 3, "2-3")
        .otherwise("4+")
        .alias("depth"),
        F.when(
            F.col("first_view").isNotNull()
            & (F.col("last_click") > F.col("first_view")),
            1,
        )
        .otherwise(0)
        .alias("converted"),
    )
    return bucketed.groupBy("depth").agg(
        F.count("*").cast("bigint").alias("n_sessions"),
        F.sum("converted").cast("bigint").alias("n_converted"),
        F.round(
            F.sum("converted").cast("double") / F.count("*"), 6
        ).alias("conversion_rate"),
    )


BPE_TOP = 20


@register(
    "q171_bpe_merge_scan",
    f"""
    WITH toks AS (
      SELECT string_split(text, ' ') AS w FROM documents
    ),
    idx AS (
      SELECT w, unnest(generate_series(1, len(w) - 1)) AS i
      FROM toks WHERE len(w) >= 2
    ),
    pairs AS (
      SELECT w[i] AS left_sym, w[i+1] AS right_sym FROM idx
      WHERE w[i] <> '' AND w[i+1] <> ''
    ),
    cnt AS (
      SELECT left_sym, right_sym, COUNT(*) AS pair_count
      FROM pairs GROUP BY 1, 2
    ),
    ranked AS (
      SELECT left_sym, right_sym, pair_count,
             row_number() OVER (ORDER BY pair_count DESC,
                                left_sym, right_sym) AS rnk
      FROM cnt
    )
    SELECT CAST(rnk AS BIGINT) AS rnk, left_sym, right_sym,
           CAST(pair_count AS BIGINT) AS pair_count
    FROM ranked WHERE rnk <= {BPE_TOP}
    """,
    f"one BPE-training merge iteration at word level: count every "
    "ADJACENT symbol pair across the corpus and rank the top "
    f"{BPE_TOP} merge candidates (deterministic (count desc, pair) "
    "tie-break) — the inner loop of tokenizer training as a query. "
    "Adjacent-pair explode (positions 1..n−1) → hash count → top-k; at "
    "scale the rank runs on the aggregated pair vocabulary, not the "
    "corpus, and top-k goes through TakeOrdered, no global window",
    ("llm", "tokenization"),
)
def q171(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fluvii_spark.operators.stats import fan_out_scan

    t = load_tables(spark, sf_dir)
    # the adjacent-pair explode is the map side of the pair count; keep it
    # parallel when the doc scan plans below core count (2.8 s → 0.7 s
    # solo at sf0.1; no-op at cluster scale)
    pairs = fan_out_scan(t.documents).select(
        F.explode(
            # CASE guard: sequence(1, 0) counts DOWN and element_at(arr, 0)
            # is a runtime error — a one-token document would abort the job
            F.expr(
                "CASE WHEN size(split(text, ' ')) >= 2 THEN"
                " transform(sequence(1, size(split(text, ' ')) - 1),"
                " i -> struct(element_at(split(text, ' '), i) as left_sym,"
                "            element_at(split(text, ' '), i + 1) as right_sym))"
                " ELSE array() END"
            )
        ).alias("p")
    ).select("p.left_sym", "p.right_sym").filter(
        (F.col("left_sym") != "") & (F.col("right_sym") != "")
    )
    cnt = pairs.groupBy("left_sym", "right_sym").agg(
        F.count("*").alias("pair_count")
    )
    top = (
        cnt.orderBy(
            F.desc("pair_count"), "left_sym", "right_sym"
        ).limit(BPE_TOP)
    )
    return top.select(
        F.row_number()
        .over(
            Window.orderBy(F.desc("pair_count"), "left_sym", "right_sym")
        )
        .cast("bigint")
        .alias("rnk"),
        "left_sym",
        "right_sym",
        F.col("pair_count").cast("bigint").alias("pair_count"),
    )


@register(
    "q172_spearman_length_quality",
    """
    WITH scored AS (
      SELECT doc_id, lang,
             len(string_split(text, ' ')) AS n_tok,
             CAST(list_unique(string_split(text, ' ')) AS DOUBLE)
               / len(string_split(text, ' ')) AS ttr
      FROM documents
    ),
    rx AS (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang
                                ORDER BY n_tok, doc_id) AS r_len
      FROM scored
    ),
    ry AS (
      SELECT doc_id,
             row_number() OVER (PARTITION BY lang
                                ORDER BY ttr, doc_id) AS r_ttr
      FROM scored
    ),
    d AS (
      SELECT rx.lang, rx.r_len - ry.r_ttr AS dd
      FROM rx JOIN ry USING (doc_id)
    ),
    m AS (
      SELECT lang, COUNT(*) AS n, SUM(dd * dd) AS sd2
      FROM d GROUP BY lang
    )
    SELECT lang, CAST(n AS BIGINT) AS n_docs,
           ROUND(1.0 - 6.0 * sd2 / (CAST(n AS DOUBLE) * (n * n - 1)), 6)
             AS spearman_rho
    FROM m WHERE n > 1
    """,
    "Spearman rank correlation between document length and type-token "
    "ratio per language: does verbosity predict lexical quality? Both "
    "rank lists use unique (value, doc_id) tie-breaks, so Σd² is an "
    "EXACT integer and ρ = 1 − 6Σd²/(n(n²−1)) divides bit-identical "
    "values once — rank correlation without any float moment. Ranks come "
    "from distributed_row_number + broadcast per-lang offsets (two "
    "composite-order passes), never a per-lang window over the corpus",
    ("llm", "statistics", "order-statistics"),
)
def q172(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fluvii_spark.operators.ranking import distributed_row_number

    t = load_tables(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    scored = t.documents.select(
        "doc_id",
        "lang",
        F.size(toks).alias("n_tok"),
        (F.size(F.array_distinct(toks)).cast("double") / F.size(toks)).alias(
            "ttr"
        ),
    )
    scored = scored.localCheckpoint(eager=False)  # two rank passes, one scan

    def lang_rank(order_cols, out):
        ranked = distributed_row_number(scored, order_cols, out_col="_g")
        base = ranked.groupBy("lang").agg(F.min("_g").alias("_b"))
        return ranked.join(F.broadcast(base), "lang").select(
            "doc_id", "lang", (F.col("_g") - F.col("_b") + 1).alias(out)
        )

    rx = lang_rank(["lang", "n_tok", "doc_id"], "r_len")
    ry = lang_rank(["lang", "ttr", "doc_id"], "r_ttr").drop("lang")
    d = rx.join(ry, "doc_id").select(
        "lang", (F.col("r_len") - F.col("r_ttr")).alias("dd")
    )
    m = d.groupBy("lang").agg(
        F.count("*").alias("n"), F.sum(F.col("dd") * F.col("dd")).alias("sd2")
    )
    return m.filter(F.col("n") > 1).select(
        "lang",
        F.col("n").cast("bigint").alias("n_docs"),
        F.round(
            F.lit(1.0)
            - F.lit(6.0)
            * F.col("sd2")
            / (F.col("n").cast("double") * (F.col("n") * F.col("n") - 1)),
            6,
        ).alias("spearman_rho"),
    )


# Benford first-digit probabilities log10(1+1/d), fixed 6-dp literals so both
# engines compare against identical constants (no runtime libm log)
BENFORD_P = {
    1: 0.301030, 2: 0.176091, 3: 0.124939, 4: 0.096910,
    5: 0.079181, 6: 0.066947, 7: 0.057992, 8: 0.051153, 9: 0.045757,
}


@register(
    "q173_benford_deviation",
    f"""
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
                  AS BIGINT) AS d
      FROM orders WHERE o_totalprice >= 1
    ),
    obs AS (SELECT d, COUNT(*) AS c FROM digits GROUP BY d),
    tot AS (SELECT SUM(c) AS n FROM obs),
    exp_t AS (
      SELECT unnest([{', '.join(str(d) for d in BENFORD_P)}]) AS d,
             unnest([{', '.join(str(p) for p in BENFORD_P.values())}]) AS p
    )
    SELECT e.d AS digit, CAST(COALESCE(o.c, 0) AS BIGINT) AS observed,
           ROUND(e.p * t.n, 6) AS expected,
           ROUND((COALESCE(o.c, 0) - e.p * t.n)
                 * (COALESCE(o.c, 0) - e.p * t.n) / (e.p * t.n), 6)
             AS chi2_term
    FROM exp_t e LEFT JOIN obs o ON o.d = e.d, tot t
    """,
    "Benford's-law first-digit audit of order totals: observed counts per "
    "leading digit vs the Benford expectation, with per-digit chi-square "
    "terms — the classic synthetic-data / fraud smoke test. The log10 "
    "probabilities are FIXED 6-dp literals (no runtime libm), digit "
    "extraction is integer/string arithmetic, so both engines compare "
    "identical numbers. One scan + 9-row arithmetic",
    ("relational", "statistics", "audit"),
)
def q173(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    digits = t.orders.filter(F.col("o_totalprice") >= 1).select(
        F.substring(
            F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
        )
        .cast("bigint")
        .alias("d")
    )
    obs = digits.groupBy("d").agg(F.count("*").alias("c"))
    tot = obs.agg(F.sum("c").alias("n"))
    exp_t = spark.range(1).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).cast("bigint").alias("d"),
                        F.lit(p).alias("p"),
                    )
                    for d, p in BENFORD_P.items()
                ]
            )
        ).alias("e")
    ).select("e.d", "e.p")
    joined = (
        exp_t.join(obs, "d", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("d").alias("digit"),
            F.coalesce(F.col("c"), F.lit(0)).cast("bigint").alias("observed"),
            (F.col("p") * F.col("n")).alias("_exp"),
        )
    )
    diff = F.col("observed") - F.col("_exp")
    return joined.select(
        "digit",
        "observed",
        F.round(F.col("_exp"), 6).alias("expected"),
        F.round(diff * diff / F.col("_exp"), 6).alias("chi2_term"),
    )


@register(
    "q174_referential_audit",
    """
    SELECT 'orders->customer' AS fk, CAST(COUNT(*) AS BIGINT) AS orphans
    FROM orders o WHERE NOT EXISTS
      (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    UNION ALL
    SELECT 'lineitem->orders', CAST(COUNT(*) AS BIGINT)
    FROM lineitem l WHERE NOT EXISTS
      (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    UNION ALL
    SELECT 'lineitem->part', CAST(COUNT(*) AS BIGINT)
    FROM lineitem l WHERE NOT EXISTS
      (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
    UNION ALL
    SELECT 'lineitem->supplier', CAST(COUNT(*) AS BIGINT)
    FROM lineitem l WHERE NOT EXISTS
      (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)
    UNION ALL
    SELECT 'customer->nation', CAST(COUNT(*) AS BIGINT)
    FROM customer c WHERE NOT EXISTS
      (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)
    """,
    "referential-integrity audit across the star schema: orphan-row "
    "counts for five foreign-key relations in one result — the "
    "data-quality gate run before any pipeline trusts its joins. Each "
    "check is a LEFT ANTI join (broadcast for the small parents, shuffle "
    "hash for fact-to-fact), counts only — no payload movement",
    ("relational", "audit", "join"),
)
def q174(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)

    def orphans(child, ckey, parent, pkey, label):
        return (
            child.join(
                parent.select(F.col(pkey).alias(ckey)), ckey, "left_anti"
            )
            .agg(F.count("*").cast("bigint").alias("orphans"))
            .select(F.lit(label).alias("fk"), "orphans")
        )

    # MEASURED AND REJECTED (r11 opt): sharing the three lineitem checks
    # through ONE fact scan (chained left joins against the unique-PK
    # parent key projections, counting null parent keys — oracle-hash-
    # equal at sf0.001+sf0.01 before rejection) ran +0.15–0.2 s warm in an
    # interleaved same-session A/B (old {0.51,0.43,0.37,0.44} vs new
    # {0.61,0.47,0.67,0.61}): locally the five anti-join branches
    # parallelize inside the one job while the chained form serializes
    # three broadcast builds ahead of a single-task scan. The anti-join
    # union stays as measured-best; at true fact-table scale the
    # single-scan form's 3×-fewer lineitem scans would dominate — revisit
    # on a multi-split corpus.
    checks = [
        orphans(t.orders, "o_custkey", t.customer, "c_custkey",
                "orders->customer"),
        orphans(t.lineitem, "l_orderkey", t.orders, "o_orderkey",
                "lineitem->orders"),
        orphans(t.lineitem, "l_partkey", t.part, "p_partkey",
                "lineitem->part"),
        orphans(t.lineitem, "l_suppkey", t.supplier, "s_suppkey",
                "lineitem->supplier"),
        orphans(t.customer, "c_nationkey", t.nation, "n_nationkey",
                "customer->nation"),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


@register(
    "q175_seasonality_index",
    """
    WITH monthly AS (
      SELECT EXTRACT(year FROM o_orderdate) AS y,
             EXTRACT(month FROM o_orderdate) AS m,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY 1, 2
    ),
    yearly AS (
      SELECT y, SUM(rev) AS yrev, COUNT(*) AS n_months FROM monthly
      GROUP BY y
    ),
    idx AS (
      SELECT m.m,
             CAST(FLOOR(((CAST(m.rev AS DOUBLE) / CAST(y.yrev AS DOUBLE))
                         * y.n_months) * 1e12) AS BIGINT) AS idx_e12
      FROM monthly m JOIN yearly y USING (y)
    )
    SELECT CAST(m AS BIGINT) AS month,
           CAST(COUNT(*) AS BIGINT) AS n_years,
           ROUND(CAST(SUM(idx_e12) AS DOUBLE) / COUNT(*) / 1e12, 6)
             AS seasonality_index
    FROM idx GROUP BY m
    """,
    "monthly seasonality index of order revenue: each month's share of "
    "its year's revenue scaled by the months observed that year (1.0 = "
    "neutral), averaged across years — the de-trended seasonal profile. "
    "DECIMAL-exact monthly and yearly sums; each per-(year,month) ratio "
    "is one IEEE division of exactly-convertible scaled integers, then "
    "QUANTIZED to a 1e-12-grid BIGINT before the cross-year average — "
    "integer addition is associative, so the sum is order-free where a "
    "free-order double AVG wobbles in the last ulp with aggregation "
    "order (the r11 g=10 oracle caught exactly that: Spark's DECIMAL "
    "division path and the oracle's promoted division landed one ulp "
    "apart on either side of a 6-dp rounding boundary). The ≤5e-13 "
    "quantization bias is 6 orders below the 6-dp output grid",
    ("relational", "timeseries"),
)
def q175(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    monthly = t.orders.groupBy(
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")
    )
    yearly = monthly.groupBy("y").agg(
        F.sum("rev").alias("yrev"), F.count("*").alias("n_months")
    )
    # quantize each year's ratio to a 1e-12-grid BIGINT before averaging:
    # integer addition is order-free, so the cross-year sum is bit-stable
    # in any engine (see oracle note — a free-order double/decimal AVG
    # landed one ulp on either side of a 6-dp boundary at g=10)
    idx = monthly.join(yearly, "y").select(
        "m",
        F.floor(
            (
                F.col("rev").cast("double")
                / F.col("yrev").cast("double")
            )
            * F.col("n_months")
            * F.lit(1e12)
        )
        .cast("bigint")
        .alias("idx_e12"),
    )
    return idx.groupBy("m").agg(
        F.count("*").cast("bigint").alias("n_years"),
        F.round(
            F.sum("idx_e12").cast("double") / F.count("*") / F.lit(1e12), 6
        ).alias("seasonality_index"),
    ).select(
        F.col("m").cast("bigint").alias("month"),
        "n_years",
        "seasonality_index",
    )


@register(
    "q176_incremental_rollup",
    f"""
    WITH ev AS (
      SELECT event_type, user_id, value,
             CASE WHEN event_id % 5 = 4 THEN 'delta' ELSE 'old' END AS part
      FROM events
    ),
    part_stats AS (
      SELECT event_type, part, COUNT(*) AS n,
             SUM(CAST(value AS DECIMAL(18,6))) AS sv
      FROM ev GROUP BY 1, 2
    ),
    merged AS (
      SELECT event_type, SUM(n) AS n, SUM(sv) AS sv FROM part_stats
      GROUP BY event_type
    ),
    hashed AS (
      SELECT DISTINCT event_type, part, user_id,
             (('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT)
               / 4294967296.0 AS h
      FROM ev
    ),
    part_kmv AS (
      SELECT event_type, part, user_id, h FROM (
        SELECT event_type, part, user_id, h,
               row_number() OVER (PARTITION BY event_type, part
                                  ORDER BY h, user_id) AS rn
        FROM hashed
      ) WHERE rn <= {KMV_K}
    ),
    merged_kmv AS (
      SELECT event_type, COUNT(*) AS n_kept, MAX(h) AS h_k FROM (
        SELECT event_type, h,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY h, user_id) AS rn
        FROM (SELECT DISTINCT event_type, user_id, h FROM part_kmv)
      ) WHERE rn <= {KMV_K} GROUP BY event_type
    ),
    direct_kmv AS (
      SELECT event_type, COUNT(*) AS n_kept, MAX(h) AS h_k FROM (
        SELECT event_type, h,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY h, user_id) AS rn
        FROM (SELECT DISTINCT event_type, user_id, h FROM hashed)
      ) WHERE rn <= {KMV_K} GROUP BY event_type
    )
    SELECT m.event_type,
           CAST(m.n AS BIGINT) AS n_events,
           ROUND(CAST(m.sv AS DOUBLE), 2) AS sum_value,
           ROUND(CASE WHEN mk.n_kept < {KMV_K}
                      THEN CAST(mk.n_kept AS DOUBLE)
                      ELSE ({KMV_K} - 1) / mk.h_k END, 6) AS kmv_merged,
           ROUND(CASE WHEN dk.n_kept < {KMV_K}
                      THEN CAST(dk.n_kept AS DOUBLE)
                      ELSE ({KMV_K} - 1) / dk.h_k END, 6) AS kmv_direct,
           (mk.n_kept = dk.n_kept AND mk.h_k = dk.h_k) AS sketch_mergeable
    FROM merged m
    JOIN merged_kmv mk USING (event_type)
    JOIN direct_kmv dk USING (event_type)
    """,
    "incremental-view-maintenance proof: partition events into an 80% "
    "'old' slice and a 20% 'delta', aggregate each, MERGE the partials "
    "(counts add, DECIMAL sums add, KMV k-min sets union + re-truncate), "
    "and emit the merged results next to a direct full recompute with a "
    "per-group sketch_mergeable flag — true because the k smallest of a "
    "union of per-part k-smallest IS the global k smallest. This is the "
    "algebra that makes continuous aggregates / delta pipelines correct "
    "at 100 TB: the delta path touches |delta| rows + O(k) state, never "
    "the full history",
    ("relational", "rollup", "sketch", "incremental"),
)
def q176(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    ev = t.events.select(
        "event_type",
        "user_id",
        "value",
        F.when(F.col("event_id") % 5 == 4, "delta")
        .otherwise("old")
        .alias("part"),
    )
    part_stats = ev.groupBy("event_type", "part").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("sv"),
    )
    merged = part_stats.groupBy("event_type").agg(
        F.sum("n").alias("n"), F.sum("sv").alias("sv")
    )
    # two consumers (the per-part sketch path and the direct whole-type
    # sketch — the latter is deliberately NOT derived from the former, or
    # the mergeability check would be tautological), so un-checkpointed
    # the events scan + corpus-wide distinct executed twice
    hashed = (
        ev.select("event_type", "part", "user_id")
        .distinct()
        .withColumn(
            "h",
            md5_hash64(F.col("user_id").cast("string"))
            / F.lit(4294967296.0),
        )
        .localCheckpoint(eager=False)
    )

    def kmv(df, keys):
        return (
            df.withColumn(
                "rn",
                F.row_number().over(
                    Window.partitionBy(*keys).orderBy("h", "user_id")
                ),
            )
            .filter(F.col("rn") <= KMV_K)
            .drop("rn")
        )

    part_kmv = kmv(hashed, ["event_type", "part"])
    merged_kmv = (
        kmv(
            part_kmv.select("event_type", "user_id", "h").distinct(),
            ["event_type"],
        )
        .groupBy("event_type")
        .agg(F.count("*").alias("mk_n"), F.max("h").alias("mk_h"))
    )
    direct_kmv = (
        kmv(
            hashed.select("event_type", "user_id", "h").distinct(),
            ["event_type"],
        )
        .groupBy("event_type")
        .agg(F.count("*").alias("dk_n"), F.max("h").alias("dk_h"))
    )

    def est(n, h):
        return F.round(
            F.when(n < KMV_K, n.cast("double")).otherwise(
                F.lit(KMV_K - 1) / h
            ),
            6,
        )

    return (
        merged.join(merged_kmv, "event_type")
        .join(direct_kmv, "event_type")
        .select(
            "event_type",
            F.col("n").cast("bigint").alias("n_events"),
            F.round(F.col("sv").cast("double"), 2).alias("sum_value"),
            est(F.col("mk_n"), F.col("mk_h")).alias("kmv_merged"),
            est(F.col("dk_n"), F.col("dk_h")).alias("kmv_direct"),
            (
                (F.col("mk_n") == F.col("dk_n"))
                & (F.col("mk_h") == F.col("dk_h"))
            ).alias("sketch_mergeable"),
        )
    )


LATE_1H_US = 3600 * 1_000_000
LATE_24H_US = 24 * 3600 * 1_000_000


@register(
    "q177_late_data_report",
    f"""
    WITH seq AS (
      SELECT event_type, event_id, epoch_us(ts) AS t FROM events
    ),
    wm AS (
      SELECT event_type, t,
             MAX(t) OVER (ORDER BY event_id ROWS UNBOUNDED PRECEDING)
               AS high_watermark
      FROM seq
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(CASE WHEN t < high_watermark - {LATE_1H_US}
                      THEN 1 END) AS BIGINT) AS late_1h,
           CAST(COUNT(CASE WHEN t < high_watermark - {LATE_24H_US}
                      THEN 1 END) AS BIGINT) AS late_24h,
           ROUND(CAST(COUNT(CASE WHEN t < high_watermark - {LATE_1H_US}
                           THEN 1 END) AS DOUBLE) / COUNT(*), 6)
             AS late_1h_rate
    FROM wm GROUP BY event_type
    """,
    "watermark-tuning report: replay the ingest sequence (event_id order), "
    "track the event-time HIGH WATERMARK via a distributed prefix-max "
    "(range repartition + local cummax + broadcast partition-max prefix — "
    "the prefix-max member of the ranking family, no single-task global "
    "window), and count per type how many events arrive more than "
    "1h/24h behind it — exactly the rows a streaming watermark of that "
    "delay would drop. Integer-µs comparisons; the number that sizes "
    "`withWatermark` before deploying the streaming twin",
    ("relational", "streaming-adjacent", "timeseries"),
)
def q177(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fluvii_spark.operators.ranking import distributed_running_max

    t = load_tables(spark, sf_dir)
    seq = t.events.select(
        "event_type",
        "event_id",
        F.expr("unix_micros(cast(ts as timestamp))").alias("t"),
    )
    wm = distributed_running_max(
        seq, ["event_id"], "t", out_col="high_watermark"
    )
    late1 = F.count(
        F.when(F.col("t") < F.col("high_watermark") - LATE_1H_US, 1)
    )
    late24 = F.count(
        F.when(F.col("t") < F.col("high_watermark") - LATE_24H_US, 1)
    )
    return wm.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_events"),
        late1.cast("bigint").alias("late_1h"),
        late24.cast("bigint").alias("late_24h"),
        F.round(late1.cast("double") / F.count("*"), 6).alias(
            "late_1h_rate"
        ),
    )


HORIZONS_US = {"1h": 3600 * 10**6, "24h": 24 * 3600 * 10**6,
               "7d": 7 * 24 * 3600 * 10**6}


@register(
    "q178_conversion_horizons",
    f"""
    WITH v AS (
      SELECT user_id, epoch_us(ts) AS t, event_id FROM events
      WHERE event_type = 'view'
    ),
    p AS (
      SELECT user_id, epoch_us(ts) AS t FROM events
      WHERE event_type = 'purchase'
    ),
    firstp AS (
      SELECT v.user_id, v.event_id, v.t,
             MIN(p.t) AS tp
      FROM v LEFT JOIN p ON p.user_id = v.user_id AND p.t > v.t
      GROUP BY v.user_id, v.event_id, v.t
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_views,
           CAST(COUNT(CASE WHEN tp - t <= {HORIZONS_US['1h']} THEN 1 END)
                AS BIGINT) AS conv_1h,
           CAST(COUNT(CASE WHEN tp - t <= {HORIZONS_US['24h']} THEN 1 END)
                AS BIGINT) AS conv_24h,
           CAST(COUNT(CASE WHEN tp - t <= {HORIZONS_US['7d']} THEN 1 END)
                AS BIGINT) AS conv_7d,
           ROUND(CAST(COUNT(CASE WHEN tp - t <= {HORIZONS_US['24h']}
                            THEN 1 END) AS DOUBLE) / COUNT(*), 6)
             AS rate_24h
    FROM firstp
    """,
    "multi-horizon conversion matrix: for every view, the user's FIRST "
    "later purchase, bucketed by time-to-convert at 1h/24h/7d — one "
    "forward as-of pass answers all horizons (the cumulative-funnel "
    "companion to q153's single-tolerance join). Spark side reuses "
    "asof_join(direction='forward') — one key-partitioned union+window "
    "shuffle, no per-horizon rescans; integer-µs horizon gates",
    ("relational", "funnel", "asof"),
)
def q178(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fluvii_spark.operators.asof import asof_join

    t = load_tables(spark, sf_dir)
    ev = t.events.select(
        "user_id",
        "event_type",
        F.expr("unix_micros(cast(ts as timestamp))").alias("t"),
        "event_id",
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "t", "event_id"
    )
    # strict > : shift purchases one microsecond earlier so at-or-after
    # becomes strictly-after, matching the oracle's p.t > v.t
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", "t")
        .distinct()
        .select(
            "user_id", (F.col("t") - 1).alias("t_join"), F.col("t").alias("tp")
        )
    )
    matched = asof_join(
        views,
        purchases,
        ["user_id"],
        "t",
        "t_join",
        right_payload=["tp"],
        direction="forward",
    )
    gap = F.col("right_tp") - F.col("t")
    conv = lambda us: F.count(F.when(gap <= us, 1))  # noqa: E731
    return matched.agg(
        F.count("*").cast("bigint").alias("n_views"),
        conv(HORIZONS_US["1h"]).cast("bigint").alias("conv_1h"),
        conv(HORIZONS_US["24h"]).cast("bigint").alias("conv_24h"),
        conv(HORIZONS_US["7d"]).cast("bigint").alias("conv_7d"),
        F.round(
            conv(HORIZONS_US["24h"]).cast("double") / F.count("*"), 6
        ).alias("rate_24h"),
    )


@register(
    "q179_weekday_hour_heatmap",
    """
    WITH g AS (
      SELECT CAST(dayofweek(ts) AS BIGINT) AS weekday,
             CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ),
    tot AS (SELECT SUM(n) AS total FROM g)
    SELECT weekday, hour, CAST(n AS BIGINT) AS n_events,
           ROUND(CAST(n AS DOUBLE) / tot.total, 6) AS share
    FROM g, tot
    """,
    "weekday × hour traffic heatmap with global share — the load-shaping "
    "matrix behind capacity planning and trigger scheduling. duckdb "
    "dayofweek (0=Sunday) differs from Spark's dayofweek (1=Sunday), so "
    "the Spark side subtracts 1 to match; one hash aggregate + a 1-row "
    "total broadcast over ≤168 cells",
    ("relational", "timeseries"),
)
def q179(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    g = t.events.groupBy(
        (F.dayofweek(F.col("ts").cast("timestamp")) - 1)
        .cast("bigint")
        .alias("weekday"),
        F.hour(F.col("ts").cast("timestamp")).cast("bigint").alias("hour"),
    ).agg(F.count("*").alias("n"))
    tot = g.agg(F.sum("n").alias("total"))
    return g.crossJoin(F.broadcast(tot)).select(
        "weekday",
        "hour",
        F.col("n").cast("bigint").alias("n_events"),
        F.round(F.col("n").cast("double") / F.col("total"), 6).alias(
            "share"
        ),
    )


@register(
    "q180_market_concentration",
    """
    WITH rev AS (
      SELECT p.p_brand AS brand, l.l_suppkey AS supp,
             SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS r
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1, 2
    ),
    m AS (
      SELECT brand,
             COUNT(*) AS n_suppliers,
             SUM(r) AS total,
             SUM(CAST(r AS DECIMAL(38,4)) * r) AS ss
      FROM rev GROUP BY brand
    )
    SELECT brand, CAST(n_suppliers AS BIGINT) AS n_suppliers,
           ROUND(CAST(ss AS DOUBLE)
                 / (CAST(total AS DOUBLE) * CAST(total AS DOUBLE)), 6)
             AS hhi
    FROM m
    """,
    "Herfindahl-Hirschman market concentration per part brand: HHI = "
    "Σ(supplier revenue share)² computed as Σr²/total² so every sum is "
    "DECIMAL-exact (shares are never summed as floats) — 1/n for perfect "
    "competition, 1.0 for monopoly. The supply-chain-risk companion to "
    "q125's Gini; two hash aggregates on the brand-supplier rollup",
    ("relational", "statistics"),
)
def q180(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    rev = (
        t.lineitem.join(
            t.part.select("p_partkey", "p_brand"),
            t.lineitem["l_partkey"] == F.col("p_partkey"),
        )
        .groupBy(F.col("p_brand").alias("brand"), "l_suppkey")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("r")
        )
    )
    m = rev.groupBy("brand").agg(
        F.count("*").alias("n_suppliers"),
        F.sum("r").alias("total"),
        F.sum(F.col("r").cast("decimal(38,4)") * F.col("r")).alias("ss"),
    )
    return m.select(
        "brand",
        F.col("n_suppliers").cast("bigint").alias("n_suppliers"),
        F.round(
            F.col("ss").cast("double")
            / (F.col("total").cast("double") * F.col("total").cast("double")),
            6,
        ).alias("hhi"),
    )


@register(
    "q181_point_in_time_join",
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
    versions AS (
      -- duplicate (user_id, ts) click pairs can both survive the LAG
      -- filter; the as-of contract (operators/asof.py) requires the
      -- caller to resolve right-side key duplicates, so keep the
      -- last-written version per instant (max event_id) on BOTH sides
      SELECT user_id, valid_from, k FROM (
        SELECT user_id, ts AS valid_from, k,
               ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                  ORDER BY event_id DESC) AS vrn
        FROM d WHERE pk IS NULL OR k <> pk
      ) WHERE vrn = 1
    ),
    p AS (
      SELECT user_id, ts, event_id,
             CAST(value AS DECIMAL(18,6)) AS v
      FROM events WHERE event_type = 'purchase'
    ),
    joined AS (
      SELECT p.event_id, ver.k, p.v
      FROM p ASOF LEFT JOIN versions ver
        ON p.user_id = ver.user_id AND ver.valid_from <= p.ts
    )
    SELECT k AS attr_k,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           ROUND(CAST(SUM(v) AS DOUBLE), 2) AS total_value
    FROM joined GROUP BY k
    """,
    "POINT-IN-TIME (SCD2 lookup) join: purchases joined to the user's "
    "attribute version VALID AT purchase time — the temporal-correctness "
    "join that prevents leakage in feature pipelines (training rows must "
    "see dimension state as-of the event, not today's). Versions come "
    "from q126's collapse-consecutive CDC fold; the PIT lookup is the "
    "backward as-of operator (one key-partitioned union+window shuffle), "
    "NOT a range join — duckdb's native ASOF JOIN is the oracle. "
    "Purchases before any version group under NULL",
    ("relational", "scd", "asof", "temporal"),
)
def q181(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fluvii_spark.operators.asof import asof_join

    t = load_tables(spark, sf_dir)
    c = t.events.filter(F.col("event_type") == "click").select(
        "user_id",
        "event_id",
        "ts",
        F.get_json_object("props", "$.k").cast("bigint").alias("k"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # keep the last-written version per (user_id, instant): asof_join's
    # documented contract puts right-side key dedup on the caller, and
    # DuckDB ASOF's pick among duplicate right keys is unspecified
    vw = Window.partitionBy("user_id", "valid_from").orderBy(
        F.col("event_id").desc()
    )
    versions = (
        c.withColumn("pk", F.lag("k").over(w))
        .filter(F.col("pk").isNull() | (F.col("k") != F.col("pk")))
        .select(
            "user_id", F.col("ts").alias("valid_from"), "k", "event_id"
        )
        .withColumn("vrn", F.row_number().over(vw))
        .filter(F.col("vrn") == 1)
        .select("user_id", "valid_from", "k")
    )
    p = t.events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        "event_id",
        F.col("value").cast("decimal(18,6)").alias("v"),
    )
    joined = asof_join(
        p, versions, ["user_id"], "ts", "valid_from", right_payload=["k"]
    )
    return joined.groupBy(F.col("right_k").alias("attr_k")).agg(
        F.count("*").cast("bigint").alias("n_purchases"),
        F.round(F.sum("v").cast("double"), 2).alias("total_value"),
    )


@register(
    "q182_cdc_apply",
    """
    WITH log AS (
      SELECT user_id, ts, event_id,
             CASE WHEN event_type = 'purchase' THEN 'delete'
                  ELSE 'upsert' END AS op,
             CAST(value AS DECIMAL(18,6)) AS v
      FROM events WHERE event_type IN ('view', 'click', 'purchase')
    ),
    last_op AS (
      SELECT user_id, op, v FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                     ORDER BY ts DESC, event_id DESC) AS rn
        FROM log
      ) WHERE rn = 1
    )
    SELECT CAST(COUNT(CASE WHEN op = 'upsert' THEN 1 END) AS BIGINT)
             AS live_keys,
           CAST(COUNT(CASE WHEN op = 'delete' THEN 1 END) AS BIGINT)
             AS tombstoned_keys,
           ROUND(CAST(SUM(CASE WHEN op = 'upsert' THEN v END) AS DOUBLE), 2)
             AS live_value_total
    FROM last_op
    """,
    "CDC changelog materialization: apply an ordered upsert/delete log "
    "(views/clicks upsert the key's value, purchases are tombstones) and "
    "report the final table — live keys, tombstoned keys, DECIMAL-exact "
    "live value total. Last-writer-wins is one arg-max window per key "
    "(the same micro-batch apply a MERGE-based lakehouse sink runs); the "
    "reference's state-table semantics (upsert/delete verbs, "
    "streaming/state.py) expressed as a batch query",
    ("relational", "cdc", "stateful"),
)
def q182(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    log = t.events.filter(
        F.col("event_type").isin("view", "click", "purchase")
    ).select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "purchase", "delete")
        .otherwise("upsert")
        .alias("op"),
        F.col("value").cast("decimal(18,6)").alias("v"),
    )
    # last op per key as max(struct) — (ts, event_id) is unique within a
    # user, so the hash aggregation selects exactly the desc-window's
    # rn=1 row, with map-side partial aggregation instead of funneling
    # the whole change log through a per-user sort window
    last = log.groupBy("user_id").agg(
        F.max(F.struct("ts", "event_id", "op", "v")).alias("_m")
    ).select(F.col("_m.op").alias("op"), F.col("_m.v").alias("v"))
    return last.agg(
        F.count(F.when(F.col("op") == "upsert", 1))
        .cast("bigint")
        .alias("live_keys"),
        F.count(F.when(F.col("op") == "delete", 1))
        .cast("bigint")
        .alias("tombstoned_keys"),
        F.round(
            F.sum(F.when(F.col("op") == "upsert", F.col("v"))).cast(
                "double"
            ),
            2,
        ).alias("live_value_total"),
    )
