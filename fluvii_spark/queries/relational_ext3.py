"""Extended inventory, batch 3 (q70+): deterministic hash sampling, bucketed
range join, hopping windows, regex tokenization, k-NN join, correlated
scalar subqueries, multimodal feature extraction.

Scale rationale per query lives in each docstring — these are the shapes a
100 TB training-data pipeline hits constantly (reproducible sampling,
bounded-time self-joins, multi-query ANN) where the naive plan (random(),
theta-join, per-query scan) falls over.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fluvii_spark.io.readers import load_tables, register_temp_views
from fluvii_spark.queries import register

# Deterministic 32-bit hash from a string — identical in Spark
# (conv(substring(md5..))) and duckdb (('0x' || substr(md5..))::BIGINT).
# The engine-portable substitute for rand(seed): same rows sampled on any
# engine, any partitioning, any rerun — what a training pipeline needs for
# reproducible held-out splits.
_H32_DUCK = "('0x' || substr(md5({x}), 1, 8))::BIGINT"


def _h32(col):
    # single home for the cross-engine hash contract: operators/text.py
    from fluvii_spark.operators.text import md5_hash64

    return md5_hash64(col)


@register(
    "q70_hash_sample",
    f"""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM orders
    WHERE {_H32_DUCK.format(x="CAST(o_orderkey AS VARCHAR)")} % 100 < 5
    GROUP BY o_orderpriority
    """,
    "deterministic 5% hash sample (md5-derived) — reproducible train/held-"
    "out splits; unlike TABLESAMPLE/rand() the membership is stable across "
    "engines, reruns, and repartitioning, and the predicate pushes to the "
    "scan (no materialized sample table)",
    ("pipeline", "sampling"),
)
def q70(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    keep = (_h32(F.col("o_orderkey").cast("string")) % 100) < 5
    return (
        t.orders.filter(keep)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.expr(
                "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)"
            ).alias("sum_price"),
        )
    )


# 10 minutes: at 60 s nearly every user had exactly ONE qualifying pair
# (constant n_pairs — degeneracy-gate catch, r7); 600 s gives 1..6 pairs
_US_600S = 600_000_000  # exact integer µs — no float boundary drift vs oracle


@register(
    "q71_range_join_bucketed",
    """
    WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS t FROM events)
    SELECT a.user_id, COUNT(*) AS n_pairs
    FROM e a JOIN e b
      ON a.user_id = b.user_id
     AND b.t >= a.t AND b.t - a.t <= 600000000
     AND (b.t > a.t OR b.event_id > a.event_id)
    GROUP BY a.user_id
    """,
    "bounded-range self-join (pairs of a user's events ≤600 s apart) via "
    "time-bucketing: explode the left side into its two candidate 600 s "
    "buckets and equi-join on (user, bucket) — SortMergeJoin, not the "
    "O(n²)-per-key theta join duckdb's IEJoin oracle runs; each pair "
    "matches exactly one bucket key so no dedup pass",
    ("relational", "join", "range"),
)
def q71(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir).events.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),
    )
    # forward orientation (b at-or-after a, id tie-break) ⇒ b's bucket is a's
    # bucket or the next one — the ONLY two join keys the left row needs
    a = ev.select(
        F.col("event_id").alias("id_a"),
        "user_id",
        F.col("t").alias("ta"),
        F.explode(
            F.array(
                F.floor(F.col("t") / _US_600S), F.floor(F.col("t") / _US_600S) + 1
            )
        ).alias("bucket"),
    )
    b = ev.select(
        F.col("event_id").alias("id_b"),
        "user_id",
        F.col("t").alias("tb"),
        F.floor(F.col("t") / _US_600S).alias("bucket"),
    )
    pairs = a.join(b, ["user_id", "bucket"]).filter(
        (F.col("tb") >= F.col("ta"))
        & (F.col("tb") - F.col("ta") <= _US_600S)
        & ((F.col("tb") > F.col("ta")) | (F.col("id_b") > F.col("id_a")))
    )
    return pairs.groupBy("user_id").agg(F.count("*").alias("n_pairs"))


@register(
    "q72_hopping_window",
    """
    WITH e AS (SELECT event_type,
                      -- floor(), not //: DuckDB's // truncates toward zero
                      -- while Spark's F.window floors — they diverge on
                      -- pre-epoch timestamps (the q196 class)
                      CAST(floor(epoch_us(ts) / 1800000000.0) AS BIGINT)
                        * 1800 AS b
               FROM events),
         x AS (SELECT event_type, b AS win_start FROM e
               UNION ALL
               SELECT event_type, b - 1800 AS win_start FROM e)
    SELECT win_start, event_type, COUNT(*) AS n_events
    FROM x GROUP BY win_start, event_type
    """,
    "hopping/sliding window (1 h size, 30 min slide): every event lands in "
    "exactly two epoch-aligned windows; Spark's F.window replicates rows "
    "then hash-aggregates (oracle: explicit 2-bucket UNION ALL)",
    ("streaming", "window"),
)
def q72(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t.events.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type"
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            F.expr("unix_micros(cast(w.start as timestamp)) div 1000000").alias(
                "win_start"
            ),
            "event_type",
            "n_events",
        )
    )


# letters-and-digits runs only: identical semantics in Java regex (Spark)
# and RE2 (duckdb); deliberately avoids \s / unicode-class divergence
_TOK_PAT = "[A-Za-z]+|[0-9]+"


@register(
    "q73_regex_tokens",
    f"""
    WITH tok AS (SELECT lang,
                        UNNEST(regexp_extract_all(text, '{_TOK_PAT}')) AS tok
                 FROM documents)
    SELECT lang,
           COUNT(*) AS n_tokens,
           COUNT(DISTINCT tok) AS n_distinct,
           CAST(SUM(LENGTH(tok)) AS DOUBLE) / COUNT(*) AS avg_tok_len
    FROM tok GROUP BY lang
    """,
    "BPE-ish regex tokenizer (letter runs | digit runs): per-language token "
    "counts, vocabulary size, mean token length — the pre-tokenization "
    "profile pass of a training corpus",
    ("llm", "text"),
)
def q73(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    toks = t.documents.select(
        "lang",
        F.explode(F.regexp_extract_all("text", F.lit(_TOK_PAT), F.lit(0))).alias(
            "tok"
        ),
    )
    return toks.groupBy("lang").agg(
        F.count("*").alias("n_tokens"),
        F.count_distinct("tok").alias("n_distinct"),
        (F.sum(F.length("tok")).cast("double") / F.count("*")).alias("avg_tok_len"),
    )


@register(
    "q74_knn_join",
    """
    WITH q AS (SELECT vec_id AS qid, embedding AS qvec
               FROM embeddings WHERE vec_id < 5),
         s AS (SELECT q.qid, e.vec_id,
                      list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                             CAST(q.qvec AS DOUBLE[])) AS cosine
               FROM embeddings e, q WHERE e.vec_id >= 5),
         r AS (SELECT qid, vec_id, cosine,
                      row_number() OVER (PARTITION BY qid
                                         ORDER BY cosine DESC, vec_id) AS rn
               FROM s)
    SELECT qid, vec_id, cosine FROM r WHERE rn <= 3
    """,
    "k-NN JOIN (top-3 cosine neighbors for EACH of 5 query vectors): "
    "broadcast the query set, one scan of the corpus scores all queries "
    "(queries × corpus work but corpus-scan I/O paid once), per-query "
    "window top-k — the batch retrieval shape of embedding dedup/eval",
    ("llm", "similarity"),
)
def q74(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fluvii_spark.operators.similarity import (
        cosine_hoisted_sql,
        norm_sql,
    )

    from fluvii_spark.operators.stats import fan_out_scan

    # fan_out: the 5-probe cosine scoring is map-side work serialized by a
    # single-partition scan (0.49 s -> 0.34 s solo at sf0.1); both norms
    # hoisted out of the probe x corpus cosine (q146 pattern —
    # bit-identical arithmetic, 1/3 the fold work per pair)
    emb = fan_out_scan(load_tables(spark, sf_dir).embeddings).withColumn(
        "_ne", F.expr(norm_sql("embedding"))
    )
    q = emb.filter("vec_id < 5").select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qvec"),
        F.col("_ne").alias("_nq"),
    )
    scored = (
        emb.filter("vec_id >= 5")
        .crossJoin(F.broadcast(q))
        .select(
            "qid",
            "vec_id",
            F.expr(
                cosine_hoisted_sql("embedding", "qvec", "_ne", "_nq")
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter("rn <= 3")
        .select("qid", "vec_id", "cosine")
    )


@register(
    "q75_correlated_subquery",
    """
    SELECT o_orderpriority, COUNT(*) AS n_max_orders
    FROM orders o
    WHERE o_totalprice = (SELECT MAX(o2.o_totalprice) FROM orders o2
                          WHERE o2.o_custkey = o.o_custkey)
    GROUP BY o_orderpriority
    """,
    "correlated scalar subquery (each customer's most-expensive order), "
    "run through the engine's SQL front door: Catalyst decorrelates to an "
    "aggregate + join instead of a per-row re-scan",
    ("relational", "subquery", "sql"),
)
def q75(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_temp_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n_max_orders
        FROM orders o
        WHERE o_totalprice = (SELECT MAX(o2.o_totalprice) FROM orders o2
                              WHERE o2.o_custkey = o.o_custkey)
        GROUP BY o_orderpriority
        """
    )


@register(
    "q76_multimodal_features",
    """
    SELECT doc_id AS media_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text) AS payload_sha,
           CAST(CAST(('0x' || substr(sha256('image' || text), 1, 8))::BIGINT
                     / 4294967296.0 AS REAL) AS DOUBLE) AS feat0
    FROM documents
    """,
    "multimodal decode plumbing end-to-end: binary payload + metadata "
    "struct through the Arrow-batched mapInPandas feature extractor "
    "(operators.multimodal; decode kernel is the documented deterministic "
    "stub) — oracle recomputes the digest arithmetic in SQL",
    ("llm", "multimodal"),
)
def q76(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fluvii_spark.operators.multimodal import (
        extract_features,
        media_from_documents,
    )

    docs = load_tables(spark, sf_dir).documents
    feats = extract_features(media_from_documents(docs, kind="image"))
    return feats.select(
        "media_id",
        "n_bytes",
        F.col("sha256").alias("payload_sha"),
        F.element_at("features", 1).cast("double").alias("feat0"),
    )


@register(
    "q77_try_cast",
    """
    WITH s AS (SELECT CASE WHEN event_id % 7 = 0
                           THEN 'x' || CAST(value AS VARCHAR)
                           ELSE CAST(value AS VARCHAR) END AS raw
               FROM events)
    SELECT COUNT(*) AS n_rows,
           COUNT(TRY_CAST(raw AS DOUBLE)) AS n_parsed,
           CAST(SUM(CAST(TRY_CAST(raw AS DECIMAL(18,6)) AS DECIMAL(18,6)))
                AS DOUBLE) AS sum_parsed
    FROM s
    """,
    "malformed-input tolerance: TRY_CAST yields NULL (not a job abort) on "
    "unparseable rows — the ingest posture for dirty corpora; 1/7 of rows "
    "are made deterministically invalid",
    ("pipeline", "functions"),
)
def q77(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    raw = F.when(
        F.col("event_id") % 7 == 0, F.concat(F.lit("x"), F.col("value").cast("string"))
    ).otherwise(F.col("value").cast("string"))
    return t.events.select(raw.alias("raw")).select(
        F.count("*").alias("n_rows"),
        F.count(F.expr("TRY_CAST(raw AS DOUBLE)")).alias("n_parsed"),
        F.expr(
            "CAST(SUM(TRY_CAST(raw AS DECIMAL(18,6))) AS DOUBLE)"
        ).alias("sum_parsed"),
    )


@register(
    "q78_date_spine",
    """
    WITH bounds AS (SELECT date_trunc('month', MIN(o_orderdate)) AS lo,
                           date_trunc('month', MAX(o_orderdate)) AS hi
                    FROM orders),
         months AS (SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 MONTH)) AS month
                    FROM bounds),
         prio AS (SELECT DISTINCT o_orderpriority FROM orders),
         spine AS (SELECT month, o_orderpriority FROM months CROSS JOIN prio),
         counts AS (SELECT date_trunc('month', o_orderdate) AS month,
                           o_orderpriority, COUNT(*) AS n
                    FROM orders GROUP BY 1, 2)
    SELECT s.month, s.o_orderpriority, COALESCE(c.n, 0) AS n_orders
    FROM spine s LEFT JOIN counts c
      ON s.month = c.month AND s.o_orderpriority = c.o_orderpriority
    """,
    "date-spine gap fill: dense calendar x dimension scaffold left-joined "
    "to sparse counts so empty months surface as 0 (time-series backfill; "
    "the spine is generated, never scanned)",
    ("relational", "timeseries"),
)
def q78(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    # ONE orders pass: the calendar bounds and the priority list both
    # derive from the months×priorities count relation (date_trunc is
    # monotonic, so min/max of truncated months equal the truncation of
    # min/max dates; every priority value appears in some count row) —
    # previously three separate full orders scans. The checkpointed
    # relation is calendar×schema-bounded at any corpus size.
    counts = (
        t.orders.groupBy(
            F.date_trunc("month", "o_orderdate").alias("month"),
            "o_orderpriority",
        )
        .agg(F.count("*").alias("n"))
        .localCheckpoint(eager=False)
    )
    bounds = counts.select(
        F.min("month").alias("lo"), F.max("month").alias("hi")
    )
    months = bounds.select(
        F.explode(F.expr("sequence(lo, hi, INTERVAL 1 MONTH)")).alias("month")
    )
    prio = counts.select("o_orderpriority").distinct()
    return (
        months.crossJoin(prio)
        .join(counts, ["month", "o_orderpriority"], "left")
        .select(
            "month",
            "o_orderpriority",
            F.coalesce(F.col("n"), F.lit(0)).alias("n_orders"),
        )
    )


@register(
    "q79_stratified_split",
    f"""
    WITH s AS (SELECT lang,
                      CASE WHEN {_H32_DUCK.format(x="'split_' || CAST(doc_id AS VARCHAR)")} % 10 < 8
                           THEN 'train'
                           WHEN {_H32_DUCK.format(x="'split_' || CAST(doc_id AS VARCHAR)")} % 10 = 8
                           THEN 'val' ELSE 'test' END AS split
               FROM documents)
    SELECT lang, split, COUNT(*) AS n_docs
    FROM s GROUP BY lang, split
    """,
    "deterministic stratified 80/10/10 split: membership from a salted "
    "md5 hash of the id — stable across engines/reruns/repartitioning, "
    "no shuffled sample materialization; per-language counts verify the "
    "strata",
    ("pipeline", "sampling"),
)
def q79(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    h = _h32(F.concat(F.lit("split_"), F.col("doc_id").cast("string"))) % 10
    split = (
        F.when(h < 8, "train").when(h == 8, "val").otherwise("test")
    )
    return (
        t.documents.select("lang", split.alias("split"))
        .groupBy("lang", "split")
        .agg(F.count("*").alias("n_docs"))
    )


@register(
    "q80_sequence_packing",
    """
    WITH RECURSIVE d AS MATERIALIZED (
        SELECT lang, doc_id, len(string_split(text, ' ')) AS n_toks,
               row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
        FROM documents),
    rec AS (
        SELECT lang, doc_id, rn, n_toks,
               CAST(0 AS BIGINT) AS bin, n_toks AS fill
        FROM d WHERE rn = 1
        UNION ALL
        SELECT d.lang, d.doc_id, d.rn, d.n_toks,
               CASE WHEN rec.fill + d.n_toks > 512
                    THEN rec.bin + 1 ELSE rec.bin END,
               CASE WHEN rec.fill + d.n_toks > 512
                    THEN d.n_toks ELSE rec.fill + d.n_toks END
        FROM rec JOIN d ON d.lang = rec.lang AND d.rn = rec.rn + 1)
    SELECT lang, doc_id, n_toks, bin FROM rec
    """,
    "LLM sequence packing: greedy first-fit of documents into 512-token "
    "bins per language (order-dependent fold -> applyInPandas per group; "
    "oracle: recursive CTE). operators.packing adds the sharded variant "
    "for scale.",
    ("pipeline", "packing"),
)
def q80(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fluvii_spark.operators.packing import pack_sequences

    t = load_tables(spark, sf_dir)
    docs = t.documents.select(
        "lang", "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_toks")
    )
    return pack_sequences(
        docs, group_cols=["lang"], order_col="doc_id", size_col="n_toks",
        capacity=512,
    )


@register(
    "q81_map_funcs",
    """
    WITH b AS (SELECT event_type,
                      CAST(FLOOR(value / 500) AS BIGINT) AS bucket
               FROM events WHERE value >= 0),
         c AS (SELECT event_type, bucket, COUNT(*) AS n
               FROM b GROUP BY event_type, bucket)
    SELECT event_type,
           array_to_string(list(bucket ORDER BY bucket), ',') AS buckets,
           array_to_string(list(n ORDER BY bucket), ',') AS counts
    FROM c GROUP BY event_type
    """,
    "map-typed histogram per event_type: counts assembled into a "
    "map<bucket,count> via map_from_entries, surfaced as comma-joined sorted "
    "key/value strings (map AND raw-array columns don't hash-compare across "
    "engines — a pandas-based comparator can't factorize ndarray cells; "
    "serialized entry strings do)",
    ("relational", "map"),
)
def q81(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    c = (
        t.events.filter("value >= 0")
        .groupBy(
            "event_type",
            F.floor(F.col("value") / 500).cast("long").alias("bucket"),
        )
        .agg(F.count("*").alias("n"))
    )
    m = c.groupBy("event_type").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("bucket", "n")))
        ).alias("m")
    )
    return m.select(
        "event_type",
        F.array_join(F.map_keys("m").cast("array<string>"), ",").alias(
            "buckets"
        ),
        F.array_join(F.map_values("m").cast("array<string>"), ",").alias(
            "counts"
        ),
    )


@register(
    "q82_salted_distinct",
    """
    SELECT event_type, COUNT(DISTINCT user_id) AS n_distinct
    FROM events GROUP BY event_type
    """,
    "exact count-distinct under group skew, two-phase: phase 1 splits each "
    "group's distinct-state over 16 value-hash buckets (buckets partition "
    "the value space, so bucket counts sum exactly), phase 2 is a tiny "
    "merge — the pattern for one-hot-group × high-cardinality columns "
    "(operators.skew.salted_count_distinct)",
    ("relational", "skew", "agg"),
)
def q82(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fluvii_spark.operators.skew import salted_count_distinct

    t = load_tables(spark, sf_dir)
    return salted_count_distinct(
        t.events, group_cols=["event_type"], distinct_col="user_id"
    )


@register(
    "q83_window_ignore_nulls",
    """
    WITH e AS (SELECT user_id, ts, event_id,
                      CASE WHEN event_id % 3 = 0 THEN NULL ELSE value END AS v
               FROM events),
         w AS (SELECT user_id,
                      last_value(v IGNORE NULLS)
                        OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND UNBOUNDED FOLLOWING) AS last_v,
                      row_number()
                        OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn
               FROM e)
    SELECT user_id, last_v FROM w WHERE rn = 1
    """,
    "IGNORE NULLS window navigation: per user, the value of their latest "
    "non-null reading (1/3 of rows deterministically nulled) — the "
    "last-known-good lookup of sensor/state pipelines",
    ("relational", "window"),
)
def q83(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    e = t.events.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_id") % 3 == 0, None)
        .otherwise(F.col("value"))
        .alias("v"),
    )
    full = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    latest = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        e.select(
            "user_id",
            F.last("v", ignorenulls=True).over(full).alias("last_v"),
            F.row_number().over(latest).alias("rn"),
        )
        .filter("rn = 1")
        .select("user_id", "last_v")
    )


@register(
    "q84_lateral_topn",
    """
    SELECT n.n_name, c.c_custkey, c.c_acctbal
    FROM nation n, LATERAL (
        SELECT c_custkey, c_acctbal FROM customer
        WHERE c_nationkey = n.n_nationkey
        ORDER BY c_acctbal DESC, c_custkey LIMIT 2
    ) c
    """,
    "LATERAL correlated subquery (top-2 customers per nation): Catalyst "
    "plans the decorrelated window form, not 25 correlated re-scans",
    ("relational", "subquery", "sql"),
)
def q84(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_temp_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT n.n_name, c.c_custkey, c.c_acctbal
        FROM nation n, LATERAL (
            SELECT c_custkey, c_acctbal FROM customer
            WHERE c_nationkey = n.n_nationkey
            ORDER BY c_acctbal DESC, c_custkey LIMIT 2
        ) c
        """
    )


@register(
    "q85_bitwise_aggs",
    """
    SELECT o_orderpriority,
           bit_and(o_orderkey) AS k_and,
           bit_or(o_orderkey)  AS k_or,
           bit_xor(o_orderkey) AS k_xor
    FROM orders GROUP BY o_orderpriority
    """,
    "bitwise aggregates (and/or/xor fold over int64 keys) — set-membership "
    "sketches and checksum-style folds",
    ("relational", "agg"),
)
def q85(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return t.orders.groupBy("o_orderpriority").agg(
        F.bit_and("o_orderkey").alias("k_and"),
        F.bit_or("o_orderkey").alias("k_or"),
        F.bit_xor("o_orderkey").alias("k_xor"),
    )


@register(
    "q86_regex_backref",
    r"""
    SELECT p_partkey,
           regexp_replace(p_name, '^(\w+) (\w+)', '\2 \1') AS swapped
    FROM part
    """,
    "regexp_replace with capture-group backreferences (swap first two "
    "words) — engine syntax differs ($2 $1 vs \\2 \\1) but semantics are "
    "identical, which is exactly what the oracle checks",
    ("relational", "string"),
)
def q86(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return t.part.select(
        "p_partkey",
        F.regexp_replace("p_name", r"^(\w+) (\w+)", r"$2 $1").alias("swapped"),
    )


@register(
    "q87_exists_subquery",
    """
    SELECT s.s_nationkey, COUNT(*) AS n_suppliers
    FROM supplier s
    WHERE EXISTS (SELECT 1 FROM customer c
                  WHERE c.c_nationkey = s.s_nationkey
                    AND c.c_acctbal > 9900)
      AND NOT EXISTS (SELECT 1 FROM customer c2
                      WHERE c2.c_nationkey = s.s_nationkey
                        AND c2.c_acctbal < -990)
    GROUP BY s.s_nationkey
    """,
    "correlated EXISTS / NOT EXISTS through the SQL front door — Catalyst "
    "decorrelates to semi + anti joins (q09/q10 are the DataFrame forms)",
    ("relational", "subquery", "sql"),
)
def q87(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_temp_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT s.s_nationkey, COUNT(*) AS n_suppliers
        FROM supplier s
        WHERE EXISTS (SELECT 1 FROM customer c
                      WHERE c.c_nationkey = s.s_nationkey
                        AND c.c_acctbal > 9900)
          AND NOT EXISTS (SELECT 1 FROM customer c2
                          WHERE c2.c_nationkey = s.s_nationkey
                            AND c2.c_acctbal < -990)
        GROUP BY s.s_nationkey
        """
    )


@register(
    "q88_pipeline_e2e",
    f"""
    WITH RECURSIVE
    qual AS (
      SELECT doc_id, lang, text,
             len(string_split(text, ' ')) AS n_toks,
             trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                  ' +', ' ', 'g')) AS norm_text
      FROM documents
      WHERE len(string_split(text, ' ')) >= 20),
    dedup AS (
      SELECT * FROM (
        SELECT doc_id, lang, n_toks, norm_text,
               row_number() OVER (PARTITION BY norm_text ORDER BY doc_id) AS rn
        FROM qual) WHERE rn = 1),
    split AS (
      SELECT doc_id, lang, n_toks,
             CASE WHEN {_H32_DUCK.format(x="'split_' || CAST(doc_id AS VARCHAR)")} % 10 < 8
                  THEN 'train'
                  WHEN {_H32_DUCK.format(x="'split_' || CAST(doc_id AS VARCHAR)")} % 10 = 8
                  THEN 'val' ELSE 'test' END AS split
      FROM dedup),
    d AS MATERIALIZED (
      SELECT lang, split, doc_id, n_toks,
             row_number() OVER (PARTITION BY lang, split ORDER BY doc_id) AS rn
      FROM split),
    rec AS (
      SELECT lang, split, doc_id, rn, n_toks,
             CAST(0 AS BIGINT) AS bin, n_toks AS fill
      FROM d WHERE rn = 1
      UNION ALL
      SELECT d.lang, d.split, d.doc_id, d.rn, d.n_toks,
             CASE WHEN rec.fill + d.n_toks > 512 THEN rec.bin + 1 ELSE rec.bin END,
             CASE WHEN rec.fill + d.n_toks > 512 THEN d.n_toks
                  ELSE rec.fill + d.n_toks END
      FROM rec JOIN d ON d.lang = rec.lang AND d.split = rec.split
                     AND d.rn = rec.rn + 1)
    SELECT lang, split,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT bin) AS n_bins,
           CAST(SUM(n_toks) AS BIGINT) AS total_toks
    FROM rec GROUP BY lang, split
    """,
    "the training-data pipeline END-TO-END in one plan: quality gate "
    "(>=20 tokens) -> normalize + exact dedup keep-first -> deterministic "
    "stratified 80/10/10 split -> greedy 512-token sequence packing per "
    "(lang, split) -> corpus stats. Every stage is one of the inventory "
    "operators composed; the oracle replays the whole chain in SQL "
    "(recursive CTE for the packing fold).",
    ("pipeline", "e2e"),
)
def q88(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fluvii_spark.operators.packing import pack_sequences

    t = load_tables(spark, sf_dir)
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower("text"), "[^a-z0-9 ]", ""), " +", " "
        )
    )
    qual = t.documents.select(
        "doc_id",
        "lang",
        F.size(F.split("text", " ")).cast("long").alias("n_toks"),
        norm.alias("norm_text"),
    ).filter("n_toks >= 20")
    # keep-first as min(struct) — doc_id leads the struct and is unique,
    # so the hash aggregation selects exactly the window's rn=1 row but
    # with map-side PARTIAL aggregation instead of a corpus sort window
    dedup = (
        qual.groupBy("norm_text")
        .agg(F.min(F.struct("doc_id", "lang", "n_toks")).alias("_m"))
        .select("_m.doc_id", "_m.lang", "_m.n_toks")
    )
    h = _h32(F.concat(F.lit("split_"), F.col("doc_id").cast("string"))) % 10
    split = dedup.withColumn(
        "split", F.when(h < 8, "train").when(h == 8, "val").otherwise("test")
    )
    packed = pack_sequences(
        split,
        group_cols=["lang", "split"],
        order_col="doc_id",
        size_col="n_toks",
        capacity=512,
    )
    return packed.groupBy("lang", "split").agg(
        F.count("*").alias("n_docs"),
        F.count_distinct("bin").alias("n_bins"),
        F.sum("n_toks").alias("total_toks"),
    )


@register(
    "q89_funnel",
    """
    WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS t FROM events),
    v AS (SELECT user_id, MIN(t) AS tv FROM e
          WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, MIN(t) AS tc FROM e JOIN v USING (user_id)
          WHERE event_type = 'click' AND t > tv
            AND t - tv <= 86400000000 GROUP BY e.user_id),
    p AS (SELECT e.user_id, MIN(t) AS tp FROM e JOIN c USING (user_id)
          WHERE event_type = 'purchase' AND t > tc
            AND t - tc <= 259200000000 GROUP BY e.user_id)
    SELECT 'view' AS stage, COUNT(*) AS n_users FROM v
    UNION ALL SELECT 'view>click', COUNT(*) FROM c
    UNION ALL SELECT 'view>click>purchase', COUNT(*) FROM p
    """,
    "ordered funnel with conversion horizons (first view -> click within "
    "24 h -> purchase within 72 h of that click): stage user counts via "
    "chained first-occurrence aggregates — each stage joins the (small) "
    "survivor set back to events, so the event table is scanned, never "
    "self-joined row x row. Unbounded horizons let every user complete "
    "the funnel (no drop-off — degeneracy-gate catch, r7); the windows "
    "give 150/60/45 at sf0.01",
    ("relational", "funnel"),
)
def q89(spark: SparkSession, sf_dir: str) -> DataFrame:
    # single-pass funnel: ONE filtered scan + ONE per-user time-ordered
    # window instead of three filtered scans, three per-user aggregations
    # and two join-backs (the before-plan carried six events scans).
    # Correctness: with the default RANGE UNBOUNDED PRECEDING..CURRENT ROW
    # frame, the running min(view t) at any row r equals the user's global
    # first-view time tv whenever tv <= t(r) and is NULL otherwise — and a
    # row can only satisfy the strict `t > tv` horizon test when tv <= t,
    # so per-row running mins decide exactly the global-join conditions.
    # The same argument chains for the qualified-click marker. Ties in t
    # are harmless: RANGE frames include all tied rows, and equality
    # fails the strict `>` either way. The three window expressions share
    # one WindowSpec (one shuffle + sort); the per-user flag aggregation
    # reuses the window's hash partitioning (no second exchange).
    return _funnel_stages(
        spark,
        sf_dir,
        click_horizon_us=86_400_000_000,  # click within 24 h
        purchase_horizon_us=259_200_000_000,  # purchase within 72 h
        labels=("view", "view>click", "view>click>purchase"),
    )


def _funnel_stages(
    spark: SparkSession,
    sf_dir: str,
    click_horizon_us: int,
    purchase_horizon_us: int,
    labels: tuple[str, str, str],
) -> DataFrame:
    """Shared single-pass funnel body for q89/q119 (see q89's note)."""
    e = (
        load_tables(spark, sf_dir)
        .events.select(
            "user_id",
            "event_type",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),
        )
        # only the three funnel stages cross the shuffle (guide §2.3)
        .filter(F.col("event_type").isin("view", "click", "purchase"))
    )
    w = Window.partitionBy("user_id").orderBy("t")
    ev = e.withColumn(
        "tv", F.min(F.when(F.col("event_type") == "view", F.col("t"))).over(w)
    )
    ev = ev.withColumn(
        "tc",
        F.min(
            F.when(
                (F.col("event_type") == "click")
                & (F.col("t") > F.col("tv"))
                & (F.col("t") - F.col("tv") <= click_horizon_us),
                F.col("t"),
            )
        ).over(w),
    )
    qp = (
        (F.col("event_type") == "purchase")
        & (F.col("t") > F.col("tc"))
        & (F.col("t") - F.col("tc") <= purchase_horizon_us)
    )
    per_user = ev.groupBy("user_id").agg(
        F.max(F.col("tv").isNotNull()).alias("has_v"),
        F.max(F.col("tc").isNotNull()).alias("has_c"),
        F.max(qp).alias("has_p"),
    )
    tot = per_user.agg(
        *[
            F.coalesce(F.sum(F.when(F.col(c), 1)), F.lit(0))
            .cast("bigint")
            .alias(a)
            for c, a in (("has_v", "nv"), ("has_c", "nc"), ("has_p", "np"))
        ]
    )
    return tot.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(lbl).alias("stage"),
                        F.col(col).alias("n_users"),
                    )
                    for lbl, col in zip(labels, ("nv", "nc", "np"))
                ]
            )
        ).alias("s")
    ).select("s.stage", "s.n_users")


_US_WEEK = 604_800_000_000  # 7 * 86400 * 1e6 — epoch-aligned integer weeks


@register(
    "q90_cohort_retention",
    f"""
    WITH s AS (SELECT user_id, MIN(epoch_us(ts)) // {_US_WEEK} AS cw
               FROM events WHERE event_type = 'signup' GROUP BY user_id),
         a AS (SELECT user_id, epoch_us(ts) // {_US_WEEK} AS aw FROM events)
    SELECT s.cw AS cohort_week, a.aw - s.cw AS week_offset,
           COUNT(DISTINCT a.user_id) AS n_users
    FROM a JOIN s USING (user_id)
    WHERE a.aw >= s.cw
    GROUP BY 1, 2
    """,
    "cohort retention matrix: users bucketed by signup week, counted in "
    "each later activity week — the cohort dimension joins as a per-user "
    "attribute (one small build side), the activity scan stays single-pass",
    ("relational", "cohort"),
)
def q90(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir).events.select(
        "user_id",
        "event_type",
        F.expr(f"unix_micros(cast(ts as timestamp)) div {_US_WEEK}").alias("w"),
    )
    s = (
        e.filter("event_type = 'signup'")
        .groupBy("user_id")
        .agg(F.min("w").alias("cw"))
    )
    return (
        e.join(s, "user_id")
        .filter("w >= cw")
        .groupBy(
            F.col("cw").alias("cohort_week"),
            (F.col("w") - F.col("cw")).alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


@register(
    "q91_median_abs_dev",
    """
    WITH med AS (SELECT event_type,
                        percentile_cont(0.5) WITHIN GROUP (ORDER BY value) AS med
                 FROM events GROUP BY event_type)
    SELECT e.event_type, ANY_VALUE(m.med) AS med,
           percentile_cont(0.5) WITHIN GROUP (ORDER BY abs(e.value - m.med)) AS mad
    FROM events e JOIN med m ON e.event_type = m.event_type
    GROUP BY e.event_type
    """,
    "robust dispersion: median absolute deviation per group — two exact "
    "interpolated-percentile passes, group medians joined back as a "
    "broadcast attribute",
    ("relational", "stats"),
)
def q91(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    med = t.events.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    return (
        t.events.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.expr("any_value(med)").alias("med"),
            F.expr("percentile(abs(value - med), 0.5)").alias("mad"),
        )
    )


@register(
    "q92_variant_json",
    """
    WITH v AS (SELECT CAST(json_extract(props, '$.k') AS BIGINT) AS k
               FROM events)
    SELECT k % 10 AS k_mod, COUNT(*) AS n,
           CAST(SUM(k) AS BIGINT) AS k_sum
    FROM v GROUP BY k % 10
    """,
    "schema-on-read semi-structured path: props parsed to VARIANT "
    "(parse_json) and navigated with variant_get — Spark 4's open-schema "
    "column type, vs q25's fixed-schema from_json (oracle: duckdb JSON "
    "extraction)",
    ("relational", "json", "variant"),
)
def q92(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fluvii_spark.session import require_spark

    require_spark(spark, (4, 0), "q92 VARIANT (parse_json/variant_get)")
    t = load_tables(spark, sf_dir)
    v = t.events.select(
        F.expr("variant_get(parse_json(props), '$.k', 'long')").alias("k")
    )
    return v.groupBy((F.col("k") % 10).alias("k_mod")).agg(
        F.count("*").alias("n"), F.sum("k").alias("k_sum")
    )


@register(
    "q93_gaps_islands",
    """
    WITH d AS (SELECT DISTINCT user_id,
                               epoch_us(ts) // 86400000000 AS day
               FROM events),
         g AS (SELECT user_id, day,
                      day - row_number() OVER (PARTITION BY user_id
                                               ORDER BY day) AS grp
               FROM d),
         s AS (SELECT user_id, COUNT(*) AS streak
               FROM g GROUP BY user_id, grp)
    SELECT user_id, MAX(streak) AS longest_streak
    FROM s GROUP BY user_id
    """,
    "gaps-and-islands: longest run of consecutive active days per user — "
    "the day-minus-row_number island key turns streak detection into two "
    "hash aggregates, no self-join",
    ("relational", "window", "islands"),
)
def q93(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir).events.select(
        "user_id",
        F.expr("unix_micros(cast(ts as timestamp)) div 86400000000").alias("day"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    g = e.withColumn("grp", F.col("day") - F.row_number().over(w))
    s = g.groupBy("user_id", "grp").agg(F.count("*").alias("streak"))
    return s.groupBy("user_id").agg(F.max("streak").alias("longest_streak"))


@register(
    "q94_percent_of_total",
    """
    WITH r AS (SELECT o_orderpriority,
                      SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
               FROM orders GROUP BY o_orderpriority)
    SELECT o_orderpriority,
           CAST(rev AS DOUBLE) AS revenue,
           CAST(rev / SUM(rev) OVER () AS DOUBLE) AS share
    FROM r
    """,
    "percent-of-total: global-frame window over a pre-aggregated (tiny) "
    "relation — the share is computed on 5 rows, never on the fact table",
    ("relational", "window"),
)
def q94(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    r = t.orders.groupBy("o_orderpriority").agg(
        F.expr("SUM(CAST(o_totalprice AS DECIMAL(18,2)))").alias("rev")
    )
    w = Window.partitionBy()
    return r.select(
        "o_orderpriority",
        F.col("rev").cast("double").alias("revenue"),
        (F.col("rev") / F.sum("rev").over(w)).cast("double").alias("share"),
    )


@register(
    "q95_full_outer_join",
    """
    WITH o AS (SELECT o_custkey, COUNT(*) AS n_orders
               FROM orders WHERE o_orderpriority = '1-URGENT'
               GROUP BY o_custkey),
         c AS (SELECT c_custkey FROM customer WHERE c_custkey % 3 <> 0),
         j AS (SELECT c.c_custkey, o.o_custkey, o.n_orders
               FROM c FULL OUTER JOIN o
                 ON c.c_custkey = o.o_custkey)
    SELECT CASE WHEN c_custkey IS NULL THEN 'order_only'
                WHEN o_custkey IS NULL THEN 'customer_only'
                ELSE 'both' END AS side,
           COUNT(*) AS n,
           CAST(COALESCE(SUM(n_orders), 0) AS BIGINT) AS total_orders
    FROM j GROUP BY 1
    """,
    "FULL OUTER join (the one join type q06-q12 didn't cover): a customer "
    "subset x urgent-order counts, classified matched / left-only / "
    "right-only — the reconciliation-report shape (subsets chosen so all "
    "three classes are non-empty)",
    ("relational", "join"),
)
def q95(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    o = (
        t.orders.filter("o_orderpriority = '1-URGENT'")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
    )
    c = t.customer.select("c_custkey").filter("c_custkey % 3 <> 0")
    j = c.join(o, c["c_custkey"] == o["o_custkey"], "full_outer")
    side = (
        F.when(F.col("c_custkey").isNull(), "order_only")
        .when(F.col("o_custkey").isNull(), "customer_only")
        .otherwise("both")
    )
    return j.groupBy(side.alias("side")).agg(
        F.count("*").alias("n"),
        F.coalesce(F.sum("n_orders"), F.lit(0)).alias("total_orders"),
    )
