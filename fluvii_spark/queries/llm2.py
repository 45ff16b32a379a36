"""Training-data-pipeline inventory, part 2 (Q96+): chunking, contamination
checks, repetition scoring, PII-style redaction, and cluster-level keep-best
dedup. Like :mod:`fluvii_spark.queries.llm`, every query pairs a Spark plan
built from `pyspark.sql.functions` (JVM-side, codegen-able) with a DuckDB
oracle using the same md5-derived determinism.

No counterpart in the reference (SURVEY.md §2.2 "LLM-data ops").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fluvii_spark.io.readers import load_tables
from fluvii_spark.operators import dedup as D
from fluvii_spark.queries import register
from fluvii_spark.queries.llm import _JACCARD, _MINHASH, _SH3

CHUNK = 50
STRIDE = 40


@register(
    "q96_doc_chunking",
    f"""
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    s AS (
      SELECT doc_id, toks, len(toks) AS n,
             unnest(range(0, len(toks), {STRIDE})) AS s
      FROM d WHERE len(toks) > 0
    )
    SELECT doc_id,
           CAST(s AS BIGINT) AS chunk_start,
           CAST(least({CHUNK}, n - s) AS BIGINT) AS chunk_toks,
           md5(array_to_string(list_slice(toks, s + 1, least(s + {CHUNK}, n)), ' '))
             AS chunk_md5
    FROM s
    """,
    f"RAG/training chunking: fixed {CHUNK}-token windows, stride {STRIDE} "
    f"({CHUNK - STRIDE}-token overlap), per-chunk content digest. One "
    "explode per chunk — no per-doc Python, chunk boundaries are pure array "
    "arithmetic so the scan stays in whole-stage codegen",
    ("llm", "chunking"),
)
def q96(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t.documents.select("doc_id", F.split("text", " ").alias("toks"))
        .withColumn("n", F.size("toks"))
        .filter(F.col("n") > 0)
        .withColumn("s", F.explode(F.expr(f"sequence(0, n - 1, {STRIDE})")))
        .select(
            "doc_id",
            F.col("s").cast("long").alias("chunk_start"),
            F.least(F.lit(CHUNK), F.col("n") - F.col("s"))
            .cast("long")
            .alias("chunk_toks"),
            F.md5(F.concat_ws(" ", F.expr(f"slice(toks, s + 1, {CHUNK})"))).alias(
                "chunk_md5"
            ),
        )
    )


_H32_CONT_DUCK = (
    "('0x' || substr(md5('cont_' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT"
)


@register(
    "q97_contamination_check",
    f"""
    WITH split AS (
      SELECT doc_id, lang,
             CASE WHEN {_H32_CONT_DUCK} % 10 < 8 THEN 'train' ELSE 'test' END
               AS part
      FROM documents
    ),
    toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
             generate_subscripts(string_split(text, ' '), 1) AS pos
      FROM documents
    ),
    sh5 AS (
      SELECT DISTINCT a.doc_id,
             a.tok || ' ' || b.tok || ' ' || c.tok || ' ' || d.tok || ' ' || e.tok
               AS shingle
      FROM toks a
      JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
      JOIN toks c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
      JOIN toks d ON a.doc_id = d.doc_id AND d.pos = a.pos + 3
      JOIN toks e ON a.doc_id = e.doc_id AND e.pos = a.pos + 4
    ),
    train_sh AS (
      SELECT DISTINCT shingle FROM sh5 JOIN split USING (doc_id)
      WHERE part = 'train'
    ),
    contaminated AS (
      SELECT DISTINCT s.doc_id
      FROM sh5 s JOIN split p USING (doc_id)
      JOIN train_sh t ON s.shingle = t.shingle
      WHERE p.part = 'test'
    )
    SELECT lang,
           COUNT(*) AS n_test,
           CAST(COUNT(c.doc_id) AS BIGINT) AS n_contaminated,
           CAST(COUNT(c.doc_id) AS DOUBLE) / COUNT(*) AS contamination_rate
    FROM split LEFT JOIN contaminated c USING (doc_id)
    WHERE part = 'test'
    GROUP BY lang
    """,
    "train/test contamination: fraction of test documents sharing any "
    "5-gram with the train split (deterministic md5 80/20 assignment). The "
    "Spark plan is a distinct-shingle LEFT SEMI join — candidate volume is "
    "|test shingles|, never |test|x|train|",
    ("llm", "contamination"),
)
def q97(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    h = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("cont_"), F.col("doc_id").cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % 10
    )
    split = t.documents.select(
        "doc_id", "lang", F.when(h < 8, "train").otherwise("test").alias("part")
    )
    sh5 = D.word_shingles(t.documents, "doc_id", "text", n=5)
    train_sh = (
        sh5.join(split.filter("part = 'train'"), "doc_id")
        .select("shingle")
        .distinct()
    )
    contaminated = (
        sh5.join(split.filter("part = 'test'"), "doc_id")
        .join(train_sh, "shingle", "leftsemi")
        .select("doc_id")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    return (
        split.filter("part = 'test'")
        .join(contaminated, "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_test"),
            F.count("_hit").alias("n_contaminated"),
            (F.count("_hit").cast("double") / F.count("*")).alias(
                "contamination_rate"
            ),
        )
    )


@register(
    "q98_repetition_score",
    """
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
             generate_subscripts(string_split(text, ' '), 1) AS pos
      FROM documents
    ),
    tri AS (
      SELECT a.doc_id, a.tok || ' ' || b.tok || ' ' || c.tok AS tg
      FROM toks a
      JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
      JOIN toks c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
    ),
    tstat AS (
      SELECT doc_id, COUNT(*) AS n_tri,
             COUNT(DISTINCT tg) AS n_distinct_tri
      FROM tri GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_toks,
           CAST(len(list_distinct(string_split(d.text, ' '))) AS BIGINT)
             AS n_distinct_toks,
           1.0 - CAST(len(list_distinct(string_split(d.text, ' '))) AS DOUBLE)
               / len(string_split(d.text, ' ')) AS dup_token_ratio,
           1.0 - CAST(t.n_distinct_tri AS DOUBLE) / t.n_tri AS dup_trigram_ratio
    FROM documents d JOIN tstat t USING (doc_id)
    WHERE len(string_split(d.text, ' ')) >= 3
    """,
    "Gopher/C4-style repetition quality signal: duplicate-token and "
    "duplicate-trigram ratios per document — pure array higher-order "
    "functions, zero UDFs, one scan",
    ("llm", "quality"),
)
def q98(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    # materialize the token array once per row; re-splitting inside the
    # trigram lambda is O(words²) splits per document
    base = t.documents.select(
        "doc_id", F.split("text", " ").alias("toks")
    ).select(
        "doc_id",
        "toks",
        F.expr(
            "transform(sequence(0, size(toks) - 3),"
            " i -> concat_ws(' ', slice(toks, i + 1, 3)))"
        ).alias("tri"),
    )
    return (
        base.select(
            "doc_id",
            F.size("toks").cast("long").alias("n_toks"),
            F.size(F.array_distinct("toks")).cast("long").alias("n_distinct_toks"),
            F.size("tri").alias("_n_tri"),
            F.size(F.array_distinct("tri")).alias("_n_distinct_tri"),
        )
        .filter(F.col("n_toks") >= 3)
        .select(
            "doc_id",
            "n_toks",
            "n_distinct_toks",
            (
                F.lit(1.0)
                - F.col("n_distinct_toks").cast("double") / F.col("n_toks")
            ).alias("dup_token_ratio"),
            (
                F.lit(1.0)
                - F.col("_n_distinct_tri").cast("double") / F.col("_n_tri")
            ).alias("dup_trigram_ratio"),
        )
    )


@register(
    "q99_pii_redaction",
    """
    WITH red AS (
      SELECT c_mktsegment,
             c_name,
             regexp_replace(c_name, '[0-9]{3,}', '[ID]', 'g') AS redacted
      FROM customer
    )
    SELECT c_mktsegment,
           COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN redacted <> c_name THEN 1 ELSE 0 END) AS BIGINT)
             AS n_redacted,
           CAST(SUM(len(c_name) - len(redacted)) AS BIGINT) AS chars_delta,
           MIN(redacted) AS sample_redacted
    FROM red GROUP BY c_mktsegment
    """,
    "PII-style redaction machinery: mask long digit runs (account/customer "
    "ids — same shape as phone/SSN scrubbing) and report hit counts + size "
    "deltas per segment. regexp_replace is JVM-side; at 100 TB this is a "
    "single codegen'd scan, no shuffle before the tiny aggregate",
    ("llm", "redaction"),
)
def q99(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    red = t.customer.select(
        "c_mktsegment",
        "c_name",
        F.regexp_replace("c_name", "[0-9]{3,}", "[ID]").alias("redacted"),
    )
    return red.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_rows"),
        F.sum(F.when(F.col("redacted") != F.col("c_name"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_redacted"),
        F.sum(F.length("c_name") - F.length("redacted"))
        .cast("bigint")
        .alias("chars_delta"),
        F.min("redacted").alias("sample_redacted"),
    )


@register(
    "q100_dedup_keep_best",
    f"""
    WITH RECURSIVE
    {_SH3},
    {_MINHASH},
    bands AS (
      SELECT doc_id, perm // 4 AS band,
             string_agg(perm || ':' || minhash, ',' ORDER BY perm) AS band_sig
      FROM sig GROUP BY doc_id, perm // 4
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a
      JOIN bands b ON a.band = b.band AND a.band_sig = b.band_sig
                  AND a.doc_id < b.doc_id
    ),
    {_JACCARD},
    pairs AS (
      SELECT c.id_a, c.id_b
      FROM cand c JOIN jac j ON c.id_a = j.id_a AND c.id_b = j.id_b
      WHERE j.jaccard >= 0.5
    ),
    edges AS MATERIALIZED (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    reach AS (
      SELECT src, dst FROM edges
      UNION SELECT src, src FROM edges
    ),
    closure(src, dst) AS (
      SELECT src, dst FROM reach
      UNION
      SELECT c.src, e.dst FROM closure c JOIN edges e ON c.dst = e.src
    ),
    clusters AS (
      SELECT src AS node, CAST(MIN(dst) AS BIGINT) AS cluster
      FROM closure GROUP BY src
    ),
    ranked AS (
      SELECT cl.cluster, cl.node, d.n_chars,
             row_number() OVER (PARTITION BY cl.cluster
                                ORDER BY d.n_chars DESC, cl.node) AS rn
      FROM clusters cl JOIN documents d ON d.doc_id = cl.node
    )
    SELECT cluster,
           MAX(CASE WHEN rn = 1 THEN node END) AS keep_doc_id,
           CAST(MAX(CASE WHEN rn = 1 THEN n_chars END) AS BIGINT)
             AS kept_n_chars,
           COUNT(*) AS n_members
    FROM ranked GROUP BY cluster
    """,
    "cluster-level keep-best dedup: near-dup clusters (MinHash-LSH pairs → "
    "connected components) keep the longest member (tie: lowest id) — the "
    "policy step a real dedup pipeline runs after clustering, composed from "
    "inventory operators in one plan",
    ("llm", "dedup", "pipeline"),
)
def q100(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fluvii_spark.queries.llm import doc_dedup_clusters

    t = load_tables(spark, sf_dir)
    clusters = doc_dedup_clusters(spark, sf_dir)
    ranked = clusters.join(
        t.documents.select(F.col("doc_id").alias("node"), "n_chars"), "node"
    ).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("cluster").orderBy(
                F.col("n_chars").desc(), F.col("node")
            )
        ),
    )
    return ranked.groupBy("cluster").agg(
        F.max(F.when(F.col("rn") == 1, F.col("node"))).alias("keep_doc_id"),
        F.max(F.when(F.col("rn") == 1, F.col("n_chars")))
        .cast("bigint")
        .alias("kept_n_chars"),
        F.count("*").alias("n_members"),
    )
