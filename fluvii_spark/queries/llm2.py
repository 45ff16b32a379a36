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
from fluvii_spark.operators import similarity as S
from fluvii_spark.queries.llm import _JACCARD, _LSH_BUCKETS, _MINHASH, _SH3

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
    # the train/test split is a pure function of doc_id, so it attaches to
    # the shingle rows as an EXPRESSION — no join against a split relation
    # (the previous formulation joined the split table twice; this plan has
    # exactly one join: the leftsemi contamination probe)
    part = F.when(h < 8, "train").otherwise("test")
    # in-row distinct: identical (doc, shingle) rows as the dropDuplicates
    # form (every duplicate originates in one source row) but ZERO shuffle
    # — and this relation has two consumers (train distinct + test probe),
    # each of which re-executed the dedup exchange over the exploded
    # corpus. A/B'd vs checkpoint variants (best-of-3 2.21 s vs 2.34 s
    # original, noise-level locally); kept on the structural argument:
    # two corpus-scale exchanges removed, no new barrier.
    sh5 = D.word_shingles(
        t.documents, "doc_id", "text", n=5, distinct_in_row=True
    ).withColumn("part", part)
    train_sh = sh5.filter("part = 'train'").select("shingle").distinct()
    contaminated = (
        sh5.filter("part = 'test'")
        .join(train_sh, "shingle", "leftsemi")
        .select("doc_id")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    return (
        t.documents.select("doc_id", "lang")
        .withColumn("part", part)
        .filter("part = 'test'")
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
    from fluvii_spark.operators.stats import fan_out_scan

    t = load_tables(spark, sf_dir)
    # materialize the token array once per row; re-splitting inside the
    # trigram lambda is O(words²) splits per document. fan_out_scan keeps
    # the per-row trigram folds parallel on an under-partitioned scan
    # (0.57 s -> 0.35 s solo at sf0.1; no-op at cluster scale)
    base = fan_out_scan(t.documents).select(
        "doc_id", F.split("text", " ").alias("toks")
    ).select(
        "doc_id",
        "toks",
        F.expr(
            "CASE WHEN size(toks) >= 3 THEN"
            " transform(sequence(0, size(toks) - 3),"
            " i -> concat_ws(' ', slice(toks, i + 1, 3)))"
            " ELSE array() END"
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


@register(
    "q103_lang_rebalance",
    """
    WITH c AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY 1),
    t AS (SELECT MIN(n_docs) AS target FROM c),
    r AS (SELECT lang, n_docs, CAST(target AS DOUBLE) / n_docs AS rate
          FROM c, t),
    k AS (
      SELECT d.lang, COUNT(*) AS n_kept
      FROM documents d JOIN r USING (lang)
      WHERE (('0x' || substr(md5('mix_' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT)
              / 4294967296.0 < r.rate
      GROUP BY 1
    )
    SELECT r.lang, CAST(r.n_docs AS BIGINT) AS n_docs,
           CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept, r.rate
    FROM r LEFT JOIN k USING (lang)
    """,
    "domain-mix rebalancing: deterministically downsample every language to "
    "≈ the smallest language's count via an md5-uniform keep-if-hash<rate "
    "rule — the data-mixing step of a training pipeline, reproducible "
    "across engines and reruns (no rand()), pushed down as a scan "
    "predicate; the per-lang rate table is a broadcast join",
    ("llm", "sampling", "mixing"),
)
def q103(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    # |langs| rows, checkpointed once (two remaining reads: the kept
    # broadcast + the final left join). The min-count target now attaches
    # as a GLOBAL WINDOW over the |langs|-bounded relation (r12, VERDICT
    # #2) instead of a separate aggregate branch + crossJoin — one fewer
    # checkpoint consumer and two fewer operators; the single-task window
    # sees ≤|langs| rows at any corpus scale. The un-checkpointed window
    # form (3 corpus scans — the counts subtree plans twice, no
    # ReusedExchange) measured neutral-to-better locally but re-scans the
    # corpus at scale; ckpt kept. Low-steal A/B: sf0.1 window+ckpt
    # 0.52–0.76 s vs committed 0.56–0.97; g10-ms best 1.53 vs 1.74.
    counts = (
        t.documents.groupBy("lang")
        .agg(F.count("*").alias("n_docs"))
        .localCheckpoint(eager=False)
    )
    rates = counts.withColumn(
        "rate",
        F.min("n_docs").over(Window.partitionBy()).cast("double")
        / F.col("n_docs"),
    )
    h = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("mix_"), F.col("doc_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        / F.lit(4294967296.0)
    )
    kept = (
        t.documents.join(F.broadcast(rates), "lang")
        .filter(h < F.col("rate"))
        .groupBy("lang")
        .agg(F.count("*").alias("n_kept"))
    )
    return rates.join(kept, "lang", "left").select(
        "lang",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.coalesce(F.col("n_kept"), F.lit(0)).cast("bigint").alias("n_kept"),
        "rate",
    )


@register(
    "q105_quality_quantile_gate",
    """
    WITH scored AS (
      SELECT doc_id, lang,
             CAST(list_unique(string_split(text, ' ')) AS DOUBLE)
               / len(string_split(text, ' ')) AS ttr
      FROM documents
    ),
    ranked AS (
      SELECT doc_id, lang, ttr,
             row_number() OVER (PARTITION BY lang ORDER BY ttr, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY lang) AS n
      FROM scored
    )
    SELECT lang, CAST(MAX(n) AS BIGINT) AS n_total,
           CAST(COUNT(CASE WHEN rn > n // 4 THEN 1 END) AS BIGINT) AS n_kept,
           MIN(CASE WHEN rn > n // 4 THEN ttr END) AS min_kept_ttr
    FROM ranked GROUP BY lang
    """,
    "quantile-gated quality filter: drop the bottom quartile of documents "
    "per language by type-token ratio. The gate is RANK-based (keep rank > "
    "floor(n/4)), not value-based — integer arithmetic on both engines, so "
    "no float-boundary membership flips. Per-lang ranks come from "
    "DISTRIBUTED ranking over the composite (lang, ttr, doc_id) order "
    "(operators/ranking.py) minus broadcast per-lang base offsets — the "
    "oracle's PARTITION BY lang window would put |corpus|/|langs| rows "
    "through one task per language at 100 TB",
    ("llm", "quality", "sampling"),
)
def q105(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fluvii_spark.operators.ranking import distributed_row_number

    t = load_tables(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    scored = t.documents.select(
        "doc_id",
        "lang",
        (F.size(F.array_distinct(toks)).cast("double") / F.size(toks)).alias(
            "ttr"
        ),
    )
    # global rank over (lang, ttr, doc_id): lang groups are contiguous in
    # the composite order, so rank-within-lang = rnk - min(rnk per lang) + 1
    ranked = distributed_row_number(scored, ["lang", "ttr", "doc_id"])
    per_lang = ranked.groupBy("lang").agg(
        F.min("rnk").alias("base"), F.count("*").alias("n")
    )
    j = ranked.join(F.broadcast(per_lang), "lang").withColumn(
        "rn", F.col("rnk") - F.col("base") + 1
    )
    gate = F.col("rn") > F.floor(F.col("n") / 4)
    return j.groupBy("lang").agg(
        F.max("n").cast("bigint").alias("n_total"),
        F.count(F.when(gate, 1)).cast("bigint").alias("n_kept"),
        F.min(F.when(gate, F.col("ttr"))).alias("min_kept_ttr"),
    )


@register(
    "q106_containment_pairs",
    f"""
    WITH
    {_SH3},
    card AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           CAST(n_common AS DOUBLE) / LEAST(ca.n_sh, cb.n_sh) AS containment
    FROM inter
    JOIN card ca ON ca.doc_id = id_a
    JOIN card cb ON cb.doc_id = id_b
    WHERE CAST(n_common AS DOUBLE) / LEAST(ca.n_sh, cb.n_sh) >= 0.6
    """,
    "asymmetric near-dup detection: word-3-gram CONTAINMENT ≥ 0.6 pairs "
    "(|A∩B| / min(|A|,|B|)) — catches a short doc quoted inside a long one, "
    "which symmetric Jaccard misses. Same shared-shingle equi-join candidate "
    "plan as q34, never a cross join. NOTE: the shared doc_ngram_stats "
    "builds with max_doc_freq=None so the ORACLE comparison is exact over "
    "all shingles; production corpora should pass the auto df-cut "
    "(ngram_pair_stats default) to cap corpus-hot shingle fan-out",
    ("llm", "dedup"),
)
def q106(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fluvii_spark.queries.llm import doc_ngram_stats

    return D.containment_from_stats(
        doc_ngram_stats(spark, sf_dir), threshold=0.6
    )


@register(
    "q107_semantic_rep_select",
    f"""
    WITH
    {_LSH_BUCKETS},
    bc AS (
      SELECT c.vec_id, b.bucket, c.dim, c.x
      FROM comp c JOIN buckets b USING (vec_id)
    ),
    cent AS (SELECT bucket, dim, AVG(x) AS cx FROM bc GROUP BY 1, 2),
    cn AS (SELECT bucket, sqrt(SUM(cx * cx)) AS c_norm FROM cent GROUP BY 1),
    pm AS (
      SELECT bc.vec_id, bc.bucket,
             SUM(bc.x * cent.cx) AS dot, sqrt(SUM(bc.x * bc.x)) AS m_norm
      FROM bc JOIN cent ON bc.bucket = cent.bucket AND bc.dim = cent.dim
      GROUP BY 1, 2
    ),
    cosined AS (
      SELECT pm.vec_id, pm.bucket, pm.dot / (pm.m_norm * cn.c_norm) AS cosine
      FROM pm JOIN cn USING (bucket)
    ),
    ranked AS (
      SELECT vec_id, bucket, cosine,
             row_number() OVER (PARTITION BY bucket
                                ORDER BY cosine DESC, vec_id) AS rn,
             COUNT(*) OVER (PARTITION BY bucket) AS n_members
      FROM cosined
    )
    SELECT bucket, CAST(n_members AS BIGINT) AS n_members,
           vec_id AS rep_id, cosine AS rep_cosine
    FROM ranked WHERE rn = 1 AND n_members >= 2
    """,
    "SemDeDup-style representative selection: per LSH bucket (md5-derived "
    "hyperplanes, shared with q39) pick the member closest to the bucket "
    "centroid. Fully relational — vectors stay exploded as (id, dim, x), "
    "centroid = per-(bucket, dim) mean, cosine via grouped sums — so no "
    "task ever materializes a whole bucket; operators.similarity."
    "bucket_representatives",
    ("llm", "dedup", "similarity"),
)
def q107(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return S.bucket_representatives(t.embeddings, dims=64).select(
        "bucket", "n_members", F.col("rep_id"), "rep_cosine"
    )


@register(
    "q109_importance_sample",
    """
    WITH scored AS (
      SELECT doc_id, lang,
             CAST(list_unique(string_split(text, ' ')) AS DOUBLE)
               / len(string_split(text, ' ')) AS ttr,
             (('0x' || substr(md5('imp_' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT)
               / 4294967296.0 AS h
      FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(COUNT(CASE WHEN h < ttr THEN 1 END) AS BIGINT) AS n_kept,
           AVG(CASE WHEN h < ttr THEN ttr END) AS avg_kept_ttr
    FROM scored GROUP BY lang
    """,
    "importance-weighted sampling: keep each document with probability equal "
    "to its quality score (type-token ratio), via the deterministic "
    "md5-uniform hash — upweights high-quality text exactly the way "
    "quality-weighted training mixtures do, with no rand() and full "
    "reproducibility across engines/reruns; single scan, no materialization",
    ("llm", "sampling", "quality"),
)
def q109(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    h = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("imp_"), F.col("doc_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        / F.lit(4294967296.0)
    )
    scored = t.documents.select(
        "lang",
        (F.size(F.array_distinct(toks)).cast("double") / F.size(toks)).alias(
            "ttr"
        ),
        h.alias("h"),
    )
    kept = F.col("h") < F.col("ttr")
    return scored.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_total"),
        F.count(F.when(kept, 1)).cast("bigint").alias("n_kept"),
        F.avg(F.when(kept, F.col("ttr"))).alias("avg_kept_ttr"),
    )


@register(
    "q111_prefix_dedup",
    """
    SELECT md5(array_to_string(list_slice(string_split(text, ' '), 1, 64), ' '))
             AS prefix_md5,
           CAST(MIN(doc_id) AS BIGINT) AS keep_doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_copies,
           CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_full_variants
    FROM documents
    GROUP BY 1
    """,
    "truncation-tolerant dedup: group on the md5 of the first 64 tokens — "
    "catches copies that differ only past the prefix (truncated mirrors, "
    "appended boilerplate) that exact full-text dedup (q33) treats as "
    "distinct; n_full_variants > 1 marks exactly those groups. One scan, "
    "one groupBy — the same scale shape as exact dedup",
    ("llm", "dedup"),
)
def q111(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    prefix = F.md5(
        F.concat_ws(" ", F.slice(F.split(F.col("text"), " "), 1, 64))
    )
    return t.documents.groupBy(prefix.alias("prefix_md5")).agg(
        F.min("doc_id").cast("bigint").alias("keep_doc_id"),
        F.count("*").cast("bigint").alias("n_copies"),
        F.count_distinct(F.md5(F.col("text")))
        .cast("bigint")
        .alias("n_full_variants"),
    )


@register(
    "q116_ann_multiprobe",
    f"""
    WITH
    {_LSH_BUCKETS},
    qd AS (SELECT plane, dot FROM dots WHERE vec_id = 0),
    qb AS (SELECT bucket AS qbucket FROM buckets WHERE vec_id = 0),
    fl AS (
      SELECT xor(qb.qbucket, (CAST(1 AS BIGINT) << qd.plane)) AS probe_bucket
      FROM (
        SELECT plane FROM qd
        QUALIFY row_number() OVER (ORDER BY abs(dot), plane) <= 3
      ) qd_top
      JOIN qd ON qd.plane = qd_top.plane, qb
    ),
    probe AS (
      SELECT qbucket AS probe_bucket FROM qb
      UNION ALL SELECT probe_bucket FROM fl
    ),
    q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id,
           list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                  CAST(q.qvec AS DOUBLE[])) AS cosine
    FROM embeddings e
    JOIN buckets b USING (vec_id)
    JOIN probe p ON b.bucket = p.probe_bucket, q
    WHERE e.vec_id <> 0
    ORDER BY cosine DESC, e.vec_id
    LIMIT 5
    """,
    "multi-probe LSH ANN (Lv et al., VLDB'07): probe the query's bucket "
    "plus the 3 buckets reached by flipping its lowest-|dot| hyperplane "
    "bits — the recall knob that does NOT re-hash the corpus (vs adding "
    "tables); candidates grow to 4/2^8 of the corpus, assignment stays one "
    "scan. Exact cosine within probed buckets, md5-deterministic",
    ("llm", "similarity", "ann"),
)
def q116(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return S.lsh_topk_multiprobe(t.embeddings, query_id=0, dims=64, k=5, probes=3)


BM25_TERMS = ("spark", "hash", "window")
BM25_K1 = 1.2
BM25_B = 0.75


@register(
    "q117_bm25_search",
    f"""
    WITH dl AS (
      SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents
    ),
    avgdl AS (SELECT AVG(dl) AS avgdl FROM dl),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM toks
      WHERE term IN {BM25_TERMS!r} GROUP BY 1, 2
    ),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    scored AS (
      SELECT tf.doc_id,
             COALESCE(SUM(CASE WHEN term = 'spark' THEN
               ((n.n_docs - df.df + 0.5) / (df.df + 0.5))
               * tf.tf * ({BM25_K1} + 1)
               / (tf.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.dl / avgdl.avgdl))
             END), 0)
             + COALESCE(SUM(CASE WHEN term = 'hash' THEN
               ((n.n_docs - df.df + 0.5) / (df.df + 0.5))
               * tf.tf * ({BM25_K1} + 1)
               / (tf.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.dl / avgdl.avgdl))
             END), 0)
             + COALESCE(SUM(CASE WHEN term = 'window' THEN
               ((n.n_docs - df.df + 0.5) / (df.df + 0.5))
               * tf.tf * ({BM25_K1} + 1)
               / (tf.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.dl / avgdl.avgdl))
             END), 0) AS score
      FROM tf JOIN df USING (term) JOIN dl USING (doc_id), n, avgdl
      GROUP BY tf.doc_id
    )
    SELECT doc_id, score FROM scored
    ORDER BY score DESC, doc_id
    LIMIT 20
    """,
    "BM25 relevance search over the corpus for a fixed term set — "
    "query-relevance filtering for training-data curation. Rational "
    "arithmetic only (the q59 libm-free idf; avgdl is an exact int-mean) "
    "AND a syntactically FIXED term-order sum: each per-term conditional "
    "aggregate folds exactly one (doc, term) row, then the <=3 addends "
    "add left-to-right, so the score is the same double in every engine "
    "and every run. A free-order SUM wobbles in the last ulp with "
    "aggregation order, and the r11 g=10 growth oracle caught exactly "
    "that: replica docs form score-tie clusters, the top-20 boundary "
    "landed inside one, and the ulp wobble broke the tie differently "
    "per engine. Plan: one token explode filtered to the query terms, "
    "tiny df/N/avgdl broadcasts, top-20 via TakeOrderedAndProject",
    ("llm", "text", "search"),
)
def q117(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    # (doc_id, dl) has two consumers (corpus stats + the scoring join);
    # checkpoint the narrow projection once instead of re-scanning +
    # re-splitting the text per consumer
    dl = (
        t.documents.select(
            "doc_id", F.size(F.split("text", " ")).alias("dl")
        )
        .localCheckpoint(eager=False)
    )
    # avgdl and N in ONE aggregation over dl (N = |documents| = |dl rows|)
    # — previously a separate full documents scan just for the count
    stats = dl.agg(
        F.avg("dl").alias("avgdl"), F.count("*").alias("n_docs")
    )
    # ≤ |docs|·|terms| rows, consumed by df_ and the scoring join — the
    # un-checkpointed form re-ran the explode over the corpus twice
    tf = (
        t.documents.select(
            "doc_id", F.explode(F.split("text", " ")).alias("term")
        )
        .filter(F.col("term").isin(*BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=False)
    )
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    idf = (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    tf_sat = (
        F.col("tf")
        * (BM25_K1 + 1)
        / (
            F.col("tf")
            + BM25_K1
            * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
        )
    )
    # fixed term-order sum (see oracle note): each per-term aggregate
    # folds exactly one row, then the addends add in BM25_TERMS order —
    # a free-order F.sum wobbles in the last ulp and broke a replica
    # tie-cluster at the top-20 boundary on the g=10 corpus
    per_term = [
        F.coalesce(
            F.sum(F.when(F.col("term") == t, idf * tf_sat)), F.lit(0.0)
        )
        for t in BM25_TERMS
    ]
    score = per_term[0]
    for p in per_term[1:]:
        score = score + p
    return (
        tf.join(F.broadcast(df_), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(score.alias("score"))
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(20)
    )


@register(
    "q120_prefix_filter_pairs",
    f"""
    WITH {_SH3},
    {_JACCARD}
    SELECT id_a, id_b, jaccard FROM jac WHERE jaccard >= 0.7
    """,
    "3-shingle-SET Jaccard ≥ 0.7 pairs over the FULL documents table via "
    "PREFIX FILTERING (ppjoin family): shingles ordered rarest-first "
    "(frequency groupBy + per-doc windows — no global window task); only "
    "each doc's first m−ceil(0.7m)+1 ordered shingles enter the candidate "
    "join, exact array_intersect verify on candidates. Prefix filtering is "
    "pigeonhole-LOSSLESS at the threshold, so the oracle is brute-force "
    "shingle Jaccard — the row proves the prune drops nothing. Round 2 ran "
    "this query on token sets, where this closed ~100-word vocabulary made "
    "every token corpus-hot and the candidate join degenerated toward "
    "all-pairs (70 s at sf0.1 → bounded to a 500-doc slice); 3-gram shingle "
    "vocabularies are combinatorial, hence rare-element-rich on ANY corpus "
    "— the prefix join keys are genuinely low-fanout and the full table "
    "runs unbounded. operators.dedup.prefix_filter_jaccard_pairs(n=3).",
    ("llm", "dedup"),
)
def q120(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return D.prefix_filter_jaccard_pairs(t.documents, threshold=0.7, n=3)
