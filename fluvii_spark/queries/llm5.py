"""Round-6 LLM-data additions: character-n-gram near-dup scoring (q218)
and embedding norm hygiene auditing (q225) — the cross-word-boundary
sibling of the word-shingle family and the vector-quality gate a training
pipeline runs before indexing embeddings. Same determinism rules as the
rest of the inventory: exact integer/DECIMAL moment cores with single IEEE
divisions, 6-dp-rounded ranking keys, unique tie-breaks.

Reference parity: none — the reference (rh-marketingops/fluvii) is a
Kafka client; this is the beyond-reference LLM-ops surface (SURVEY.md
§2.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fluvii_spark.io.readers import load_tables
from fluvii_spark.queries import register

# df-cut for char shingles: a FIXED part of the query definition (applied
# identically in the oracle), not an auto heuristic — char n-grams like
# 'e th' are corpus-hot at every scale, so similarity is DEFINED over the
# rare-shingle space. 20 docs caps any one shingle's candidate fan-out at
# C(20,2) pairs regardless of corpus size.
_CHAR_DF_CUT = 20
_CHAR_N = 4


@register(
    "q218_char_ngram_jaccard",
    f"""
    WITH sh AS (
      SELECT DISTINCT doc_id,
             substr(text, i, {_CHAR_N}) AS shingle
      FROM documents,
           LATERAL unnest(generate_series(1, len(text) - {_CHAR_N} + 1))
             AS t(i)
      WHERE len(text) >= {_CHAR_N}
    ),
    kept AS (
      SELECT shingle FROM sh GROUP BY 1 HAVING COUNT(*) <= {_CHAR_DF_CUT}
    ),
    shk AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN kept USING (shingle)),
    card AS (SELECT doc_id, COUNT(*) AS n_sh FROM shk GROUP BY 1),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
      FROM shk a JOIN shk b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    j AS (
      SELECT id_a, id_b,
             ROUND(CAST(n_common AS DOUBLE)
                   / (ca.n_sh + cb.n_sh - n_common), 6) AS jaccard
      FROM inter
      JOIN card ca ON ca.doc_id = id_a
      JOIN card cb ON cb.doc_id = id_b
    )
    SELECT id_a, id_b, jaccard FROM j
    ORDER BY jaccard DESC, id_a, id_b LIMIT 20
    """,
    "top-20 near-dup pairs by character-4-gram Jaccard over the "
    "rare-shingle space (df-cut 20, part of the definition and applied "
    "identically in the oracle) — catches cross-word-boundary edits "
    "(hyphenation, concatenation, in-word typos) the word-shingle family "
    "(q34) misses. Candidates only ever come from the bounded equi-join on "
    "rare shared shingles (max C(20,2) pairs per shingle at ANY corpus "
    "size); ranking on the 6-dp-rounded score with the id pair tie-break, "
    "TakeOrdered 20",
    ("llm", "dedup", "similarity"),
)
def q218(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fluvii_spark.operators.dedup import (
        char_shingles,
        pair_stats_from_shingles,
    )

    t = load_tables(spark, sf_dir)
    # checkpoint: char_shingles now dedups in-row (no exchange), so the
    # string-heavy explode must be materialized ONCE here — pair_stats
    # consumes it four ways (df-cut, kept join, cardinalities, both join
    # sides) and without the checkpoint each consumer re-runs the explode
    # (measured 6.4 s vs 2.6 s solo at sf0.1)
    from fluvii_spark.operators.stats import fan_out_scan

    sh = char_shingles(
        fan_out_scan(t.documents), "doc_id", "text", n=_CHAR_N
    ).localCheckpoint(eager=False)
    stats = pair_stats_from_shingles(sh, "doc_id", max_doc_freq=_CHAR_DF_CUT)
    j = stats.select(
        "id_a",
        "id_b",
        F.round(
            F.col("n_common").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
            6,
        ).alias("jaccard"),
    )
    return j.orderBy(F.col("jaccard").desc(), "id_a", "id_b").limit(20)


@register(
    "q225_embedding_norm_audit",
    """
    WITH v AS (
      SELECT label, CAST(embedding AS DOUBLE[]) AS e
      FROM embeddings
      WHERE embedding IS NOT NULL AND len(embedding) > 0
    ),
    scaled AS (
      SELECT label,
             CAST(ROUND(sqrt(list_sum(list_transform(e, x -> x * x)))
                        * 1000000.0) AS BIGINT) AS ni,
             CAST(ROUND((list_sum(e) / len(e)) * 1000000.0) AS BIGINT) AS bi
      FROM v
    ),
    m AS (
      SELECT label, COUNT(*) AS n,
             SUM(CAST(ni AS HUGEINT)) AS sn,
             SUM(CAST(bi AS HUGEINT)) AS s1,
             SUM(CAST(bi AS HUGEINT) * bi) AS s2
      FROM scaled GROUP BY 1
    ),
    st AS (
      SELECT label, n,
             CAST(sn AS DOUBLE) / n / 1000000.0 AS mean_norm,
             CAST(s1 AS DOUBLE) / n / 1000000.0 AS bias_mean,
             sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE)) / n / 1000000.0 AS sd
      FROM m
    )
    SELECT st.label, CAST(st.n AS BIGINT) AS n_vectors,
           ROUND(mean_norm, 6) AS mean_norm,
           ROUND(bias_mean, 6) AS bias_mean,
           ROUND(sd, 6) AS bias_sd,
           CAST(COUNT(CASE WHEN ABS(CAST(bi AS DOUBLE) / 1000000.0
                                    - bias_mean) > 2 * sd
                           THEN 1 END) AS BIGINT) AS n_outliers
    FROM scaled JOIN st USING (label)
    GROUP BY 1, 2, 3, 4, 5
    """,
    "embedding hygiene per label: mean L2 norm (asserts the corpus is "
    "normalized — it reads 1.0 here) plus the per-vector COMPONENT-BIAS "
    "distribution (mean coordinate): mean/sd and >2\u03c3 outlier counts — a "
    "biased mean coordinate is the classic symptom of a broken encoder "
    "batch or a missing centering step. Norms and biases are 6-dp-rounded "
    "then scaled to exact INTEGERS so the cross-row moment sums are "
    "order-independent (the float-accumulation trap); mean/sd are single "
    "IEEE divisions from exact integer moments; the z-boundary compares "
    "identically-derived doubles on both engines. One scan + a 10-row "
    "broadcast back over labels",
    ("llm", "embedding", "quality"),
)
def q225(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    v = F.col("embedding").cast("array<double>")
    acc = lambda col: F.aggregate(  # noqa: E731 — in-row fold, index order
        col, F.lit(0.0), lambda a, x: a + x
    )
    norm = F.sqrt(acc(F.transform(v, lambda x: x * x)))
    meanc = acc(v) / F.size(v)
    scaled = t.embeddings.filter(v.isNotNull() & (F.size(v) > 0)).select(
        "label",
        F.round(norm * F.lit(1000000.0)).cast("bigint").alias("ni"),
        F.round(meanc * F.lit(1000000.0)).cast("bigint").alias("bi"),
    )
    m = scaled.groupBy("label").agg(
        F.count("*").alias("n"),
        F.sum(F.col("ni").cast("decimal(38,0)")).alias("sn"),
        F.sum(F.col("bi").cast("decimal(38,0)")).alias("s1"),
        F.sum(F.col("bi").cast("decimal(38,0)") * F.col("bi")).alias("s2"),
    )
    st = m.select(
        F.col("label").alias("_lbl"),
        "n",
        (F.col("sn").cast("double") / F.col("n") / 1000000.0).alias(
            "mean_norm"
        ),
        (F.col("s1").cast("double") / F.col("n") / 1000000.0).alias(
            "bias_mean"
        ),
        (
            F.sqrt(
                (
                    F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")
                ).cast("double")
            )
            / F.col("n")
            / 1000000.0
        ).alias("sd"),
    )
    out = F.when(
        F.abs(F.col("bi").cast("double") / 1000000.0 - F.col("bias_mean"))
        > 2 * F.col("sd"),
        1,
    )
    return (
        scaled.join(F.broadcast(st), scaled.label == F.col("_lbl"))
        .groupBy("label", "n", "mean_norm", "bias_mean", "sd")
        .agg(F.count(out).cast("bigint").alias("n_outliers"))
        .select(
            "label",
            F.col("n").cast("bigint").alias("n_vectors"),
            F.round("mean_norm", 6).alias("mean_norm"),
            F.round("bias_mean", 6).alias("bias_mean"),
            F.round("sd", 6).alias("bias_sd"),
            "n_outliers",
        )
    )


@register(
    "q231_langid_confusion",
    """
    WITH scores AS (
      SELECT doc_id, lang,
             len(list_filter(string_split(text,' '),
                 t -> t IN ('der','die','das','und','ist'))) AS s_de,
             len(list_filter(string_split(text,' '),
                 t -> t IN ('the','a','of','and','is'))) AS s_en,
             len(list_filter(string_split(text,' '),
                 t -> t IN ('el','la','de','y','es'))) AS s_es,
             len(list_filter(string_split(text,' '),
                 t -> t IN ('le','la','et','de','est'))) AS s_fr,
             len(list_filter(string_split(text,' '),
                 t -> t IN ('de','le','shi','he','zai'))) AS s_zh
      FROM documents),
    pred AS (
      SELECT lang AS true_lang,
             CASE WHEN s_de >= GREATEST(s_en, s_es, s_fr, s_zh) THEN 'de'
                  WHEN s_en >= GREATEST(s_es, s_fr, s_zh) THEN 'en'
                  WHEN s_es >= GREATEST(s_fr, s_zh) THEN 'es'
                  WHEN s_fr >= s_zh THEN 'fr'
                  ELSE 'zh' END AS pred_lang
      FROM scores)
    SELECT true_lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(CAST(COUNT(*) AS DOUBLE)
                 / SUM(COUNT(*)) OVER (PARTITION BY true_lang), 6)
             AS row_share
    FROM pred GROUP BY 1, 2
    """,
    "language-ID confusion matrix: q40's marker-token predictor against "
    "the declared lang column, with per-true-language row shares — the "
    "classifier-quality readout that decides whether the cheap heuristic "
    "is good enough to gate a mixture. One scan + a window over ≤25 "
    "contracted confusion cells",
    ("llm", "text", "evaluation"),
)
def q231(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fluvii_spark.operators import text as T

    t = load_tables(spark, sf_dir)
    g = (
        t.documents.select(
            F.col("lang").alias("true_lang"),
            T.predict_lang("text").alias("pred_lang"),
        )
        .groupBy("true_lang", "pred_lang")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
    )
    w = Window.partitionBy("true_lang")  # ≤25 confusion cells — contracted
    return g.select(
        "true_lang",
        "pred_lang",
        "n_docs",
        F.round(
            F.col("n_docs").cast("double") / F.sum("n_docs").over(w), 6
        ).alias("row_share"),
    )


@register(
    "q232_ann_label_mrr",
    """
    WITH base AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings
    ),
    q AS (SELECT vec_id AS qid, label AS qlabel, v AS qv
          FROM base WHERE vec_id < 10),
    ranked AS (
      SELECT q.qid, q.qlabel, b.label,
             row_number() OVER (PARTITION BY q.qid
               ORDER BY round(list_cosine_similarity(b.v, q.qv), 6) DESC,
                        b.vec_id) AS rn
      FROM base b, q WHERE b.vec_id <> q.qid
    ),
    hit AS (
      SELECT qid, MIN(rn) AS first_hit
      FROM ranked WHERE label = qlabel AND rn <= 10 GROUP BY qid
    ),
    rr AS (
      SELECT q.qid,
             CAST(ROUND(COALESCE(1.0 / h.first_hit, 0.0), 6)
                  AS DECIMAL(18,6)) AS rr
      FROM q LEFT JOIN hit h ON h.qid = q.qid
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
           ROUND(CAST(SUM(rr) AS DOUBLE) / COUNT(*), 6) AS mrr,
           CAST(COUNT(CASE WHEN rr > 0 THEN 1 END) AS BIGINT) AS n_hit
    FROM rr
    """,
    "retrieval MRR@10 with label relevance: for the first 10 query "
    "vectors, the reciprocal rank of the first same-label neighbor in the "
    "exact cosine top-10 (0 if absent) — the ranking-quality metric that "
    "complements q189's recall (how EARLY the right answer appears, not "
    "just whether). Brute-force scan against a 10-row broadcast probe set "
    "(q74's shape), ranks on 6-dp-rounded cosine with the vec_id "
    "tie-break, per-probe reciprocal ranks rounded into DECIMAL before "
    "the cross-probe mean",
    ("llm", "similarity", "ann", "evaluation"),
)
def q232(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fluvii_spark.operators import similarity as S

    from fluvii_spark.operators.stats import fan_out_scan

    t = load_tables(spark, sf_dir)
    # fan_out: 10-probe cosine scoring parallel on an under-partitioned
    # scan (0.84 s -> 0.59 s solo at sf0.1; no-op at cluster scale)
    # both norms hoisted out of the probe x corpus cosine (q146 pattern;
    # bit-identical arithmetic, 1/3 the fold work per pair)
    corpus = fan_out_scan(t.embeddings).withColumn(
        "_ne", F.expr(S.norm_sql("embedding"))
    )
    q = corpus.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("qlabel"),
        F.col("embedding").alias("qvec"),
        F.col("_ne").alias("_nq"),
    )
    scored = (
        corpus.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "qlabel",
            "label",
            "vec_id",
            F.round(
                F.expr(
                    S.cosine_hoisted_sql("embedding", "qvec", "_ne", "_nq")
                ),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), "vec_id")
    hit = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") <= 10) & (F.col("label") == F.col("qlabel")))
        .groupBy("qid")
        .agg(F.min("rn").alias("first_hit"))
        .withColumnRenamed("qid", "_hq")
    )
    rr = q.join(F.broadcast(hit), q.qid == F.col("_hq"), "left").select(
        F.round(
            F.coalesce(F.lit(1.0) / F.col("first_hit"), F.lit(0.0)), 6
        )
        .cast("decimal(18,6)")
        .alias("rr")
    )
    return rr.agg(
        F.count("*").cast("bigint").alias("n_queries"),
        F.round(F.sum("rr").cast("double") / F.count("*"), 6).alias("mrr"),
        F.count(F.when(F.col("rr") > 0, 1)).cast("bigint").alias("n_hit"),
    )


def _q239_oracle_sql() -> str:
    from fluvii_spark.queries.llm import _JACCARD, _SH3, _SIMHASH

    return f"""
    WITH
    {_SIMHASH},
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
             a.simhash AS sa, b.simhash AS sb
      FROM sim a JOIN sim b ON a.doc_id < b.doc_id
       AND ((a.simhash >> 16) = (b.simhash >> 16)
            OR (a.simhash & 65535) = (b.simhash & 65535))
    ),
    flagged AS (
      SELECT id_a, id_b FROM cand WHERE bit_count(xor(sa, sb)) <= 6
    ),
    {_SH3},
    {_JACCARD},
    scored AS (
      SELECT COALESCE(ROUND(j.jaccard, 6), 0.0) AS j
      FROM flagged f LEFT JOIN jac j
        ON j.id_a = f.id_a AND j.id_b = f.id_b
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_flagged,
           CAST(COUNT(CASE WHEN j < 0.3 THEN 1 END) AS BIGINT)
             AS n_false_pos,
           ROUND(CAST(COUNT(CASE WHEN j < 0.3 THEN 1 END) AS DOUBLE)
                 / COUNT(*), 6) AS fp_rate
    FROM scored
    """


@register(
    "q239_simhash_fp_audit",
    _q239_oracle_sql(),
    "SimHash false-positive audit: of the pairs the 2-block pigeonhole "
    "scheme flags at Hamming <= 6 (q37's production rule), how many have "
    "word-3-gram Jaccard < 0.3 — the precision readout that calibrates "
    "the Hamming threshold before trusting the cheap filter at corpus "
    "scale. Reuses the persisted simhash and ngram-stats memos (one build "
    "each per session/dataset); flagged pairs LEFT JOIN the Jaccard "
    "relation so no-shared-shingle pairs score 0; boundary on the "
    "6-dp-rounded score",
    ("llm", "dedup", "evaluation"),
)
def q239(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fluvii_spark.operators import dedup as D
    from fluvii_spark.queries.llm import doc_ngram_stats, doc_simhash

    t = load_tables(spark, sf_dir)
    flagged = D.simhash_pairs(
        t.documents, max_hamming=6, signatures=doc_simhash(spark, sf_dir)
    ).select("id_a", "id_b")
    jac = doc_ngram_stats(spark, sf_dir).select(
        F.col("id_a").alias("_ja"),
        F.col("id_b").alias("_jb"),
        F.round(
            F.col("n_common").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
            6,
        ).alias("jaccard"),
    )
    scored = flagged.join(
        jac,
        (F.col("id_a") == F.col("_ja")) & (F.col("id_b") == F.col("_jb")),
        "left",
    ).select(F.coalesce(F.col("jaccard"), F.lit(0.0)).alias("j"))
    return scored.agg(
        F.count("*").cast("bigint").alias("n_flagged"),
        F.count(F.when(F.col("j") < 0.3, 1))
        .cast("bigint")
        .alias("n_false_pos"),
        F.round(
            F.count(F.when(F.col("j") < 0.3, 1)).cast("double")
            / F.count("*"),
            6,
        ).alias("fp_rate"),
    )


@register(
    "q240_bigram_frequency_spectrum",
    """
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
             generate_subscripts(string_split(text, ' '), 1) AS pos
      FROM documents
    ),
    bg AS (
      SELECT a.tok || ' ' || b.tok AS g
      FROM toks a JOIN toks b
        ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
    ),
    cnt AS (SELECT g, COUNT(*) AS c FROM bg GROUP BY 1)
    SELECT CAST(CASE WHEN c = 1 THEN 1 WHEN c <= 2 THEN 2
                     WHEN c <= 4 THEN 4 WHEN c <= 8 THEN 8
                     WHEN c <= 16 THEN 16 WHEN c <= 32 THEN 32
                     WHEN c <= 64 THEN 64 ELSE 128 END AS BIGINT)
             AS freq_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(SUM(c) AS BIGINT) AS n_bigrams
    FROM cnt GROUP BY 1
    """,
    "bigram frequency spectrum (count-of-counts) with geometric power-of-2 "
    "buckets: how many bigram types occur once, <=2, <=4, ... times and "
    "the token mass per bucket — the Zipf-tail diagnostic behind "
    "vocabulary truncation and Good-Turing smoothing, generalizing q163's "
    "hapax ratio to the whole spectrum (bigrams, because this corpus's "
    "unigram vocabulary is deliberately tiny). Exact integer thresholds, "
    "two hash aggregates over the adjacent-pair explode",
    ("llm", "text", "vocabulary"),
)
def q240(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fluvii_spark.operators.dedup import word_shingles

    t = load_tables(spark, sf_dir)
    # non-distinct word 2-grams — the operator materializes the token
    # array once per doc (inlining split() into the transform re-splits
    # per position, the measured 3x trap its docstring records)
    bg = word_shingles(
        t.documents, "doc_id", "text", n=2, distinct=False
    ).select(F.col("shingle").alias("g"))
    cnt = bg.groupBy("g").agg(F.count("*").alias("c"))
    bucket = (
        F.when(F.col("c") == 1, 1)
        .when(F.col("c") <= 2, 2)
        .when(F.col("c") <= 4, 4)
        .when(F.col("c") <= 8, 8)
        .when(F.col("c") <= 16, 16)
        .when(F.col("c") <= 32, 32)
        .when(F.col("c") <= 64, 64)
        .otherwise(128)
    )
    return cnt.groupBy(
        bucket.cast("bigint").alias("freq_bucket")
    ).agg(
        F.count("*").cast("bigint").alias("n_types"),
        F.sum("c").cast("bigint").alias("n_bigrams"),
    )


from fluvii_spark.queries.llm import lsh_buckets_cte_adaptive  # noqa: E402


@register(
    "q246_mutual_nn_pairs",
    f"""
    WITH
    {lsh_buckets_cte_adaptive()},
    base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
             FROM embeddings),
    best AS (
      SELECT vec_id, nb, cos_r FROM (
        SELECT a.vec_id, b.vec_id AS nb,
               round(list_cosine_similarity(bb.v, aa.v), 6) AS cos_r,
               row_number() OVER (PARTITION BY a.vec_id
                 ORDER BY round(list_cosine_similarity(bb.v, aa.v), 6)
                          DESC, b.vec_id) AS rn
        FROM buckets a JOIN buckets b
          ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
        JOIN base aa ON aa.vec_id = a.vec_id
        JOIN base bb ON bb.vec_id = b.vec_id
      ) WHERE rn = 1
    )
    SELECT CAST(x.vec_id AS BIGINT) AS id_a,
           CAST(x.nb AS BIGINT) AS id_b,
           x.cos_r AS cosine
    FROM best x JOIN best y
      ON y.vec_id = x.nb AND y.nb = x.vec_id AND x.vec_id < x.nb
    ORDER BY cosine DESC, id_a
    """,
    "reciprocal best match (mutual nearest neighbors) within an "
    "ADAPTIVELY-sized LSH index (planes = ceil(log2(n/32)), min 4): pairs "
    "where each vector is the other's top-1 cosine neighbor among its "
    "bucket-mates — the high-precision alignment primitive bitext mining "
    "and cross-corpus dedup use (a one-sided top-1 keeps hub vectors that "
    "attract many queries; mutuality filters them). The plane count grows "
    "with the corpus so expected bucket occupancy stays ~32 and candidate "
    "volume is O(n*32), never n^2/2^planes; candidates only ever come "
    "from the bucket equi-join (never all-pairs), rank on 6-dp-rounded "
    "cosine with the vec_id tie-break, mutuality is one self-join of the "
    "per-vector top-1 relation on the reversed pair",
    ("llm", "similarity", "ann", "dedup"),
)
def q246(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fluvii_spark.operators import similarity as S

    import os

    from fluvii_spark.operators.stats import parquet_row_count

    t = load_tables(spark, sf_dir)
    corpus = t.embeddings
    # the EXACT corpus size sizes the index (see similarity.adaptive_planes
    # for why a fixed plane count would make this join quadratic at 100 TB),
    # read from parquet footers — no full-scan count() job at plan-build
    # time, and exact so the oracle's COUNT(*)-derived plane count can
    # never land one power-of-2 bucket away (an estimate near a boundary
    # would shift every bucket id)
    planes = S.adaptive_planes(
        parquet_row_count(
            os.path.join(sf_dir, "embeddings.parquet"), fallback_df=corpus
        )
    )
    # the bucket fold is a zero-shuffle projection, so carry the vector
    # through it (keep=) instead of joining (id, bucket) back to the
    # corpus on vec_id — that attach join re-shuffled the corpus by id
    # on BOTH sides of the bucket self-join for a column already on the
    # row (guide §8 re-attach trap; 2 corpus joins removed).
    # (r11 measured-and-rejected: localCheckpointing (id, bucket, vec) once
    # for both join sides — 3.8 s vs 3.1 s solo at sf0.1; the double
    # bucket-fold subtree is cheaper than the materialization barrier.)
    bv = S.lsh_buckets(
        corpus, dims=64, planes=planes, keep=("embedding",)
    ).withColumn("nrm", F.expr(S.norm_sql("embedding")))
    a = bv.select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qvec"),
        F.col("nrm").alias("qnrm"),
        "bucket",
    )
    # norms hoisted to once-per-vector (cosine_hoisted_sql): each
    # candidate pair runs ONE O(dims) dot fold instead of three;
    # arithmetic bit-identical to cosine_sql
    scored = (
        bv.join(a, "bucket")
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            F.round(
                F.expr(
                    S.cosine_hoisted_sql("embedding", "qvec", "nrm", "qnrm")
                ),
                6,
            ).alias("cos_r"),
        )
    )
    # top-1 per qid as max(struct(cos_r, -vec_id)) instead of a
    # row_number window: identical selection ((cos_r DESC, vec_id ASC)
    # maximum — negating the id turns the ASC tie-break into a struct
    # max), but a hash aggregation does map-side PARTIAL aggregation, so
    # the shuffle carries one candidate per (qid, map task) instead of
    # funneling every bucket-join candidate row through a sort window
    # (§2.3 aggregate-before-you-shuffle).
    best = (
        scored.groupBy("qid")
        .agg(
            F.max(
                F.struct(
                    F.col("cos_r"), (-F.col("vec_id")).alias("_nv")
                )
            ).alias("_m")
        )
        .select(
            "qid",
            (-F.col("_m._nv")).alias("nb"),
            F.col("_m.cos_r").alias("cos_r"),
        )
    )
    # Mutuality via ONE symmetric-key aggregation instead of the self-join
    # on the reversed pair: `best` has exactly one row per qid, so the
    # unordered key {qid, nb} collects 2 rows iff each side is the other's
    # top-1 — the same relation the reversed-pair join produced, but the
    # expensive bucket-join → cosine → window pipeline behind `best` is
    # consumed ONCE (the join evaluated it on both sides; no ReusedExchange
    # across the differing projections). cos_r is bit-identical in both
    # directions (IEEE dot/norm arithmetic is symmetric term-by-term), and
    # the oracle reads the qid<nb row's value — max(fwd_cos) picks exactly
    # that row.
    sym = best.select(
        F.least("qid", "nb").alias("id_a"),
        F.greatest("qid", "nb").alias("id_b"),
        F.when(F.col("qid") < F.col("nb"), F.col("cos_r")).alias("fwd_cos"),
    )
    return (
        sym.groupBy("id_a", "id_b")
        .agg(
            F.count("*").alias("_c"),
            F.max("fwd_cos").alias("cosine"),
        )
        .filter(F.col("_c") == 2)
        .select(
            F.col("id_a").cast("bigint").alias("id_a"),
            F.col("id_b").cast("bigint").alias("id_b"),
            "cosine",
        )
        .orderBy(F.col("cosine").desc(), "id_a")
    )


@register(
    "q251_boilerplate_shingles",
    """
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
             generate_subscripts(string_split(text, ' '), 1) AS pos
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT a.doc_id,
             a.tok || ' ' || b.tok || ' ' || c.tok AS shingle
      FROM toks a
      JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
      JOIN toks c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
    ),
    src AS (SELECT doc_id, source FROM documents),
    nd AS (SELECT source, COUNT(DISTINCT doc_id) AS n_docs
           FROM src GROUP BY source),
    d AS (
      SELECT s.source, sh.shingle, COUNT(*) AS df
      FROM sh JOIN src s ON s.doc_id = sh.doc_id
      GROUP BY s.source, sh.shingle
    ),
    hot AS (
      SELECT d.source, d.shingle, d.df, nd.n_docs,
             row_number() OVER (PARTITION BY d.source
                                ORDER BY d.df DESC, d.shingle) AS rn
      FROM d JOIN nd ON nd.source = d.source
      WHERE d.df >= 0.05 * nd.n_docs
    )
    SELECT source, shingle, CAST(df AS BIGINT) AS df,
           ROUND(CAST(df AS DOUBLE) / n_docs, 6) AS df_share
    FROM hot WHERE rn <= 10
    """,
    "boilerplate detection — the INVERSE of the dedup df-cut: word "
    "3-gram shingles whose within-source document frequency is >= 5% of "
    "the source's docs are templated boilerplate (headers, footers, "
    "navigation), the text a training pipeline strips BEFORE dedup so "
    "boilerplate doesn't glue unrelated documents into near-dup "
    "clusters; top-10 per source by (df DESC, shingle) — a deterministic "
    "per-source window over the already-aggregated (source, shingle) "
    "frame, never over raw postings. Same shingle space as q34/q120, so "
    "the df table is shareable at scale",
    ("llm", "text", "dedup"),
)
def q251(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fluvii_spark.operators.dedup import word_shingles

    t = load_tables(spark, sf_dir)
    docs = t.documents
    # source rides the shingle rows in a struct id (every doc has exactly
    # one source), so the doc_id attach-join disappears; in-row distinct
    # gives the same (doc, shingle) rows as the dropDuplicates exchange
    # with zero shuffle. Before: 3 documents scans + a dedup exchange + a
    # corpus join; after: 2 scans (shingles + the n_docs pass, which must
    # see shingle-less short docs too) and one grouped count.
    sh = word_shingles(
        docs.select(F.struct("doc_id", "source").alias("_ds"), "text"),
        "_ds",
        "text",
        n=3,
        distinct=True,
        distinct_in_row=True,
    )
    d = (
        sh.select(F.col("_ds.source").alias("source"), "shingle")
        .groupBy("source", "shingle")
        .agg(F.count("*").alias("df"))
    )
    nd = docs.groupBy("source").agg(
        F.countDistinct("doc_id").alias("n_docs")
    )
    w = Window.partitionBy("source").orderBy(F.col("df").desc(), "shingle")
    return (
        d.join(F.broadcast(nd), "source")
        .filter(F.col("df") >= 0.05 * F.col("n_docs"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select(
            "source",
            "shingle",
            F.col("df").cast("bigint").alias("df"),
            F.round(F.col("df").cast("double") / F.col("n_docs"), 6).alias(
                "df_share"
            ),
        )
    )
