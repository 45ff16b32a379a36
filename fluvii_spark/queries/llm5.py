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
    sh = char_shingles(t.documents, "doc_id", "text", n=_CHAR_N)
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
    WITH norms AS (
      SELECT label,
             CAST(ROUND(sqrt(list_sum(list_transform(
                    CAST(embedding AS DOUBLE[]), x -> x * x))) * 1000000.0)
                  AS BIGINT) AS ni
      FROM embeddings
      WHERE embedding IS NOT NULL AND len(embedding) > 0
    ),
    m AS (
      SELECT label, COUNT(*) AS n,
             SUM(CAST(ni AS HUGEINT)) AS s1,
             SUM(CAST(ni AS HUGEINT) * ni) AS s2
      FROM norms GROUP BY 1
    ),
    st AS (
      SELECT label, n,
             CAST(s1 AS DOUBLE) / n / 1000000.0 AS mean_norm,
             sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE)) / n / 1000000.0 AS sd
      FROM m
    )
    SELECT st.label, CAST(st.n AS BIGINT) AS n_vectors,
           ROUND(mean_norm, 6) AS mean_norm,
           ROUND(sd, 6) AS sd_norm,
           CAST(COUNT(CASE WHEN ABS(CAST(ni AS DOUBLE) / 1000000.0
                                    - mean_norm) > 2 * sd
                           THEN 1 END) AS BIGINT) AS n_outliers
    FROM norms JOIN st USING (label)
    GROUP BY 1, 2, 3, 4
    """,
    "embedding norm hygiene per label: mean/sd of L2 norms and the count "
    "of >2σ outliers — the vector-quality gate run before indexing (a "
    "norm outlier is a broken encode or an unnormalized batch). Norms are "
    "6-dp-rounded then scaled to exact INTEGERS, so the cross-row moment "
    "sums are order-independent (the float-accumulation trap); mean/sd "
    "are single IEEE divisions from exact integer moments; the z-boundary "
    "compares identically-derived doubles on both engines. One scan + a "
    "5-row broadcast back over labels",
    ("llm", "embedding", "quality"),
)
def q225(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    v = F.col("embedding").cast("array<double>")
    norm = F.sqrt(
        F.aggregate(
            F.transform(v, lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    ni = F.round(norm * F.lit(1000000.0)).cast("bigint")
    norms = t.embeddings.filter(v.isNotNull() & (F.size(v) > 0)).select(
        "label", ni.alias("ni")
    )
    m = norms.groupBy("label").agg(
        F.count("*").alias("n"),
        F.sum(F.col("ni").cast("decimal(38,0)")).alias("s1"),
        F.sum(
            F.col("ni").cast("decimal(38,0)") * F.col("ni")
        ).alias("s2"),
    )
    st = m.select(
        F.col("label").alias("_lbl"),
        "n",
        (F.col("s1").cast("double") / F.col("n") / 1000000.0).alias(
            "mean_norm"
        ),
        (
            F.sqrt((F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")).cast("double"))
            / F.col("n")
            / 1000000.0
        ).alias("sd"),
    )
    out = F.when(
        F.abs(F.col("ni").cast("double") / 1000000.0 - F.col("mean_norm"))
        > 2 * F.col("sd"),
        1,
    )
    return (
        norms.join(F.broadcast(st), norms.label == F.col("_lbl"))
        .groupBy("label", "n", "mean_norm", "sd")
        .agg(F.count(out).cast("bigint").alias("n_outliers"))
        .select(
            "label",
            F.col("n").cast("bigint").alias("n_vectors"),
            F.round("mean_norm", 6).alias("mean_norm"),
            F.round("sd", 6).alias("sd_norm"),
            "n_outliers",
        )
    )
