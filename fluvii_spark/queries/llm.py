"""LLM-data-pipeline query inventory (Q30+): similarity search, text
analysis, the dedup family, and multimodal metadata — each with a duckdb
oracle built from the SAME deterministic md5-derived hashing so results
hash-match across engines.

These have no counterpart in the reference (SURVEY.md §2.2 "LLM-data ops");
implementations live in fluvii_spark.operators.{dedup,similarity,text,
multimodal}.
"""

from __future__ import annotations

import threading
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fluvii_spark.io.readers import load_tables
from fluvii_spark.operators import dedup as D
from fluvii_spark.operators import similarity as S
from fluvii_spark.operators import text as T
from fluvii_spark.queries import register

# ---------------------------------------------------------------------------
# shared duckdb SQL fragments (mirror the Spark operators exactly)
# ---------------------------------------------------------------------------

# word 3-shingles, distinct per doc
_SH3 = """
  toks AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
           generate_subscripts(string_split(text, ' '), 1) AS pos
    FROM documents
  ),
  sh AS (
    SELECT DISTINCT a.doc_id, a.tok || ' ' || b.tok || ' ' || c.tok AS shingle
    FROM toks a
    JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
    JOIN toks c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
  )
"""

_JACCARD = """
  card AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
  inter AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2
  ),
  jac AS (
    SELECT id_a, id_b,
           CAST(n_common AS DOUBLE) / (ca.n_sh + cb.n_sh - n_common) AS jaccard
    FROM inter
    JOIN card ca ON ca.doc_id = id_a
    JOIN card cb ON cb.doc_id = id_b
  )
"""

_PERM_VALUES = ",\n      ".join(
    f"({i}, {a}, {b})" for i, (a, b) in enumerate(D.MINHASH_PERMS)
)

_MINHASH = f"""
  perms(perm, a, b) AS (
    VALUES
      {_PERM_VALUES}
  ),
  hashed AS (
    SELECT doc_id, perm,
           (a * (('0x' || substr(md5(shingle), 1, 8))::BIGINT) + b)
             % {D.MINHASH_P} AS hv
    FROM sh, perms
  ),
  sig AS (
    SELECT doc_id, perm, MIN(hv) AS minhash FROM hashed GROUP BY doc_id, perm
  )
"""

_SIMHASH = """
  tc AS (
    SELECT doc_id, tok, COUNT(*) AS cnt
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
    GROUP BY doc_id, tok
  ),
  th AS (
    SELECT doc_id, cnt, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h FROM tc
  ),
  votes AS (
    SELECT doc_id, j,
           SUM(cnt * CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS vote
    FROM th, generate_series(0, 31) AS g(j)
    GROUP BY doc_id, j
  ),
  sim AS (
    SELECT doc_id,
           CAST(SUM(CASE WHEN vote > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END)
                AS BIGINT) AS simhash
    FROM votes GROUP BY doc_id
  )
"""

def lsh_buckets_cte(planes: int = 8) -> str:
    """The hyperplane-LSH bucket CTE chain, parameterized on plane count —
    the bucket table a production 8-plane index serves from by default;
    evaluation queries can pick a coarser grid (fewer planes) when the
    eval corpus is too small to populate 2^8 buckets (q189)."""
    return _LSH_BUCKETS_TPL.replace("__MAXPLANE__", str(planes - 1))


def lsh_buckets_cte_adaptive(
    target_bucket: int = 32, min_planes: int = 4, max_planes: int = 30
) -> str:
    """The ADAPTIVE hyperplane-LSH bucket CTE: plane count computed from
    the corpus size as ⌈log₂(n / target_bucket)⌉ clamped to
    [min_planes, max_planes] — the exact formula
    ``operators.similarity.adaptive_planes`` uses, so the Spark index and
    the DuckDB oracle pick the SAME grid at any scale. DuckDB's
    generate_series needs constant bounds, so we enumerate max_planes rows
    and filter by the computed count."""
    return f"""
  lsh_params AS (
    SELECT GREATEST({min_planes}, LEAST({max_planes},
           CAST(CEIL(LOG2(GREATEST(COUNT(*), 1) / {target_bucket}.0)) AS INT)))
           AS planes
    FROM embeddings
  ),
  hp AS (
    SELECT p.plane, d.dim,
           ((('0x' || substr(md5('plane_' || p.plane || '_' || d.dim), 1, 8))::BIGINT
             % 2001) - 1000) / 1000.0 AS w
    FROM generate_series(0, {max_planes - 1}) AS p(plane),
         generate_series(0, 63) AS d(dim)
    WHERE p.plane < (SELECT planes FROM lsh_params)
  ),
  comp AS (
    SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim,
           CAST(unnest(embedding) AS DOUBLE) AS x
    FROM embeddings
    WHERE {_WELL_FORMED_64}
  ),
  dots AS (
    SELECT vec_id, plane, SUM(x * w) AS dot
    FROM comp JOIN hp USING (dim) GROUP BY vec_id, plane
  ),
  buckets AS (
    SELECT vec_id,
           CAST(SUM(CASE WHEN dot > 0 THEN (CAST(1 AS BIGINT) << plane) ELSE 0 END)
                AS BIGINT) AS bucket
    FROM dots GROUP BY vec_id
  )
"""


# DuckDB mirror of operators.similarity.well_formed_vec(vec, 64) (ADVICE r9
# #1): the Spark LSH index EXCLUDES NULL/ragged/NULL-component vectors
# before bucketing, so the oracle bucket CTEs must exclude them before the
# unnest too — an unguarded unnest PARTIAL-SUMS a short vector's components
# into a bucket the Spark side never builds. len(NULL array) is NULL in
# DuckDB, so a NULL embedding fails the width test exactly like Spark's
# size(NULL)=NULL under non-legacy sizeOfNull. Applied inside `comp`
# (the per-component explode) and NOT to the adaptive `lsh_params`
# COUNT(*) — Spark sizes planes from parquet-footer TOTAL row counts
# (operators/stats.py:parquet_row_count), so both engines size the grid
# from the unfiltered count while indexing only well-formed vectors.
_WELL_FORMED_64 = (
    "len(embedding) = 64"
    " AND len(list_filter(embedding, x -> x IS NULL)) = 0"
)


_LSH_BUCKETS_TPL = f"""
  hp AS (
    SELECT p.plane, d.dim,
           ((('0x' || substr(md5('plane_' || p.plane || '_' || d.dim), 1, 8))::BIGINT
             % 2001) - 1000) / 1000.0 AS w
    FROM generate_series(0, __MAXPLANE__) AS p(plane), generate_series(0, 63) AS d(dim)
  ),
  comp AS (
    SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim,
           CAST(unnest(embedding) AS DOUBLE) AS x
    FROM embeddings
    WHERE {_WELL_FORMED_64}
  ),
  dots AS (
    SELECT vec_id, plane, SUM(x * w) AS dot
    FROM comp JOIN hp USING (dim) GROUP BY vec_id, plane
  ),
  buckets AS (
    SELECT vec_id,
           CAST(SUM(CASE WHEN dot > 0 THEN (CAST(1 AS BIGINT) << plane) ELSE 0 END)
                AS BIGINT) AS bucket
    FROM dots GROUP BY vec_id
  )
"""

# the production 8-plane bucket table (q39/q107/q116's index)
_LSH_BUCKETS = lsh_buckets_cte(8)

_STOPWORD_LIST = ", ".join(f"'{s}'" for s in T.STOPWORDS)


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------


@register(
    "q30_cosine_topk",
    """
    WITH q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0)
    SELECT vec_id,
           list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                  CAST(qvec AS DOUBLE[])) AS cosine
    FROM embeddings, q
    WHERE vec_id <> 0
    ORDER BY cosine DESC, vec_id
    LIMIT 5
    """,
    "exact top-5 cosine neighbors of vec_id=0 (brute force baseline: "
    "broadcast query vector, single scan, TakeOrderedAndProject)",
    ("llm", "similarity"),
)
def q30(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return S.brute_force_topk(t.embeddings, query_id=0, k=5)


@register(
    "q39_ann_lsh_topk",
    f"""
    WITH
    {_LSH_BUCKETS},
    q AS (
      SELECT b.bucket AS qbucket, e.embedding AS qvec
      FROM buckets b JOIN embeddings e USING (vec_id) WHERE vec_id = 0
    )
    SELECT e.vec_id,
           list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                  CAST(q.qvec AS DOUBLE[])) AS cosine
    FROM embeddings e JOIN buckets b USING (vec_id), q
    WHERE b.bucket = q.qbucket AND e.vec_id <> 0
    ORDER BY cosine DESC, e.vec_id
    LIMIT 5
    """,
    "approximate top-5: random-hyperplane LSH bucket (md5-derived planes) "
    "prunes candidates to ~1/2^8 of the corpus, exact cosine within bucket",
    ("llm", "similarity", "ann"),
)
def q39(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return S.lsh_topk(t.embeddings, query_id=0, dims=64, k=5)


@register(
    "q57_ann_ivf_topk",
    """
    WITH
    base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    seeds AS (
      SELECT list_id, v FROM (
        SELECT vec_id, v,
               row_number() OVER (
                 ORDER BY ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT,
                          vec_id) - 1 AS list_id
        FROM base) WHERE list_id < 8),
    a1 AS (
      SELECT vec_id, list_id FROM (
        SELECT b.vec_id, s.list_id,
               row_number() OVER (PARTITION BY b.vec_id
                 ORDER BY list_cosine_similarity(b.v, s.v) DESC, s.list_id) AS rn
        FROM base b, seeds s) WHERE rn = 1),
    m1 AS (
      SELECT list_id, dim, AVG(x) AS mx FROM (
        SELECT a1.list_id, generate_subscripts(b.v, 1) AS dim, unnest(b.v) AS x
        FROM a1 JOIN base b USING (vec_id)) GROUP BY list_id, dim),
    c1 AS (
      SELECT s.list_id, coalesce(u.c, s.v) AS v
      FROM seeds s LEFT JOIN (
        SELECT list_id, list(mx ORDER BY dim) AS c FROM m1 GROUP BY list_id) u
      USING (list_id)),
    a2 AS (
      SELECT vec_id, list_id FROM (
        SELECT b.vec_id, c.list_id,
               row_number() OVER (PARTITION BY b.vec_id
                 ORDER BY list_cosine_similarity(b.v, c.v) DESC, c.list_id) AS rn
        FROM base b, c1 c) WHERE rn = 1),
    m2 AS (
      SELECT list_id, dim, AVG(x) AS mx FROM (
        SELECT a2.list_id, generate_subscripts(b.v, 1) AS dim, unnest(b.v) AS x
        FROM a2 JOIN base b USING (vec_id)) GROUP BY list_id, dim),
    c2 AS (
      SELECT c1.list_id, coalesce(u.c, c1.v) AS v
      FROM c1 LEFT JOIN (
        SELECT list_id, list(mx ORDER BY dim) AS c FROM m2 GROUP BY list_id) u
      USING (list_id)),
    q AS (SELECT v AS qv FROM base WHERE vec_id = 0),
    probe AS (
      SELECT list_id FROM (
        SELECT c2.list_id,
               row_number() OVER (
                 ORDER BY list_cosine_similarity(c2.v, q.qv) DESC, c2.list_id) AS rn
        FROM c2, q) WHERE rn <= 4)
    SELECT b.vec_id, list_cosine_similarity(b.v, q.qv) AS cosine
    FROM base b JOIN a2 USING (vec_id) JOIN probe USING (list_id), q
    WHERE b.vec_id <> 0
    ORDER BY cosine DESC, b.vec_id
    LIMIT 5
    """,
    "IVF ANN: deterministic mini-k-means inverted lists (seeds = 8 smallest "
    "md5(vec_id); 2 Lloyd rounds: cosine argmax assignment with first-index "
    "ties, per-dim mean update, empty lists keep their previous centroid), "
    "probe the 4 closest of 8 lists, exact cosine within probed lists. The "
    "fixed-seed fixed-round schedule makes the whole index SQL-expressible "
    "— the oracle replays both Lloyd rounds as CTEs.",
    ("llm", "similarity", "ann"),
)
def q57(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return S.ivf_topk(t.embeddings, query_id=0, k=5, n_lists=8, n_probe=4)


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------


@register(
    "q31_text_stats",
    """
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
           AVG(len(string_split(text, ' '))) AS avg_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY lang
    """,
    "per-language token/char statistics",
    ("llm", "text"),
)
def q31(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    n_tok = T.token_count("text")
    return t.documents.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(n_tok).alias("total_tokens"),
        F.avg(n_tok).alias("avg_tokens"),
        F.sum("n_chars").alias("total_chars"),
    )


@register(
    "q32_top_bigrams",
    """
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
             generate_subscripts(string_split(text, ' '), 1) AS pos
      FROM documents
    )
    SELECT a.tok || ' ' || b.tok AS bigram, COUNT(*) AS n
    FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
    GROUP BY 1 ORDER BY n DESC, bigram LIMIT 10
    """,
    "corpus-wide top-10 bigrams with deterministic tie-break",
    ("llm", "text"),
)
def q32(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t.documents.select(F.explode(T.bigrams("text")).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "bigram")
        .limit(10)
    )


@register(
    "q40_lang_id",
    f"""
    WITH scores AS (
      SELECT doc_id,
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
      FROM documents)
    SELECT doc_id,
           CASE WHEN s_de >= GREATEST(s_en, s_es, s_fr, s_zh) THEN 'de'
                WHEN s_en >= GREATEST(s_es, s_fr, s_zh) THEN 'en'
                WHEN s_es >= GREATEST(s_fr, s_zh) THEN 'es'
                WHEN s_fr >= s_zh THEN 'fr'
                ELSE 'zh' END AS pred_lang
    FROM scores
    """,
    "marker-token language-ID heuristic, argmax with alphabetic tie-break "
    "(mechanism is the deliverable: bounded map-side scoring, no shuffle)",
    ("llm", "text"),
)
def q40(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fluvii_spark.operators.stats import fan_out_scan

    t = load_tables(spark, sf_dir)
    # predict_lang is a heavy per-row stopword-profile expression; keep it
    # parallel when the scan plans below core count (0.71 s -> 0.41 s
    # solo at sf0.1; no-op at cluster scale)
    return fan_out_scan(t.documents).select(
        "doc_id", T.predict_lang("text").alias("pred_lang")
    )


@register(
    "q41_quality_score",
    f"""
    WITH stats AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS DOUBLE) AS n,
             CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) AS nd,
             CAST(len(list_filter(string_split(text, ' '),
                      t -> t IN ({_STOPWORD_LIST}))) AS DOUBLE) AS ns
      FROM documents)
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_tokens,
           0.4 * LEAST(n / 100.0, 1.0) + 0.3 * (nd / n) + 0.3 * (1.0 - ns / n)
             AS quality
    FROM stats
    """,
    "document quality heuristic: length + lexical diversity + stopword "
    "ratio (rational arithmetic only — no libm divergence across engines)",
    ("llm", "text"),
)
def q41(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return t.documents.select(
        "doc_id",
        T.token_count("text").alias("n_tokens"),
        T.quality_score("text").alias("quality"),
    )


@register(
    "q42_doc_fingerprint",
    """
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
             generate_subscripts(string_split(text, ' '), 1) AS pos
      FROM documents
    ),
    sh5 AS (
      SELECT a.doc_id,
             a.tok || ' ' || b.tok || ' ' || c.tok || ' ' || d.tok || ' ' || e.tok AS s
      FROM toks a
      JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
      JOIN toks c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
      JOIN toks d ON a.doc_id = d.doc_id AND d.pos = a.pos + 3
      JOIN toks e ON a.doc_id = e.doc_id AND e.pos = a.pos + 4
    )
    SELECT doc_id, MIN(('0x' || substr(md5(s), 1, 8))::BIGINT) AS fingerprint
    FROM sh5 GROUP BY doc_id
    """,
    "winnowing-style fingerprint: min md5-hash over word 5-shingles",
    ("llm", "text", "dedup"),
)
def q42(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fluvii_spark.operators.stats import fan_out_scan

    t = load_tables(spark, sf_dir)
    # per-row shingle+md5 fingerprint fold - parallelize an
    # under-partitioned scan (1.18 s -> 0.87 s solo at sf0.1)
    return fan_out_scan(t.documents).select(
        "doc_id", T.doc_fingerprint("text", 5).alias("fingerprint")
    ).filter(
        # documents too short for one 5-shingle have no fingerprint; the
        # oracle's positional self-join omits them, so the NULL row must
        # not appear here either
        F.col("fingerprint").isNotNull()
    )


@register(
    "q59_tfidf_terms",
    """
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
    df AS (SELECT term, COUNT(*) AS df, SUM(tf) AS total_tf FROM tf GROUP BY term),
    n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT term,
           CAST(df AS BIGINT) AS df,
           total_tf * (n_docs - df + 0.5) / (df + 0.5) AS score
    FROM df, n
    ORDER BY score DESC, term
    LIMIT 10
    """,
    "corpus TF-IDF (BM25-style rational idf — no libm, cross-engine exact): "
    "distinctive-term extraction for training-data curation",
    ("llm", "text"),
)
def q59(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    # n_docs stays inside the lazy plan: 1-row aggregate broadcast-crossed
    # onto the per-term frame (same trick as q55) — no eager count(), one job.
    n = t.documents.agg(F.count("*").alias("n_docs"))
    tf = (
        t.documents.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(
        F.count("*").alias("df"), F.sum("tf").alias("total_tf")
    )
    return (
        df_.crossJoin(F.broadcast(n))
        .select(
            "term",
            F.col("df").cast("bigint").alias("df"),
            (
                F.col("total_tf")
                * (F.col("n_docs") - F.col("df") + 0.5)
                / (F.col("df") + 0.5)
            ).alias("score"),
        )
        .orderBy(F.col("score").desc(), "term")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# dedup family
# ---------------------------------------------------------------------------


@register(
    "q33_dedup_exact",
    """
    SELECT md5(text) AS text_md5, MIN(doc_id) AS keep_doc_id,
           COUNT(*) AS n_copies
    FROM documents GROUP BY text
    """,
    "exact dedup: hash-groupBy on content, keep minimum id",
    ("llm", "dedup"),
)
def q33(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t.documents.groupBy("text")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_copies"))
        .select(F.md5(F.encode("text", "UTF-8")).alias("text_md5"), "keep_doc_id", "n_copies")
    )


@register(
    "q34_dedup_ngram_jaccard",
    f"""
    WITH
    {_SH3},
    {_JACCARD}
    SELECT id_a, id_b, jaccard FROM jac WHERE jaccard >= 0.5
    """,
    "near-dup pairs by exact word-3-gram Jaccard ≥ 0.5; candidates from a "
    "shared-shingle equi-join (never a crossJoin)",
    ("llm", "dedup"),
)
def q34(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.jaccard_from_stats(doc_ngram_stats(spark, sf_dir), threshold=0.5)


@register(
    "q35_dedup_minhash_lsh",
    f"""
    WITH
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
    {_JACCARD}
    SELECT c.id_a, c.id_b, j.jaccard
    FROM cand c JOIN jac j ON c.id_a = j.id_a AND c.id_b = j.id_b
    WHERE j.jaccard >= 0.5
    """,
    "MinHash(16 perms, md5-derived)+LSH(4 bands × 4 rows) candidate pairs, "
    "verified with exact Jaccard — the 100 TB fuzzy-dedup path",
    ("llm", "dedup"),
)
def q35(spark: SparkSession, sf_dir: str) -> DataFrame:
    return doc_dedup_pairs(spark, sf_dir)


@register(
    "q36_simhash",
    f"""
    WITH
    {_SIMHASH}
    SELECT doc_id, simhash FROM sim
    """,
    "32-bit SimHash fingerprints (token-frequency-weighted bit votes)",
    ("llm", "dedup"),
)
def q36(spark: SparkSession, sf_dir: str) -> DataFrame:
    return doc_simhash(spark, sf_dir)


@register(
    "q37_simhash_pairs",
    f"""
    WITH
    {_SIMHASH},
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
             a.simhash AS sa, b.simhash AS sb
      FROM sim a JOIN sim b ON a.doc_id < b.doc_id
       AND ((a.simhash >> 16) = (b.simhash >> 16)
            OR (a.simhash & 65535) = (b.simhash & 65535))
    )
    SELECT id_a, id_b, CAST(bit_count(xor(sa, sb)) AS INTEGER) AS hamming
    FROM cand WHERE bit_count(xor(sa, sb)) <= 6
    """,
    "SimHash candidate pairs via 16-bit half-matching, verified to "
    "Hamming <= 6 (Manku et al. WWW'07 block scheme). COMPLETENESS "
    "CAVEAT: two blocks guarantee recall only for Hamming <= 1 — a pair "
    "differing in BOTH halves is never a candidate even under the verify "
    "bound; full d=6 recall needs d+1=7 blocks (more candidate joins on "
    "~4.6-bit keys — the recall/cost dial). Both engines run the same "
    "2-block scheme, so the oracle checks the scheme, not full-d recall",
    ("llm", "dedup"),
)
def q37(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    p = D.simhash_pairs(
        t.documents, max_hamming=6, signatures=doc_simhash(spark, sf_dir)
    )
    return p.select("id_a", "id_b", F.col("hamming").cast("int").alias("hamming"))


@register(
    "q38_dedup_embedding_cosine",
    """
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                  CAST(b.embedding AS DOUBLE[])) AS cosine
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                 CAST(b.embedding AS DOUBLE[])) >= 0.4
    """,
    "embedding near-dup pairs (cosine ≥ 0.4); exact=True because the oracle "
    "is exact all-pairs (this corpus is in the exact regime); at scale the "
    "operator's exact=None default routes to LSH-bucketed candidates on "
    "metadata stats alone — no pre-plan count job",
    ("llm", "dedup", "similarity"),
)
def q38(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return D.embedding_near_dup_pairs(t.embeddings, threshold=0.4, exact=True)


# The MinHash-LSH chain (shingle → 16-perm minhash → band join → Arrow
# verify) is the shared upstream of q35 (pair listing), q60 (clusters) and
# q100 (keep-best policy). Within one SparkSession compute it once and
# persist the (tiny) results — the cross-query analogue of a materialized
# intermediate in a warehouse run. One live (session, sf_dir) entry each so
# stale sessions' storage is never pinned.
_PAIRS_CACHE: dict[tuple[str, str], DataFrame] = {}
_CLUSTERS_CACHE: dict[tuple[str, str], DataFrame] = {}
_NGRAM_STATS_CACHE: dict[tuple[str, str], DataFrame] = {}
_SIMHASH_CACHE: dict[tuple[str, str], DataFrame] = {}
# Harnesses run queries from a thread pool: without a lock, q35/q60/q100 all
# miss the memo simultaneously and each computes the whole chain (and the
# iterative components loops then starve behind each other's jobs). One
# builder, everyone else waits for the persisted result.
_DEDUP_LOCK = threading.Lock()
# The ngram-stats chain gets its OWN lock: holding _DEDUP_LOCK while the
# stats builder runs would serialize the (independent) minhash chain behind
# it — measured 90 s inventory wall vs 20 s with separate locks. The simhash
# chain is independent of both, so it gets its own lock too (sharing
# _NGRAM_LOCK would queue the light simhash build behind the heavy
# shingle-pair build — the exact serialization the split exists to avoid).
_NGRAM_LOCK = threading.Lock()
_SIMHASH_LOCK = threading.Lock()


def _memo_key(spark: SparkSession, sf_dir: str) -> tuple:
    """Memo key scoping a persisted frame to one live session + dataset.

    Classic sessions use applicationId (stable across getOrCreate handles
    to the same JVM app); Spark Connect has no SparkContext, so fall back
    to a uuid token stamped onto the session object on first use. A bare
    ``id(spark)`` would alias a NEW session to a DEAD one whenever CPython
    reuses the freed address — the token survives only as long as the
    exact session object does, which is the invalidation boundary persist
    needs."""
    try:
        return (spark.sparkContext.applicationId, sf_dir)
    except Exception:  # noqa: BLE001 — Connect: no SparkContext
        token = getattr(spark, "_fluvii_memo_token", None)
        if token is None:
            token = uuid.uuid4().hex
            try:
                spark._fluvii_memo_token = token
            except Exception:  # noqa: BLE001 — unstampable: never memoize
                token = f"nomemo-{uuid.uuid4().hex}"
        return (token, sf_dir)


def _memo_swap(cache: dict, key: tuple[str, str], df: DataFrame) -> DataFrame:
    """Evict-then-insert for the single-entry memos, unpersisting what we
    evict so a second sf_dir queried in the same live session doesn't leak
    the old persisted blocks in storage memory. Checkpoint-backed entries
    (the self-contained clusters memo) additionally need their LogicalRDD
    blocks released — plain unpersist can't reach those. Eviction may race
    a stopped session — both frees are best-effort."""
    from fluvii_spark.operators.stats import release_local_checkpoint

    for old in cache.values():
        try:
            old.unpersist()
        except Exception:  # noqa: BLE001 — stale session's blocks die with it
            pass
        release_local_checkpoint(old)  # no-op for persist-backed frames
    cache.clear()
    cache[key] = df
    return df


def doc_ngram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared (id_a, id_b, n_common, n_a, n_b) shingle-pair stats for the
    documents table — q34 (Jaccard) and q106 (containment) score the same
    persisted candidate set instead of each re-running the shingle
    explode + self-join."""
    key = _memo_key(spark, sf_dir)
    with _NGRAM_LOCK:
        cached = _NGRAM_STATS_CACHE.get(key)
        if cached is not None:
            return cached
        t = load_tables(spark, sf_dir)
        # max_doc_freq=None: the oracle-checked variants need exact
        # semantics (module docstring in operators.dedup) — "auto" routes
        # through a metadata-only ESTIMATE (no job) that may enable the
        # df-cut and change pair stats, so exactness must be explicit.
        stats = D.ngram_pair_stats(t.documents, max_doc_freq=None).persist()
        return _memo_swap(_NGRAM_STATS_CACHE, key, stats)


def doc_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared persisted SimHash fingerprints: q36 reports them, q37 joins
    them — one 32-vote aggregation serves both."""
    key = _memo_key(spark, sf_dir)
    with _SIMHASH_LOCK:
        cached = _SIMHASH_CACHE.get(key)
        if cached is not None:
            return cached
        t = load_tables(spark, sf_dir)
        hs = D.simhash(t.documents).persist()
        return _memo_swap(_SIMHASH_CACHE, key, hs)


def doc_dedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = _memo_key(spark, sf_dir)
    with _DEDUP_LOCK:
        cached = _PAIRS_CACHE.get(key)
        if cached is not None:
            return cached
        t = load_tables(spark, sf_dir)
        pairs = D.minhash_lsh_pairs(t.documents, threshold=0.5).persist()
        return _memo_swap(_PAIRS_CACHE, key, pairs)


def doc_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = _memo_key(spark, sf_dir)
    with _DEDUP_LOCK:
        cached = _CLUSTERS_CACHE.get(key)
        if cached is not None:
            return cached
    pairs = doc_dedup_pairs(spark, sf_dir)
    with _DEDUP_LOCK:
        cached = _CLUSTERS_CACHE.get(key)
        if cached is not None:
            return cached
        # self_contained: the result is ONE eager checkpoint owning its
        # blocks, every internal round checkpoint freed by the operator.
        # The projection over it is narrow — no separate persist needed
        # (a persist here would store the same rows twice); eviction frees
        # the blocks via release_local_checkpoint in _memo_swap.
        clusters = D.connected_components(pairs, self_contained=True).select(
            "node", F.col("cluster").cast("bigint").alias("cluster")
        )
        return _memo_swap(_CLUSTERS_CACHE, key, clusters)


@register(
    "q60_dedup_clusters",
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
    )
    SELECT src AS node, CAST(MIN(dst) AS BIGINT) AS cluster
    FROM closure GROUP BY src
    """,
    "near-dup clusters: MinHash-LSH pairs → connected components (min-label "
    "propagation; oracle = recursive-CTE transitive closure). Cluster id = "
    "canonical (minimum) doc id",
    ("llm", "dedup", "graph"),
)
def q60(spark: SparkSession, sf_dir: str) -> DataFrame:
    return doc_dedup_clusters(spark, sf_dir)


# ---------------------------------------------------------------------------
# multimodal
# ---------------------------------------------------------------------------


@register(
    "q43_multimodal_meta",
    """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS content_md5
    FROM documents
    """,
    "multimodal binary-column plumbing: payload byte length + content "
    "digest (decode kernels are stubbed; schema/UDF plumbing is real — "
    "operators.multimodal)",
    ("llm", "multimodal"),
)
def q43(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return t.documents.select(
        "doc_id",
        F.octet_length("text").cast("bigint").alias("n_bytes"),
        F.md5(F.encode("text", "UTF-8")).alias("content_md5"),
    )
