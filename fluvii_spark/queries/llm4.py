"""Round-5 LLM-data-ops additions (q189-q194, q200, q203, q209, q211, q212):
retrieval-quality evaluation, language-model scoring, corpus-divergence
and duplication audits, sketch-fidelity measurement, score calibration,
and distributed k-means clustering — the evaluation-and-curation half of
a training-data pipeline (the earlier inventory built the operators;
these queries measure how well they work on the corpus at hand).

No reference counterpart (SURVEY.md §2.2 "LLM-data ops"); determinism
follows FIXTURES.md (md5-derived hashing, exact integer/DECIMAL cores,
single IEEE divisions, unique tie-breaks, identical aliases both sides).
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fluvii_spark.io.readers import load_tables
from fluvii_spark.operators import dedup as D
from fluvii_spark.operators import similarity as S
from fluvii_spark.operators import text as T
from fluvii_spark.queries import register
from fluvii_spark.queries.llm import (
    _JACCARD,
    _MINHASH,
    _SH3,
    lsh_buckets_cte,
)


@register(
    "q189_ann_recall_eval",
    f"""
    WITH
    {lsh_buckets_cte(4)},
    base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q AS (SELECT vec_id AS qid, v AS qv FROM base WHERE vec_id < 10),
    exact AS (
      SELECT qid, vec_id FROM (
        SELECT q.qid, b.vec_id,
               row_number() OVER (PARTITION BY q.qid
                 ORDER BY round(list_cosine_similarity(b.v, q.qv), 6) DESC,
                          b.vec_id) AS rn
        FROM base b, q WHERE b.vec_id <> q.qid) WHERE rn <= 5),
    qb AS (SELECT q.qid, q.qv, bk.bucket FROM q
           JOIN buckets bk ON bk.vec_id = q.qid),
    lsh AS (
      SELECT qid, vec_id FROM (
        SELECT qb.qid, b.vec_id,
               row_number() OVER (PARTITION BY qb.qid
                 ORDER BY round(list_cosine_similarity(b.v, qb.qv), 6) DESC,
                          b.vec_id) AS rn
        FROM base b JOIN buckets bk USING (vec_id)
        JOIN qb ON bk.bucket = qb.bucket AND b.vec_id <> qb.qid) WHERE rn <= 5)
    SELECT CAST(e.qid AS BIGINT) AS qid,
           CAST(COUNT(l.vec_id) AS BIGINT) AS n_overlap,
           ROUND(CAST(COUNT(l.vec_id) AS DOUBLE) / 5.0, 6) AS recall
    FROM exact e LEFT JOIN lsh l ON l.qid = e.qid AND l.vec_id = e.vec_id
    GROUP BY e.qid
    """,
    "recall@5 of a 4-plane (16-bucket) LSH index against exact "
    "brute-force ground truth for the first 10 query vectors — the "
    "retrieval-quality evaluation every ANN deployment needs. 4 planes "
    "(not the production 8) because the eval corpus (200 vectors at "
    "sf0.01) leaves 2^8 buckets ~0.8-deep: every probe's bucket was "
    "empty and recall was identically 0 — a vacuous eval "
    "(degeneracy-gate catch, r7). The retrieval-quality "
    "evaluation every ANN deployment needs before trusting the index. "
    "Both sides rank with (cosine DESC, vec_id); ground truth is one "
    "corpus scan against a 10-row broadcast probe set (q74's pattern), "
    "the LSH side joins through the same bucket table the index serves "
    "from, so the measured recall is the production path's recall",
    ("llm", "similarity", "ann", "evaluation"),
)
def q189(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    corpus = t.embeddings
    # both norms hoisted out of the per-(row, probe) cosine (the q146
    # pattern — bit-identical arithmetic, 1/3 the fold work): corpus rows
    # carry their norm once, the 10-row probe set carries its own
    corpus = corpus.withColumn("_ne", F.expr(S.norm_sql("embedding")))
    # vector + norm carried through the bucket projection so the LSH
    # candidate side never attach-joins the corpus (guide §8 re-attach
    # trap; same move as lsh_topk)
    buckets = S.lsh_buckets(
        corpus, dims=64, planes=4, keep=("embedding", "_ne")
    )
    queries = corpus.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qvec"),
        F.col("_ne").alias("_nq"),
    )
    # rank on ROUND(cosine, 6): raw cosines can differ by ~1 ulp across
    # engines, and a rank flip at position 5 moves recall by a full 0.2 —
    # a discrete jump no output rounding absorbs. 6-dp ranking leaves only
    # the knife-edge class every rounded float query shares.
    scored = (
        corpus.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
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
    exact = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("qid", "vec_id")
    )
    qb = queries.join(
        buckets.select(F.col("vec_id").alias("qid"), "bucket"), "qid"
    )  # qid, qvec, _nq, bucket — 10 rows, broadcast
    lsh = (
        buckets.join(F.broadcast(qb), "bucket")
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            F.round(
                F.expr(
                    S.cosine_hoisted_sql("embedding", "qvec", "_ne", "_nq")
                ),
                6,
            ).alias("cosine"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("qid", F.col("vec_id").alias("l_vec_id"))
    )
    return (
        exact.join(
            lsh,
            (exact.qid == lsh.qid) & (exact.vec_id == lsh.l_vec_id),
            "left",
        )
        .groupBy(exact.qid)
        .agg(
            F.count("l_vec_id").cast("bigint").alias("n_overlap"),
            F.round(F.count("l_vec_id").cast("double") / 5.0, 6).alias(
                "recall"
            ),
        )
        .select(F.col("qid").cast("bigint").alias("qid"), "n_overlap", "recall")
    )


@register(
    "q190_bigram_logprob",
    """
    WITH toks AS (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok,
             generate_subscripts(string_split(text, ' '), 1) AS pos
      FROM documents
    ),
    bg AS (
      SELECT a.doc_id, a.lang, a.tok || ' ' || b.tok AS bigram
      FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
    ),
    dbg AS (
      SELECT doc_id, lang, bigram, COUNT(*) AS tf FROM bg GROUP BY 1, 2, 3
    ),
    c12 AS (SELECT lang, bigram, SUM(tf) AS c12 FROM dbg GROUP BY 1, 2),
    c1 AS (
      SELECT lang, split_part(bigram, ' ', 1) AS w1, SUM(c12) AS c1
      FROM c12 GROUP BY 1, 2
    ),
    vocab AS (SELECT lang, COUNT(DISTINCT tok) AS v FROM toks GROUP BY lang),
    doc_nll AS (
      SELECT d.doc_id, d.lang,
             SUM(d.tf * -LN((c.c12 + 1) / CAST(u.c1 + vb.v AS DOUBLE)))
               / SUM(d.tf) AS nll
      FROM dbg d
      JOIN c12 c ON c.lang = d.lang AND c.bigram = d.bigram
      JOIN c1 u ON u.lang = d.lang
                AND u.w1 = split_part(d.bigram, ' ', 1)
      JOIN vocab vb ON vb.lang = d.lang
      GROUP BY d.doc_id, d.lang
    )
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           AVG(nll) AS avg_nll, MIN(nll) AS min_nll, MAX(nll) AS max_nll
    FROM doc_nll GROUP BY lang
    """,
    "bigram language-model scoring with add-1 smoothing, per language — "
    "the second-order companion to q185's unigram filter (a repetitive "
    "doc scores well on unigrams but its bigram NLL exposes it). "
    "p(w2|w1) = (c12+1)/(c1+V) over the per-lang corpus; per-doc score = "
    "tf-weighted mean -ln p. The explode contracts immediately to "
    "per-(doc,bigram) term frequencies (checkpointed once for the model "
    "aggregation and the scoring join); the LM stays a distributed "
    "relation. Per-term ln differs <=1 ulp; per-doc means are ~1e-14 off "
    "across engines, far under the 6-dp gate (q185 precedent)",
    ("llm", "text", "quality"),
)
def q190(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fluvii_spark.operators.stats import fan_out_scan

    t = load_tables(spark, sf_dir)
    # both explodes are map-side feeders of their aggregations; keep them
    # parallel when the doc scan plans as fewer partitions than cores
    docs = fan_out_scan(t.documents)
    toks = docs.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("tok")
    )
    dbg = (
        docs.select(
            "doc_id", "lang", F.explode(T.bigrams("text")).alias("bigram")
        )
        .groupBy("doc_id", "lang", "bigram")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=False)
    )
    # the LM is checkpointed at bigram-TYPE granularity: c12 feeds both
    # its c1 marginal and the per-type score — without the barrier both
    # consumers re-run the dbg→c12 aggregation (measured 5.0 s vs 2.2 s
    # solo at sf0.1)
    c12 = (
        dbg.groupBy("lang", "bigram")
        .agg(F.sum("tf").alias("c12"))
        .localCheckpoint(eager=False)
    )
    c1 = (
        c12.select(
            "lang", F.expr("split_part(bigram, ' ', 1)").alias("w1"), "c12"
        )
        .groupBy("lang", "w1")
        .agg(F.sum("c12").alias("c1"))
    )
    vocab = toks.groupBy("lang").agg(F.countDistinct("tok").alias("v"))
    # per-bigram -ln p computed ONCE per (lang, bigram) TYPE: the c1 and
    # vocab joins run over |bigram types| rows instead of every
    # per-(doc, bigram) occurrence (§2.3 — types are a strict subset of
    # occurrences at any scale). Each dbg row then picks up the identical
    # double the inline expression produced (same inputs, same ops), so
    # per-doc sums are unchanged.
    sbg = (
        c12.withColumn("w1", F.expr("split_part(bigram, ' ', 1)"))
        .join(c1, ["lang", "w1"])
        .join(F.broadcast(vocab), "lang")
        .select(
            "lang",
            "bigram",
            (
                -F.log(
                    (F.col("c12") + 1)
                    / (F.col("c1") + F.col("v")).cast("double")
                )
            ).alias("s"),
        )
    )
    doc_nll = (
        dbg.join(sbg, ["lang", "bigram"])
        .groupBy("doc_id", "lang")
        .agg((F.sum(F.col("tf") * F.col("s")) / F.sum("tf")).alias("nll"))
    )
    return doc_nll.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.avg("nll").alias("avg_nll"),
        F.min("nll").alias("min_nll"),
        F.max("nll").alias("max_nll"),
    )


@register(
    "q191_token_entropy",
    """
    WITH toks AS (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
      FROM documents
    ),
    dt AS (
      SELECT doc_id, lang, token, COUNT(*) AS tf FROM toks GROUP BY 1, 2, 3
    ),
    doc_h AS (
      SELECT doc_id, lang,
             -SUM((tf / CAST(n AS DOUBLE)) * LN(tf / CAST(n AS DOUBLE)))
               AS entropy
      FROM (SELECT *, SUM(tf) OVER (PARTITION BY doc_id) AS n FROM dt)
      GROUP BY doc_id, lang
    )
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           AVG(entropy) AS avg_entropy,
           MIN(entropy) AS min_entropy, MAX(entropy) AS max_entropy
    FROM doc_h GROUP BY lang
    """,
    "per-document token-distribution Shannon entropy aggregated by "
    "language — the information-density screen (near-zero entropy = "
    "boilerplate/repetition, the complement of q98's repetition score). "
    "The per-doc token total comes from a window over the contracted "
    "per-(doc,token) relation (each doc's distinct tokens, not the raw "
    "stream, flow through the window); ln-ulp analysis as q185/q190",
    ("llm", "text", "quality"),
)
def q191(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    dt = (
        t.documents.select(
            "doc_id", "lang", F.explode(F.split("text", " ")).alias("token")
        )
        .groupBy("doc_id", "lang", "token")
        .agg(F.count("*").alias("tf"))
    )
    wn = Window.partitionBy("doc_id")
    doc_h = (
        dt.withColumn("n", F.sum("tf").over(wn))
        .groupBy("doc_id", "lang")
        .agg(
            (
                -F.sum(
                    (F.col("tf") / F.col("n").cast("double"))
                    * F.log(F.col("tf") / F.col("n").cast("double"))
                )
            ).alias("entropy")
        )
    )
    return doc_h.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.avg("entropy").alias("avg_entropy"),
        F.min("entropy").alias("min_entropy"),
        F.max("entropy").alias("max_entropy"),
    )


@register(
    "q192_split_js_divergence",
    f"""
    WITH toks AS (
      SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 2
               AS split,
             lang, unnest(string_split(text, ' ')) AS token
      FROM documents
    ),
    c AS (
      SELECT lang, token,
             SUM(CASE WHEN split = 0 THEN 1 ELSE 0 END) AS ca,
             SUM(CASE WHEN split = 1 THEN 1 ELSE 0 END) AS cb
      FROM toks GROUP BY 1, 2
    ),
    n AS (
      SELECT lang, SUM(ca) AS na, SUM(cb) AS nb FROM c GROUP BY lang
    ),
    terms AS (
      SELECT c.lang,
             CASE WHEN n.na > 0 THEN c.ca / CAST(n.na AS DOUBLE) ELSE 0 END
               AS pa,
             CASE WHEN n.nb > 0 THEN c.cb / CAST(n.nb AS DOUBLE) ELSE 0 END
               AS pb
      FROM c JOIN n USING (lang)
    )
    SELECT lang,
           ROUND(SUM(
             CASE WHEN pa > 0 THEN 0.5 * pa * LN(pa / ((pa + pb) / 2))
                  ELSE 0 END +
             CASE WHEN pb > 0 THEN 0.5 * pb * LN(pb / ((pa + pb) / 2))
                  ELSE 0 END), 6) AS js_divergence
    FROM terms GROUP BY lang
    """,
    "Jensen-Shannon divergence between the token distributions of the two "
    "md5-hash splits, per language — the train/validation leakage-and-"
    "drift check (a healthy random split has JS near 0; a contaminated "
    "or skewed split does not). Split assignment reuses the q70 "
    "md5-predicate convention (no rand()); zero-probability terms "
    "contribute 0 by the KL convention, guarded with CASE on both "
    "engines so ANSI mode never divides by zero; vocab-sum float error "
    "~1e-13 against the 6-dp gate",
    ("llm", "text", "quality", "sampling"),
)
def q192(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    split = T.md5_hash64(F.col("doc_id").cast("string")) % 2
    toks = t.documents.select(
        split.alias("split"),
        "lang",
        F.explode(F.split("text", " ")).alias("token"),
    )
    c = toks.groupBy("lang", "token").agg(
        F.sum(F.when(F.col("split") == 0, 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("split") == 1, 1).otherwise(0)).alias("cb"),
    )
    n = c.groupBy("lang").agg(
        F.sum("ca").alias("na"), F.sum("cb").alias("nb")
    )
    terms = c.join(F.broadcast(n), "lang").select(
        "lang",
        F.when(F.col("na") > 0, F.col("ca") / F.col("na").cast("double"))
        .otherwise(F.lit(0.0))
        .alias("pa"),
        F.when(F.col("nb") > 0, F.col("cb") / F.col("nb").cast("double"))
        .otherwise(F.lit(0.0))
        .alias("pb"),
    )
    m = (F.col("pa") + F.col("pb")) / 2
    term = F.when(
        F.col("pa") > 0, 0.5 * F.col("pa") * F.log(F.col("pa") / m)
    ).otherwise(F.lit(0.0)) + F.when(
        F.col("pb") > 0, 0.5 * F.col("pb") * F.log(F.col("pb") / m)
    ).otherwise(F.lit(0.0))
    return terms.groupBy("lang").agg(
        F.round(F.sum(term), 6).alias("js_divergence")
    )


@register(
    "q193_dup_inflation",
    """
    WITH norm AS (
      SELECT lang,
             lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS norm_text
      FROM documents
    ),
    groups AS (
      SELECT lang, norm_text, COUNT(*) AS c FROM norm GROUP BY 1, 2
    )
    SELECT lang,
           CAST(SUM(c) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           ROUND(CAST(SUM(c) AS DOUBLE) / COUNT(*), 6) AS inflation,
           CAST(MAX(c) AS BIGINT) AS max_dup_count
    FROM groups GROUP BY lang
    """,
    "per-language duplication inflation: docs per distinct normalized "
    "text (lowercase, trimmed, whitespace-collapsed — q67's "
    "normalization) plus the largest duplicate group — the one-line "
    "corpus-health number a dedup pass is judged by (inflation 1.0 = "
    "clean). Exact integer core, one final division; hash-groupBy on the "
    "normalized text exactly like exact dedup, so it scales as q33 does",
    ("llm", "dedup", "quality"),
)
def q193(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    norm = t.documents.select(
        "lang",
        F.lower(
            F.trim(F.regexp_replace("text", r"\s+", " "))
        ).alias("norm_text"),
    )
    groups = norm.groupBy("lang", "norm_text").agg(F.count("*").alias("c"))
    return groups.groupBy("lang").agg(
        F.sum("c").cast("bigint").alias("n_docs"),
        F.count("*").cast("bigint").alias("n_distinct"),
        F.round(
            F.sum("c").cast("double") / F.count("*"), 6
        ).alias("inflation"),
        F.max("c").cast("bigint").alias("max_dup_count"),
    )


@register(
    "q194_minhash_fidelity",
    f"""
    WITH
    {_SH3},
    {_JACCARD},
    {_MINHASH},
    bands AS (
      SELECT doc_id, perm // 4 AS band,
             string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY perm)
               AS band_sig
      FROM sig GROUP BY doc_id, perm // 4
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_sig = b.band_sig
       AND a.doc_id < b.doc_id
    ),
    est AS (
      SELECT c.id_a, c.id_b,
             SUM(CASE WHEN sa.minhash = sb.minhash THEN 1 ELSE 0 END)
               / 16.0 AS est_jaccard
      FROM cand c
      JOIN sig sa ON sa.doc_id = c.id_a
      JOIN sig sb ON sb.doc_id = c.id_b AND sb.perm = sa.perm
      GROUP BY c.id_a, c.id_b
    )
    SELECT e.id_a, e.id_b,
           ROUND(e.est_jaccard, 6) AS est_jaccard,
           ROUND(COALESCE(j.jaccard, 0.0), 6) AS exact_jaccard,
           ROUND(ABS(e.est_jaccard - COALESCE(j.jaccard, 0.0)), 6)
             AS abs_err
    FROM est e
    LEFT JOIN jac j ON j.id_a = e.id_a AND j.id_b = e.id_b
    """,
    "MinHash estimator fidelity: for every LSH candidate pair, the "
    "16-permutation signature agreement (matches/16 — the unbiased "
    "Jaccard estimator) against the exact shingle Jaccard, with the "
    "absolute error — the measurement that justifies (or indicts) the "
    "signature width before a corpus-wide dedup run trusts it. "
    "Candidates and exact verification are the SAME relations q35 "
    "builds (banded equi-join, per-pair array intersect), so the audit "
    "costs one extra 16-row-per-pair signature join",
    ("llm", "dedup", "sketch", "evaluation"),
)
def q194(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fluvii_spark.operators.stats import fan_out_scan

    t = load_tables(spark, sf_dir)
    docs = t.documents
    # ONE checkpointed per-doc profile — the 16 minhash minima AND the
    # distinct shingle SET collected from the SAME shingle explode — feeds
    # the band join, the estimator and the exact-Jaccard verification
    # through a single cand⋈a⋈b chain. The previous split topology
    # (signatures checkpoint + two fresh document scans re-running the
    # shingle pipeline for the exact pass) was r11's measured-best on the
    # single-row-group sf0.1 files where the duplicated branches were
    # free; re-adjudicated in r12 on the MULTI-SPLIT g=10 corpus (every
    # scan = 32 real tasks): merged profile 12.2 s vs split 16.4 s best
    # (−26%), and the sf0.1 A/B now also favors it (2.62 vs 3.40 best of
    # 4 interleaved). collect_set's order doesn't matter: the exact
    # Jaccard reads the set only through size/array_intersect.
    n_perms = len(D.MINHASH_PERMS)
    sh = D.word_shingles(
        fan_out_scan(docs), "doc_id", "text", 3, distinct=False
    )
    h = F.conv(F.substring(F.md5("shingle"), 1, 8), 16, 10).cast("long")
    aggs = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % D.MINHASH_P).alias(
            f"mh{i}"
        )
        for i, (a, b) in enumerate(D.MINHASH_PERMS)
    ]
    prof = (
        sh.withColumn("h", h)
        .groupBy("doc_id")
        .agg(*aggs, F.collect_set("shingle").alias("_ss"))
        .localCheckpoint(eager=False)
    )
    cand = D.lsh_candidate_pairs(docs, wide=prof).localCheckpoint(
        eager=False
    )
    wa = prof.select(
        F.col("doc_id").alias("id_a"),
        *[F.col(f"mh{i}").alias(f"a{i}") for i in range(n_perms)],
        F.col("_ss").alias("_sa"),
    )
    wb = prof.select(
        F.col("doc_id").alias("id_b"),
        *[F.col(f"mh{i}").alias(f"b{i}") for i in range(n_perms)],
        F.col("_ss").alias("_sb"),
    )
    matches = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(n_perms)
    )
    # exact Jaccard on the profile's shingle sets — identical values to
    # minhash_lsh_pairs' array_distinct form (same set per doc; every
    # candidate doc has ≥1 shingle or it could not share a band), and the
    # old est⋈exact left join always matched (threshold 0.0 passes every
    # candidate pair), so computing both in-row changes no row
    n_int = F.size(F.array_intersect("_sa", "_sb")).cast("double")
    jac = F.when(
        F.size("_sa") + F.size("_sb") == n_int, F.lit(0.0)
    ).otherwise(n_int / (F.size("_sa") + F.size("_sb") - n_int))
    return (
        cand.join(wa, "id_a")
        .join(wb, "id_b")
        .select(
            "id_a",
            "id_b",
            (matches / float(n_perms)).alias("_est"),
            jac.alias("_jac"),
        )
        .select(
            "id_a",
            "id_b",
            F.round("_est", 6).alias("est_jaccard"),
            F.round("_jac", 6).alias("exact_jaccard"),
            F.round(F.abs(F.col("_est") - F.col("_jac")), 6).alias(
                "abs_err"
            ),
        )
    )


@register(
    "q200_quality_auc",
    f"""
    WITH stats AS (
      SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
             CAST(len(string_split(text, ' ')) AS DOUBLE) AS n,
             CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
               AS nd,
             CAST(len(list_filter(string_split(text, ' '),
                      t -> t IN ({{stopwords}}))) AS DOUBLE) AS ns
      FROM documents),
    scored AS (
      SELECT pos,
             ROUND(0.4 * LEAST(n / 100.0, 1.0) + 0.3 * (nd / n)
                   + 0.3 * (1.0 - ns / n), 6) AS s
      FROM stats),
    g AS (SELECT s, COUNT(*) AS c, SUM(pos) AS cp FROM scored GROUP BY s),
    r AS (
      SELECT s, c, cp,
             SUM(c) OVER (ORDER BY s ROWS UNBOUNDED PRECEDING) - c
               AS prefix
      FROM g),
    m AS (
      SELECT SUM(cp) AS np, SUM(c - cp) AS nn,
             SUM(cp * (prefix + (c + 1) / 2.0)) AS rpos
      FROM r)
    SELECT CAST(np AS BIGINT) AS n_pos, CAST(nn AS BIGINT) AS n_neg,
           ROUND((rpos - np * (np + 1) / 2.0)
                 / (CAST(np AS DOUBLE) * nn), 6) AS auc
    FROM m WHERE np > 0 AND nn > 0
    """.replace("{stopwords}", ", ".join(f"'{s}'" for s in T.STOPWORDS)),
    "AUC (Mann-Whitney, tie-corrected) of the q41 quality score as a "
    "classifier for lang='en' — the separability evaluation that turns "
    "a heuristic score into a defensible filter threshold. Scores are "
    "6-dp-rounded before ranking (the q189 rank-stability rule), then "
    "AUC = (R+ - np(np+1)/2) / (np*nn) over AVERAGE ranks of the "
    "distinct-score groups: prefix counts come from the distributed "
    "running-sum operator (range partitioning over the contracted "
    "per-score relation — no single-task corpus window), and every "
    "rank term is a half-integer, so the double sums are EXACT in any "
    "order and both engines divide bit-identical numbers once",
    ("llm", "quality", "evaluation", "order-statistics"),
)
def q200(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fluvii_spark.operators.ranking import distributed_running_sum

    t = load_tables(spark, sf_dir)
    scored = t.documents.select(
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("pos"),
        F.round(T.quality_score("text"), 6).alias("s"),
    )
    g = scored.groupBy("s").agg(
        F.count("*").alias("c"), F.sum("pos").alias("cp")
    )
    r = distributed_running_sum(g, ["s"], "c").withColumn(
        "prefix", F.col("run_sum") - F.col("c")
    )
    m = r.agg(
        F.sum("cp").alias("np"),
        F.sum(F.col("c") - F.col("cp")).alias("nn"),
        F.sum(
            F.col("cp") * (F.col("prefix") + (F.col("c") + 1) / 2.0)
        ).alias("rpos"),
    )
    return m.filter((F.col("np") > 0) & (F.col("nn") > 0)).select(
        F.col("np").cast("bigint").alias("n_pos"),
        F.col("nn").cast("bigint").alias("n_neg"),
        F.round(
            (F.col("rpos") - F.col("np") * (F.col("np") + 1) / 2.0)
            / (F.col("np").cast("double") * F.col("nn")),
            6,
        ).alias("auc"),
    )


@register(
    "q203_hybrid_rank_fusion",
    """
    WITH cq AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0),
    cos_r AS (
      SELECT vec_id AS id,
             ROW_NUMBER() OVER (
               ORDER BY ROUND(list_cosine_similarity(
                 CAST(embedding AS DOUBLE[]), CAST(qvec AS DOUBLE[])), 6)
                 DESC, vec_id) AS r_cos
      FROM embeddings, cq WHERE vec_id <> 0),
    tq AS (SELECT list_distinct(string_split(text, ' ')) AS qtok
           FROM documents WHERE doc_id = 0),
    tok_r AS (
      SELECT doc_id AS id, ROW_NUMBER() OVER (ORDER BY j DESC, doc_id)
               AS r_tok
      FROM (
        SELECT d.doc_id,
               ROUND(CAST(len(list_intersect(d.dt, q.qtok)) AS DOUBLE)
                     / (len(d.dt) + len(q.qtok)
                        - len(list_intersect(d.dt, q.qtok))), 6) AS j
        FROM (SELECT doc_id, list_distinct(string_split(text, ' ')) AS dt
              FROM documents) d, tq q
        WHERE d.doc_id <> 0))
    SELECT c.id, CAST(c.r_cos AS BIGINT) AS r_cos,
           CAST(t.r_tok AS BIGINT) AS r_tok,
           ROUND(1.0 / (60 + c.r_cos) + 1.0 / (60 + t.r_tok), 6) AS rrf
    FROM cos_r c JOIN tok_r t ON t.id = c.id
    ORDER BY 1.0 / (60 + c.r_cos) + 1.0 / (60 + t.r_tok) DESC, c.id
    LIMIT 10
    """,
    "reciprocal-rank fusion (k=60) of two retrieval signals for probe "
    "id 0: embedding-cosine rank against vec 0 and distinct-token "
    "Jaccard rank against doc 0 — the standard hybrid dense+lexical "
    "fusion. Both rankings go through distributed_row_number on "
    "(-rounded_score, id) (no single-task corpus window; scores "
    "6-dp-rounded before ranking per the q189 rule), and the fused "
    "score 1/(60+r1)+1/(60+r2) is a sum of two exact reciprocals of "
    "integers — bit-identical across engines, so the top-10 order "
    "(fused DESC, id) is deterministic",
    ("llm", "similarity", "evaluation"),
)
def q203(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fluvii_spark.operators.ranking import distributed_row_number

    t = load_tables(spark, sf_dir)
    emb = t.embeddings
    # probe norm hoisted into the 1-row broadcast (q146 pattern): the
    # corpus-row norm is inherent per pair (one probe), but norm(qvec)
    # was re-folded for every corpus row. Bit-identical arithmetic.
    cq = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qvec"),
        F.expr(S.norm_sql("embedding")).alias("_nq"),
    )
    # Both score relations are PERSISTED before ranking (r12):
    # repartitionByRange's range sampling re-executes its input, so the
    # un-persisted form ran the cosine fold (and below, the token-Jaccard
    # fold) over the whole corpus TWICE — once for boundary sampling,
    # once for the shuffle map. The persisted rows are the narrow
    # (id, score) projection (~16 B/row at any scale), so the cache write
    # is strictly cheaper than a second corpus-wide fold. Interleaved
    # low-steal A/B on the multi-split g=10 corpus: 0.97–1.44 s vs
    # 1.37–1.49 s committed (sf0.1 neutral). r11's localCheckpoint
    # variant of the same idea measured WORSE — the lineage cut hides
    # stats from the planner; plain persist keeps them.
    cos_scored = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(cq))
        .select(
            F.col("vec_id").alias("id"),
            (-F.round(
                F.expr(
                    S.cosine_hoisted_sql(
                        "embedding", "qvec", S.norm_sql("embedding"), "_nq"
                    )
                ),
                6,
            )).alias("neg_c"),
        )
        .persist()
    )
    cos_r = distributed_row_number(
        cos_scored, ["neg_c", "id"], out_col="r_cos"
    ).select("id", "r_cos")
    toks = t.documents.select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("dt")
    )
    tq = toks.filter(F.col("doc_id") == 0).select(
        F.col("dt").alias("qtok")
    )
    inter = F.size(F.array_intersect(F.col("dt"), F.col("qtok")))
    tok_scored = (
        toks.filter(F.col("doc_id") != 0)
        .crossJoin(F.broadcast(tq))
        .select(
            F.col("doc_id").alias("id"),
            (-F.round(
                inter.cast("double")
                / (F.size("dt") + F.size("qtok") - inter),
                6,
            )).alias("neg_j"),
        )
        .persist()  # see cos_scored note — sampling re-runs the fold
    )
    tok_r = distributed_row_number(
        tok_scored, ["neg_j", "id"], out_col="r_tok"
    ).select("id", "r_tok")
    rrf = F.lit(1.0) / (60 + F.col("r_cos")) + F.lit(1.0) / (
        60 + F.col("r_tok")
    )
    return (
        cos_r.join(tok_r, "id")
        .select(
            "id",
            F.col("r_cos").cast("bigint").alias("r_cos"),
            F.col("r_tok").cast("bigint").alias("r_tok"),
            F.round(rrf, 6).alias("rrf"),
            rrf.alias("_rrf_raw"),
        )
        .orderBy(F.col("_rrf_raw").desc(), "id")
        .limit(10)
        .drop("_rrf_raw")
    )


_CAL_PS = [i / 10.0 for i in range(1, 10)]


@register(
    "q209_quality_calibration",
    f"""
    WITH stats AS (
      SELECT doc_id,
             lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS norm,
             CAST(len(string_split(text, ' ')) AS DOUBLE) AS n,
             CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
               AS nd,
             CAST(len(list_filter(string_split(text, ' '),
                      t -> t IN ({{stopwords}}))) AS DOUBLE) AS ns
      FROM documents),
    scored AS (
      SELECT doc_id, norm,
             ROUND(0.4 * LEAST(n / 100.0, 1.0) + 0.3 * (nd / n)
                   + 0.3 * (1.0 - ns / n), 6) AS s
      FROM stats),
    dupc AS (SELECT norm, COUNT(*) AS c FROM scored GROUP BY norm),
    flagged AS (
      SELECT sc.doc_id, sc.s,
             CASE WHEN d.c > 1 THEN 1 ELSE 0 END AS is_dup
      FROM scored sc JOIN dupc d ON d.norm = sc.norm),
    bounds AS (
      SELECT unnest(quantile_cont(s, [{', '.join(str(p) for p in _CAL_PS)}]))
               AS b
      FROM flagged),
    bucketed AS (
      SELECT f.doc_id, f.is_dup,
             1 + COUNT(CASE WHEN f.s > ROUND(b.b, 6) THEN 1 END) AS bucket
      FROM flagged f, bounds b
      GROUP BY f.doc_id, f.is_dup)
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(is_dup) AS BIGINT) AS n_dups,
           ROUND(CAST(SUM(is_dup) AS DOUBLE) / COUNT(*), 6) AS dup_rate
    FROM bucketed GROUP BY bucket
    """.replace("{stopwords}", ", ".join(f"'{s}'" for s in T.STOPWORDS)),
    "calibration curve of the q41 quality score against exact-duplicate "
    "membership: decile-bucket the score (distributed exact quantile "
    "boundaries, 6-dp-rounded strictly-greater bucketing — the proven "
    "q124/q196 pattern) and report the duplicate rate per bucket — the "
    "measurement that says whether 'low quality' actually predicts "
    "'duplicated boilerplate' before a filter threshold is set. "
    "Duplicate membership is the q67/q193 normalized-text hash-groupBy "
    "joined back at doc granularity; exact integer core, one final "
    "division per bucket",
    ("llm", "quality", "dedup", "evaluation"),
)
def q209(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fluvii_spark.operators.ranking import grouped_exact_quantiles

    t = load_tables(spark, sf_dir)
    scored = t.documents.select(
        "doc_id",
        F.lower(
            F.trim(F.regexp_replace("text", r"\s+", " "))
        ).alias("norm"),
        F.round(T.quality_score("text"), 6).alias("s"),
    ).localCheckpoint(eager=False)
    dupc = scored.groupBy("norm").agg(F.count("*").alias("c"))
    flagged = scored.join(dupc, "norm").select(
        "doc_id",
        "s",
        F.when(F.col("c") > 1, 1).otherwise(0).alias("is_dup"),
    )
    # include_empty_groups=False: one constant group over never-NULL
    # 6-dp-rounded scores — the universe pass would re-run the dupc join
    # just to emit the constant the ranking path already carries.
    # Quantile input is scored, not flagged: the dupc join is 1:1 on
    # scored's rows (per-norm count attached many-to-one), so the s
    # multiset is identical and the quantile branch skips re-running the
    # dup-count groupBy + join on the checkpointed corpus.
    bounds = grouped_exact_quantiles(
        scored.select("s").withColumn("g", F.lit(1)),
        ["g"],
        "s",
        _CAL_PS,
        include_empty_groups=False,
    ).select(F.col("quantile").alias("b"))
    bucketed = (
        flagged.crossJoin(F.broadcast(bounds))
        .groupBy("doc_id", "is_dup")
        .agg(
            (
                1
                + F.count(
                    F.when(F.col("s") > F.round(F.col("b"), 6), 1)
                )
            ).alias("bucket")
        )
    )
    return bucketed.groupBy("bucket").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("is_dup").cast("bigint").alias("n_dups"),
        F.round(
            F.sum("is_dup").cast("double") / F.count("*"), 6
        ).alias("dup_rate"),
    ).select(
        F.col("bucket").cast("bigint").alias("bucket"),
        "n_docs",
        "n_dups",
        "dup_rate",
    )


_KM_K = 4
# seed CTE matching operators/clustering.lloyd_kmeans EXACTLY: the k
# smallest vec_ids that actually have embedding elements, relabeled to
# dense cluster ids 0..k-1 — `WHERE vec_id < k` would diverge from the
# operator whenever ids aren't dense from 0 (a missing/NULL-embedding
# seed id changes both the seed set and the labels)
_KM_SEED_SQL = """
    seeds AS (
      SELECT vec_id, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS c_id
      FROM (SELECT DISTINCT vec_id FROM comp)
      ORDER BY vec_id LIMIT {k}),
    c0 AS (SELECT s.c_id, e.dim, e.x AS c
           FROM comp e JOIN seeds s USING (vec_id))"""
_KM_ASSIGN_CACHE: dict[tuple, DataFrame] = {}
_KM_LOCK = threading.Lock()


def _kmeans_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared, persisted (vec_id, cluster, sqdist) k-means assignment —
    q211 and q212 aggregate the same relation instead of each re-running
    the 2 Lloyd updates (2 bounded collects + 3 corpus assignments). Same
    per-(session, dataset) memo contract as queries.llm / the ext8 graph
    relations."""
    from fluvii_spark.operators.clustering import lloyd_kmeans
    from fluvii_spark.queries.llm import _memo_key, _memo_swap

    key = _memo_key(spark, sf_dir)
    with _KM_LOCK:
        cached = _KM_ASSIGN_CACHE.get(key)
        if cached is not None:
            return cached
        t = load_tables(spark, sf_dir)
        emb = t.embeddings.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        ).filter(
            # oracle's unnest drops BOTH NULL and zero-element embeddings
            # (no comp rows) — mirror both so a non-null empty array can't
            # enter the seed set / assignment here while the oracle skips it
            F.col("v").isNotNull() & (F.size("v") > 0)
        )
        a = (
            lloyd_kmeans(emb, id_col="vec_id", vec_col="v", k=_KM_K, iters=2)
            .select("vec_id", "cluster", "sqdist")
            .persist()
        )
        return _memo_swap(_KM_ASSIGN_CACHE, key, a)


_KM_ITER_SQL = """
    d{i} AS (
      SELECT e.vec_id, c.c_id,
             ROUND(SUM((e.x - c.c) * (e.x - c.c)), 6) AS d
      FROM comp e JOIN c{j} c ON c.dim = e.dim
      GROUP BY 1, 2),
    a{i} AS (
      SELECT vec_id, c_id, d FROM (
        SELECT vec_id, c_id, d,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY d, c_id) AS rn
        FROM d{i}) WHERE rn = 1),
    c{i} AS (
      SELECT a.c_id, e.dim, ROUND(AVG(e.x), 6) AS c
      FROM comp e JOIN a{i} a USING (vec_id)
      GROUP BY 1, 2)"""


@register(
    "q211_kmeans_embeddings",
    f"""
    WITH comp AS (
      SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings),
    {_KM_SEED_SQL.format(k=_KM_K)},
    {_KM_ITER_SQL.format(i=1, j=0)},
    {_KM_ITER_SQL.format(i=2, j=1)},
    d3 AS (
      SELECT e.vec_id, c.c_id,
             ROUND(SUM((e.x - c.c) * (e.x - c.c)), 6) AS d
      FROM comp e JOIN c2 c ON c.dim = e.dim
      GROUP BY 1, 2),
    a3 AS (
      SELECT vec_id, c_id, d FROM (
        SELECT vec_id, c_id, d,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY d, c_id) AS rn
        FROM d3) WHERE rn = 1)
    SELECT CAST(c_id AS BIGINT) AS cluster,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           ROUND(AVG(d), 6) AS avg_sqdist
    FROM a3 GROUP BY 1
    """,
    "distributed Lloyd k-means (k=4, 2 centroid updates + final "
    "assignment) over the embedding corpus — the clustering stage of "
    "semantic curation (SemDeDup cluster pools, topic balancing, "
    "diversity sampling). Spark-first scale shape: centroids live as "
    "k x dims literal arrays in the closed-form assignment expression "
    "(zip_with/aggregate squared-L2, pure codegen, ZERO shuffle per "
    "assignment — the blessed bounded driver transfer, as q57's IVF "
    "centroids), and centroid updates posexplode to (cluster, dim) "
    "partial means that contract to k*dims rows per task via map-side "
    "combine. Determinism: seeds are the k smallest vec_ids with "
    "embedding elements, relabeled 0..k-1 (exact float->double "
    "widening), every centroid dim and every distance is 6-dp-rounded "
    "before any cross-engine comparison, assignment breaks distance "
    "ties on cluster id (least-struct = the oracle's ROW_NUMBER), so "
    "both engines iterate on IDENTICAL numbers; a cluster that empties "
    "drops out of both engines' next iteration alike",
    ("llm", "similarity", "clustering", "iterative"),
)
def q211(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = _kmeans_assignment(spark, sf_dir)
    return (
        a.groupBy("cluster")
        .agg(
            F.count("*").cast("bigint").alias("n_members"),
            F.round(F.avg("sqdist"), 6).alias("avg_sqdist"),
        )
        .select(
            F.col("cluster").cast("bigint").alias("cluster"),
            "n_members",
            "avg_sqdist",
        )
    )


_KM_CAP = 8


@register(
    "q212_cluster_balanced_sample",
    f"""
    WITH comp AS (
      SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings),
    {_KM_SEED_SQL.format(k=_KM_K)},
    {_KM_ITER_SQL.format(i=1, j=0)},
    {_KM_ITER_SQL.format(i=2, j=1)},
    d3 AS (
      SELECT e.vec_id, c.c_id,
             ROUND(SUM((e.x - c.c) * (e.x - c.c)), 6) AS d
      FROM comp e JOIN c2 c ON c.dim = e.dim
      GROUP BY 1, 2),
    a3 AS (
      SELECT vec_id, c_id FROM (
        SELECT vec_id, c_id,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY d, c_id) AS rn
        FROM d3) WHERE rn = 1)
    SELECT CAST(c_id AS BIGINT) AS cluster,
           CAST(rk AS BIGINT) AS rank,
           CAST(vec_id AS BIGINT) AS vec_id
    FROM (
      SELECT c_id, vec_id,
             ROW_NUMBER() OVER (
               PARTITION BY c_id
               ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rk
      FROM a3)
    WHERE rk <= {_KM_CAP}
    """,
    "cluster-balanced diversity sample: run the q211 k-means assignment, "
    "then keep {cap} deterministic representatives per semantic cluster "
    "(md5-hex order over vec_id — the FIXTURES md5-not-rand convention, "
    "vec_id tie-break) — the representative-selection stage of semantic "
    "curation (a SemDeDup-style pool draw that caps every topic's share "
    "instead of letting the biggest cluster dominate). Composes the "
    "operators: lloyd_kmeans assignment (zero-shuffle, codegen) into a "
    "per-cluster window over k bounded groups; at corpus scale the "
    "window input is the assignment relation contracted to (cluster, "
    "hash, id) and k is small, so the per-cluster top-N is a TakeOrdered "
    "shape, not a corpus sort".replace("{cap}", str(_KM_CAP)),
    ("llm", "sampling", "clustering"),
)
def q212(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = _kmeans_assignment(spark, sf_dir).select("vec_id", "cluster")
    w = Window.partitionBy("cluster").orderBy(
        F.md5(F.col("vec_id").cast("string")), "vec_id"
    )
    return (
        a.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _KM_CAP)
        .select(
            F.col("cluster").cast("bigint").alias("cluster"),
            F.col("rank").cast("bigint").alias("rank"),
            F.col("vec_id").cast("bigint").alias("vec_id"),
        )
    )
