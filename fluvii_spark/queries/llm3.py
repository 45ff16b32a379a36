"""Training-data-pipeline inventory, part 3 (q134+): edit-distance near-dup,
embedding quantization, vocabulary analytics (OOV, cross-lingual overlap,
co-occurrence lift, heavy hitters), bag-of-words dedup, and centroid
cohesion — the corpus-health and feature-engineering passes a 100 TB text /
embedding store runs before training.

No counterpart in the reference (SURVEY.md §2.2 "LLM-data ops"). Like
:mod:`fluvii_spark.queries.llm`, every Spark plan stays in
`pyspark.sql.functions` (JVM-side, codegen-able) and every oracle replays
the identical deterministic arithmetic in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fluvii_spark.io.readers import load_tables
from fluvii_spark.operators import dedup as D
from fluvii_spark.queries import register

_LEV_PREFIX = 64  # compare 64-char prefixes: O(64^2) per pair, scale-safe
_LEV_MAX = 8
_LEN_BAND = 32  # candidate pairs must be within 32 chars of each other


@register(
    "q134_edit_distance_pairs",
    f"""
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(levenshtein(substr(a.text, 1, {_LEV_PREFIX}),
                            substr(b.text, 1, {_LEV_PREFIX})) AS BIGINT)
             AS dist
    FROM documents a JOIN documents b
      ON a.lang = b.lang AND a.doc_id < b.doc_id
     AND abs(a.n_chars - b.n_chars) <= {_LEN_BAND}
    WHERE levenshtein(substr(a.text, 1, {_LEV_PREFIX}),
                      substr(b.text, 1, {_LEV_PREFIX})) <= {_LEV_MAX}
    """,
    f"edit-distance near-dup pairs (same lang, length within {_LEN_BAND} "
    f"chars, Levenshtein <= {_LEV_MAX} on {_LEV_PREFIX}-char prefixes): "
    "the oracle does the quadratic per-lang join; the Spark plan length-"
    "BANDS candidates (floor(n_chars/32), each left row probes bands "
    "-1/0/+1 — lossless for the 32-char gate) so the equi-join, not a "
    "theta join, bounds the O(len^2) distance computations",
    ("llm", "dedup", "similarity"),
)
def q134(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fluvii_spark.operators.stats import fan_out_scan

    t = load_tables(spark, sf_dir)
    # shuffle only the 64-char comparison prefix, never the full document.
    # fan_out_scan: the banded edit-distance comparisons are map-heavy;
    # an under-partitioned scan serialized them (1.52 s -> 0.42 s solo at
    # sf0.1; no-op at cluster scale)
    docs = fan_out_scan(t.documents).select(
        "doc_id",
        "lang",
        "n_chars",
        F.substring("text", 1, _LEV_PREFIX).alias("prefix"),
    )
    band = (F.col("n_chars") / _LEN_BAND).cast("bigint")
    left = docs.withColumn(
        "bkey", F.explode(F.array(band - 1, band, band + 1))
    )
    right = (
        docs.withColumn("bkey", band)
        .withColumnRenamed("doc_id", "doc_id_b")
        .withColumnRenamed("n_chars", "n_chars_b")
        .withColumnRenamed("prefix", "prefix_b")
    )
    pairs = left.join(right, ["lang", "bkey"]).filter(
        (F.col("doc_id") < F.col("doc_id_b"))
        & (
            F.abs(F.col("n_chars") - F.col("n_chars_b")) <= _LEN_BAND
        )
    )
    # thresholded Levenshtein: the DP abandons a pair as soon as the band
    # exceeds _LEV_MAX (returns -1), so distant candidates cost O(len*k),
    # not O(len^2) — identical accept set to the oracle's plain distance
    dist = F.levenshtein(F.col("prefix"), F.col("prefix_b"), _LEV_MAX)
    return (
        pairs.withColumn("dist", dist.cast("bigint"))
        .filter((F.col("dist") >= 0) & (F.col("dist") <= _LEV_MAX))
        .select(
            F.col("doc_id").alias("id_a"),
            F.col("doc_id_b").alias("id_b"),
            "dist",
        )
    )


@register(
    "q135_int8_quantization",
    """
    WITH comp AS (
      SELECT vec_id, label,
             generate_subscripts(embedding, 1) - 1 AS dim,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings
    ),
    mx AS (
      SELECT vec_id, 127.0 / MAX(abs(x)) AS scale FROM comp GROUP BY vec_id
      HAVING MAX(abs(x)) > 0
    ),
    q AS (
      SELECT c.vec_id, c.label, c.x, m.scale,
             greatest(-127, least(127, floor(c.x * m.scale + 0.5))) AS qv
      FROM comp c JOIN mx m ON c.vec_id = m.vec_id
    ),
    pe AS (
      SELECT vec_id, label,
             SUM((x - qv/scale) * (x - qv/scale)) AS err2,
             COUNT(*) AS nd
      FROM q GROUP BY vec_id, label
    )
    SELECT label, COUNT(*) AS n_vecs,
           ROUND(AVG(err2 / nd) * 1000000, 6) AS avg_mse_1e6
    FROM pe GROUP BY label
    """,
    "int8 scalar quantization of the embedding column (per-vector "
    "absmax scale, symmetric round-half-up via floor(x*s+0.5), clamp to "
    "[-127,127]) with exact reconstruction-MSE accounting per label — the "
    "compression / recall-budget trade every vector store makes. Pure "
    "explode + hash aggregates; both engines run the identical IEEE "
    "expression tree so the oracle checks the quantizer itself. All-zero "
    "vectors are excluded identically on both sides (HAVING max_abs > 0): "
    "their scale is 127/0, where Spark's non-ANSI division yields NULL but "
    "DuckDB's IEEE float division yields inf — the engines would diverge",
    ("llm", "similarity", "multimodal"),
)
def q135(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    comp = t.embeddings.select(
        "vec_id",
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "dim", "x"
        ),
    )
    mx = (
        comp.groupBy("vec_id")
        .agg(F.max(F.abs("x")).alias("max_abs"))
        .filter(F.col("max_abs") > 0)  # drop all-zero vectors (see oracle)
        .select("vec_id", (F.lit(127.0) / F.col("max_abs")).alias("scale"))
    )
    q = comp.join(mx, "vec_id").withColumn(
        "qv",
        F.greatest(
            F.lit(-127.0),
            F.least(F.lit(127.0), F.floor(F.col("x") * F.col("scale") + 0.5)),
        ),
    )
    err = F.col("x") - F.col("qv") / F.col("scale")
    pe = q.groupBy("vec_id", "label").agg(
        F.sum(err * err).alias("err2"), F.count("*").alias("nd")
    )
    return pe.groupBy("label").agg(
        F.count("*").alias("n_vecs"),
        F.round(F.avg(F.col("err2") / F.col("nd")) * 1000000, 6).alias(
            "avg_mse_1e6"
        ),
    )


_VOCAB_TOP = 40


@register(
    "q136_oov_rate",
    f"""
    WITH toks AS (
      SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    vocab AS (
      SELECT tok FROM (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok)
      ORDER BY c DESC, tok LIMIT {_VOCAB_TOP}
    )
    SELECT lang, COUNT(*) AS total_toks,
           CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS oov_toks,
           ROUND(CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS oov_rate
    FROM toks LEFT JOIN vocab v USING (tok)
    GROUP BY lang
    """,
    f"tokenizer-vocabulary coverage: build the top-{_VOCAB_TOP} corpus "
    "vocabulary (deterministic count-then-token order), broadcast it, and "
    "measure the out-of-vocabulary token share per language — the "
    "coverage check run before committing to a tokenizer. Two hash aggs + "
    "one broadcast join; the token stream is never shuffled by token "
    "twice",
    ("llm", "text"),
)
def q136(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    toks = t.documents.select(
        "lang", F.explode(F.split("text", " ")).alias("tok")
    )
    vocab = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), "tok")
        .limit(_VOCAB_TOP)
        .select("tok", F.lit(1).alias("in_vocab"))
    )
    joined = toks.join(F.broadcast(vocab), "tok", "left")
    oov = F.when(F.col("in_vocab").isNull(), 1).otherwise(0)
    return joined.groupBy("lang").agg(
        F.count("*").alias("total_toks"),
        F.sum(oov).cast("bigint").alias("oov_toks"),
        F.round(F.sum(oov).cast("double") / F.count("*"), 6).alias(
            "oov_rate"
        ),
    )


@register(
    "q137_lang_vocab_jaccard",
    """
    WITH lt AS (
      SELECT DISTINCT lang, tok FROM (
        SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents
      )
    ),
    sz AS (SELECT lang, COUNT(*) AS n FROM lt GROUP BY lang),
    inter AS (
      SELECT a.lang AS lang_a, b.lang AS lang_b, COUNT(*) AS n_common
      FROM lt a JOIN lt b ON a.tok = b.tok AND a.lang < b.lang
      GROUP BY 1, 2
    )
    SELECT lang_a, lang_b, CAST(n_common AS BIGINT) AS n_common,
           ROUND(CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common), 6)
             AS jaccard
    FROM inter
    JOIN sz sa ON sa.lang = lang_a
    JOIN sz sb ON sb.lang = lang_b
    """,
    "cross-lingual vocabulary overlap: distinct (lang, token) relation "
    "(set semantics via one dropDuplicates shuffle), token-keyed self-join "
    "for intersections, Jaccard against broadcast per-lang sizes. The "
    "self-join fans out per shared token — bounded by vocabulary size, "
    "not corpus size, so it holds at 100 TB of text",
    ("llm", "text", "dedup"),
)
def q137(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    # (lang, tok) vocabulary checkpointed once — it had three consumers
    # (sizes + both self-join sides), each re-running the corpus explode
    # + dedup shuffle (4 documents scans in the before-plan)
    lt = (
        t.documents.select(
            "lang", F.explode(F.split("text", " ")).alias("tok")
        )
        .dropDuplicates(["lang", "tok"])
        .localCheckpoint(eager=False)
    )
    sz = lt.groupBy("lang").agg(F.count("*").alias("n"))
    # intersection via the self-join OVER THE CHECKPOINT — measured-best
    # interleaved (orig {1.00,0.85,0.80} / checkpoint+self-join
    # {0.84,0.64,0.55} / checkpoint+per-token-set-contraction
    # {0.77,0.73,0.76} s solo; the contraction also read consistently
    # ~1.4× normalized under the concurrent bench). The contraction's
    # single-shuffle form wins the shuffle count at true vocab scale —
    # revisit in optimization round 2 on the grown corpus.
    a = lt.withColumnRenamed("lang", "lang_a")
    b = lt.withColumnRenamed("lang", "lang_b")
    inter = (
        a.join(b, "tok")
        .filter(F.col("lang_a") < F.col("lang_b"))
        .groupBy("lang_a", "lang_b")
        .agg(F.count("*").alias("n_common"))
    )
    sa = F.broadcast(sz.withColumnRenamed("lang", "lang_a").withColumnRenamed("n", "na"))
    sb = F.broadcast(sz.withColumnRenamed("lang", "lang_b").withColumnRenamed("n", "nb"))
    return (
        inter.join(sa, "lang_a")
        .join(sb, "lang_b")
        .select(
            "lang_a",
            "lang_b",
            F.col("n_common").cast("bigint").alias("n_common"),
            F.round(
                F.col("n_common").cast("double")
                / (F.col("na") + F.col("nb") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
    )


@register(
    "q138_doc_gini_diversity",
    """
    WITH tc AS (
      SELECT doc_id, tok, COUNT(*) AS c
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents)
      GROUP BY doc_id, tok
    )
    SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_toks,
           COUNT(*) AS n_types,
           ROUND(1.0 - CAST(SUM(c*c) AS DOUBLE)
                 / (CAST(SUM(c) AS DOUBLE) * CAST(SUM(c) AS DOUBLE)), 6)
             AS gini,
           ROUND(CAST(COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE), 6)
             AS ttr
    FROM tc GROUP BY doc_id
    """,
    "lexical-diversity quality signals per document: Gini impurity "
    "1 - sum(p_i^2) computed from INTEGER count-of-squares (exact "
    "rational — no libm log-entropy, no float accumulation ambiguity) "
    "plus type-token ratio. Two chained hash aggregates over one token "
    "explode; a low-diversity gate for template/spam docs at corpus scale",
    ("llm", "text", "quality"),
)
def q138(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    tc = (
        t.documents.select(
            "doc_id", F.explode(F.split("text", " ")).alias("tok")
        )
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
    )
    n = F.sum("c").cast("double")
    return tc.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_toks"),
        F.count("*").alias("n_types"),
        F.round(
            F.lit(1.0) - F.sum(F.col("c") * F.col("c")).cast("double") / (n * n),
            6,
        ).alias("gini"),
        F.round(F.count("*").cast("double") / n, 6).alias("ttr"),
    )


@register(
    "q139_bow_fingerprint_dedup",
    """
    WITH fp AS (
      SELECT doc_id,
             md5(array_to_string(list_sort(list_distinct(
               string_split(text, ' '))), ' ')) AS bow_md5
      FROM documents
    )
    SELECT bow_md5, COUNT(*) AS n_docs, MIN(doc_id) AS keep_id
    FROM fp GROUP BY bow_md5 HAVING COUNT(*) > 1
    """,
    "vocabulary-fingerprint dedup: md5 over the SORTED DISTINCT token set "
    "catches word-reordered / repetition-padded near-copies that exact "
    "content dedup (q33) misses, at exact-dedup cost — one in-row "
    "array_distinct+sort_array (no extra shuffle) + one content-hash "
    "groupBy. The keep-min-id contract matches the dedup family",
    ("llm", "dedup"),
)
def q139(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    fp = t.documents.select(
        "doc_id",
        F.md5(
            F.array_join(
                F.sort_array(F.array_distinct(F.split("text", " "))), " "
            )
        ).alias("bow_md5"),
    )
    return (
        fp.groupBy("bow_md5")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("keep_id"))
        .filter(F.col("n_docs") > 1)
    )


@register(
    "q140_label_centroid_cosine",
    """
    WITH comp AS (
      SELECT vec_id, label,
             generate_subscripts(embedding, 1) - 1 AS dim,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings
    ),
    cent AS (
      SELECT label, dim, SUM(x) / COUNT(*) AS c FROM comp GROUP BY label, dim
    ),
    dots AS (
      SELECT comp.vec_id, comp.label,
             SUM(x * c) AS dot, SUM(x * x) AS nx, SUM(c * c) AS nc
      FROM comp JOIN cent
        ON comp.label = cent.label AND comp.dim = cent.dim
      GROUP BY comp.vec_id, comp.label
    )
    SELECT label, COUNT(*) AS n_vecs,
           ROUND(AVG(dot / (sqrt(nx) * sqrt(nc))), 6) AS avg_cos
    FROM dots GROUP BY label
    """,
    "cluster-cohesion report: per-label centroid (the k-means E-step as a "
    "hash aggregate over exploded components — vectors are never "
    "collected) joined back for the mean member-to-centroid cosine. "
    "sqrt is IEEE-correctly-rounded so both engines agree bit-for-bit; "
    "the label x dim centroid relation broadcasts at any corpus size",
    ("llm", "similarity"),
)
def q140(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    comp = t.embeddings.select(
        "vec_id",
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "dim", "x"
        ),
    )
    cent = comp.groupBy("label", "dim").agg(
        (F.sum("x") / F.count("*")).alias("c")
    )
    dots = (
        comp.join(F.broadcast(cent), ["label", "dim"])
        .groupBy("vec_id", "label")
        .agg(
            F.sum(F.col("x") * F.col("c")).alias("dot"),
            F.sum(F.col("x") * F.col("x")).alias("nx"),
            F.sum(F.col("c") * F.col("c")).alias("nc"),
        )
    )
    return dots.groupBy("label").agg(
        F.count("*").alias("n_vecs"),
        F.round(
            F.avg(
                # try_divide: NULL on a zero norm, exactly the oracle's
                # x/0.0 DOUBLE semantics (AVG skips NULL both engines) —
                # a plain division ABORTS under ANSI on one zero vector
                F.try_divide(
                    F.col("dot"),
                    F.sqrt(F.col("nx")) * F.sqrt(F.col("nc")),
                )
            ),
            6,
        ).alias("avg_cos"),
    )


@register(
    "q141_shingle_uniqueness",
    """
    WITH toks AS (
      SELECT doc_id, source, unnest(string_split(text, ' ')) AS tok,
             generate_subscripts(string_split(text, ' '), 1) AS pos
      FROM documents
    ),
    sh AS (
      SELECT a.source, a.tok || ' ' || b.tok || ' ' || c.tok AS shingle
      FROM toks a
      JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
      JOIN toks c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
    )
    SELECT source, COUNT(*) AS n_shingles,
           CAST(COUNT(DISTINCT shingle) AS BIGINT) AS n_distinct,
           ROUND(CAST(COUNT(DISTINCT shingle) AS DOUBLE) / COUNT(*), 6)
             AS uniq_ratio
    FROM sh GROUP BY source
    """,
    "corpus-health shingle profile per source: total vs distinct word "
    "3-grams and their ratio — a crashed crawler or template farm shows "
    "up as a low-uniqueness source before any pairwise dedup runs. "
    "Shingles come from the shared in-row transform/slice operator "
    "(operators/dedup.py word_shingles, non-distinct mode), distinct "
    "counting is one two-phase agg",
    ("llm", "text", "dedup", "quality"),
)
def q141(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    # key the shingle op on `source` directly: q141 never needs doc_id, so
    # the (source, shingle) multiset falls out of one scan with ZERO joins
    # (a doc_id-keyed shingle frame joined back to a broadcast dim would
    # cliff at billions of docs)
    from fluvii_spark.operators.stats import fan_out_scan

    # fan_out: parallel shingling on a single-partition scan
    # (0.80 s -> 0.67 s solo at sf0.1; no-op at cluster scale)
    sh = D.word_shingles(
        fan_out_scan(t.documents),
        id_col="source",
        text_col="text",
        n=3,
        distinct=False,
    )
    return sh.groupBy("source").agg(
        F.count("*").alias("n_shingles"),
        F.count_distinct("shingle").cast("bigint").alias("n_distinct"),
        F.round(
            F.count_distinct("shingle").cast("double") / F.count("*"), 6
        ).alias("uniq_ratio"),
    )


@register(
    "q142_heavy_hitters",
    """
    WITH toks AS (
      SELECT unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    tc AS (SELECT tok, COUNT(*) AS n FROM toks GROUP BY tok),
    tot AS (SELECT SUM(n) AS t FROM tc)
    SELECT tok, CAST(n AS BIGINT) AS n,
           ROUND(CAST(n AS DOUBLE) / CAST(t AS DOUBLE), 6) AS share
    FROM tc, tot
    WHERE 1000 * n > 11 * t
    """,
    "corpus heavy hitters: tokens above 1.1% frequency support — the "
    "candidate stopword / boilerplate report. Map-side-combined token "
    "counts, broadcast 1-row total, and an INTEGER support predicate "
    "(1000n > 11t) so the threshold can't float-flip between engines; "
    "the full-table pass is one partial-agg shuffle",
    ("llm", "text"),
)
def q142(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    tc = (
        t.documents.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("n"))
    )
    tot = tc.agg(F.sum("n").alias("t"))
    return (
        tc.crossJoin(F.broadcast(tot))
        .filter(F.lit(1000) * F.col("n") > F.lit(11) * F.col("t"))
        .select(
            "tok",
            F.col("n").cast("bigint").alias("n"),
            F.round(F.col("n").cast("double") / F.col("t").cast("double"), 6)
            .alias("share"),
        )
    )


_LIFT_VOCAB = 30
_LIFT_MIN_CO = 10
_LIFT_TOPK = 25


@register(
    "q143_token_lift_pairs",
    f"""
    WITH toks AS (
      SELECT DISTINCT doc_id, tok FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
      )
    ),
    vocab AS (
      SELECT tok FROM (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok)
      ORDER BY c DESC, tok LIMIT {_LIFT_VOCAB}
    ),
    vt AS (
      SELECT doc_id, tok FROM toks WHERE tok IN (SELECT tok FROM vocab)
    ),
    df AS (SELECT tok, COUNT(*) AS c FROM vt GROUP BY tok),
    nd AS (SELECT COUNT(*) AS n FROM documents),
    pairs AS (
      SELECT a.tok AS tok_a, b.tok AS tok_b, COUNT(*) AS c_ab
      FROM vt a JOIN vt b ON a.doc_id = b.doc_id AND a.tok < b.tok
      GROUP BY 1, 2
    )
    SELECT tok_a, tok_b, CAST(c_ab AS BIGINT) AS c_ab,
           ROUND(CAST(n AS DOUBLE) * c_ab / (ca.c * cb.c), 6) AS lift
    FROM pairs
    JOIN df ca ON ca.tok = tok_a
    JOIN df cb ON cb.tok = tok_b, nd
    WHERE c_ab >= {_LIFT_MIN_CO}
    ORDER BY lift DESC, tok_a, tok_b
    LIMIT {_LIFT_TOPK}
    """,
    f"token co-occurrence lift (PMI's rational cousin — no libm log): "
    f"document-frequency-cut to the top-{_LIFT_VOCAB} vocabulary "
    "(broadcast semi-join) BEFORE pairing, so per-doc pair fan-out is "
    f"bounded by C({_LIFT_VOCAB},2) regardless of corpus size; lift = "
    "N*c_ab/(c_a*c_b) over broadcast marginals, deterministic top-"
    f"{_LIFT_TOPK} on the rounded value with full tie-breaks",
    ("llm", "text"),
)
def q143(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    toks = (
        t.documents.select(
            "doc_id", F.explode(F.split("text", " ")).alias("tok")
        )
        .dropDuplicates(["doc_id", "tok"])
        # four consumers (vocab, df marginals, both self-join sides) —
        # checkpoint once so the corpus explode + distinct shuffle never
        # re-executes per branch (q120's elems pattern)
        .localCheckpoint(eager=False)
    )
    vocab = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), "tok")
        .limit(_LIFT_VOCAB)
        .select("tok")
    )
    vt = toks.join(F.broadcast(vocab), "tok", "leftsemi")
    df_ = vt.groupBy("tok").agg(F.count("*").alias("c"))
    nd = t.documents.agg(F.count("*").alias("n"))
    a = vt.withColumnRenamed("tok", "tok_a")
    b = vt.withColumnRenamed("tok", "tok_b")
    pairs = (
        a.join(b, "doc_id")
        .filter(F.col("tok_a") < F.col("tok_b"))
        .groupBy("tok_a", "tok_b")
        .agg(F.count("*").alias("c_ab"))
        .filter(F.col("c_ab") >= _LIFT_MIN_CO)
    )
    ca = F.broadcast(df_.select(F.col("tok").alias("tok_a"), F.col("c").alias("ca")))
    cb = F.broadcast(df_.select(F.col("tok").alias("tok_b"), F.col("c").alias("cb")))
    out = (
        pairs.join(ca, "tok_a")
        .join(cb, "tok_b")
        .crossJoin(F.broadcast(nd))
        .select(
            "tok_a",
            "tok_b",
            F.col("c_ab").cast("bigint").alias("c_ab"),
            F.round(
                F.col("n").cast("double")
                * F.col("c_ab")
                / (F.col("ca") * F.col("cb")),
                6,
            ).alias("lift"),
        )
    )
    return out.orderBy(F.desc("lift"), "tok_a", "tok_b").limit(_LIFT_TOPK)


_KNN_K = 5
_PROBE_N = 64


@register(
    "q146_knn_classify",
    f"""
    WITH probes AS (
      SELECT vec_id AS qid, embedding AS qvec, label AS qlabel
      FROM embeddings
      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {_PROBE_N}
    ),
    scored AS (
      SELECT p.qid, p.qlabel, e.vec_id, e.label,
             round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                          CAST(p.qvec AS DOUBLE[])), 6)
               AS cos_r
      FROM embeddings e, probes p
      WHERE e.vec_id <> p.qid
    ),
    nn AS (
      SELECT qid, qlabel, label,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY cos_r DESC, vec_id) AS rn
      FROM scored
    ),
    votes AS (
      SELECT qid, qlabel, label, COUNT(*) AS c
      FROM nn WHERE rn <= {_KNN_K} GROUP BY 1, 2, 3
    ),
    pred AS (
      SELECT qid, qlabel, label AS pred_label,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY c DESC, label)
               AS pr
      FROM votes
    )
    SELECT qlabel AS label, COUNT(*) AS n_probes,
           CAST(SUM(CASE WHEN pred_label = qlabel THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct,
           ROUND(CAST(SUM(CASE WHEN pred_label = qlabel THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS accuracy
    FROM pred WHERE pr = 1 GROUP BY qlabel
    """,
    f"k-NN label-classifier evaluation (k={_KNN_K}): a FIXED-size "
    f"deterministic sample of {_PROBE_N} held-out probes (md5-hash order "
    "with a vec_id tie-break — the q149 pattern) classified by majority "
    "label of their "
    "cosine neighbors in ONE corpus scan (broadcast probe set + "
    "per-probe top-k window — q74's shape, now with a voting head). "
    "Cosines round to 6dp BEFORE ranking so the neighbor sets are "
    "engine-deterministic; the embedding-quality smoke test every "
    "vector pipeline wants. The probe count no longer scales with the "
    "corpus (the first form took every 25th vector, so probe x corpus "
    "work grew superlinearly under replication — stress exponent 0.854, "
    "VERDICT r6 ask #2); a fixed probe set makes the scan O(corpus)",
    ("llm", "similarity"),
)
def q146(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fluvii_spark.operators.similarity import dot_sql, norm_sql

    from fluvii_spark.operators.stats import fan_out_scan

    t = load_tables(spark, sf_dir)
    # hoist both norms out of the probe x candidate pair expression: each
    # vector's norm is computed once per row / once per probe, not once per
    # pair — same association as cosine_sql (dot / (norm_a * norm_b)), so
    # values are bit-identical, at 1/(|probes|) the sqrt-fold work.
    # fan_out_scan: the probe x corpus cosine folds are map-side; keep
    # them parallel on an under-partitioned scan (1.42 s -> 0.87 s solo)
    e = fan_out_scan(t.embeddings).withColumn(
        "n_e", F.expr(norm_sql("embedding"))
    )
    probes = (
        e.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(_PROBE_N)
        .select(
            F.col("vec_id").alias("qid"),
            F.col("embedding").alias("qvec"),
            F.col("label").alias("qlabel"),
            F.col("n_e").alias("n_q"),
        )
    )
    scored = (
        e.crossJoin(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "qlabel",
            "vec_id",
            "label",
            F.round(
                # list_cosine_similarity parity: -1.0 when a norm is zero
                # (oracle behavior; also sorts degenerate vectors last) —
                # plain division ABORTS under ANSI
                F.when(
                    F.col("n_e") * F.col("n_q") == 0.0, F.lit(-1.0)
                ).otherwise(
                    F.expr(dot_sql("embedding", "qvec"))
                    / (F.col("n_e") * F.col("n_q"))
                ),
                6,
            ).alias("cos_r"),
        )
    )
    w_nn = Window.partitionBy("qid").orderBy(F.desc("cos_r"), "vec_id")
    nn = scored.withColumn("rn", F.row_number().over(w_nn)).filter(
        F.col("rn") <= _KNN_K
    )
    votes = nn.groupBy("qid", "qlabel", "label").agg(
        F.count("*").alias("c")
    )
    w_pred = Window.partitionBy("qid").orderBy(F.desc("c"), "label")
    pred = (
        votes.withColumn("pr", F.row_number().over(w_pred))
        .filter(F.col("pr") == 1)
        .select("qid", "qlabel", F.col("label").alias("pred_label"))
    )
    correct = F.when(F.col("pred_label") == F.col("qlabel"), 1).otherwise(0)
    return pred.groupBy(F.col("qlabel").alias("label")).agg(
        F.count("*").alias("n_probes"),
        F.sum(correct).cast("bigint").alias("n_correct"),
        F.round(F.sum(correct).cast("double") / F.count("*"), 6).alias(
            "accuracy"
        ),
    )
