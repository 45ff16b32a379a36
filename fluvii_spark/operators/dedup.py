"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup.

No counterpart in the reference (fluvii has no relational/dedup operators —
SURVEY.md §2.2); this family is core LLM-data-pipeline surface designed for
100 TB:

- candidate generation is always a *bucketed equi-join* (shared shingle,
  LSH band, SimHash half) — never a crossJoin;
- all hashing is md5-derived (bit-identical in Spark / duckdb / Python) so
  results are oracle-checkable across engines;
- everything is built-in-function DataFrame code: one shuffle per groupBy /
  join stage, map-side partial aggregation throughout, zero Python UDFs.

Skew note: ultra-common shingles create hot join keys. ``max_doc_freq``
drops shingles whose document frequency exceeds a cap before the candidate
join (standard df-cut from the MinHash literature) — at 100 TB this is the
difference between a bounded shuffle and a quadratic blow-up. The
oracle-checked query variants keep ``max_doc_freq=None`` for exact parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 2^61 - 1 (Mersenne prime): (a*h + b) % P stays < 2^62, no int64 overflow
# for a,b < 2^29 and h < 2^32.
MINHASH_P = 2305843009213693951

# 16 fixed (a, b) permutation constants, a odd, generated once with
# random.Random(42).randrange(1 << 29) — hardcoded so Spark, duckdb oracle
# SQL and tests all share them.
MINHASH_PERMS: tuple[tuple[int, int], ...] = (
    (119540831, 26855092),
    (295310485, 262950628),
    (239670711, 149827706),
    (110053353, 93349856),
    (453035111, 34126396),
    (31994523, 100604502),
    (234760739, 249817734),
    (28492781, 213500298),
    (450455977, 236696312),
    (482334539, 298704996),
    (6977991, 171432881),
    (453778757, 365341213),
    (298362083, 166944844),
    (231191391, 361415646),
    (109747451, 99585092),
    (407943839, 103848421),
)

N_BANDS = 4
ROWS_PER_BAND = 4


def word_shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles, one row per (doc, shingle)."""
    toks = f"split({text_col}, ' ')"
    shingle_arr = (
        f"transform(sequence(0, size({toks}) - {n}),"
        f" i -> concat_ws(' ', slice({toks}, i + 1, {n})))"
    )
    return (
        df.select(id_col, F.explode(F.expr(shingle_arr)).alias("shingle"))
        .dropDuplicates([id_col, "shingle"])
    )


def exact_dedup(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """Keep the minimum-id row per duplicate group; returns
    (key-hash, keep_id, n_copies)."""
    return df.groupBy(*key_cols).agg(
        F.min(id_col).alias(f"keep_{id_col}"),
        F.count("*").alias("n_copies"),
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """All pairs with word-n-gram Jaccard ≥ threshold.

    Candidate generation: equi-join on shared shingle (docs with no common
    shingle can't clear any positive threshold) → intersection counts via
    groupBy → Jaccard from per-doc cardinalities. Three shuffles total, all
    key-partitioned.
    """
    sh = word_shingles(df, id_col, text_col, n)
    if max_doc_freq is not None:
        keep = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") <= max_doc_freq)
            .select("shingle")
        )
        sh = sh.join(keep, "shingle")
    card = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))

    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_common"))
    )
    return (
        inter.join(card.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a")), "id_a")
        .join(card.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b")), "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """(id, perm, minhash) — min over shingles of (a·h(s) + b) mod P.

    h(s) = first 8 md5 hex chars as int (cross-engine deterministic). The
    perm table is a broadcast literal; min-aggregation is map-side partial,
    so the only shuffle is the final groupBy(id, perm).
    """
    sh = word_shingles(df, id_col, text_col, n)
    perms = df.sparkSession.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(MINHASH_PERMS)], "perm INT, a LONG, b LONG"
    )
    h = F.conv(F.substring(F.md5("shingle"), 1, 8), 16, 10).cast("long")
    return (
        sh.withColumn("h", h)
        .crossJoin(F.broadcast(perms))
        .groupBy(id_col, "perm")
        .agg(F.min((F.col("a") * F.col("h") + F.col("b")) % MINHASH_P).alias("minhash"))
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash-LSH near-dup pairs, verified with exact Jaccard.

    Banding: 16 minhashes → 4 bands × 4 rows; candidates = pairs sharing at
    least one full band (equi-join on (band, band-signature) — the classic
    LSH bucket join). Candidates then verified against exact shingle Jaccard
    so the output is deterministic (bands only prune).
    """
    sig = minhash_signatures(df, id_col, text_col, n)
    bands = (
        sig.withColumn("band", (F.col("perm") / ROWS_PER_BAND).cast("int"))
        .groupBy(id_col, "band")
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_list(F.format_string("%d:%d", "perm", "minhash")))).alias(
                "band_sig"
            )
        )
    )
    a = bands.select(F.col(id_col).alias("id_a"), "band", "band_sig")
    b = bands.select(F.col(id_col).alias("id_b"), "band", "band_sig")
    cand = (
        a.join(b, ["band", "band_sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates()
    )
    exact = ngram_jaccard_pairs(df, id_col, text_col, n, threshold=0.0)
    return (
        cand.join(exact, ["id_a", "id_b"])
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 32,
) -> DataFrame:
    """(id, simhash): token-frequency-weighted bit votes over md5 hashes.

    Plan shape: tokenize → groupBy(id, token) counts → broadcast-join the
    0..bits-1 index table → per-(id, bit) vote sum → per-id bit assembly.
    Two key-partitioned shuffles, no UDFs.
    """
    spark = df.sparkSession
    tok_counts = (
        df.select(F.col(id_col), F.explode(F.split(text_col, " ")).alias("tok"))
        .groupBy(id_col, "tok")
        .agg(F.count("*").alias("cnt"))
        .withColumn(
            "h", F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long")
        )
    )
    bit_idx = spark.range(bits).select(F.col("id").cast("int").alias("j"))
    votes = (
        tok_counts.crossJoin(F.broadcast(bit_idx))
        .withColumn(
            "dir",
            F.when(F.expr("shiftright(h, j) & 1") == 1, F.lit(1)).otherwise(F.lit(-1)),
        )
        .groupBy(id_col, "j")
        .agg(F.sum(F.col("cnt") * F.col("dir")).alias("vote"))
    )
    return votes.groupBy(id_col).agg(
        F.sum(
            F.when(F.col("vote") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), j)")).otherwise(
                F.lit(0)
            )
        ).alias("simhash")
    )


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 6,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ max_hamming.

    Candidates: pigeonhole on 16-bit halves — any pair within Hamming 6 of a
    32-bit hash agrees on at least one half only when distance ≤ ... (the
    guarantee needs distance < 2·halves; with 2 halves it prunes exactly the
    pairs differing in both halves). This mirrors production SimHash tables
    (Manku et al., WWW'07: split into d+1 blocks for distance d); the
    block count is a knob — halves keep the oracle SQL tractable here.
    """
    hs = simhash(df, id_col, text_col)
    a = hs.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"))
    b = hs.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"))
    hi = a.withColumn("k", F.expr("shiftright(sh_a, 16)")).join(
        b.withColumn("k", F.expr("shiftright(sh_b, 16)")), "k"
    )
    lo = a.withColumn("k", F.expr("sh_a & 65535")).join(
        b.withColumn("k", F.expr("sh_b & 65535")), "k"
    )
    cand = (
        hi.select("id_a", "id_b", "sh_a", "sh_b")
        .unionByName(lo.select("id_a", "id_b", "sh_a", "sh_b"))
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.withColumn("hamming", F.expr("bit_count(sh_a ^ sh_b)"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
) -> DataFrame:
    """Pairs with cosine similarity ≥ threshold.

    Exact all-pairs form (the oracle-checked query). At 100 TB the candidate
    join is replaced by the hyperplane-LSH buckets in operators.similarity
    (same cosine verification, bucket-join candidates).
    """
    from fluvii_spark.operators.similarity import cosine_sql

    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", F.expr(cosine_sql("va", "vb")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
