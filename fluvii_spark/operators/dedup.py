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

import pandas as pd  # module-level so pandas_udf type hints resolve
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fluvii_spark.operators.stats import release_local_checkpoint

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


def word_shingles(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    distinct: bool = True,
    distinct_in_row: bool = False,
) -> DataFrame:
    """Word n-gram shingles, one row per (doc, shingle).

    ``distinct=True`` (set semantics — what Jaccard needs) costs a
    key-partitioned shuffle — and that dropDuplicates exchange is ALSO the
    plan's reuse point when several consumers read the shingles, so
    multi-consumer callers that do NOT materialize the result should keep
    it (the q34/q106 pair-stats plan; see the measured note in
    :func:`ngram_jaccard_pairs`). ``distinct_in_row=True`` instead dedups
    with ``array_distinct`` BEFORE the explode — same rows (every
    (doc, shingle) duplicate originates in one source row), zero shuffle —
    for callers that checkpoint the result once themselves
    (:func:`prefix_filter_jaccard_pairs`, q218's char sibling).

    The token array is materialized in a child projection before the
    transform/slice lambda: inlining ``split()`` into the lambda makes
    Catalyst re-split the text once per shingle position (O(words²) splits
    per document — measured 3× slower at sf0.1).
    """
    # guard: sequence(0, negative) counts DOWN, handing slice() a start of 0
    # (error) — a doc shorter than n tokens must yield zero shingles, which
    # is also what the duckdb oracle's positional self-join produces
    gen = (
        f"transform(sequence(0, size(toks) - {n}),"
        f" i -> concat_ws(' ', slice(toks, i + 1, {n})))"
    )
    if distinct and distinct_in_row:
        gen = f"array_distinct({gen})"
    shingle_arr = (
        f"CASE WHEN size(toks) >= {n} THEN {gen} ELSE array() END"
    )
    out = df.select(
        id_col, F.split(F.col(text_col), " ").alias("toks")
    ).select(id_col, F.explode(F.expr(shingle_arr)).alias("shingle"))
    if distinct and not distinct_in_row:
        return out.dropDuplicates([id_col, "shingle"])
    return out


def char_shingles(
    df: DataFrame, id_col: str, text_col: str, n: int = 4, distinct: bool = True
) -> DataFrame:
    """Character n-gram shingles, one row per (doc, shingle) — the
    cross-word-boundary sibling of :func:`word_shingles` (catches edits
    word shingling misses: hyphenation, concatenation, small typos inside
    long words). Docs shorter than ``n`` chars yield zero shingles, same
    as the oracle's positional enumeration.

    Unlike word shingles, common char n-grams appear in nearly every
    document — ALWAYS pair this with a df-cut before the candidate join
    (``pair_stats_from_shingles(max_doc_freq=...)``): one corpus-hot
    shingle like ``'e th'`` is a quadratic candidate blow-up at any scale.
    """
    # distinct=True dedups IN-ROW (array_distinct before the explode):
    # every (doc, shingle) duplicate comes from the same source row, so
    # row-local dedup is exactly dropDuplicates([id, shingle]) — minus the
    # full shuffle of the exploded relation the dropDuplicates exchange
    # cost. Measured r11 (q218, sf0.1 solo): 4.3 s → 2.6 s WHEN the caller
    # materializes the result once (localCheckpoint) — without that, the
    # missing exchange means every downstream consumer re-runs the string
    # explode (6.4 s); multi-consumer callers must checkpoint.
    gen = (
        f"transform(sequence(1, length(txt) - {n} + 1),"
        f" i -> substring(txt, i, {n}))"
    )
    if distinct:
        gen = f"array_distinct({gen})"
    arr = f"CASE WHEN length(txt) >= {n} THEN {gen} ELSE array() END"
    return df.select(id_col, F.col(text_col).alias("txt")).select(
        id_col, F.explode(F.expr(arr)).alias("shingle")
    )


def exact_dedup(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """Keep the minimum-id row per duplicate group; returns
    (key-hash, keep_id, n_copies)."""
    return df.groupBy(*key_cols).agg(
        F.min(id_col).alias(f"keep_{id_col}"),
        F.count("*").alias("n_copies"),
    )


# ngram_jaccard_pairs(max_doc_freq="auto"): corpora above this row count get
# a df-cut automatically — beyond ~1M docs a boilerplate shingle shared by
# x% of the corpus contributes (x% · N)² candidate pairs, which is the
# quadratic blow-up the cut exists to stop. Below it, no cut: exact
# semantics, oracle-checkable.
AUTO_DF_CUT_MIN_DOCS = 1_000_000


def ngram_pair_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    max_doc_freq: int | str | None = "auto",
) -> DataFrame:
    """(id_a, id_b, n_common, n_a, n_b) for every doc pair sharing ≥ 1 word
    n-gram — the shared upstream of Jaccard (q34) and containment (q106)
    scoring, so one persisted instance serves both.

    Candidate generation: equi-join on shared shingle (docs with no common
    shingle can't clear any positive threshold) → intersection counts via
    groupBy → per-doc cardinalities joined on. Three shuffles total, all
    key-partitioned. ``max_doc_freq`` as in :func:`ngram_jaccard_pairs`.
    """
    if max_doc_freq == "auto":
        # Metadata-only estimate (no job at plan-build time), calibrated at
        # ~1KB/document so a 100k-doc corpus of KB-scale texts is not
        # mistaken for a million-doc one; a residual over-estimate still
        # errs toward APPLYING the df-cut — the scale-safe direction.
        from fluvii_spark.operators.stats import estimate_rows

        n_docs = estimate_rows(df, fallback_bytes_per_row=1000)
        max_doc_freq = (
            max(256, int(n_docs * 0.0005))
            if n_docs > AUTO_DF_CUT_MIN_DOCS
            else None
        )
    sh = word_shingles(df, id_col, text_col, n)
    return pair_stats_from_shingles(sh, id_col, max_doc_freq)


def pair_stats_from_shingles(
    sh: DataFrame, id_col: str, max_doc_freq: int | None = None
) -> DataFrame:
    """The shared candidate-join core of every shingle-set similarity:
    (id_a, id_b, n_common, n_a, n_b) from a distinct (id, shingle) frame —
    equi-join on shared shingle → intersection counts → per-doc
    cardinalities joined on. Word (``ngram_pair_stats``) and char
    (``char_shingles``) shinglings both feed it. When ``max_doc_freq`` is
    set, cardinalities count only KEPT shingles — similarity over the
    df-cut shingle space, applied identically by any oracle."""
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
    return inter.join(
        card.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a")),
        "id_a",
    ).join(
        card.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b")),
        "id_b",
    )


def jaccard_from_stats(stats: DataFrame, threshold: float) -> DataFrame:
    return stats.select(
        "id_a",
        "id_b",
        (
            F.col("n_common").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
        ).alias("jaccard"),
    ).filter(F.col("jaccard") >= threshold)


def containment_from_stats(stats: DataFrame, threshold: float) -> DataFrame:
    return stats.select(
        "id_a",
        "id_b",
        (
            F.col("n_common").cast("double")
            / F.least(F.col("n_a"), F.col("n_b"))
        ).alias("containment"),
    ).filter(F.col("containment") >= threshold)


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int | str | None = "auto",
) -> DataFrame:
    """All pairs with word-n-gram Jaccard ≥ threshold.

    Candidate generation: equi-join on shared shingle (docs with no common
    shingle can't clear any positive threshold) → intersection counts via
    groupBy → Jaccard from per-doc cardinalities. Three shuffles total, all
    key-partitioned.

    ``max_doc_freq`` drops shingles hotter than the cap before the candidate
    join (the standard df-cut). ``"auto"`` (default) applies
    ``max(256, 0.05% · n_docs)`` only above ``AUTO_DF_CUT_MIN_DOCS`` rows —
    small corpora keep exact semantics, 100 TB corpora are never one
    boilerplate footer away from a quadratic shuffle. The cut can only lose
    pairs whose EVERY shared shingle is corpus-hot — true near-dups share
    their rare shingles too. ``None`` forces exact at any size.

    Measured plan note (sf0.1, local[32]): this formulation beats the
    "fewer-exchanges" rewrite (row-local ``array_distinct`` + carried
    cardinalities + ``repartition(shingle)``) 3.1 s vs 3.7 s warm. The
    ``dropDuplicates`` exchange is a ReusedExchange point so the string-heavy
    shingle explode is computed once, and the two cardinality joins are
    AQE-broadcast; the rewrite's savings are spent on SMJ sorts it can't
    avoid. Don't re-attempt without re-measuring.
    """
    return jaccard_from_stats(
        ngram_pair_stats(df, id_col, text_col, n, max_doc_freq), threshold
    )


def ngram_containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.6,
    max_doc_freq: int | str | None = "auto",
) -> DataFrame:
    """All pairs with word-n-gram *containment* ≥ threshold.

    Containment = |A ∩ B| / min(|A|, |B|): the asymmetric twin of Jaccard
    that catches quote-inclusion / boilerplate-wrapping near-dups a
    symmetric Jaccard misses (a short doc fully embedded in a long one has
    high containment but low Jaccard). Same candidate plan as
    :func:`ngram_jaccard_pairs` — shared-shingle equi-join, never a cross
    join — so the 100 TB posture is identical, including the auto df-cut.
    """
    return containment_from_stats(
        ngram_pair_stats(df, id_col, text_col, n, max_doc_freq), threshold
    )

def minhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """(id, perm, minhash) — min over shingles of (a·h(s) + b) mod P.

    Tall form (one row per permutation), derived from the wide form below —
    kept for tests/inspection; the LSH path uses the wide form directly.
    """
    wide = minhash_signatures_wide(df, id_col, text_col, n)
    stack_args = ", ".join(f"{i}, mh{i}" for i in range(len(MINHASH_PERMS)))
    return wide.selectExpr(
        id_col, f"stack({len(MINHASH_PERMS)}, {stack_args}) AS (perm, minhash)"
    )


def minhash_signatures_wide(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """(id, mh0..mh15): all permutation minima in ONE groupBy pass.

    h(s) = first 8 md5 hex chars as int (cross-engine deterministic). Each
    permutation is its own ``min`` aggregate over the same hashed-shingle
    rows — map-side partial aggregation, a single key-partitioned shuffle,
    and no ×n_perms row replication (the naive explode-per-perm plan
    shuffles 16× the data for the same answer).
    """
    # duplicate shingles can't change a min — skip the distinct shuffle.
    # fan_out_scan: the explode + per-shingle md5 is the expensive map
    # side of the one shuffle; a single-row-group doc scan would run it
    # all on one task (no-op when the scan is already parallel).
    from fluvii_spark.operators.stats import fan_out_scan

    sh = word_shingles(fan_out_scan(df), id_col, text_col, n, distinct=False)
    h = F.conv(F.substring(F.md5("shingle"), 1, 8), 16, 10).cast("long")
    aggs = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % MINHASH_P).alias(f"mh{i}")
        for i, (a, b) in enumerate(MINHASH_PERMS)
    ]
    return sh.withColumn("h", h).groupBy(id_col).agg(*aggs)


def lsh_band_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    wide: DataFrame | None = None,
) -> DataFrame:
    """(id, band, band_sig): LSH bucket keys — band k = perms [4k, 4k+4),
    signature = comma-joined minhashes. The bucket identity used by both the
    batch candidate join and the streaming dedup state.

    Pass a precomputed (ideally checkpointed) ``wide`` signature frame when
    the caller also consumes the signatures itself — otherwise the whole
    shingle→hash→16-min aggregation would run once per consumer."""
    if wide is None:
        wide = minhash_signatures_wide(df, id_col, text_col, n)
    band_exprs = ", ".join(
        "{k}, concat_ws(',', {cols})".format(
            k=k,
            cols=", ".join(
                f"mh{i}" for i in range(k * ROWS_PER_BAND, (k + 1) * ROWS_PER_BAND)
            ),
        )
        for k in range(N_BANDS)
    )
    return wide.selectExpr(
        id_col, f"stack({N_BANDS}, {band_exprs}) AS (band, band_sig)"
    )


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    wide: DataFrame | None = None,
) -> DataFrame:
    """(id_a < id_b) pairs sharing at least one full LSH band.

    ``wide``: optional precomputed signature frame (see
    :func:`lsh_band_signatures`)."""
    bands = lsh_band_signatures(df, id_col, text_col, n, wide=wide)
    a = bands.select(F.col(id_col).alias("id_a"), "band", "band_sig")
    b = bands.select(F.col(id_col).alias("id_b"), "band", "band_sig")
    return (
        a.join(b, ["band", "band_sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates()
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """MinHash-LSH near-dup pairs, verified with exact Jaccard.

    Banding: 16 minhashes → 4 bands × 4 rows; candidates = pairs sharing at
    least one full band (equi-join on (band, band-signature) — the classic
    LSH bucket join). Candidates then verified against exact shingle Jaccard
    so the output is deterministic (bands only prune).

    ``candidates``: optional precomputed (id_a, id_b) candidate frame —
    callers that already built the band join (q194's fidelity audit) skip
    a full recompute of the signature pipeline.
    """
    cand = (
        candidates
        if candidates is not None
        else lsh_candidate_pairs(df, id_col, text_col, n)
    )
    # Exact-Jaccard verification touches ONLY candidate pairs, and stays
    # entirely JVM-side: each doc's distinct-shingle ARRAY is built once in
    # the scan projection, candidates join the two (small) arrays on, and
    # ``array_intersect`` + ``size`` compute the set Jaccard inside
    # whole-stage codegen. Banding already pruned the corpus to near-dup
    # candidates, so per-pair verification is O(|candidates| · doc_len); the
    # previous Arrow pandas-UDF variant computed the identical values but
    # paid Python-worker spin-up + Arrow transfer for the candidate texts —
    # this formulation keeps the whole dedup chain UDF-free.
    shingle_arr = (
        f"array_distinct(transform(array(split({text_col}, ' ')), toks ->"
        f" CASE WHEN size(toks) >= {n} THEN"
        f" transform(sequence(0, size(toks) - {n}),"
        f" i -> concat_ws(' ', slice(toks, i + 1, {n})))"
        f" ELSE array() END)[0])"
    )
    sh_a = df.select(
        F.col(id_col).alias("id_a"), F.expr(shingle_arr).alias("_sa")
    )
    sh_b = df.select(
        F.col(id_col).alias("id_b"), F.expr(shingle_arr).alias("_sb")
    )
    return (
        cand.join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .withColumn(
            "_n_int", F.size(F.array_intersect("_sa", "_sb")).cast("double")
        )
        .withColumn(
            "jaccard",
            F.when(F.size("_sa") + F.size("_sb") == F.col("_n_int"), F.lit(0.0))
            .otherwise(
                F.col("_n_int")
                / (F.size("_sa") + F.size("_sb") - F.col("_n_int"))
            ),
        )
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

    Plan shape: tokenize → per-instance hash → ONE groupBy(id) computing all
    ``bits`` vote sums as separate aggregates → bit assembly in the same
    projection. Summing ±1 per token *instance* is identical to weighting
    distinct tokens by count, so the per-token count pass (and any per-bit
    row replication) is unnecessary — a single key-partitioned shuffle with
    map-side partial aggregation, no UDFs.
    """
    toks = df.select(
        F.col(id_col), F.explode(F.split(text_col, " ")).alias("tok")
    ).withColumn("h", F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long"))
    votes = [
        F.sum(
            F.when(F.expr(f"(shiftright(h, {j}) & 1) = 1"), F.lit(1)).otherwise(
                F.lit(-1)
            )
        ).alias(f"v{j}")
        for j in range(bits)
    ]
    assemble = sum(
        (
            F.when(F.col(f"v{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
            for j in range(bits)
        ),
        F.lit(0),
    ).cast("long")
    return toks.groupBy(id_col).agg(*votes).select(id_col, assemble.alias("simhash"))


def cap_pairs_per_doc(
    pairs: DataFrame,
    max_pairs_per_doc: int,
    strength_col: str,
    ascending: bool = False,
    id_a: str = "id_a",
    id_b: str = "id_b",
    salt_buckets: int | None = None,
) -> DataFrame:
    """Emission cap for near-dup pair auditors (VERDICT r7 ask #5): on a
    duplicate-heavy corpus the TRUE near-dup pair count grows quadratically
    with duplication (K copies of one document are K·(K-1)/2 pairs), so an
    uncapped auditor's OUTPUT — not its candidate work — becomes the
    bottleneck. This dial keeps, per document, its ``max_pairs_per_doc``
    STRONGEST pairs (``strength_col`` descending by default; ascending for
    distance-like strengths such as Hamming), with the partner id as the
    deterministic tie-break. A pair survives when EITHER endpoint ranks it
    (so every doc retains its own top-N view — recall@cap is exactly 1.0
    per doc by construction, pinned by test_cap_pairs_recall_at_cap).

    Two windows over the PAIR OUTPUT (already threshold-verified, far
    smaller than the candidate set), each partitioned by one endpoint —
    key-partitioned, no global sort. Default OFF in every inventory query:
    the oracle-pinned uncapped semantics stand; the cap is the dial a
    100 TB run sets when its corpus is duplication-heavy.

    Work bound, stated precisely (ADVICE r8): the cap bounds EMITTED pairs
    at n·cap; per-TASK work is the one-partition sort of a single
    endpoint's pair list — O(K log K) for a document with K near-dup
    partners, because partitioning by one endpoint spreads a K-clique's
    K²/2 pairs across K partitions of ~K rows each. A task sorts tens of
    millions of rows routinely, so this holds through K ≈ 10⁷; a corpus
    whose single hottest document exceeds that sets ``salt_buckets``
    (VERDICT r9 ask #5): a LOSSLESS salted pre-cut first ranks within
    (endpoint, partner-hash % salt_buckets) subgroups and keeps rank ≤
    cap there, shrinking the hottest endpoint's list to ≤ cap·S rows
    before the exact two-window cap runs. Lossless because each
    endpoint's ordering key (strength, partner id) is a total order, so
    a pair ranked ≤ cap in the endpoint's FULL list is ranked ≤ cap
    within whichever salt subgroup it lands in — the pre-cut can only
    drop pairs the exact cap would drop anyway (pinned by
    test_cap_pairs_salted_pre_cut_lossless). Default OFF: the upstream
    candidate joins' skew guards (df-cut, band-bucket caps) bound K long
    before 10⁷ in every inventory query.
    """
    strength = F.col(strength_col)
    order_a = [
        strength.asc() if ascending else strength.desc(), F.col(id_b)
    ]
    order_b = [
        strength.asc() if ascending else strength.desc(), F.col(id_a)
    ]
    if salt_buckets is not None and salt_buckets > 1:
        # partner-id hash salt: a hot endpoint's K pairs spread over
        # salt_buckets tasks of ~K/S rows; survivors ≤ cap·S per endpoint
        salt_a = F.pmod(F.xxhash64(F.col(id_b)), F.lit(salt_buckets))
        salt_b = F.pmod(F.xxhash64(F.col(id_a)), F.lit(salt_buckets))
        wsa = Window.partitionBy(F.col(id_a), salt_a).orderBy(*order_a)
        wsb = Window.partitionBy(F.col(id_b), salt_b).orderBy(*order_b)
        pairs = (
            pairs.withColumn("_psa", F.row_number().over(wsa))
            .withColumn("_psb", F.row_number().over(wsb))
            .filter(
                (F.col("_psa") <= max_pairs_per_doc)
                | (F.col("_psb") <= max_pairs_per_doc)
            )
            .drop("_psa", "_psb")
        )
    w_a = Window.partitionBy(id_a).orderBy(*order_a)
    w_b = Window.partitionBy(id_b).orderBy(*order_b)
    return (
        pairs.withColumn("_ra", F.row_number().over(w_a))
        .withColumn("_rb", F.row_number().over(w_b))
        .filter(
            (F.col("_ra") <= max_pairs_per_doc)
            | (F.col("_rb") <= max_pairs_per_doc)
        )
        .drop("_ra", "_rb")
    )


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 6,
    signatures: DataFrame | None = None,
    max_pairs_per_doc: int | None = None,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ max_hamming.

    Candidates: pigeonhole on 16-bit halves — any pair within Hamming 6 of a
    32-bit hash agrees on at least one half only when distance ≤ ... (the
    guarantee needs distance < 2·halves; with 2 halves it prunes exactly the
    pairs differing in both halves). This mirrors production SimHash tables
    (Manku et al., WWW'07: split into d+1 blocks for distance d); the
    block count is a knob — halves keep the oracle SQL tractable here.
    """
    # ``signatures``: pass a precomputed (persisted) simhash() frame so the
    # 32-vote aggregation isn't rebuilt when fingerprints are also reported
    # on their own (q36/q37 share one instance via the query-layer memo)
    hs = simhash(df, id_col, text_col) if signatures is None else signatures
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
    out = (
        cand.withColumn("hamming", F.expr("bit_count(sh_a ^ sh_b)"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
    if max_pairs_per_doc is not None:
        # output-bound dial (see cap_pairs_per_doc) — hamming is a
        # distance, so strongest = smallest
        out = cap_pairs_per_doc(
            out, max_pairs_per_doc, "hamming", ascending=True
        )
    return out


def _large_star(edges: DataFrame) -> DataFrame:
    """Large-star round: every node links its strictly-larger neighbors to
    the minimum of its closed neighborhood. One groupBy + one key-join."""
    sym = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    m = sym.groupBy("u").agg(F.min("v").alias("mn")).select(
        "u", F.least("mn", F.col("u")).alias("m")
    )
    return (
        sym.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .dropDuplicates()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Small-star round: direct each edge large→small; every node links its
    not-larger neighborhood (and itself) to the neighborhood minimum."""
    d = (
        edges.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .dropDuplicates()
    )
    m = d.groupBy("u").agg(F.min("v").alias("m"))
    leaf = (
        d.join(m, "u")
        .filter(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    center = m.select("u", F.col("m").alias("v"))
    return leaf.unionByName(center).dropDuplicates()


# Above this many edges, connected_components switches from min-label
# propagation (fewest stages/round — wins when every Spark job is
# latency-bound) to large/small-star contraction (O(log n) rounds — wins when
# rounds are shuffle-bound and diameter is unknowable). ~5M edges ≈ the point
# where one extra round costs more than the per-round stage overhead.
STAR_EDGE_THRESHOLD = 5_000_000


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 20,
    stats: dict | None = None,
    algorithm: str = "auto",
    star_threshold: int = STAR_EDGE_THRESHOLD,
    self_contained: bool = False,
) -> DataFrame:
    """(node, cluster): connected components of the near-dup pair graph —
    the step after pair finding: a dedup pipeline keeps one canonical doc
    per *cluster*, not per pair (A~B, B~C ⇒ {A,B,C} together even when A,C
    never matched directly).

    Two physical strategies, picked by ``algorithm``:

    - ``"star"`` — alternating large-star / small-star contraction (Kiveris
      et al., "Connected Components in MapReduce and Beyond", SoCC'14): each
      round is two (groupBy + equi-join) stages and the edge set converges to
      a star forest — every node pointing at its component minimum — in
      O(log n) rounds *independent of diameter* (propagation needs ~diameter
      rounds: a chain of 10⁶ near-identical docs would take 10⁶ shuffles).
      Convergence is detected by an (edge-count, hash-sum) fingerprint — one
      tiny aggregate per round, no edge-set anti-join.
    - ``"propagation"`` — min-label propagation: one join + one groupBy per
      round, rounds ≈ cluster diameter. Fewer stages per round, so it wins
      on small graphs where each job is scheduler-latency-bound and dup
      clusters have tiny diameters.
    - ``"auto"`` (default) — propagation below ``star_threshold`` edges,
      star contraction above: small inputs stay latency-optimal, 100 TB
      inputs get the diameter-independent bound.

    ``localCheckpoint`` truncates lineage each round in both strategies;
    superseded round checkpoints are unpersisted deterministically inside
    the loop (not left to ContextCleaner GC). The cluster id IS the minimum
    doc id — i.e. the canonical keeper. Pass ``stats={}`` to receive
    ``{"rounds": k, "algorithm": ...}`` back (tests assert the O(log n)
    bound on a chain graph).

    ``self_contained=True`` returns an eagerly checkpointed result and
    releases EVERY internal checkpoint before returning — the frame carries
    its own storage blocks and no hidden ancestry. Use for long-lived /
    memoized results; release them with
    ``operators.stats.release_local_checkpoint`` when done (a plain
    ``unpersist()`` cannot free checkpoint blocks).
    """
    edges = (
        pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .dropDuplicates()
        .localCheckpoint(eager=True)
    )
    init_edges = edges  # kept through the loops: `nodes` reads it lazily
    if algorithm == "auto":
        algorithm = "star" if edges.count() > star_threshold else "propagation"
    nodes = (
        edges.select(F.col("u").alias("node"))
        .unionByName(edges.select(F.col("v").alias("node")))
        .dropDuplicates()
    )
    rounds = 0

    if algorithm == "star":
        def fingerprint(e: DataFrame) -> tuple:
            row = e.agg(
                F.count("*").alias("n"),
                F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
            ).collect()[0]
            return (row["n"], row["h"])

        prev = None
        releasable = None  # superseded round checkpoint, freed next round
        for _ in range(max_iters):
            new_edges = _small_star(_large_star(edges)).localCheckpoint(
                eager=True
            )
            rounds += 1
            # the PREVIOUS round's checkpoint (never the initial one —
            # `nodes` still reads it) is dead once this round materialized
            # eagerly: free its blocks now instead of waiting for the
            # ContextCleaner to notice the GC'd reference
            if releasable is not None:
                release_local_checkpoint(releasable)
            releasable = new_edges
            edges = new_edges
            fp = fingerprint(edges)
            if fp == prev:
                break
            prev = fp
        # converged star forest: each non-root points at its root; roots
        # appear only on the v side — label them with themselves
        lab = edges.groupBy("u").agg(F.min("v").alias("cluster"))
        out = nodes.join(
            lab.select(F.col("u").alias("node"), "cluster"), "node", "left"
        ).select("node", F.coalesce("cluster", "node").alias("cluster"))
    else:
        sym = edges.unionByName(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        ).localCheckpoint(eager=False)
        labels = nodes.withColumn("label", F.col("node"))
        for i in range(max_iters):
            neigh = sym.join(
                labels, sym.v == labels.node
            ).select(F.col("u").alias("node"), "label")
            new_labels = (
                labels.unionByName(neigh)
                .groupBy("node")
                .agg(F.min("label").alias("label"))
                .localCheckpoint(eager=True)
            )
            rounds += 1
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "node")
                .filter(F.col("n.label") != F.col("o.label"))
                .count()
            )
            # `labels` (a round checkpoint from i>=1; round 0's is a plain
            # projection) was last read by the `changed` count above —
            # free its blocks deterministically rather than on GC
            if i > 0:
                release_local_checkpoint(labels)
            labels = new_labels
            if changed == 0:
                break
        # the final labels checkpoint truncates lineage, so the lazily
        # checkpointed symmetric edge list is dead too
        release_local_checkpoint(sym)
        out = labels.select("node", F.col("label").alias("cluster"))

    if stats is not None:
        stats["rounds"] = rounds
        stats["algorithm"] = algorithm
    if not self_contained:
        return out
    final = out.localCheckpoint(eager=True)
    # the result now carries its own blocks — the initial edge checkpoint
    # and the last surviving round checkpoint are dead; free them now
    release_local_checkpoint(init_edges)
    release_local_checkpoint(edges if algorithm == "star" else labels)
    return final


# Above this many vectors, embedding_near_dup_pairs(exact=None) routes to
# LSH-bucketed candidates: the exact block-GEMM holds ~2·N/n_blocks vectors
# in one pandas group, which stops fitting executor memory long before the
# O(N²) flops stop fitting the cluster.
EXACT_EMBED_MAX_ROWS = 200_000


def lsh_tables_for_target_recall(
    threshold: float, planes: int, target_recall: float
) -> int:
    """Hyperplane-LSH table count that reaches ``target_recall`` for a
    pair at EXACTLY ``threshold`` cosine (higher-cosine pairs recall
    better): P(one table co-buckets) = p^planes with
    p = 1 - acos(threshold)/pi, so recall = 1-(1-p^planes)^tables.
    Shared by :func:`embedding_near_dup_pairs`' bucketed path and
    tools/growth_recall.py (which measures the bound this solve targets)
    so the measured configuration IS the deployed one."""
    import math

    p = 1.0 - math.acos(max(-1.0, min(1.0, threshold))) / math.pi
    p_table = p**planes  # P(one table co-buckets a threshold-cosine pair)
    if p_table >= target_recall:
        return 1
    return min(128, math.ceil(math.log(1 - target_recall) / math.log(1 - p_table)))


def _estimate_rows(df: DataFrame) -> int:
    """Metadata-only row estimate — submits NO Spark job.

    Delegates to :func:`fluvii_spark.operators.stats.estimate_rows`; the
    ``sizeInBytes // 100`` fallback is a deliberate row-count OVER-estimate
    for wide embedding rows, so size-based routing errs toward the bucketed
    (scale-safe) path rather than pulling an oversized corpus through one
    exact GEMM group.
    """
    from fluvii_spark.operators.stats import estimate_rows

    return estimate_rows(df)


def _gemm_pairs(
    pairs: DataFrame, group_cols: list[str], threshold: float
) -> DataFrame:
    """Shared GEMM verify: per group, one dense cosine sub-matrix.

    ``pairs`` carries (group_cols..., bi, bj, vid, vec, blk); each group is
    one (block-pair) within one candidate scope (the whole corpus for the
    exact path, one LSH bucket for the bucketed path)."""
    import numpy as np
    import pandas as pd

    # bi/bj positions inside the group key depend on the caller's scope cols
    bi_pos = group_cols.index("bi")
    bj_pos = group_cols.index("bj")

    def gemm(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        bi, bj = int(key[bi_pos]), int(key[bj_pos])
        ids = pdf["vid"].to_numpy()
        mat = np.stack(pdf["vec"].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(mat, axis=1)
        same = bi == bj
        if same:
            a_idx = np.arange(len(ids))
            b_idx = a_idx
        else:
            a_idx = np.flatnonzero(pdf["blk"].to_numpy() == bi)
            b_idx = np.flatnonzero(pdf["blk"].to_numpy() == bj)
        if len(a_idx) == 0 or len(b_idx) == 0:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []}).astype(
                {"id_a": "int64", "id_b": "int64", "cosine": "float64"}
            )
        A, B = mat[a_idx], mat[b_idx]
        sims = (A @ B.T) / np.outer(norms[a_idx], norms[b_idx])
        ia, ib = np.nonzero(sims >= threshold)
        id_a, id_b = ids[a_idx][ia], ids[b_idx][ib]
        if same:
            # full symmetric matrix: keep each unordered pair once, drop diag
            keep = id_a < id_b
            lo, hi = id_a[keep], id_b[keep]
            cos = sims[ia[keep], ib[keep]]
        else:
            # each unordered cross-block pair appears exactly once; emit in
            # canonical (min, max) order — filtering would lose x > y pairs
            lo = np.minimum(id_a, id_b)
            hi = np.maximum(id_a, id_b)
            cos = sims[ia, ib]
        return pd.DataFrame({"id_a": lo, "id_b": hi, "cosine": cos})

    return pairs.groupBy(*group_cols).applyInPandas(
        gemm, schema="id_a long, id_b long, cosine double"
    )


def _block_pairs(df: DataFrame, id_col: str, vec_col: str, n_blocks: int,
                 scope_cols: list[str] | None = None) -> DataFrame:
    """Replicate each row to every (block-pair) group it participates in."""
    scope_cols = scope_cols or []
    blocked = df.select(
        *scope_cols,
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        (F.col(id_col) % n_blocks).cast("int").alias("blk"),
    ).withColumn("other", F.explode(F.sequence(F.lit(0), F.lit(n_blocks - 1))))
    return blocked.select(
        *scope_cols,
        F.least("blk", "other").alias("bi"),
        F.greatest("blk", "other").alias("bj"),
        "vid",
        "vec",
        "blk",
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    n_blocks: int = 8,
    exact: bool | None = None,
    exact_max_rows: int = EXACT_EMBED_MAX_ROWS,
    planes: int = 8,
    n_tables: int | None = None,
    target_recall: float = 0.9,
    size_hint: int | None = None,
) -> DataFrame:
    """Pairs with cosine similarity ≥ threshold.

    Two physical strategies:

    - **exact** — block-matrix all-pairs: vectors bucket into ``n_blocks``
      blocks, each row replicates to its block-pair groups, each group runs
      one BLAS GEMM inside ``applyInPandas``. Never materializes O(N²) pair
      rows through a shuffle (shuffle volume is ``n_blocks × data``) — but
      one group still holds ~2·N/n_blocks vectors, so it is a small-corpus /
      within-bucket tool, not a 100 TB plan.
    - **bucketed** — multi-table hyperplane-LSH candidates first
      (:func:`fluvii_spark.operators.similarity.lsh_bucket_tables` —
      deterministic md5-derived planes, ``n_tables`` amplification), then
      the SAME block-GEMM verify *within each (table, bucket)*: group size
      is bounded by the bucket, shuffle by ``n_tables × n_blocks × data``.
      Approximate (a pair split by a hyperplane in every table is missed;
      recall = 1-(1-p^planes)^n_tables with p = 1-θ/π); this is the 100 TB
      default.

    ``n_tables=None`` solves that recall formula for ``target_recall`` AT
    the threshold: high thresholds (true near-dups, the production regime)
    need a handful of tables; low thresholds are honestly expensive — the
    replication factor is the cost of asking LSH for far-apart pairs.

    ``exact=None`` routes by corpus size WITHOUT running a job: the caller's
    ``size_hint`` wins, else the optimized plan's metadata row count (CBO /
    in-memory relations), else a conservative ``sizeInBytes``-based bound
    (assumes ≥100 B/row — embedding rows are far wider, so the estimate
    over-counts rows and errs toward the scale-safe bucketed path). Callers
    wanting exact all-pairs semantics at any size opt in with ``exact=True``
    (q38 does — its oracle is exact all-pairs).
    """
    if exact is None:
        if size_hint is None:
            size_hint = _estimate_rows(df)
        exact = size_hint <= exact_max_rows
    if exact:
        pairs = _block_pairs(df, id_col, vec_col, n_blocks)
        return _gemm_pairs(pairs, ["bi", "bj"], threshold)

    from fluvii_spark.operators.similarity import lsh_bucket_tables

    if n_tables is None:
        n_tables = lsh_tables_for_target_recall(threshold, planes, target_recall)

    # one-ROW probe for the vector width (bounded driver transfer; the
    # routing above stayed metadata-only). An empty/fully-filtered input
    # has no pairs by definition — return the empty frame instead of
    # dereferencing head()'s None.
    first = df.select(vec_col).head()
    if first is None:
        # mirror the non-empty output's id type (hardcoding long would give
        # empty vs non-empty results inconsistent schemas for string ids)
        from pyspark.sql import types as T

        id_type = df.schema[id_col].dataType
        return df.sparkSession.createDataFrame(
            [],
            T.StructType(
                [
                    T.StructField("id_a", id_type),
                    T.StructField("id_b", id_type),
                    T.StructField("cosine", T.DoubleType()),
                ]
            ),
        )
    dims = len(first[0])
    buckets = lsh_bucket_tables(df, dims, id_col, vec_col, planes, n_tables)
    in_bucket = df.join(buckets, id_col)
    pairs = _block_pairs(in_bucket, id_col, vec_col, n_blocks,
                         scope_cols=["table", "bucket"])
    found = _gemm_pairs(pairs, ["table", "bucket", "bi", "bj"], threshold)
    # a pair co-bucketed in several tables is verified in each — same vectors,
    # same float path, identical cosine; keep one
    return found.dropDuplicates(["id_a", "id_b"])


def prefix_filter_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.7,
    n: int = 1,
    max_pairs_per_doc: int | None = None,
) -> DataFrame:
    """Set Jaccard ≥ threshold pairs via PREFIX FILTERING (ppjoin family —
    Chaudhuri et al. ICDE'06, Xiao et al. WWW'08), over word ``n``-gram
    sets (``n=1``: token sets; ``n≥2``: shingle sets).

    The alternative candidate generator to LSH/shared-element joins: order
    every element by global frequency (rarest first, ties lexicographic);
    two sets with Jaccard ≥ t MUST share an element among their first
    ``m - ceil(t·m) + 1`` ordered elements (pigeonhole — LOSSLESS for ANY
    fixed global total order), so only that prefix is exploded into the
    equi-join. Because prefixes favor RARE elements, the join keys are
    intrinsically low-fanout — exactly the skew story the shared-shingle
    join needs a df-cut for. Verification is exact set Jaccard via
    ``array_intersect`` on the element arrays, JVM-side.

    Scale shape: the global frequency order is realized WITHOUT a global
    window — element frequency is one groupBy; each doc then sorts its own
    elements by ``(freq, element)`` under a per-doc window (the compound
    key is a total order, so every doc agrees on the global ordering).
    All stages are key-partitioned; nothing funnels through one task.

    Applicability boundary: low candidate fanout REQUIRES the element
    vocabulary to be Zipfian (real-text tokens, or shingles on any corpus —
    shingle vocabularies are combinatorial, hence rare-element-rich even
    over a closed word vocabulary). On a ~100-word closed vocabulary with
    ``n=1`` every token is corpus-hot and the candidate join degenerates
    toward all-pairs (measured 70 s at sf0.1) — there, use ``n=3``
    (q120's configuration) or LSH banding (:func:`minhash_lsh_pairs`).
    """
    # elems feeds THREE branches (frequency table, per-doc ranking join,
    # element arrays for verify); without materialization the shingle
    # explode re-executes per branch — checkpoint once. In-row distinct:
    # the checkpoint is the materialization point anyway, so the
    # dropDuplicates exchange would be a second, redundant barrier.
    # (r11 measured: fan_out_scan before the explode is a NET LOSS here —
    # +0.6 s of task churn at sf0.1; unlike q218's char explode, the word
    # shingling is light enough that one scan task feeds the pipeline
    # faster than 32 repartitioned ones. Don't re-add without measuring.)
    elems = word_shingles(
        df, id_col, text_col, n, distinct=True, distinct_in_row=True
    )
    elems = elems.localCheckpoint(eager=False)
    freq = elems.groupBy("shingle").agg(F.count("*").alias("freq"))
    w_doc = Window.partitionBy(id_col).orderBy("freq", "shingle")
    w_all = Window.partitionBy(id_col)
    ranked = (
        elems.join(freq, "shingle")
        .withColumn("rn", F.row_number().over(w_doc))
        .withColumn("m", F.count("*").over(w_all))
    )
    # The double product is SAFE here: round-to-nearest can land fl(t*m)
    # at-or-above the next integer k only when the real product t*m is
    # already within ulp/2 below k (then ceil of both is k) or exactly k
    # (then the product is exact) — so ceil(fl(t*m)) <= ceil(t*m) always,
    # and the only possible misrounding makes the prefix one LONGER (extra
    # candidates; the verify is exact). No epsilon guard needed; the tight
    # pigeonhole case is pinned by test_prefix_filter_threshold_rounding.
    prefix_len = (
        F.col("m") - F.ceil(F.lit(threshold) * F.col("m")).cast("int") + 1
    )
    # candidates join ONLY (id, prefix-element, set size); the (heavier)
    # element arrays join back onto the deduped candidate ids for the verify
    prefixes = ranked.filter(F.col("rn") <= prefix_len).select(
        id_col, "shingle", "m"
    )
    a = prefixes.select(
        F.col(id_col).alias("id_a"), "shingle", F.col("m").alias("ma")
    )
    b = prefixes.select(
        F.col(id_col).alias("id_b"), "shingle", F.col("m").alias("mb")
    )
    docs = elems.groupBy(id_col).agg(
        F.sort_array(F.collect_list("shingle")).alias("_elems")
    )
    # ppjoin LENGTH FILTER: J(A,B) <= |A|/|B| for |A| <= |B|, so any pair
    # with min/max size ratio below t is pruned BEFORE the array verify.
    # The ratio form (division, then >= t) is LOSSLESS under IEEE rounding:
    # the correctly-rounded quotient of a rational >= t can never land
    # strictly below the double t (it rounds to t or above), while the
    # product form t*|B| could round UP past an integer |A| and wrongly
    # drop an exactly-threshold pair.
    cand = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            F.least("ma", "mb").cast("double") / F.greatest("ma", "mb")
            >= F.lit(threshold)
        )
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
        .join(
            docs.select(F.col(id_col).alias("id_a"), F.col("_elems").alias("ea")),
            "id_a",
        )
        .join(
            docs.select(F.col(id_col).alias("id_b"), F.col("_elems").alias("eb")),
            "id_b",
        )
    )
    inter = F.size(F.array_intersect("ea", "eb")).cast("double")
    jac = inter / (F.size("ea") + F.size("eb") - inter)
    out = (
        cand.select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )
    if max_pairs_per_doc is not None:
        # output-bound dial (see cap_pairs_per_doc) — jaccard is a
        # similarity, so strongest = largest
        out = cap_pairs_per_doc(out, max_pairs_per_doc, "jaccard")
    return out
