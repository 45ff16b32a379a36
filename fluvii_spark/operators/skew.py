"""Skew & co-location toolkit: salted joins, skew diagnosis, bucketed
tables (SURVEY.md §7 "100 TB design discipline").

AQE's skew-join splitting (enabled by the session factory) handles most
skew at runtime; these are the explicit levers for the cases AQE can't fix:

- **salting** — when one join key holds a double-digit percentage of the
  fact table, splitting the *partition* still leaves one reducer with one
  giant key. Salting rewrites the key space: the small side replicates
  n_salts times, the big side scatters — turning 1 hot reducer into n.
- **bucketing** — two fact tables repeatedly joined on the same key can be
  written bucketed on that key; Spark then plans the join with NO exchange
  on either side (co-located scan), which at 100 TB is the difference
  between a network-bound and a disk-bound join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def key_skew_profile(df: DataFrame, key: str, top_n: int = 10) -> DataFrame:
    """Per-key share of rows — the diagnosis step before salting.

    Returns the ``top_n`` heaviest keys with absolute and relative counts.
    One lazy plan, one scan: the denominator is a 1-row sum over the per-key
    aggregate, broadcast-crossed back on (the q55/q59 pattern) — no separate
    ``df.count()`` job, and both branches reuse the same groupBy exchange.
    An empty-window sum would work too but single-partitions the distinct
    keys; the broadcast aggregate keeps top-n as TakeOrderedAndProject.
    """
    per_key = df.groupBy(key).agg(F.count("*").alias("n_rows"))
    tot = per_key.agg(F.sum("n_rows").alias("_total"))
    return (
        per_key.crossJoin(F.broadcast(tot))
        .withColumn("share", F.col("n_rows") / F.col("_total"))
        .drop("_total")
        .orderBy(F.col("n_rows").desc(), key)
        .limit(top_n)
    )


def salted_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the hot-key fix: result ≡ ``large.join(small, key)``.

    - large side: deterministic per-row salt ``pmod(hash(all columns), n)``
      — spreads each key's rows over ``n_salts`` reducers;
    - small side: exploded ×``n_salts`` (every salt value) so every
      (key, salt) pair finds its match.

    Shuffle cost: small side grows ×n_salts (bounded — it's the small
    side); the large side's shuffle is unchanged in volume but loses its
    hot partition. Only inner/left joins preserve semantics under salting
    (right/full would duplicate unmatched small-side rows).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins only")
    salt_large = large.withColumn(
        "_salt", F.pmod(F.hash(*[F.col(c) for c in large.columns]), F.lit(n_salts))
    )
    salt_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = salt_large.join(salt_small, [key, "_salt"], how)
    return out.drop("_salt")


def salted_count_distinct(
    df: DataFrame,
    group_cols: list[str],
    distinct_col: str,
    n_buckets: int = 16,
) -> DataFrame:
    """Exact COUNT(DISTINCT x) per group, two-phase: result ≡
    ``groupBy(group).agg(count_distinct(x))``.

    Phase 1 groups by (group, ``hash(x) % n_buckets``) — the buckets
    PARTITION the value space, so per-bucket distinct counts sum exactly.
    A hot group's distinct-state (the hash set Spark keeps per group) is
    thereby split over ``n_buckets`` reducers instead of one; phase 2
    merges bucket counts with a plain sum (tiny: groups × n_buckets rows).
    This is the scale path when ONE group holds most of a high-cardinality
    column — the case where Spark's own count-distinct expansion still
    lands the whole group on one reducer.
    """
    bucket = F.pmod(F.xxhash64(F.col(distinct_col)), F.lit(n_buckets))
    partial = (
        df.groupBy(*group_cols, bucket.alias("_bucket"))
        .agg(F.count_distinct(F.col(distinct_col)).alias("_nd"))
    )
    return partial.groupBy(*group_cols).agg(F.sum("_nd").alias("n_distinct"))


def write_bucketed(
    df: DataFrame,
    table_name: str,
    key: str,
    n_buckets: int = 32,
    sort_by: str | None = None,
) -> None:
    """Persist a table bucketed (and optionally sorted) on its join key.

    Subsequent equi-joins between tables bucketed on the same key with the
    same bucket count plan WITHOUT a shuffle on either side.
    """
    w = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort_by:
        w = w.sortBy(sort_by)
    w.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two pre-bucketed tables (shuffle-free when buckets align)."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
