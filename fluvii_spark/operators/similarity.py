"""Embedding similarity search: brute-force cosine top-k (baseline) and
random-hyperplane LSH bucketing (the scale path).

No counterpart in the reference; SURVEY.md §2.2 "LLM-data ops". Everything is
built-in higher-order functions (zip_with / aggregate) — JVM-side, no UDFs.

Scale design (100 TB of vectors):
- brute force is the correctness baseline: broadcast the query vector(s),
  one scan, TakeOrderedAndProject top-k — linear, no shuffle, but O(N·Q);
- hyperplane LSH assigns every vector a bucket id in one scan; queries only
  score their own bucket (candidate reduction ≈ 2^planes). Buckets are
  md5-derived so Spark / duckdb / Python agree bit-for-bit;
- an IVF variant would swap the hash for learned centroids — the plumbing
  (bucket column, equi-join on bucket, per-bucket top-k) is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_PLANES = 8


def dot_sql(a: str, b: str) -> str:
    """SQL for Σ aᵢ·bᵢ in double (left-to-right fold — deterministic)."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        f" CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def norm_sql(a: str) -> str:
    return f"sqrt({dot_sql(a, a)})"


def cosine_sql(a: str, b: str) -> str:
    return f"({dot_sql(a, b)} / ({norm_sql(a)} * {norm_sql(b)}))"


def brute_force_topk(
    df: DataFrame,
    query_id: int,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors of one stored vector.

    The single query row broadcasts; the scan side never shuffles; top-k
    plans as TakeOrderedAndProject.
    """
    q = df.filter(F.col(id_col) == query_id).select(F.col(vec_col).alias("qvec"))
    return (
        df.filter(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(q))
        .select(id_col, F.expr(cosine_sql(vec_col, "qvec")).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def hyperplane_table(spark, dims: int, planes: int = N_PLANES) -> DataFrame:
    """(plane, dim, w): deterministic pseudo-random hyperplane components in
    [-1, 1], derived from md5('plane_{p}_{d}') — reproducible in any engine."""
    p = spark.range(planes).select(F.col("id").cast("int").alias("plane"))
    d = spark.range(dims).select(F.col("id").cast("int").alias("dim"))
    w = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("plane_"),
                        F.col("plane").cast("string"),
                        F.lit("_"),
                        F.col("dim").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 2001
        - 1000
    ) / 1000.0
    return p.crossJoin(d).select("plane", "dim", w.alias("w"))


def lsh_buckets(
    df: DataFrame,
    dims: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = N_PLANES,
) -> DataFrame:
    """(id, bucket): sign pattern of the vector against each hyperplane.

    posexplode → broadcast-join the (planes × dims) weight table → per-plane
    dot products → bucket assembly. One key-partitioned shuffle on (id,
    plane), one on id.
    """
    hp = hyperplane_table(df.sparkSession, dims, planes)
    comp = df.select(
        id_col, F.posexplode(vec_col).alias("dim", "x")
    ).withColumn("x", F.col("x").cast("double"))
    dots = (
        comp.join(F.broadcast(hp), "dim")
        .groupBy(id_col, "plane")
        .agg(F.sum(F.col("x") * F.col("w")).alias("dot"))
    )
    return dots.groupBy(id_col).agg(
        F.sum(
            F.when(F.col("dot") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), plane)"))
            .otherwise(F.lit(0))
        ).alias("bucket")
    )


def lsh_topk(
    df: DataFrame,
    query_id: int,
    dims: int,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = N_PLANES,
) -> DataFrame:
    """Approximate top-k: exact cosine, but only within the query's bucket."""
    buckets = lsh_buckets(df, dims, id_col, vec_col, planes)
    with_bucket = df.join(buckets, id_col)
    qb = with_bucket.filter(F.col(id_col) == query_id).select(
        F.col("bucket").alias("qbucket"), F.col(vec_col).alias("qvec")
    )
    return (
        with_bucket.join(F.broadcast(qb), F.col("bucket") == F.col("qbucket"))
        .filter(F.col(id_col) != query_id)
        .select(id_col, F.expr(cosine_sql(vec_col, "qvec")).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )
