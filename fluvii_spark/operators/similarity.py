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
- the IVF variant swaps the hash for learned centroids (deterministic mini
  k-means; see ``ivf_assignments``/``ivf_topk``) — same plumbing (bucket
  column, bucket-pruned scan, per-bucket top-k), data-adapted partitions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd  # module-level so pandas_udf type hints resolve
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

N_PLANES = 8

# adaptive_planes defaults: expected bucket occupancy the index is sized
# for, the floor that keeps tiny corpora on the historical 16-bucket grid,
# and a BIGINT-safe ceiling (bucket ids are shiftleft(1, plane) sums).
TARGET_BUCKET = 32
MIN_PLANES = 4
MAX_PLANES = 30

# Above this many TOTAL hyperplanes, bucket assignment switches from
# literal-array fold expressions (zero shuffle, but plan size grows with
# the plane count) back to the exploded data-join form (two shuffles,
# constant plan size) — the amplified multi-table near-dup path can ask
# for ~1000 planes, which belongs in data, not in an expression tree.
LITERAL_PLANES_MAX = 64


def adaptive_planes(
    n: int,
    target_bucket: int = TARGET_BUCKET,
    min_planes: int = MIN_PLANES,
    max_planes: int = MAX_PLANES,
) -> int:
    """Hyperplane count that holds the EXPECTED bucket size near
    ``target_bucket`` as the corpus grows: planes = ⌈log₂(n / target)⌉,
    clamped to [min_planes, max_planes].

    This is what makes an LSH candidate join linear instead of quadratic:
    with a FIXED plane count the within-bucket pair volume grows n²/2^planes,
    but with planes ≈ log₂(n/B) each vector meets ~B bucket-mates no matter
    how large n gets, so candidates are O(n·B). max_planes=30 keeps the
    bucket id a small BIGINT and covers n up to B·2³⁰ ≈ 3.4e10 vectors.
    """
    import math

    if n <= target_bucket:
        return min_planes
    return max(min_planes, min(max_planes, math.ceil(math.log2(n / target_bucket))))


def well_formed_vec(vec_col: str, dims: int):
    """Predicate: ``vec_col`` is a dense ``dims``-wide embedding with no
    NULL components — the only inputs the LSH index admits.

    Why a filter and not best-effort hashing: the zero-shuffle literal-fold
    bucket path (see :func:`lsh_buckets`) evaluates each plane's dot as a
    zip_with/aggregate fold, and a NULL/ragged vector NULLs the whole fold —
    every ``dot > 0`` test then fails and the row silently lands in bucket
    0, joining unrelated candidates (ADVICE r8). The historical exploded
    path instead dropped NULL/empty vectors (posexplode emits nothing) but
    partial-summed short ones — neither behavior is what an index wants.
    Both paths now share this guard, so malformed vectors are uniformly
    EXCLUDED from the index (and from candidate output) rather than
    mis-bucketed, and the two physical forms stay bit-identical even on
    degenerate corpora. ``size(NULL)`` is NULL under the non-legacy
    default, so a NULL array fails the predicate too. O(dims) per row,
    stays inside the scan projection's codegen — no extra pass.
    """
    c = F.col(vec_col)
    return (F.size(c) == F.lit(dims)) & ~F.exists(c, lambda x: x.isNull())


def dot_sql(a: str, b: str) -> str:
    """SQL for Σ aᵢ·bᵢ in double (left-to-right fold — deterministic)."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        f" CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def norm_sql(a: str) -> str:
    return f"sqrt({dot_sql(a, a)})"


def cosine_sql(a: str, b: str) -> str:
    """Cosine with DuckDB ``list_cosine_similarity`` degenerate-input
    parity: a zero-norm vector yields -1.0 (what the oracle function
    returns) instead of an ANSI DIVIDE_BY_ZERO abort — one corrupt/zeroed
    embedding must not kill a corpus-scale job, and -1.0 sorts such
    vectors last in every similarity ranking, the behavior a user wants.
    """
    na_nb = f"({norm_sql(a)} * {norm_sql(b)})"
    return (
        f"(CASE WHEN {na_nb} = CAST(0.0 AS DOUBLE) THEN CAST(-1.0 AS DOUBLE)"
        f" ELSE {dot_sql(a, b)} / {na_nb} END)"
    )


def cosine_hoisted_sql(a: str, b: str, na: str, nb: str) -> str:
    """:func:`cosine_sql` with the two norm folds HOISTED: ``na``/``nb``
    name columns holding ``norm_sql(a)`` / ``norm_sql(b)`` precomputed
    once per VECTOR (e.g. in the projection that builds an index side),
    so each candidate pair evaluates one O(dims) dot fold instead of
    three. Bit-identical to :func:`cosine_sql`: sqrt/dot are
    deterministic on the same input, and the guard/division arithmetic
    (norm(a)·norm(b) product order included) is unchanged — the folds
    just run once per vector instead of once per pair."""
    na_nb = f"({na} * {nb})"
    return (
        f"(CASE WHEN {na_nb} = CAST(0.0 AS DOUBLE) THEN CAST(-1.0 AS DOUBLE)"
        f" ELSE {dot_sql(a, b)} / {na_nb} END)"
    )


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
    # query norm hoisted once into the 1-row broadcast (cosine_hoisted_sql:
    # bit-identical arithmetic, one fewer O(dims) fold per corpus row)
    q = df.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("qvec"),
        F.expr(norm_sql(vec_col)).alias("_qn"),
    )
    return (
        df.filter(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(q))
        .select(
            id_col,
            F.expr(
                cosine_hoisted_sql(vec_col, "qvec", norm_sql(vec_col), "_qn")
            ).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def plane_weights(dims: int, planes: int) -> list:
    """Python-side mirror of :func:`hyperplane_table`'s md5-derived weights,
    bit-identical to the SQL form ``(conv(substr(md5('plane_{p}_{d}'),1,8),
    16,10) % 2001 - 1000) / 1000.0`` — 8 hex chars < 2^32 so the modulo is
    on a positive long in every engine, and x/1000.0 is one IEEE double
    division everywhere. planes×dims ≤ 30×64 doubles: bounded driver state,
    embeddable as literal arrays so bucket assignment needs NO join and NO
    shuffle (the hyperplane_table explode→join→2×groupBy path costs two
    shuffles of 64·n rows per call; at 100 TB that dwarfs the hash itself).
    """
    import hashlib

    return [
        [
            (
                (
                    int(
                        hashlib.md5(f"plane_{p}_{d}".encode()).hexdigest()[:8],
                        16,
                    )
                    % 2001
                )
                - 1000
            )
            / 1000.0
            for d in range(dims)
        ]
        for p in range(planes)
    ]


def _weights_array_sql(ws: list) -> str:
    """SQL double-array literal for one plane's weights (repr round-trips
    doubles exactly, so the parsed literal equals the in-engine value)."""
    return "array(" + ",".join(f"CAST({w!r} AS DOUBLE)" for w in ws) + ")"


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
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """(id, bucket): sign pattern of the vector against each hyperplane.

    ZERO-shuffle: the md5 weights are bounded (planes×dims doubles), so each
    plane's dot product is one zip_with/aggregate fold against a literal
    weight array evaluated in the same projection as the scan — no explode,
    no join, no aggregation. The fold sums dims in ascending order, the same
    order the previous explode→SUM path (posexplode emits dims in order,
    partial agg sums them in row order) and the DuckDB oracle's sequential
    SUM use, so buckets are bit-for-bit unchanged.

    Malformed vectors (NULL, ragged width, NULL components) are EXCLUDED
    from the index — see :func:`well_formed_vec` for why best-effort
    hashing would mis-bucket them.
    """
    ws = plane_weights(dims, planes)
    bucket = F.lit(0).cast("long")
    for p, w in enumerate(ws):
        bucket = bucket + F.when(
            F.expr(dot_sql(vec_col, _weights_array_sql(w))) > 0,
            F.lit(1 << p).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
    # ``keep`` carries extra columns (e.g. the vector itself) through the
    # projection, so consumers that need (id, bucket, vector) don't join
    # this zero-shuffle relation back to its own source table — that
    # "attach" join re-shuffles the corpus by id for columns that were
    # already on the row (guide §8's re-attach trap).
    return df.where(well_formed_vec(vec_col, dims)).select(
        id_col, bucket.alias("bucket"), *keep
    )


def _lsh_bucket_tables_exploded(
    df: DataFrame,
    dims: int,
    id_col: str,
    vec_col: str,
    planes: int,
    n_tables: int,
) -> DataFrame:
    """Data-join form of :func:`lsh_bucket_tables` for large plane counts:
    posexplode → broadcast (plane, dim, w) table → per-(id, plane) dot sums
    → per-(id, table) bucket assembly. Two key-partitioned shuffles, plan
    size independent of planes×n_tables."""
    total = planes * n_tables
    hp = hyperplane_table(df.sparkSession, dims, total)
    comp = df.select(
        id_col, F.posexplode(vec_col).alias("dim", "x")
    ).withColumn("x", F.col("x").cast("double"))
    dots = (
        comp.join(F.broadcast(hp), "dim")
        .groupBy(id_col, "plane")
        .agg(F.sum(F.col("x") * F.col("w")).alias("dot"))
    )
    return (
        dots.withColumn("table", (F.col("plane") / planes).cast("int"))
        .groupBy(id_col, "table")
        .agg(
            F.sum(
                F.when(
                    F.col("dot") > 0,
                    F.expr(f"shiftleft(CAST(1 AS BIGINT), plane % {planes})"),
                ).otherwise(F.lit(0))
            ).alias("bucket")
        )
    )


def lsh_bucket_tables(
    df: DataFrame,
    dims: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = N_PLANES,
    n_tables: int = 4,
) -> DataFrame:
    """(id, table, bucket): ``n_tables`` independent sign-pattern buckets.

    Standard LSH amplification — a near pair missed by one table (split by
    some hyperplane) is caught by another; candidate recall is
    1-(1-p^planes)^n_tables for per-plane agreement p. All n_tables×planes
    hyperplane dot products come out of ONE corpus scan; up to
    ``LITERAL_PLANES_MAX`` total planes they are zero-shuffle
    literal-array folds (see :func:`lsh_buckets`) and the only non-scan
    work is the n_tables-wide inline explode. BEYOND that (the auto-
    amplified near-dup path can ask for ~120 tables × 8 planes ≈ 1000
    folds — an expression Catalyst should not be asked to analyze), the
    weights go back to being DATA: the explode → broadcast-weight join →
    grouped-sum plan, whose cost is two key-partitioned shuffles but whose
    plan size is constant in the plane count. Both paths use the same md5
    weights and sign rule, so buckets are bit-identical (pinned by
    test_lsh_bucket_tables_paths_agree). Table t uses global planes
    [t·planes, (t+1)·planes) with bit p = plane % planes.

    The :func:`well_formed_vec` guard is applied BEFORE the path split, so
    malformed vectors are excluded identically by both physical forms
    (unguarded, the literal fold would bucket-0 them while the exploded
    form partial-summed or dropped them — the paths-agree invariant would
    only hold on dense corpora)."""
    df = df.where(well_formed_vec(vec_col, dims))
    total = planes * n_tables
    if total > LITERAL_PLANES_MAX:
        return _lsh_bucket_tables_exploded(
            df, dims, id_col, vec_col, planes, n_tables
        )
    ws = plane_weights(dims, total)
    structs = []
    for t in range(n_tables):
        bucket = F.lit(0).cast("long")
        for p in range(planes):
            bucket = bucket + F.when(
                F.expr(dot_sql(vec_col, _weights_array_sql(ws[t * planes + p])))
                > 0,
                F.lit(1 << p).cast("long"),
            ).otherwise(F.lit(0).cast("long"))
        structs.append(
            F.struct(
                F.lit(t).cast("int").alias("table"), bucket.alias("bucket")
            )
        )
    return df.select(
        id_col, F.explode(F.array(*structs)).alias("_tb")
    ).select(id_col, F.col("_tb.table").alias("table"), F.col("_tb.bucket").alias("bucket"))


def bucket_representatives(
    df: DataFrame,
    dims: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = N_PLANES,
    min_members: int = 2,
) -> DataFrame:
    """(bucket, n_members, rep_id, rep_cosine): SemDeDup-style cluster
    representative selection — per LSH bucket, the member closest (cosine)
    to the bucket centroid, ties to the smallest id.

    Fully relational (no pandas groups, no vector materialization on the
    driver): vectors stay exploded as (id, dim, x) rows; the centroid is a
    per-(bucket, dim) mean; dots/norms are grouped sums. Every stage is a
    key-partitioned aggregation — at 100 TB the widest shuffle is
    dims × N rows, and no single task ever holds a whole bucket.
    """
    buckets = lsh_buckets(df, dims, id_col, vec_col, planes)
    comp = df.select(
        id_col, F.posexplode(vec_col).alias("dim", "x")
    ).withColumn("x", F.col("x").cast("double"))
    bc = comp.join(buckets, id_col)
    # centroid component as a WINDOW over (bucket, dim) — no centroid
    # relation, no re-join, no second pass over the exploded vectors. Each
    # member row then carries (x, cx), and ONE aggregation yields the dot
    # product, the member norm, and the centroid norm (every member holds
    # all dims, so its Σ cx² IS the bucket's squared centroid norm).
    cx = F.avg("x").over(Window.partitionBy("bucket", "dim"))
    per_member = (
        bc.withColumn("cx", cx)
        .groupBy(id_col, "bucket")
        .agg(
            F.sum(F.col("x") * F.col("cx")).alias("dot"),
            F.sqrt(F.sum(F.col("x") * F.col("x"))).alias("m_norm"),
            F.sqrt(F.sum(F.col("cx") * F.col("cx"))).alias("c_norm"),
        )
        .select(
            id_col,
            "bucket",
            # try_divide -> NULL on a zero norm, exactly DuckDB's x/0.0
            # DOUBLE semantics in the oracle's manual-division form (no
            # ANSI abort; NULLs sort last under the DESC ranking below in
            # both engines)
            F.try_divide(
                F.col("dot"), F.col("m_norm") * F.col("c_norm")
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("bucket").orderBy(
        F.col("cosine").desc(), F.col(id_col)
    )
    return (
        per_member.withColumn("rn", F.row_number().over(w))
        .withColumn("n_members", F.count("*").over(Window.partitionBy("bucket")))
        .filter((F.col("rn") == 1) & (F.col("n_members") >= min_members))
        .select(
            "bucket",
            F.col("n_members").cast("bigint").alias("n_members"),
            F.col(id_col).alias("rep_id"),
            F.col("cosine").alias("rep_cosine"),
        )
    )


def lsh_topk_multiprobe(
    df: DataFrame,
    query_id: int,
    dims: int,
    k: int = 5,
    probes: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = N_PLANES,
) -> DataFrame:
    """Multi-probe LSH top-k: probe the query's bucket PLUS the ``probes``
    buckets reached by flipping the query's lowest-margin hyperplane bits
    (smallest |dot| — the planes the query sits closest to, so the flipped
    bucket is the likeliest home of missed neighbors; Lv et al., VLDB'07).

    Recall knob without extra tables: candidate volume grows by
    (probes+1)/2^planes of the corpus, while bucket assignment stays ONE
    scan — at 100 TB this beats amplifying with more hash tables (which
    re-hashes the corpus) whenever the probe count is small. Ties on
    |dot| break by plane index; everything md5-deterministic.

    A malformed QUERY vector (NULL/ragged — see :func:`well_formed_vec`)
    has no row in the guarded bucket index, so the probe set is empty and
    the result is empty — the consistent outcome of "not in the index",
    never a bucket-0 scan. Same for :func:`lsh_topk`.
    """
    ws = plane_weights(dims, planes)
    # keep the vector on the bucket row: the candidate side needs
    # (id, bucket, vector) and a ``df ⋈ buckets`` attach-join would
    # re-shuffle the corpus by id for a column already on the row
    # (guide §8's re-attach trap; same move as the q246 bucket path)
    buckets = lsh_buckets(df, dims, id_col, vec_col, planes, keep=(vec_col,))
    # per-plane dots ONLY for the single query row (planes rows total) —
    # the corpus side never materializes per-plane dots at all
    qdots = (
        df.filter(F.col(id_col) == query_id)
        .select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(p).cast("int").alias("plane"),
                            F.expr(
                                dot_sql(vec_col, _weights_array_sql(w))
                            ).alias("dot"),
                        )
                        for p, w in enumerate(ws)
                    ]
                )
            ).alias("_pd")
        )
        .select(F.col("_pd.plane").alias("plane"), F.col("_pd.dot").alias("dot"))
    )
    qbucket = buckets.filter(F.col(id_col) == query_id).select(
        F.col("bucket").alias("qbucket")
    )
    flips = (
        qdots.withColumn(
            "rnk",
            F.row_number().over(
                Window.orderBy(F.abs(F.col("dot")), F.col("plane"))
            ),
        )
        .filter(F.col("rnk") <= probes)
        .crossJoin(F.broadcast(qbucket))
        .select(
            F.expr("qbucket ^ shiftleft(CAST(1 AS BIGINT), plane)").alias(
                "probe_bucket"
            )
        )
    )
    probe_set = qbucket.select(
        F.col("qbucket").alias("probe_bucket")
    ).unionByName(flips)
    qvec = df.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("qvec"),
        F.expr(norm_sql(vec_col)).alias("_qn"),
    )
    return (
        buckets.join(
            F.broadcast(probe_set),
            F.col("bucket") == F.col("probe_bucket"),
            "leftsemi",
        )
        .filter(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(qvec))
        .select(
            id_col,
            F.expr(
                cosine_hoisted_sql(vec_col, "qvec", norm_sql(vec_col), "_qn")
            ).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
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
    # (id, bucket, vector) straight off the projection — no corpus
    # attach-join (see lsh_topk_multiprobe)
    with_bucket = lsh_buckets(df, dims, id_col, vec_col, planes, keep=(vec_col,))
    qb = with_bucket.filter(F.col(id_col) == query_id).select(
        F.col("bucket").alias("qbucket"),
        F.col(vec_col).alias("qvec"),
        F.expr(norm_sql(vec_col)).alias("_qn"),
    )
    return (
        with_bucket.join(F.broadcast(qb), F.col("bucket") == F.col("qbucket"))
        .filter(F.col(id_col) != query_id)
        .select(
            id_col,
            F.expr(
                cosine_hoisted_sql(vec_col, "qvec", norm_sql(vec_col), "_qn")
            ).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) index — the learned-partition ANN path
# ---------------------------------------------------------------------------


def ivf_assignments(
    df: DataFrame,
    n_lists: int = 16,
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """(assignments DataFrame, centroids ndarray): deterministic mini k-means.

    Seeds = the ``n_lists`` vectors with the smallest md5(vec_id) (stable
    across engines/runs), then ``n_iters`` Lloyd rounds executed
    distributedly: assignment is a broadcast-centroid Arrow UDF (one scan),
    the centroid update is one groupBy-mean shuffle per round. Only the
    k×dims centroid matrix ever reaches the driver — the corpus never does.

    At 100 TB this replaces hyperplane hashing with data-adapted partitions
    (IVF lists), cutting probe cost where the corpus is clustered.
    """
    seeds_rows = (
        df.select(
            id_col,
            vec_col,
            F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
            .cast("long")
            .alias("_h"),
        )
        .orderBy("_h", id_col)
        .limit(n_lists)
        .collect()
    )
    centroids = np.stack(
        [np.asarray(r[vec_col], dtype=np.float64) for r in seeds_rows]
    )

    def assign_fn(cents: "np.ndarray"):
        _cn = np.linalg.norm(cents, axis=1, keepdims=True)
        c_norm = cents / np.where(_cn == 0, 1.0, _cn)  # zero stays zero, no nan

        @F.pandas_udf("int")
        def assign(vecs: pd.Series) -> pd.Series:
            mat = np.stack(vecs.to_numpy()).astype(np.float64)
            _mn = np.linalg.norm(mat, axis=1, keepdims=True)
            mat = mat / np.where(_mn == 0, 1.0, _mn)  # zero stays zero, no nan
            return pd.Series(np.argmax(mat @ c_norm.T, axis=1).astype("int32"))

        return assign

    assigned = None
    for _ in range(max(1, n_iters)):
        assigned = df.withColumn("list_id", assign_fn(centroids)(F.col(vec_col)))
        # one Arrow transfer of the (n_lists × dims) means frame — the only
        # driver-bound data per round; vectorized scatter into the matrix
        pdf = (
            assigned.select("list_id", F.posexplode(vec_col).alias("dim", "x"))
            .groupBy("list_id", "dim")
            .agg(F.avg(F.col("x").cast("double")).alias("m"))
            .toPandas()
        )
        new = centroids.copy()
        new[pdf["list_id"].to_numpy(), pdf["dim"].to_numpy()] = pdf["m"].to_numpy()
        centroids = new
    return assigned, centroids


def ivf_topk(
    df: DataFrame,
    query_id: int,
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF search: exact cosine over the ``n_probe`` closest inverted lists.

    Probe-list selection happens on the k×dims centroid matrix (driver-side
    numpy — constant size); the corpus-side work is one partition-pruned
    scan + top-k (TakeOrderedAndProject).
    """
    assigned, centroids = ivf_assignments(df, n_lists, 2, id_col, vec_col)
    qrow = df.filter(F.col(id_col) == query_id).select(vec_col).collect()
    qvec = np.asarray(qrow[0][0], dtype=np.float64)
    _qn = np.linalg.norm(qvec)
    qn = qvec / (_qn if _qn else 1.0)  # zero query stays zero, no nan
    _cns = np.linalg.norm(centroids, axis=1, keepdims=True)
    cn = centroids / np.where(_cns == 0, 1.0, _cns)
    probe = np.argsort(-(cn @ qn))[:n_probe].tolist()

    q = (
        df.filter(F.col(id_col) == query_id)
        .select(
            F.col(vec_col).alias("qvec"),
            F.expr(norm_sql(vec_col)).alias("_qn"),
        )
    )
    return (
        assigned.filter(F.col("list_id").isin(probe))
        .filter(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(q))
        .select(
            id_col,
            F.expr(
                cosine_hoisted_sql(vec_col, "qvec", norm_sql(vec_col), "_qn")
            ).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )
