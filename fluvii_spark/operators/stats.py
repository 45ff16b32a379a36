"""Metadata-only plan statistics — sizing decisions without submitting jobs.

Several operators route between physical strategies based on input size
(exact GEMM vs LSH buckets, document-frequency cuts, recursion-anchor
partitioning). Doing that with ``df.count()`` submits a full-scan Spark job
at *plan-build* time — a scan of the 100 TB input before the query even
starts. Instead these helpers read Catalyst's optimized-plan statistics
(``rowCount`` when available, else ``sizeInBytes``), which come from file
footers / ANALYZE metadata and cost no job.

The ``sizeInBytes // 100`` fallback deliberately OVER-estimates row count
for wide rows (documents, embeddings): callers use it to decide whether a
scale-guard (df-cut, bucketing, extra partitions) applies, and over-counting
errs toward applying the guard — the safe direction at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# Row estimate reported when plan statistics are unreachable (Spark Connect
# DataFrames have no ``_jdf``): large enough that every size-triggered
# scale-guard (df-cuts, LSH routing, bucketing) APPLIES — the safe
# direction — while partitions_for_rows(10M) stays a moderate hint (3
# partitions at the 4M default), not a degenerate 1 or an explosion.
CONNECT_FALLBACK_ROWS = 10_000_000


def plan_stats_available(df: DataFrame) -> bool:
    """True when the classic-JVM ``queryExecution`` stats path exists.

    Spark Connect DataFrames expose no ``_jdf``/``_jvm`` — metadata-only
    routing degrades to conservative defaults there instead of crashing
    with AttributeError at plan-build time.
    """
    return hasattr(df, "_jdf")


def estimate_rows(df: DataFrame, fallback_bytes_per_row: int = 100) -> int:
    """Metadata-only row estimate — submits NO Spark job.

    Optimized-plan ``rowCount`` when the source carries it (ANALYZE'd tables,
    in-memory relations); else ``sizeInBytes // fallback_bytes_per_row``.
    Callers pick the divisor to match their rows: 100 over-counts wide
    embedding rows (safe for GEMM-vs-LSH routing), while document-corpus
    callers pass ~1000 so a 100k-doc corpus of KB-scale texts is not
    mistaken for a million-doc one.

    On sessions without the JVM stats path (Spark Connect) this returns
    :data:`CONNECT_FALLBACK_ROWS` — over-counting so scale-guards apply.
    """
    if not plan_stats_available(df):
        return CONNECT_FALLBACK_ROWS
    try:
        stats = df._jdf.queryExecution().optimizedPlan().stats()
        rc = stats.rowCount()
        if rc.isDefined():
            return int(str(rc.get()))
        return int(str(stats.sizeInBytes())) // fallback_bytes_per_row
    except AttributeError:  # Connect-shaped proxies that fake hasattr
        return CONNECT_FALLBACK_ROWS


def partitions_for_rows(
    rows: int, rows_per_partition: int = 4_000_000, max_partitions: int = 10_000
) -> int:
    """Partition count for a relation of ``rows`` rows: ~1 partition per
    ``rows_per_partition``, clamped to [1, max_partitions].

    Used to size REPARTITION hints whose right value scales with the input —
    e.g. a recursive-CTE anchor where each UnionLoop iteration is a narrow
    map and per-task scheduling dominates at small frontiers, while a single
    partition would serialize the whole frontier at cluster scale.
    """
    return max(1, min((rows + rows_per_partition - 1) // rows_per_partition, max_partitions))


# (path, stat-fingerprint) -> exact row count: footer reads are idempotent
# per snapshot, so repeated plan builds (bench loops, multi-query sessions)
# pay the O(files) metadata walk once. The fingerprint invalidates the
# entry when a corpus is REBUILT at the same path within one driver
# process (ADVICE r9 #2: a stale count would silently shift q246's
# adaptive plane count away from the oracle's fresh COUNT(*)). For a
# file it is (mtime_ns, size); for a directory the max child mtime_ns is
# folded in, because a directory's own mtime only bumps when its
# IMMEDIATE children change — a partitioned layout (date=*/part-*.parquet)
# rebuilt by rewriting partition SUBdirectories in place leaves the
# parent mtime untouched (ADVICE r10 #1). One stat level is enough for
# that layout when the rebuild ADDS/REMOVES/RECREATES part files (that
# bumps date=X's own mtime); a byte-level in-place overwrite that
# touches no directory entry, or deeper nesting, still needs
# clear_parquet_rows_memo(). Non-stat-able paths (object stores,
# vanished dirs) and fallback count() results are NOT memoized — the
# fallback count is a property of whatever frame the caller passed, not
# of the path.
_PARQUET_ROWS_MEMO: dict[tuple[str, tuple[int, int]], int] = {}


def clear_parquet_rows_memo() -> None:
    """Drop every memoized footer count — for tools that rebuild corpora
    in ways a same-path stat fingerprint can't see (in-place file
    rewrites preserving size and mtime granularity)."""
    _PARQUET_ROWS_MEMO.clear()


def _stat_fingerprint(path: str) -> tuple[int, int] | None:
    """(mtime_ns, size) of a LOCAL file, or (max(own/child mtime_ns),
    size) of a LOCAL directory; None when the path can't be stat'ed
    (object-store URI, missing) — None disables memoization rather than
    risking staleness. Children are included for directories because a
    dir's own mtime only reflects immediate-child add/remove/rename, not
    rewrites inside partition subdirectories (ADVICE r10 #1); the child
    scan is one O(files) listdir+stat pass, same order as the footer
    walk it guards."""
    import os

    try:
        st = os.stat(path)
    except OSError:
        return None
    mtime = st.st_mtime_ns
    if os.path.isdir(path):
        try:
            with os.scandir(path) as it:
                for entry in it:
                    try:
                        mtime = max(mtime, entry.stat().st_mtime_ns)
                    except OSError:
                        continue
        except OSError:
            return None
    return (mtime, st.st_size)


def parquet_row_count(path: str, fallback_df: DataFrame | None = None) -> int:
    """EXACT row count of a parquet file/directory from file footers —
    submits NO Spark job and reads NO data pages.

    Some sizing decisions need the exact count, not :func:`estimate_rows`'
    bytes-derived guess: an adaptive LSH plane count (planes =
    ⌈log₂(n/B)⌉) feeds a hash grid that an independent oracle recomputes
    from its own exact COUNT(*), so a factor-2 row estimate error near a
    power-of-2 boundary would silently shift every bucket id. Parquet
    footers carry exact per-file row counts; summing them is metadata-only
    (the same walk a SELECT COUNT(*) pushdown does) and scales with file
    COUNT, not bytes — at 100 TB that is one tiny read per file, on the
    driver, before any job is scheduled.

    ``pyarrow.dataset`` handles both single files and directory layouts and
    any filesystem pyarrow is configured for (posix, s3, hdfs). If the
    footer walk fails (exotic filesystem, permissions), falls back to
    ``fallback_df.count()`` — one exact-count job, correctness preserved —
    or raises when no fallback frame was given.
    """
    fp = _stat_fingerprint(path)
    if fp is not None:
        cached = _PARQUET_ROWS_MEMO.get((path, fp))
        if cached is not None:
            return cached
    try:
        import pyarrow.dataset as pads

        ds = pads.dataset(path, format="parquet")
        n = sum(
            frag.metadata.num_rows if frag.metadata is not None else frag.count_rows()
            for frag in ds.get_fragments()
        )
    except Exception:  # noqa: BLE001 — unreadable path/filesystem
        if fallback_df is None:
            raise
        return fallback_df.count()  # never memoized: not a path property
    if fp is not None:
        _PARQUET_ROWS_MEMO[(path, fp)] = n
    return n


def release_local_checkpoint(df: DataFrame) -> bool:
    """Best-effort unpersist of the RDD(s) backing a ``localCheckpoint``'d
    frame, freeing storage blocks NOW instead of whenever the JVM's
    ContextCleaner gets to the GC'd reference.

    ``DataFrame.unpersist()`` cannot do this — the blocks belong to the
    checkpointed RDD inside the plan's ``LogicalRDD`` leaf (or leaves, for
    a projection/filter layered over a checkpoint), not to the plan cache.
    Call ONLY on a checkpoint that nothing will recompute from afterwards
    (a superseded iteration round, a lazy checkpoint shadowed by a later
    eager one, a memo-evicted self-contained result): an evicted block
    under lineage truncation is gone for good. Returns False (no-op) on
    Spark Connect or a plan with no checkpoint leaf.
    """
    try:
        leaves = df._jdf.queryExecution().analyzed().collectLeaves()
        it, released = leaves.iterator(), False
        while it.hasNext():
            leaf = it.next()
            if leaf.getClass().getName().endswith(".LogicalRDD"):
                leaf.rdd().unpersist(False)
                released = True
        return released
    except Exception:  # noqa: BLE001 — Connect / already-stopped session
        return False


def fan_out_scan(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition a relation ONLY when its current partition
    count is below the scheduler's parallelism — the adaptive guard for
    compute-heavy pipelines (shingle/token explodes, per-row hashing)
    whose input may arrive in too few partitions to use the machine.

    Single-file / single-row-group parquet inputs plan as ONE scan task no
    matter how large the split config is, so everything up to the first
    exchange runs on one core; a 100 TB table, by contrast, scans as
    thousands of splits and the guard is a no-op (``cur >= target``), so
    no corpus-scale shuffle is ever introduced. The repartition moves the
    COMPACT pre-explode rows, never the exploded relation.

    Results are unchanged: callers apply this below row-local projections
    and above order-insensitive aggregations/joins (every operator in this
    package is already required to be row-order-independent — the package
    determinism rule).
    """
    try:
        sc = df.sparkSession.sparkContext
        target = min_partitions or sc.defaultParallelism
        cur = df.rdd.getNumPartitions()
    except Exception:  # Spark Connect — no RDD surface; leave the plan alone
        return df
    if cur >= target:
        return df
    return df.repartition(target)
