"""Streaming joins: stream-static enrichment and stream-stream interval
joins with watermark-bounded state.

The reference cannot join at all — its README concedes "you can only
compare your record to the one with the same key on the table"
(/root/reference/README.md:596-598), i.e. a keyed self-lookup via state.
These helpers expose Spark's built-in streaming joins as engine surface:

- ``stream_static_join``: enrich a stream against a dimension table. The
  static side is planned per micro-batch; small dims get broadcast (no
  stream-side shuffle), so at 100 TB/day the stream never repartitions
  just to pick up dimension attributes.
- ``stream_stream_interval_join``: correlate two streams on a key within
  an event-time interval. Both sides MUST carry watermarks — that is what
  lets Spark evict join state (otherwise both sides buffer forever, which
  is exactly the unbounded-state failure mode an unconstrained stream join
  has at scale). State per key ≈ rows within the interval + watermark
  delay, independent of stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_static_join(
    stream: DataFrame,
    dim: DataFrame,
    on: list[str] | str,
    how: str = "inner",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Enrich a stream with a (batch) dimension table.

    ``broadcast_dim=True`` hints the static side so each micro-batch plans a
    BroadcastHashJoin — the stream side keeps its Kafka partitioning and
    never shuffles. Set False for dims too large to broadcast; Spark then
    shuffles BOTH sides per micro-batch (usually the wrong trade — consider
    pre-bucketing the dim instead).
    """
    d = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(d, on, how)


def stream_stream_join(
    left: DataFrame,
    left_ts: str,
    left_delay: str,
    right: DataFrame,
    right_ts: str,
    right_delay: str,
    condition,
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream join with a caller-supplied condition.

    ``condition`` must include the equality keys AND a time bound between
    ``left_ts`` and ``right_ts`` (e.g. ``r.ts BETWEEN l.ts - INTERVAL 1 HOUR
    AND l.ts``); without the bound Spark must keep every row forever. Both
    inputs get their watermark here so callers can't forget one side. For
    the common key + [lower, upper]-seconds shape, prefer
    :func:`stream_stream_interval_join`, which builds the condition in the
    planner-recognized form itself.
    """
    wl = left.withWatermark(left_ts, left_delay)
    wr = right.withWatermark(right_ts, right_delay)
    return wl.join(wr, condition, how)


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    lower_s: float,
    upper_s: float,
    watermark: str = "2 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join two streams where ``right_ts - left_ts ∈ [lower_s, upper_s]``.

    Equi-join on ``key_cols`` plus a time-interval condition; both inputs
    get ``watermark`` of allowed lateness. Spark derives the state-eviction
    horizon from the interval + watermarks, so join state is bounded.

    Column names must be disjoint apart from ``key_cols`` (rename before
    calling); ``left_ts``/``right_ts`` must differ. Both sides may derive
    from the SAME streaming source (the funnel self-join case — views
    joined to purchases of one event stream): references are qualified
    through plan aliases, so Spark's ambiguous-self-join check never sees
    a two-sided column reference.
    """
    lw = left.withWatermark(left_ts, watermark).alias("__sj_l")
    rw = right.withWatermark(right_ts, watermark).alias("__sj_r")
    L = lambda c: F.col(f"__sj_l.{c}")  # noqa: E731
    R = lambda c: F.col(f"__sj_r.{c}")  # noqa: E731
    key_eq = [L(k) == R(k) for k in key_cols]
    # the bound must stay `ts ± INTERVAL` arithmetic — that's the shape
    # Spark's streaming planner recognizes to derive the state-eviction
    # horizon (a cast-to-double comparison would buffer state forever)
    lo = F.expr(f"INTERVAL {float(lower_s)} SECOND")
    hi = F.expr(f"INTERVAL {float(upper_s)} SECOND")
    cond = key_eq + [
        R(right_ts) >= L(left_ts) + lo,
        R(right_ts) <= L(left_ts) + hi,
    ]
    joined = lw.join(rw, cond, how)
    # collapse the duplicated key columns: under rightOuter/fullOuter the
    # LEFT copy is NULL for unmatched right rows, so dropping the right copy
    # outright would null out the key — coalesce keeps whichever side
    # matched, and non-key columns keep their side's values (NULL-padded by
    # the outer join as usual)
    keys = [F.coalesce(L(k), R(k)).alias(k) for k in key_cols]
    left_rest = [L(c) for c in left.columns if c not in key_cols]
    right_rest = [R(c) for c in right.columns if c not in key_cols]
    return joined.select(*keys, *left_rest, *right_rest)


def foreach_batch_join_writer(
    other_path: str,
    on: list[str] | str,
    sink_path: str,
    how: str = "inner",
    other_format: str = "parquet",
    broadcast_other: bool = False,
):
    """Stream↔stream correlation via ``foreachBatch`` against the other
    stream's materialized sink — the escape hatch when the built-in
    stream-stream join's constraints don't fit: unbounded lookback, non-equi
    or re-read-the-past semantics, or correlating with a stream some other
    query is already materializing.

    Each micro-batch re-reads ``other_path`` (so the other stream's rows
    that arrived since the last trigger are visible — per-batch snapshot
    isolation, no shared state store) and writes through the idempotent
    batch writer, so replays stay exactly-once. The cost model to respect at
    100 TB: the other side is re-scanned per trigger — keep it partitioned
    so the batch join prunes (or pass ``broadcast_other=True`` when it is a
    small keyed snapshot), and compact it periodically.
    """
    from fluvii_spark.io.sinks import idempotent_batch_writer

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        other = spark.read.format(other_format).load(other_path)
        if broadcast_other:
            other = F.broadcast(other)
        joined = batch_df.join(other, on, how)
        idempotent_batch_writer(sink_path)(joined, batch_id)

    return write_batch
