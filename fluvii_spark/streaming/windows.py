"""Event-time windowing + watermark + streaming dedup helpers.

The reference has NO window/watermark/late-data machinery (SURVEY.md §2.2:
its Faust comparison concedes the gap, README.md:687; lag only switches its
consumer into batch mode, fluvii/apps/transactions/consumer.py:60-69). These
are new engine surface, thin over Spark built-ins so Catalyst/streaming
semantics (late-row drop per watermark, state cleanup) apply unchanged.

All helpers work on both batch and streaming DataFrames — batch form is what
the duckdb oracle checks (q27); streaming form is exercised by the t1 smoke
tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_watermark(df: DataFrame, ts_col: str, delay: str) -> DataFrame:
    """Declare allowed event-time lateness, e.g. ``delay='10 minutes'``."""
    return df.withWatermark(ts_col, delay)


def tumbling(
    df: DataFrame,
    ts_col: str,
    duration: str,
    group_cols: list[str] | None = None,
    aggs: dict[str, str] | None = None,
) -> DataFrame:
    """Non-overlapping event-time windows: one row per (window, groups).

    ``aggs`` maps output name → SQL aggregate expression; defaults to count.
    """
    keys = [F.window(ts_col, duration).alias("win")] + [
        F.col(c) for c in (group_cols or [])
    ]
    exprs = (
        [F.expr(e).alias(n) for n, e in aggs.items()]
        if aggs
        else [F.count("*").alias("n")]
    )
    return (
        df.groupBy(*keys)
        .agg(*exprs)
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *(group_cols or []),
            *[F.col(n) for n in (aggs or {"n": None})],
        )
    )


def sliding(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    group_cols: list[str] | None = None,
    aggs: dict[str, str] | None = None,
) -> DataFrame:
    """Overlapping windows: every row lands in duration/slide windows."""
    keys = [F.window(ts_col, duration, slide).alias("win")] + [
        F.col(c) for c in (group_cols or [])
    ]
    exprs = (
        [F.expr(e).alias(n) for n, e in aggs.items()]
        if aggs
        else [F.count("*").alias("n")]
    )
    return (
        df.groupBy(*keys)
        .agg(*exprs)
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *(group_cols or []),
            *[F.col(n) for n in (aggs or {"n": None})],
        )
    )


def session(
    df: DataFrame,
    ts_col: str,
    gap: str,
    group_cols: list[str] | None = None,
    aggs: dict[str, str] | None = None,
) -> DataFrame:
    """Session windows: rows within ``gap`` of each other merge."""
    keys = [F.session_window(ts_col, gap).alias("win")] + [
        F.col(c) for c in (group_cols or [])
    ]
    exprs = (
        [F.expr(e).alias(n) for n, e in aggs.items()]
        if aggs
        else [F.count("*").alias("n")]
    )
    return (
        df.groupBy(*keys)
        .agg(*exprs)
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *(group_cols or []),
            *[F.col(n) for n in (aggs or {"n": None})],
        )
    )


def streaming_dedup(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str | None = None,
    within: str | None = None,
) -> DataFrame:
    """Drop duplicate keys in a stream.

    With ``ts_col``+``within`` the dedup state is bounded by the watermark
    (``dropDuplicatesWithinWatermark``) — the only form that survives
    unbounded streams at 100 TB; the unbounded form keeps every key seen.
    Supplying only ONE of the pair is almost certainly a mistaken attempt
    at the bounded form, so it raises instead of silently keeping
    every-key-ever state.
    """
    if (ts_col is None) != (within is None):
        raise ValueError(
            "streaming_dedup: pass BOTH ts_col and within for "
            "watermark-bounded dedup, or neither for the unbounded form "
            f"(got ts_col={ts_col!r}, within={within!r})"
        )
    if ts_col is not None and within is not None:
        return df.withWatermark(ts_col, within).dropDuplicatesWithinWatermark(
            key_cols
        )
    return df.dropDuplicates(key_cols)
