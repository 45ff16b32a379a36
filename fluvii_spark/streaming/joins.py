"""Streaming joins (SURVEY.md §2.2 "Streaming: joins" — absent in the
reference, whose only join-like tool is key-equality state lookup,
``/root/reference/README.md:596-598``).

Two built-in Spark forms, wrapped with the watermark bookkeeping spelled
out:

- **stream-static**: enrich a stream against a (periodically reloaded)
  batch dimension — broadcast by Catalyst when small; no state.
- **stream-stream**: both sides buffered in the state store; REQUIRES
  watermarks on both sides plus a time-bound join condition so state can be
  evicted — unbounded joins are rejected here rather than silently growing
  state (the 100 TB failure mode).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def stream_static_join(
    stream: DataFrame,
    static_dim: DataFrame,
    on: list[str] | Column,
    how: str = "inner",
) -> DataFrame:
    """Enrich a stream with a static dimension (per-micro-batch join)."""
    return stream.join(static_dim, on, how)


def stream_stream_join(
    left: DataFrame,
    left_ts: str,
    left_delay: str,
    right: DataFrame,
    right_ts: str,
    right_delay: str,
    condition: Column,
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream join.

    ``condition`` must include the equality keys AND a time bound between
    ``left_ts`` and ``right_ts`` (e.g. ``r.ts BETWEEN l.ts - INTERVAL 1 HOUR
    AND l.ts``); without the bound Spark must keep every row forever. Both
    inputs get their watermark here so callers can't forget one side.
    """
    wl = left.withWatermark(left_ts, left_delay)
    wr = right.withWatermark(right_ts, right_delay)
    return wl.join(wr, condition, how)
