"""As-of join: for each left row, the latest right row at-or-before its
timestamp (per key) — the time-series join Spark lacks as a built-in
(SURVEY.md §2.2 joins row: "as-of via window + last()").

Physical strategy — the union trick, all built-ins:

1. tag both sides, union them (left carries null right-payload columns);
2. one window per key ordered by (ts, side) — right rows sort before left
   rows at equal timestamps so ``<=`` semantics hold;
3. ``last(struct(right_row), ignorenulls=True)`` over the unbounded-
   preceding frame carries the latest right ROW forward as a unit — the
   struct is null exactly on left rows, so a NULL field inside a matched
   right row stays NULL instead of leaking an older row's value;
4. keep only left rows, unpack the struct.

Cost: ONE shuffle on the key (the window), no join at all — compare a naive
range-join (shuffle both sides + per-key quadratic probe) or per-key
``merge_asof`` in pandas (loses distribution). Skewed keys behave like any
window: one key's rows land in one partition — salt upstream if a single
key dominates.

``tolerance`` (seconds) optionally voids matches older than ``left_ts −
tolerance`` — same semantics as pandas ``merge_asof(tolerance=...)``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _is_ts(dtype: T.DataType) -> bool:
    return isinstance(dtype, (T.TimestampType, T.TimestampNTZType))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    right_payload: list[str] | None = None,
    tolerance_s: float | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join. Output: every left row + matched right payload
    columns (null when no right row matches / within tolerance).

    ``direction`` mirrors pandas ``merge_asof``: ``"backward"`` (default)
    matches the LATEST right row at-or-before the left timestamp;
    ``"forward"`` the EARLIEST right row at-or-after it (same union-window
    plan, ordered descending). ``tolerance_s`` bounds |right_ts − left_ts|
    on the matching side.

    Right-side (key, ts) duplicates should be resolved by the caller (e.g.
    keep max payload per ts) — with duplicates the carried row is the last
    in (ts, payload-order), deterministic but possibly surprising.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    payload = right_payload or [
        c for c in right.columns if c not in set(key_cols) | {right_ts}
    ]
    if "_asof_ts" in payload:
        # the carried-struct field below would collide with the match
        # timestamp and make the `_r._asof_ts` extraction ambiguous
        raise ValueError(
            "right payload column '_asof_ts' collides with the as-of "
            "carry struct's timestamp field; rename it before joining"
        )
    l_cols = [c for c in left.columns if c not in set(key_cols)]

    lt = left.select(
        *key_cols,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in l_cols if c != left_ts],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in payload],
    )
    rt = right.select(
        *key_cols,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in l_cols if c != left_ts],
        *[F.col(c).alias(f"_r_{c}") for c in payload],
    )
    unioned = lt.unionByName(rt)
    # backward: ascending (ts, side) — right (side 0) sorts before left at
    # equal ts, so <= semantics hold; forward: descending ts with right
    # still ahead of left at equal ts, so >= semantics hold symmetrically
    ts_order = F.col("_ts") if direction == "backward" else F.col("_ts").desc()
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(ts_order, "_side", *[f"_r_{c}" for c in payload])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # the matched right row is carried as ONE struct (null only on left
    # rows), never column-by-column: independent last(ignorenulls) per
    # payload column would let a NULL field in the matched row fall back to
    # a STALE older row's value — and with several payload columns could
    # stitch together a right row that never existed, while the tolerance
    # gate below validates against the newest row's timestamp only.
    r_row = F.when(
        F.col("_side") == 0,
        F.struct(
            # collision-proof field name: a right payload column named
            # plain 'ts' must not create a duplicate struct field
            F.col("_ts").alias("_asof_ts"),
            *[F.col(f"_r_{c}").alias(c) for c in payload],
        ),
    )
    carried = unioned.select(
        *key_cols,
        "_ts",
        "_side",
        *[F.col(c) for c in l_cols if c != left_ts],
        F.last(r_row, ignorenulls=True).over(w).alias("_r"),
    )
    out = carried.filter(F.col("_side") == 1).select(
        *key_cols,
        "_ts",
        *[F.col(c) for c in l_cols if c != left_ts],
        *[F.col(f"_r.{c}").alias(f"_r_{c}") for c in payload],
        F.col("_r._asof_ts").alias("_asof_r_ts"),
    )
    if tolerance_s is not None:
        # integer-microsecond gate when both sides are timestamps — a float
        # seconds comparison can flip <= at an exact-tolerance boundary
        # (unix_micros/1e6 rounds ~0.24 µs at current epochs), violating
        # the package rule that integer predicates decide membership.
        # TIMESTAMP_NTZ refuses a direct double cast; the session is pinned
        # to UTC so the NTZ→TIMESTAMP cast preserves the instant.
        if _is_ts(left.schema[left_ts].dataType) and _is_ts(
            right.schema[right_ts].dataType
        ):
            l_v = F.unix_micros(F.col("_ts").cast("timestamp"))
            r_v = F.unix_micros(F.col("_asof_r_ts").cast("timestamp"))
            tol = F.lit(int(round(float(tolerance_s) * 1e6)))
        else:
            l_v = F.col("_ts").cast("double")
            r_v = F.col("_asof_r_ts").cast("double")
            tol = F.lit(float(tolerance_s))
        gap = l_v - r_v if direction == "backward" else r_v - l_v
        within = F.col("_asof_r_ts").isNotNull() & (gap <= tol)
        out = out.select(
            *key_cols,
            "_ts",
            *[F.col(c) for c in l_cols if c != left_ts],
            *[
                F.when(within, F.col(f"_r_{c}")).alias(f"_r_{c}")
                for c in payload
            ],
        )
    return out.select(
        *key_cols,
        F.col("_ts").alias(left_ts),
        *[F.col(c) for c in l_cols if c != left_ts],
        *[F.col(f"_r_{c}").alias(f"right_{c}") for c in payload],
    )
