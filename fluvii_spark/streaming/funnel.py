"""Streaming conversion funnel — the q89 batch semantics (ordered
first-occurrence stages with conversion horizons: first view → first
click within 24 h → first purchase within 72 h of that click) kept
incrementally: one keyed fold emits a row the moment a user REACHES a
stage, so downstream dashboards see funnel movement per micro-batch
instead of per batch-job.

Parity with q89 is exact by construction: the batch query takes, per
stage, the MIN event time among events strictly after the previous
stage's time and within the stage's horizon; the fold processes events
in (ts, order) order and latches the FIRST qualifying event — the same
element. State per key is one small list of reached-stage epochs — O(1)
per user forever (never a buffer of events), the RocksDB shape.

Reference behavior being replaced: the per-message stateful-app idiom
(fluvii/apps/transactions/transaction.py state verbs driving hand-rolled
per-key funnels, README.md:342-351's running-state example) — expressed
as one reusable operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fluvii_spark.streaming.state import keyed_schema, streaming_keyed_fold

# q89's exact stage ladder: (event_type, horizon in µs from the previous
# stage's epoch; None = unbounded first occurrence)
Q89_STAGES: list[tuple[str, int | None]] = [
    ("view", None),
    ("click", 24 * 3600 * 1_000_000),
    ("purchase", 72 * 3600 * 1_000_000),
]


def streaming_funnel(
    events: DataFrame,
    stages: list[tuple[str, int | None]] | None = None,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_col: str = "event_id",
) -> DataFrame:
    """(key, stage_idx, stage, reached_ep) per stage COMPLETION — one row
    the first time a key qualifies for each stage. ``stages`` is an
    ordered list of (event_type, horizon_us): stage i qualifies on the
    first event of its type strictly after stage i-1's epoch and within
    ``horizon_us`` of it (None = no horizon; stage 0's horizon is
    ignored). Defaults to q89's view→click(24h)→purchase(72h) ladder."""
    ladder = Q89_STAGES if stages is None else stages
    if not ladder:
        raise ValueError("stages must name at least one (type, horizon)")
    types = [t for t, _ in ladder]
    if len(set(types)) != len(types):
        raise ValueError(f"stage event types must be distinct: {types}")

    def app(txn) -> None:
        # state: list of reached epochs, one slot per stage (None = not
        # yet) — latched, so replay/idempotent per (ts, order) position
        st = txn.read_table_entry() or [None] * len(ladder)
        row = txn.value()
        etype, ep = row[type_col], int(row["_ep"])
        for i, (stage_type, horizon) in enumerate(ladder):
            if etype != stage_type or st[i] is not None:
                continue
            if i > 0:
                prev = st[i - 1]
                if prev is None or ep <= prev:
                    break  # out-of-order arrival can't qualify
                if horizon is not None and ep - prev > horizon:
                    break
            st[i] = ep
            txn.update_table_entry(st)
            txn.produce(
                {
                    key_col: txn.key,
                    "stage_idx": i,
                    "stage": stage_type,
                    "reached_ep": ep,
                }
            )
            break

    src = events.filter(
        F.col(key_col).isNotNull()
        & F.col(ts_col).isNotNull()
        & F.col(type_col).isin(types)
    ).select(
        F.col(key_col),
        F.col(type_col),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_ep"),
        F.col(ts_col).alias("_ts"),
        F.col(order_col).alias("_ord"),
    )
    return streaming_keyed_fold(
        src,
        [key_col],
        app,
        keyed_schema(key_col, "stage_idx INT, stage STRING, reached_ep LONG"),
        order_by=["_ts", "_ord"],
    )
