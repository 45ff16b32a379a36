"""Streaming dual-constraint sessionization — the q226 batch semantics
kept incrementally: a session closes on a >``gap_s`` idle gap OR when an
event crosses into the next ``cap_s``-wide chunk window (the hard cap
that stops a bot's week-long click stream from forming one session).

Cap anchoring matches q226 EXACTLY: chunk windows are fixed intervals
``[origin + i*cap_s, origin + (i+1)*cap_s)`` anchored at the GAP
session's first event (``chunk = (ep - origin) DIV cap_s``), NOT
re-anchored at each chunk's first event. For epochs 0,1000,2500,3800
with gap_s=cap_s=1800 that yields THREE chunks ({0,1000},{2500},{3800})
— 3800 lands in window [3600,5400) while 2500's window is [1800,3600) —
exactly the batch assignment; a re-anchoring fold would merge the last
two. Only a gap close moves the anchor.

Closed sessions are emitted as they close; the tail session of a key is
emitted only by the idle-timeout flush (``idle_flush_ms``), mirroring
Spark's own ``session_window`` watermark-close behavior while keeping the
cap rule Spark's built-in cannot express declaratively. State per key is
one tiny dict (origin/first/last/count/ordinal) — O(1) per user forever,
the shape that survives 100 TB keyspaces on RocksDB.

Event-time discipline: events are folded in ``(ts, event_id)`` order
WITHIN a micro-batch (the fold's order_by); cross-batch order is the
source's append order, exactly the contract of the reference's
partition-ordered Kafka consumption (fluvii consumes partitions in offset
order). Epochs are whole-second floors — the same pin as q226's oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fluvii_spark.streaming.state import streaming_keyed_fold

SESSION_SCHEMA = (
    "user_id LONG, session_no LONG, n_events LONG, span_s LONG, "
    "closed_by STRING"
)


def _migrate(st: dict | None) -> dict | None:
    """Tolerate checkpoints written by the pre-r7 fold, whose state kept
    a single 'start' key (the cap re-anchored at each chunk's first
    event): map it onto the batch-anchored shape so a restart never
    raises KeyError or silently drops an open session.

    BEST-EFFORT, not exact batch parity: under the old rule 'start' is
    the CURRENT CHUNK's first event, not the gap session's first event,
    so if the old fold had already crossed a cap boundary the migrated
    'origin' sits one-or-more cap widths later than batch q226's anchor
    — an in-flight session restored from a pre-r7 checkpoint can emit
    cap boundaries that diverge from batch until its next GAP close
    (which resets the anchor and restores exact parity). Sessions that
    had not crossed a cap boundary migrate exactly."""
    if st is not None and "origin" not in st and "start" in st:
        return {
            "origin": st["start"],
            "first": st["start"],
            "last": st["last"],
            "n": st["n"],
            "sid": st["sid"],
        }
    return st


def streaming_sessions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    gap_s: int = 1800,
    cap_s: int = 1800,
    idle_flush_ms: int | None = None,
) -> DataFrame:
    """(user_id, session_no, n_events, span_s, closed_by) per CLOSED
    session. ``closed_by`` ∈ {'gap', 'cap', 'flush'} — flush rows appear
    only with ``idle_flush_ms`` set (idle keys emit their open tail and
    drop their state)."""

    def app(txn) -> None:
        st = _migrate(txn.read_table_entry())
        ep = int(txn.value()["ep"])
        if st is None:
            txn.update_table_entry(
                {"origin": ep, "first": ep, "last": ep, "n": 1, "sid": 0}
            )
            return
        # q226 parity: gap closes on STRICTLY greater idle and MOVES the
        # chunk anchor; cap closes when the event's fixed chunk window
        # ((ep - origin) DIV cap_s) differs from the open chunk's — the
        # anchor stays at the gap session's first event
        if ep - st["last"] > gap_s:
            txn.produce(
                {
                    "user_id": txn.key,
                    "session_no": st["sid"],
                    "n_events": st["n"],
                    "span_s": st["last"] - st["first"],
                    "closed_by": "gap",
                }
            )
            txn.update_table_entry(
                {
                    "origin": ep,
                    "first": ep,
                    "last": ep,
                    "n": 1,
                    "sid": st["sid"] + 1,
                }
            )
            return
        if (ep - st["origin"]) // cap_s != (st["first"] - st["origin"]) // cap_s:
            txn.produce(
                {
                    "user_id": txn.key,
                    "session_no": st["sid"],
                    "n_events": st["n"],
                    "span_s": st["last"] - st["first"],
                    "closed_by": "cap",
                }
            )
            txn.update_table_entry(
                {
                    "origin": st["origin"],
                    "first": ep,
                    "last": ep,
                    "n": 1,
                    "sid": st["sid"] + 1,
                }
            )
            return
        st["last"] = ep
        st["n"] += 1
        txn.update_table_entry(st)

    def flush(key, st):
        st = _migrate(st)
        if st and st.get("first") is not None:
            return None, [
                {
                    "user_id": key,
                    "session_no": st["sid"],
                    "n_events": st["n"],
                    "span_s": st["last"] - st["first"],
                    "closed_by": "flush",
                }
            ]
        return None, []

    src = events.filter(
        # a NULL key can't form a session and a NULL timestamp can't be
        # ordered into one — drop both up front instead of crashing the
        # stream in the fold (the streaming-HLL NULL-guard rule)
        F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(
        F.col(user_col).alias("user_id"),
        F.unix_timestamp(F.col(ts_col)).alias("ep"),
        F.col(ts_col).alias("_ts"),
        F.col(order_col).alias("_ord"),
    )
    return streaming_keyed_fold(
        src,
        ["user_id"],
        app,
        SESSION_SCHEMA,
        order_by=["_ts", "_ord"],
        timeout_ms=idle_flush_ms,
        on_timeout=flush if idle_flush_ms is not None else None,
    )
