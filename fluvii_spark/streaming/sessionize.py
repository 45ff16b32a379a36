"""Streaming dual-constraint sessionization — the q226 batch semantics
kept incrementally: a session closes on a >``gap_s`` idle gap OR when an
event lands ``cap_s`` or more seconds after the session start (the hard
cap that stops a bot's week-long click stream from forming one session).

Closed sessions are emitted as they close; the tail session of a key is
emitted only by the idle-timeout flush (``idle_flush_ms``), mirroring
Spark's own ``session_window`` watermark-close behavior while keeping the
cap rule Spark's built-in cannot express declaratively. State per key is
one tiny dict (start/last/count/ordinal) — O(1) per user forever, the
shape that survives 100 TB keyspaces on RocksDB.

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
        st = txn.read_table_entry()
        ep = int(txn.value()["ep"])
        if st is None:
            txn.update_table_entry(
                {"start": ep, "last": ep, "n": 1, "sid": 0}
            )
            return
        # q226 parity: gap closes on STRICTLY greater idle, cap closes
        # when the elapsed time reaches cap_s (chunk = elapsed DIV cap)
        if ep - st["last"] > gap_s or ep - st["start"] >= cap_s:
            txn.produce(
                {
                    "user_id": txn.key,
                    "session_no": st["sid"],
                    "n_events": st["n"],
                    "span_s": st["last"] - st["start"],
                    "closed_by": (
                        "gap" if ep - st["last"] > gap_s else "cap"
                    ),
                }
            )
            txn.update_table_entry(
                {"start": ep, "last": ep, "n": 1, "sid": st["sid"] + 1}
            )
            return
        st["last"] = ep
        st["n"] += 1
        txn.update_table_entry(st)

    def flush(key, st):
        if st and st.get("start") is not None:
            return None, [
                {
                    "user_id": key,
                    "session_no": st["sid"],
                    "n_events": st["n"],
                    "span_s": st["last"] - st["start"],
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
