"""Streaming ordered-subsequence counter — the q250 batch semantics kept
incrementally: per user, the number of view → click → purchase
SUBSEQUENCES (every ordered triple, not just first occurrences — the
funnel twin `streaming/funnel.py` latches firsts; this one counts all).

The batch query is a two-level window-prefix-sum dynamic program; the
same DP folds incrementally with O(stages) counters per key:

    on stage-0 event:  c0 += 1
    on stage-i event:  ci += c(i-1)       (every prefix ending just
                                           before this event extends)

so the state per key is one tiny counter vector — never a buffer of
events — and the final counter equals batch q250's n_paths exactly
(same (ts, order) fold order; parity pinned by
tests/test_subsequence_stream.py against the registered batch query).
Each event that completes the LAST stage emits the key's updated total,
so the emission log is a monotone per-key counter stream: the latest
row per key IS the current count (cdc_snapshot-style compaction by max).

Reference behavior replaced: the per-message stateful-app idiom
(fluvii/apps/transactions/transaction.py state verbs; README.md:342-351's
running-counter example) — expressed as one reusable operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fluvii_spark.streaming.state import keyed_schema, streaming_keyed_fold

Q250_STAGES: tuple[str, ...] = ("view", "click", "purchase")


def streaming_subsequence_count(
    events: DataFrame,
    stages: tuple[str, ...] | None = None,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_col: str = "event_id",
) -> DataFrame:
    """(key, n_complete) per completed-subsequence event — one row each
    time a key's final-stage event lands, carrying the key's updated
    TOTAL subsequence count (monotone per key; compact with
    ``max(n_complete)``). ``stages`` is the ordered event-type ladder;
    defaults to q250's view → click → purchase."""
    ladder = Q250_STAGES if stages is None else tuple(stages)
    if len(ladder) < 2:
        raise ValueError("stages must name at least two event types")
    if len(set(ladder)) != len(ladder):
        raise ValueError(f"stage event types must be distinct: {ladder}")
    idx = {t: i for i, t in enumerate(ladder)}
    last = len(ladder) - 1

    def app(txn) -> None:
        st = txn.read_table_entry() or [0] * len(ladder)
        i = idx[txn.value()[type_col]]
        if i == 0:
            st[0] += 1
        else:
            st[i] += st[i - 1]
        txn.update_table_entry(st)
        if i == last and st[last] > 0:
            txn.produce({key_col: txn.key, "n_complete": st[last]})

    src = events.filter(
        F.col(key_col).isNotNull()
        & F.col(ts_col).isNotNull()
        & F.col(type_col).isin(*ladder)
    ).select(
        F.col(key_col),
        F.col(type_col),
        F.col(ts_col).alias("_ts"),
        F.col(order_col).alias("_ord"),
    )
    return streaming_keyed_fold(
        src,
        [key_col],
        app,
        keyed_schema(key_col, "n_complete LONG"),
        order_by=["_ts", "_ord"],
    )
