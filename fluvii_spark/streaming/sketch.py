"""Streaming sketches: bounded-state approximate aggregates per key.

KMV (k-minimum-values) is the sketch the batch inventory checks exactly
(q102/q104: md5-uniform hashes make it bit-deterministic, so the DuckDB
oracle verifies the sketch itself). The streaming form keeps the SAME
O(k) state per key in the checkpointed state store: folding a hash into a
k-min set is commutative and idempotent, so the streaming result equals the
batch sketch on the same data regardless of arrival order, micro-batching,
or replay — the property that makes the sketch safe under Spark's
restart/recovery semantics (a replayed batch re-inserts hashes that are
already in the set).

No reference counterpart (fluvii state is a user-managed JSON blob —
SURVEY.md §2.1 ST1-ST3); this composes the reference's keyed-fold contract
with the q102 sketch definition.
"""

from __future__ import annotations

import bisect
import sys

from pyspark.sql import DataFrame

from fluvii_spark.streaming.state import streaming_keyed_fold

try:  # ship by value — executors may lack the package path (see state.py)
    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover
    pass

KMV_K = 64


def streaming_kmv_distinct(
    df: DataFrame,
    key_col: str,
    hash_col: str,
    k: int = KMV_K,
    order_by: list[str] | None = None,
    backend: str = "v1",
) -> DataFrame:
    """Streaming KMV distinct-count estimate per key.

    ``hash_col`` must be a uniform [0, 1) hash of the counted value (use the
    q102 convention: ``conv(substr(md5(v), 1, 8), 16, 10) / 2^32`` so batch
    and stream agree bit-for-bit). State per key is the ascending list of
    the k smallest DISTINCT hashes — O(k) forever, mergeable. Emits
    ``(key, n_kept, estimate)`` per message; ``(n_kept, estimate)`` is
    non-decreasing over a key's lifetime, so the row with the maximum
    estimate is the current one.
    """

    def app(txn) -> None:
        st = txn.read_table_entry() or []
        h = txn.value()[hash_col]
        i = bisect.bisect_left(st, h)
        if not (i < len(st) and st[i] == h):  # set-insert: replay-idempotent
            st.insert(i, h)
            del st[k:]
            txn.update_table_entry(st)
        n = len(st)
        est = float(n) if n < k else (k - 1) / st[-1]
        txn.produce({key_col: txn.key, "n_kept": n, "estimate": est})

    if backend == "v2":  # transformWithStateInPandas (typed state, RocksDB)
        from fluvii_spark.streaming.state_v2 import streaming_keyed_fold_v2

        fold = streaming_keyed_fold_v2
    else:
        fold = streaming_keyed_fold
    # derive the key's output type from the input schema — a bigint user_id
    # must not be silently re-typed to string by the fold's output contract
    key_type = df.schema[key_col].dataType.simpleString()
    return fold(
        df.select(key_col, hash_col),
        [key_col],
        app,
        output_schema=f"{key_col} {key_type}, n_kept long, estimate double",
        order_by=order_by,
    )
