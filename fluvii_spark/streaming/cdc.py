"""Streaming CDC changelog apply — the q182 batch semantics (and the
reference's state-table verbs, fluvii/apps/transactions/transaction.py:
151-192: keyed upsert / delete against a compacted table) kept
incrementally: a last-writer-wins fold over an ordered upsert/tombstone
log, emitting each key's CURRENT materialized row as it changes. This is
the micro-batch apply a MERGE-based lakehouse sink runs; the emitted
stream is itself a compacted changelog — the latest emission per key IS
the materialized table (:func:`cdc_snapshot` compacts it).

Semantics, pinned to q182:

- an ``upsert`` row sets the key's value (LWW by the fold's
  ``(ts, order)`` order within a micro-batch, arrival order across
  batches — the reference's partition-ordered consumption contract);
- a ``delete`` row TOMBSTONES the key: the value clears but the
  tombstone is remembered and emitted (a MERGE sink must propagate the
  delete; q182 counts these as ``tombstoned_keys``), and a later upsert
  revives the key;
- state per key is one tiny dict {op, v, n} — O(1) per key forever, the
  RocksDB-friendly shape; the value round-trips through JSON (shortest
  float repr), so re-emitted doubles are bit-equal to the input.

Event-time discipline mirrors ``streaming/sessionize.py``: rows fold in
``(ts_col, order_col)`` order within a micro-batch; cross-batch order is
source append order. NULL keys can't address a table row and NULL ops
can't be applied — both are dropped up front (the streaming-HLL
NULL-guard rule). NULL timestamps are ALSO dropped, and this is a
DOCUMENTED divergence from batch q182, which keeps NULL-ts rows (they
sort last under its DESC LWW window): a key whose ONLY rows carry a NULL
ts appears in the batch rollup but never in this stream. The test corpus
has no NULL ts, so the q182 parity tests hold; a stream cannot order an
un-timestamped change into an LWW fold without inventing a time for it,
so dropping is the honest behavior.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

from fluvii_spark.streaming.state import keyed_schema, streaming_keyed_fold


def events_to_cdc_changelog(events: DataFrame) -> DataFrame:
    """The q182 changelog mapping, shared by the bench, the demo, and the
    parity tests so the three can't drift: views/clicks UPSERT the key's
    value, purchases are tombstones."""
    return events.filter(
        F.col("event_type").isin("view", "click", "purchase")
    ).select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "purchase", "delete")
        .otherwise("upsert")
        .alias("op"),
        F.col("value").alias("v"),
    )


def streaming_cdc_apply(
    changelog: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    op_col: str = "op",
    value_col: str = "v",
) -> DataFrame:
    """(key, op, v, n_applied) per APPLIED change — op is the key's
    current verdict ('upsert' with its live value, or 'delete' with a
    NULL value), n_applied the key's lifetime change count (monotone, so
    ``max(n_applied)`` rows are the compaction frontier)."""

    def app(txn) -> None:
        st = txn.read_table_entry() or {"n": 0}
        row = txn.value()
        op = row[op_col]
        n = int(st.get("n", 0)) + 1
        if op == "delete":
            st = {"op": "delete", "v": None, "n": n}
        else:
            v = row[value_col]
            st = {"op": "upsert", "v": None if v is None else float(v), "n": n}
        txn.update_table_entry(st)
        txn.produce(
            {
                key_col: txn.key,
                "op": st["op"],
                "v": st["v"],
                "n_applied": n,
            }
        )

    src = changelog.filter(
        # a NULL key can't address a table row, a NULL op can't be
        # applied, and a NULL timestamp can't be ordered into an
        # LWW fold (the sessionizer's NULL-guard discipline)
        F.col(key_col).isNotNull()
        & F.col(op_col).isNotNull()
        & F.col(ts_col).isNotNull()
    ).select(
        F.col(key_col),
        F.col(op_col),
        F.col(value_col),
        F.col(ts_col).alias("_ts"),
        F.col(order_col).alias("_ord"),
    )
    return streaming_keyed_fold(
        src,
        [key_col],
        app,
        keyed_schema(key_col, "op STRING, v DOUBLE, n_applied LONG"),
        order_by=["_ts", "_ord"],
    )


def streaming_scd2_fold(
    changes: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    attr_col: str = "k",
    idle_flush_ms: int | None = None,
) -> DataFrame:
    """Streaming SCD type-2 dimension fold — the q126 batch semantics
    kept incrementally: consecutive repeats of a key's attribute collapse;
    an attribute CHANGE closes the open version (emitted with its
    ``[valid_from_ep, valid_to_ep)`` epoch-microsecond interval and its
    1-based version ordinal) and opens a new one. The idle flush emits the
    OPEN version (``valid_to_ep`` NULL) at most ONCE per version and —
    unlike the sessionizer, whose flush IS the session close — KEEPS the
    key's state: a dimension key idle for a day must not lose its version
    ordinal when it finally changes again. If a flushed-open version is
    later closed, the sink holds both rows for (key, version) — exactly
    the upsert a MERGE dimension sink applies (NULL valid_to filled in);
    after a drain+flush the emission log is the complete version history.

    State per key is {k, from, ver, fl} (fl = last flushed ordinal) —
    O(1) per key forever. NULL keys, timestamps, and attributes are
    dropped up front (q126 reads the attribute from JSON where it always
    parses; a NULL attribute can't compare under SCD2's <> rule)."""

    def app(txn) -> None:
        st = txn.read_table_entry()
        row = txn.value()
        k, ep = int(row[attr_col]), int(row["_ep"])
        if st is None:
            txn.update_table_entry({"k": k, "from": ep, "ver": 1, "fl": 0})
            return
        if k == st["k"]:
            return  # consecutive repeat — not a new version
        txn.produce(
            {
                key_col: txn.key,
                "k": st["k"],
                "valid_from_ep": st["from"],
                "valid_to_ep": ep,
                "version": st["ver"],
            }
        )
        txn.update_table_entry(
            {"k": k, "from": ep, "ver": st["ver"] + 1, "fl": st.get("fl", 0)}
        )

    def flush(key, st):
        if (
            st
            and st.get("from") is not None
            and st.get("fl", 0) != st["ver"]
        ):
            return {**st, "fl": st["ver"]}, [
                {
                    key_col: key,
                    "k": st["k"],
                    "valid_from_ep": st["from"],
                    "valid_to_ep": None,
                    "version": st["ver"],
                }
            ]
        return st, []

    src = changes.filter(
        F.col(key_col).isNotNull()
        & F.col(ts_col).isNotNull()
        & F.col(attr_col).isNotNull()
    ).select(
        F.col(key_col),
        F.col(attr_col),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_ep"),
        F.col(ts_col).alias("_ts"),
        F.col(order_col).alias("_ord"),
    )
    return streaming_keyed_fold(
        src,
        [key_col],
        app,
        keyed_schema(
            key_col,
            "k LONG, valid_from_ep LONG, valid_to_ep LONG, version LONG",
        ),
        order_by=["_ts", "_ord"],
        timeout_ms=idle_flush_ms,
        on_timeout=flush if idle_flush_ms is not None else None,
    )


def cdc_snapshot(
    emissions: DataFrame,
    key_col: str = "user_id",
    keep_tombstones: bool = False,
) -> DataFrame:
    """Compact a :func:`streaming_cdc_apply` emission log to the CURRENT
    materialized table: the highest-``n_applied`` row per key (the LWW
    frontier — n_applied is per-key monotone so no timestamp is needed),
    minus tombstoned keys unless ``keep_tombstones``."""
    w = Window.partitionBy(key_col).orderBy(F.desc("n_applied"))
    cur = (
        emissions.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    return cur if keep_tombstones else cur.filter(F.col("op") != "delete")
