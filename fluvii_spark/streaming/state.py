"""Keyed state tables: the reference's "tabling" feature on Spark state stores.

The reference keeps one SQLite dict per Kafka partition, consistent with a
compacted changelog topic, and exposes exactly three state verbs on its
transaction object (all keyed strictly on the current message's key):

- ``read_table_entry()``  — fluvii/apps/transactions/transaction.py:180-184
- ``update_table_entry(v)`` — transaction.py:186-188
- ``delete_table_entry()``  — transaction.py:190-192

State values are "anything json.dumps-able" (README.md:599-601, sqlite.py:96).
Changelog mirroring, offset bookkeeping, rebalance recovery and write caching
(reference ST4-ST7, ~400 LoC) are subsumed by Spark's checkpointed state
store: ``applyInPandasWithState`` restores per-key state from the checkpoint
on restart, so none of that machinery is reimplemented here.

Scale notes (100 TB):
- state lives in the executor-side state store partitioned by key — no
  driver involvement, horizontal by ``spark.sql.shuffle.partitions``;
- the user fold runs over Arrow batches (pandas), not per-row Python calls
  across the JVM boundary;
- per-key ordering inside a micro-batch is made explicit via ``order_by``
  (the reference inherits Kafka per-partition order; a shuffled DataFrame
  must re-establish it).
"""

from __future__ import annotations

import json
import sys
from collections.abc import Callable, Iterable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import StructType

from fluvii_spark.session import ensure_package_on_workers

# The fold closures shipped to executors reference this module's helpers
# (TableTransaction, _fold_rows). Workers generally can't import fluvii_spark
# (it is not pip-installed on executors), so have cloudpickle serialize this
# module's objects BY VALUE — the shipped function becomes self-contained.
try:  # pragma: no cover - depends on pyspark's vendored cloudpickle version
    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(sys.modules[__name__])
except Exception:
    pass

_UNSET = object()

# Distinct delete tombstone: the reference stores the string sentinel
# '-DELETED-' (transaction.py:191) which we deliberately do NOT port
# (SURVEY.md §7 "non-standard semantics") — deletes here are real state-store
# removes. The tombstone is an internal marker only, so ``None`` remains a
# legitimately storable state value ("anything json.dumps-able" includes
# JSON null, README.md:599-601).
_DELETED = object()


class TableTransaction:
    """Per-message view handed to the user's ``app_function``.

    Mirrors the surface of fluvii's ``TableTransaction`` (message accessors:
    transaction.py:61-77; state verbs: :180-192; produce: :86-96) minus
    Kafka-specific plumbing. ``produce`` may be called 0..n times per message
    — 0 is a filter, n is a flatMap — exactly the reference's contract
    (README.md:139-152).
    """

    def __init__(self, key: Any, message: dict, state_value: Any):
        self._key = key
        self._message = message
        self._state = state_value
        self._pending: Any = _UNSET
        self._produced: list[dict] = []

    @property
    def key(self) -> Any:
        return self._key

    def value(self) -> dict:
        """The current message as a dict (reference: ``transaction.value()``)."""
        return self._message

    # -- state verbs (ST1-ST3) ------------------------------------------------
    def read_table_entry(self) -> Any:
        if self._pending is _DELETED:
            return None
        if self._pending is not _UNSET:
            return self._pending
        return self._state

    def update_table_entry(self, value: Any) -> None:
        json.dumps(value)  # enforce the reference's json-able contract early
        self._pending = value

    def delete_table_entry(self) -> None:
        self._pending = _DELETED

    # -- output ---------------------------------------------------------------
    def produce(self, value: dict) -> None:
        self._produced.append(value)

    # internal: fold one message, returning (new_state, produced_rows, dirty)
    def _apply(
        self, app_function: Callable[["TableTransaction"], None]
    ) -> tuple[Any, list[dict], bool]:
        app_function(self)
        dirty = self._pending is not _UNSET
        new_state = self._state if self._pending is _UNSET else self._pending
        return new_state, self._produced, dirty


def _fold_rows(
    key: Any,
    rows: Iterable[dict],
    state_value: Any,
    app_function: Callable[[TableTransaction], None],
    initial_state: Any = None,
) -> tuple[Any, list[dict], bool]:
    """Fold messages through ``app_function``; returns (state, rows, dirty).

    ``state`` may be the ``_DELETED`` tombstone (the last verb was a delete);
    a message arriving after a delete in the same fold reads
    ``initial_state``, exactly what it would read in the next micro-batch
    after the store remove.
    """
    out: list[dict] = []
    st = state_value
    dirty = False
    for message in rows:
        view = initial_state if st is _DELETED else st
        txn = TableTransaction(key, message, view)
        st, produced, d = txn._apply(app_function)
        dirty = dirty or d
        out.extend(produced)
    return st, out, dirty


def _ddl_column_names(fixed_cols: str) -> list[str]:
    """Column names from a DDL fragment, splitting only on TOP-LEVEL commas
    — commas inside parameterized/nested types (``DECIMAL(10,2)``,
    ``MAP<STRING,LONG>``, ``STRUCT<a:INT,b:INT>``) belong to the type, not
    the column list, so a naive ``split(',')`` would hand back fragments
    like ``'2)'`` as phantom column names (ADVICE r8)."""
    names, depth, start = [], 0, 0
    for i, ch in enumerate(fixed_cols):
        if ch in "(<[":
            depth += 1
        elif ch in ")>]":
            depth -= 1
        elif ch == "," and depth == 0:
            names.append(fixed_cols[start:i])
            start = i + 1
    names.append(fixed_cols[start:])
    return [c.strip().split(" ")[0].split(":")[0] for c in names if c.strip()]


def keyed_schema(key_col: str, fixed_cols: str, key_type: str = "LONG") -> str:
    """Output schema for a keyed fold: the group key followed by the fold's
    fixed columns. Built structurally — string-templating would silently
    corrupt the schema whenever ``key_col`` collides with a fixed column
    name (e.g. a funnel keyed on a column named 'stage'), so collisions are
    rejected instead; a non-LONG key passes its type explicitly. The
    collision check parses top-level columns only (see
    :func:`_ddl_column_names`), so parameterized types can't hide or fake
    a collision."""
    fixed_names = _ddl_column_names(fixed_cols)
    if key_col in fixed_names:
        raise ValueError(
            f"key_col {key_col!r} collides with an output column "
            f"({fixed_names}) — rename the key before folding"
        )
    return f"{key_col} {key_type}, {fixed_cols}"


def _sorted_records(pdf: pd.DataFrame, order_by: list[str] | None) -> list[dict]:
    if order_by:
        pdf = pdf.sort_values(order_by, kind="mergesort")
    return pdf.to_dict("records")


def streaming_keyed_fold(
    df: DataFrame,
    key_cols: list[str],
    app_function: Callable[[TableTransaction], None],
    output_schema: StructType | str,
    order_by: list[str] | None = None,
    initial_state: Any = None,
    timeout_ms: int | None = None,
    on_timeout: Callable[[Any, Any], tuple[Any, list[dict]]] | None = None,
) -> DataFrame:
    """Run ``app_function`` per message with durable per-key state.

    Streaming equivalent of the reference's ``FluviiTableApp`` run loop
    (fluvii/apps/fluvii_table_app.py + fluvii/apps/fluvii_app.py:53-72):
    consume → user fold with state verbs → produce, with state persisted in
    Spark's checkpointed state store instead of SQLite+changelog. Restart
    recovery (reference ST4, rebalance_manager.py) is the checkpoint itself.

    State envelope: one JSON string per key — the reference's "any json
    value" contract (sqlite.py:96). ``state.exists`` distinguishes absent
    keys; explicit deletes remove the entry.

    **State expiry** (no reference counterpart — its SQLite tables grow
    forever): pass ``timeout_ms`` to arm a processing-time timer per key;
    when a key sees no input for that long, ``on_timeout(key, state) ->
    (new_state | None, rows)`` runs at the next trigger — return ``None``
    state to drop the key (bounded state at 100 TB), rows to emit a final
    record (session-close semantics), or the SAME state object (identity)
    to keep the key and STOP its timer: one final rewrite clears the
    stored timeout (Spark re-fires a stale timestamp every timer batch if
    the row isn't rewritten) and the timer is not re-armed until the key's
    next input — so a fully-flushed idle key costs one rewrite total, not
    one per timeout_ms forever.
    """
    ensure_package_on_workers(df.sparkSession)
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            st = json.loads(state.get[0])
        else:
            st = initial_state
        k = key[0] if len(key) == 1 else key
        out_rows: list[dict] = []
        dirty = False
        rearm = True
        if timeout_ms is not None and state.hasTimedOut:
            new_state, rows = (
                on_timeout(k, st) if on_timeout else (None, [])
            )
            out_rows.extend(rows)
            if new_state is None:
                # on_timeout's documented contract: None state drops the key
                st = _DELETED
                dirty = True
            elif new_state is st:
                # 'keep state, stop the timer': returning the SAME object
                # means nothing changed — rewrite once WITHOUT re-arming,
                # which clears the stored timeout (Spark keeps the old,
                # already-past timestamp if the row isn't rewritten, so the
                # timer would re-fire every timer batch forever — churn
                # proportional to the total keyspace at 100 TB). The key's
                # next input re-arms its timer.
                dirty = True
                rearm = False
            else:
                st = new_state
                dirty = True
        else:
            # A key's rows arrive as an ITERATOR of Arrow chunks (split at
            # spark.sql.execution.arrow.maxRecordsPerBatch); sorting chunks
            # independently is not a total order per key. Materialize the
            # key's batch and sort ONCE — correctness requires it, and the
            # memory bound is per (key, micro-batch), not per partition.
            chunks = [pdf for pdf in pdfs if len(pdf)]
            if chunks:
                records = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
                st, produced, dirty = _fold_rows(
                    k, _sorted_records(records, order_by), st, app_function,
                    initial_state,
                )
                out_rows.extend(produced)
        if st is _DELETED:
            if state.exists:
                state.remove()
        elif dirty or state.exists or st is not None:
            # untouched absent keys with a None initial state store nothing
            # (no state-store growth for stateless usage); an explicit
            # update_table_entry(None) IS stored — JSON null is a value.
            state.update((json.dumps(st),))
            if timeout_ms is not None and rearm:
                state.setTimeoutDuration(timeout_ms)
        if out_rows:
            yield pd.DataFrame(out_rows)

    return df.groupBy(*key_cols).applyInPandasWithState(
        fn,
        outputStructType=output_schema,
        stateStructType="state STRING",
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if timeout_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


def batch_keyed_fold(
    df: DataFrame,
    key_cols: list[str],
    app_function: Callable[[TableTransaction], None],
    output_schema: StructType | str,
    order_by: list[str] | None = None,
    initial_state: Any = None,
    emit_state: bool = False,
    state_schema: StructType | str = "key STRING, state STRING",
) -> DataFrame:
    """Batch form of the same fold: whole history per key in one pass.

    Used for oracle parity (same ``app_function``, same per-key order,
    deterministic) and for backfills — the reference has no batch mode at
    all; replaying a topic from offset 0 (its ``TopicDumperApp``,
    kafka_tools/topic_dumper.py) is the closest analogue.

    ``emit_state=True`` returns one row per key with the final JSON state
    instead of the produced messages (the "table dump" view).
    """
    ensure_package_on_workers(df.sparkSession)

    def fn(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        k = key[0] if len(key) == 1 else key
        st, produced, dirty = _fold_rows(
            k, _sorted_records(pdf, order_by), initial_state, app_function,
            initial_state,
        )
        if emit_state:
            if st is _DELETED or (st is None and not dirty):
                return pd.DataFrame({"key": [], "state": []})
            return pd.DataFrame({"key": [str(k)], "state": [json.dumps(st)]})
        return pd.DataFrame(produced)

    schema = state_schema if emit_state else output_schema
    return df.groupBy(*key_cols).applyInPandas(fn, schema=schema)
