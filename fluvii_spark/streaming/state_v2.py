"""transformWithStateInPandas backend (Spark 4.x): the same TableTransaction
fold on the newer stateful API.

Why a second backend: ``applyInPandasWithState`` (state.py) is the stable
API; ``transformWithStateInPandas`` adds typed state variables, native TTL
and timers, and works only on the RocksDB state store provider — the
configuration a 100 TB deployment runs anyway. The user contract
(``app_function(txn)`` with read/update/delete/produce) is identical, so
pipelines can switch backends with one import.

Runtime requirements beyond state.py: the ``protobuf`` Python package
(the API's Arrow state-server protocol) — absent in minimal dev images, in
which case use the state.py backend; the module imports fine either way and
tests skip themselves.
"""

from __future__ import annotations

import json
import sys
from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import StringType, StructField, StructType

from fluvii_spark.streaming.state import _DELETED, _fold_rows, _sorted_records
from fluvii_spark.session import ensure_package_on_workers

try:  # ship by value — executors lack the package (see state.py)
    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover
    pass


class _FoldProcessor(StatefulProcessor):
    """Adapts the TableTransaction fold to the StatefulProcessor lifecycle."""

    def __init__(
        self,
        app_function: Callable,
        order_by: list[str] | None,
        initial_state: Any,
        ttl_ms: int | None,
    ):
        self._app_function = app_function
        self._order_by = order_by
        self._initial_state = initial_state
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        schema = StructType([StructField("json", StringType(), True)])
        self._state = handle.getValueState("table", schema, self._ttl_ms)

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: Any
    ) -> Iterator[pd.DataFrame]:
        if self._state.exists():
            st = json.loads(self._state.get()[0])
        else:
            st = self._initial_state
        k = key[0] if isinstance(key, tuple) and len(key) == 1 else key
        out: list[dict] = []
        dirty = False
        # materialize + sort ONCE per key: the rows iterator yields Arrow
        # chunks, and sorting each chunk independently is not a total order
        # (see streaming_keyed_fold)
        chunks = [pdf for pdf in rows if len(pdf)]
        if chunks:
            records = (
                pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
            )
            st, produced, dirty = _fold_rows(
                k,
                _sorted_records(records, self._order_by),
                st,
                self._app_function,
                self._initial_state,
            )
            out.extend(produced)
        if st is _DELETED:
            self._state.clear()
        elif dirty or self._state.exists() or st is not None:
            self._state.update((json.dumps(st),))
        if out:
            yield pd.DataFrame(out)

    def close(self) -> None:
        pass


def streaming_keyed_fold_v2(
    df: DataFrame,
    key_cols: list[str],
    app_function: Callable,
    output_schema: StructType | str,
    order_by: list[str] | None = None,
    initial_state: Any = None,
    ttl_ms: int | None = None,
) -> DataFrame:
    """The state.py fold on transformWithStateInPandas.

    Requires the RocksDB state store provider
    (``get_session(rocksdb_state_store=True)``). ``ttl_ms`` uses the API's
    native per-value TTL — expired state simply reads as absent (unlike the
    v1 ``timeout_ms`` path there is no expiry callback).
    """
    ensure_package_on_workers(df.sparkSession)
    return df.groupBy(*key_cols).transformWithStateInPandas(
        statefulProcessor=_FoldProcessor(
            app_function, order_by, initial_state, ttl_ms
        ),
        outputStructType=output_schema,
        outputMode="append",
        # state TTL is clocked by processing time: Spark REJECTS a TTL'd
        # value state under timeMode="none", so the mode must follow ttl_ms
        timeMode="processingTime" if ttl_ms is not None else "none",
    )
