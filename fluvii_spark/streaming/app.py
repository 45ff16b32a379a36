"""App runners + lifecycle: the FluviiApp / FluviiTableApp equivalents.

Reference lifecycle (fluvii/apps/fluvii_app.py:89-122): forever-loop of
transaction batches with graceful-retry / abort-and-rewind failure triage,
SIGINT/SIGTERM → abort + close (fluvii/exceptions.py:13-30). On Spark the
batch loop, offset bookkeeping, retries and rewind are the micro-batch
engine + checkpoint; what remains app-level is: wiring the user function to
the right operator, naming/checkpointing the query, and signal-driven
graceful stop — which is what these classes do.
"""

from __future__ import annotations

import signal
import threading
from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

from fluvii_spark.streaming.state import TableTransaction, streaming_keyed_fold


class _AppBase:
    """Query lifecycle shared by both app kinds.

    ``run()`` = start + awaitTermination with SIGTERM/SIGINT installed to
    stop the query gracefully (reference: SignalRaise → abort + consumer
    close, fluvii/apps/fluvii_app.py:103-109, exceptions.py:13-30). A stopped
    Spark query commits nothing partial: the next start resumes from the
    checkpoint exactly like the reference's abort-and-rewind.
    """

    def __init__(self) -> None:
        self._query: StreamingQuery | None = None
        self._stop_requested = threading.Event()

    def transformed(self) -> DataFrame:  # pragma: no cover - abstract
        raise NotImplementedError

    def start(
        self,
        sink_format: str = "memory",
        output_mode: str = "append",
        checkpoint_dir: str | None = None,
        query_name: str = "fluvii_spark_app",
        **sink_options: str,
    ) -> StreamingQuery:
        writer = (
            self.transformed()
            .writeStream.format(sink_format)
            .outputMode(output_mode)
            .queryName(query_name)
        )
        if checkpoint_dir:
            writer = writer.option("checkpointLocation", checkpoint_dir)
        for k, v in sink_options.items():
            writer = writer.option(k, v)
        self._query = writer.start()
        return self._query

    def stop(self) -> None:
        if self._query is not None and self._query.isActive:
            self._query.stop()

    def _install_signals(self) -> None:
        def handler(signum: int, frame: Any) -> None:  # noqa: ARG001
            # remember the request: when it lands between restarts (during
            # the backoff sleep) there is no active query for stop() to
            # kill, and PEP-475 would resume the sleep and restart anyway
            self._stop_requested.set()
            self.stop()

        for sig in (signal.SIGINT, signal.SIGTERM):
            try:
                signal.signal(sig, handler)
            except ValueError:  # not the main thread — skip, tests do this
                pass

    def run(self, **start_kwargs: Any) -> None:
        """Blocking run-until-signalled (reference ``FluviiApp.run()``)."""
        q = self.start(**start_kwargs)
        self._install_signals()
        q.awaitTermination()

    def run_with_retries(
        self,
        max_restarts: int = 3,
        backoff_seconds: float = 2.0,
        _sleep=None,
        **start_kwargs: Any,
    ) -> None:
        """Reference failure-triage loop (``fluvii_app.py:89-101``): on a
        retriable failure the reference retries the commit; on Spark the
        equivalent is restart-from-checkpoint, which replays the failed
        micro-batch (same at-least-once-then-dedup window the reference
        documents). Exceeding ``max_restarts`` re-raises — the fatal path."""
        import time as _time

        sleep = _sleep or _time.sleep
        attempts = 0
        self._install_signals()
        while True:
            if self._stop_requested.is_set():
                return  # signal arrived between restarts — honor it
            q = self.start(**start_kwargs)
            try:
                q.awaitTermination()
                return  # stopped cleanly (signal or caller)
            except Exception:
                attempts += 1
                if attempts > max_restarts:
                    raise
                sleep(backoff_seconds * (2 ** (attempts - 1)))
                if self._stop_requested.is_set():
                    return  # SIGINT/SIGTERM during the backoff window


class MapApp(_AppBase):
    """Stateless per-message transform (reference T1/T2).

    The reference invokes an arbitrary Python ``app_function`` per message
    (fluvii/apps/fluvii_app.py:41-43). Here the function is a DataFrame →
    DataFrame transform: express pure logic in Catalyst expressions
    (filter/select/explode — the fast path); drop to ``mapInPandas`` inside
    the function only for genuinely imperative logic. Multi-message batch
    semantics (reference ``FluviiMultiMessageApp``,
    fluvii/apps/fluvii_multi_msg_app.py:13-21) come for free: the transform
    sees whole micro-batches.
    """

    def __init__(
        self,
        source: DataFrame,
        transform: Callable[[DataFrame], DataFrame],
    ) -> None:
        super().__init__()
        self._source = source
        self._transform = transform

    def transformed(self) -> DataFrame:
        return self._transform(self._source)


class MultiMessageApp(MapApp):
    """T2 parity name (reference ``FluviiMultiMessageApp``,
    fluvii/apps/fluvii_multi_msg_app.py:13-21): the reference collects a
    batch and calls the app function once with all messages; in Spark the
    transform already receives whole micro-batches, so this IS ``MapApp`` —
    the alias exists so reference users find the concept."""


class TableApp(_AppBase):
    """Stateful keyed fold (reference ST1-ST7): the "tabling" app.

    ``app_function(txn)`` gets the reference's transaction surface —
    ``txn.value()``, ``read_table_entry()``, ``update_table_entry()``,
    ``delete_table_entry()``, ``produce()`` — with state durably checkpointed
    per key. One state table per app keyed on the grouping key: the same
    "1 app = 1 table, keyed on the consumed key" rule the reference documents
    (README.md:585-604).
    """

    def __init__(
        self,
        source: DataFrame,
        app_function: Callable[[TableTransaction], None],
        key_cols: list[str],
        output_schema: StructType | str,
        order_by: list[str] | None = None,
        initial_state: Any = None,
    ) -> None:
        super().__init__()
        self._source = source
        self._app_function = app_function
        self._key_cols = key_cols
        self._output_schema = output_schema
        self._order_by = order_by
        self._initial_state = initial_state

    def transformed(self) -> DataFrame:
        return streaming_keyed_fold(
            self._source,
            self._key_cols,
            self._app_function,
            self._output_schema,
            order_by=self._order_by,
            initial_state=self._initial_state,
        )
