"""Streaming late-data handling — the deployment of batch q177's report.

q177 (relational_ext6.py, "late_data_report") REPLAYS the ingest sequence
to SIZE a watermark: it tracks the event-time high watermark over event_id
order and counts, per type, the events arriving more than 1 h / 24 h behind
it — "exactly the rows a streaming watermark of that delay would drop".
This module is the twin that DEPLOYS the chosen delay, closing SURVEY
§2.2's late-data row:

- :func:`streaming_late_window_counts` is the Spark-native form —
  ``withWatermark(delay)`` + tumbling per-type windowed counts. Late rows
  are dropped by the ENGINE's watermark (state rows whose window closed
  before the watermark), which is the scale path: state is bounded by
  (open windows × types), not by the keyspace, and eviction is the state
  store's own, not user code.
- :class:`LateDataAccountant` harvests the engine's own late-data
  evidence from the progress stream (``stateOperators[].
  numRowsDroppedByWatermark`` and the event-time watermark per batch) via
  ``StreamingQueryListener`` — the reference's metrics-listener idiom
  (fluvii/components/metrics/, mirrored by metrics.py's
  ``FluviiMetricsListener``) pointed at dropped-row accounting. The
  conservation law ``rows_kept + rows_dropped == rows_ingested`` is pinned
  by tests/test_late_stream.py.

Semantics note (why this is a TWIN, not a transliteration): batch q177's
watermark is the per-event prefix max — the tightest possible replay —
while the engine's watermark advances once per micro-batch (max event time
seen in PREVIOUS batches minus the delay) and evicts whole windows, so the
two count "late" at different granularities. q177 is the sizing tool; this
operator is the deployment. The accountant exists precisely so the
deployed drop counts are observable against q177's predictions.
"""

from __future__ import annotations

import threading
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener


def streaming_late_window_counts(
    events: DataFrame,
    delay: str = "1 hour",
    window: str = "1 hour",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str | None = "value",
) -> DataFrame:
    """(window_start, window_end, event_type, n_events[, total_value]) per
    tumbling window and type, with rows later than ``delay`` dropped by the
    engine's watermark. Use output mode 'update' (each batch re-emits the
    windows it touched; the latest row per (window, type) is current) or
    'append' (a window emits once, when the watermark passes it — the
    lakehouse-sink mode)."""
    src = events.withColumn(
        ts_col, F.col(ts_col).cast("timestamp")
    ).withWatermark(ts_col, delay)
    aggs = [F.count("*").alias("n_events")]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("total_value"))
    return (
        src.groupBy(F.window(ts_col, window), type_col)
        .agg(*aggs)
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            type_col,
            *(
                ["n_events"]
                if value_col is None
                else ["n_events", "total_value"]
            ),
        )
    )


class LateDataAccountant(StreamingQueryListener):
    """Accumulates the engine's late-data evidence for one named query.

    Per progress event it records input rows, the summed
    ``numRowsDroppedByWatermark`` across state operators, and the reported
    event-time watermark; totals are exposed thread-safely (the listener
    bus delivers progress on its own thread). Attach with
    ``spark.streams.addListener(acct)`` BEFORE ``start()`` and read
    ``totals()`` after the query stops — progress delivery is async, so
    callers should stop the query (which flushes a final progress event)
    before asserting on totals.
    """

    def __init__(self, query_name: str):
        self.query_name = query_name
        self._lock = threading.Lock()
        self._rows_in = 0
        self._rows_dropped = 0
        self._batches: list[dict] = []
        self._last_watermark: str | None = None

    # -- listener surface ---------------------------------------------
    def onQueryStarted(self, event: Any) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event: Any) -> None:  # noqa: N802
        p = event.progress
        if p.name != self.query_name:
            return
        dropped = 0
        for op in p.stateOperators or []:
            try:
                # a TOP-LEVEL StateOperatorProgress field (Spark >= 3.2),
                # not a custom metric; any shape drift degrades to 0
                # rather than killing the listener bus
                dropped += int(
                    getattr(op, "numRowsDroppedByWatermark", 0) or 0
                )
            except Exception:
                pass
        wm = (p.eventTime or {}).get("watermark")
        with self._lock:
            self._rows_in += int(p.numInputRows)
            self._rows_dropped += dropped
            self._last_watermark = wm or self._last_watermark
            self._batches.append(
                {
                    "batch_id": p.batchId,
                    "rows_in": int(p.numInputRows),
                    "dropped": dropped,
                    "watermark": wm,
                }
            )

    def onQueryTerminated(self, event: Any) -> None:  # noqa: N802
        pass

    def onQueryIdle(self, event: Any) -> None:  # noqa: N802
        pass

    # -- read side ------------------------------------------------------
    def totals(self) -> dict:
        """{'rows_in', 'rows_dropped', 'last_watermark', 'batches'}.

        ``rows_in`` counts SOURCE rows ingested. ``rows_dropped`` is the
        engine's ``numRowsDroppedByWatermark``, which counts rows at the
        STATE OPERATOR'S INPUT — i.e. after map-side partial aggregation,
        so K same-batch source rows landing in one already-evicted
        (window, key) group count as ONE dropped row. It is therefore a
        LOWER bound on dropped source rows (exact when every late source
        row has its own group). Two further engine facts the parity test
        pins (tests/test_late_stream.py): a row is dropped iff its WINDOW
        END is at or below the batch's applied watermark, and the applied
        watermark lags the progress-reported one by one micro-batch
        (``progress.eventTime.watermark`` for batch b is the value
        computed from data through b-1; the filter in batch b uses the
        value reported for b-1)."""
        with self._lock:
            return {
                "rows_in": self._rows_in,
                "rows_dropped": self._rows_dropped,
                "last_watermark": self._last_watermark,
                "batches": list(self._batches),
            }
