"""Metrics (SURVEY.md §2.1 M1): streaming telemetry → gauges.

The reference pushes five Prometheus gauges from a background thread
(``fluvii/components/metrics/manager/metrics_manager.py:56-60``:
messages_consumed / messages_produced / message_errors / external_requests /
seconds_behind). On Spark, per-batch telemetry arrives via
``StreamingQueryListener`` — no polling thread needed; the listener updates
the same gauge set and optionally pushes to a Prometheus gateway when
prometheus_client is deployed (not bundled in dev images — gated).
"""

from __future__ import annotations

import threading
from typing import Any

from pyspark.sql.streaming import StreamingQueryListener


class GaugeSet:
    """Reference metric names (metrics_manager.py:56-60), label app/topic."""

    NAMES = (
        "messages_consumed",
        "messages_produced",
        "message_errors",
        "external_requests",
        "seconds_behind",
    )

    def __init__(self, app_name: str):
        self.app_name = app_name
        self._lock = threading.Lock()
        self._values: dict[tuple[str, str], float] = {}
        self._prom = self._init_prometheus()

    def _init_prometheus(self):
        try:  # pragma: no cover - optional dependency
            from prometheus_client import Gauge

            return {
                n: Gauge(n, n, ["app", "topic"]) for n in self.NAMES
            }
        except ImportError:
            return None

    def inc(self, name: str, amount: float = 1, topic: str = "") -> None:
        with self._lock:
            key = (name, topic)
            self._values[key] = self._values.get(key, 0) + amount
        if self._prom:  # pragma: no cover
            self._prom[name].labels(app=self.app_name, topic=topic).inc(amount)

    def set(self, name: str, value: float, topic: str = "") -> None:
        with self._lock:
            self._values[(name, topic)] = value
        if self._prom:  # pragma: no cover
            self._prom[name].labels(app=self.app_name, topic=topic).set(value)

    def get(self, name: str, topic: str = "") -> float:
        with self._lock:
            return self._values.get((name, topic), 0)


class FluviiMetricsListener(StreamingQueryListener):
    """Maps query progress to the reference's gauges:

    - ``numInputRows`` → messages_consumed (consumer.py:94's counterpart)
    - sink ``numOutputRows`` (when reported) → messages_produced
    - batch exceptions → message_errors
    - watermark/processing lag → seconds_behind
    """

    def __init__(self, gauges: GaugeSet):
        self.gauges = gauges

    def onQueryStarted(self, event: Any) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event: Any) -> None:  # noqa: N802
        p = event.progress
        self.gauges.inc("messages_consumed", p.numInputRows)
        sink_rows = getattr(p.sink, "numOutputRows", -1)
        if sink_rows and sink_rows > 0:
            self.gauges.inc("messages_produced", sink_rows)
        try:
            batch_ms = (p.durationMs or {}).get("triggerExecution", 0)
            self.gauges.set("seconds_behind", float(batch_ms) / 1000.0)
        except Exception:
            pass

    def onQueryTerminated(self, event: Any) -> None:  # noqa: N802
        if getattr(event, "exception", None):
            self.gauges.inc("message_errors")

    def onQueryIdle(self, event: Any) -> None:  # noqa: N802
        self.gauges.set("seconds_behind", 0.0)


def install_metrics(spark, app_name: str) -> GaugeSet:
    """Attach a listener to the session; returns the live gauge set."""
    gauges = GaugeSet(app_name)
    listener = FluviiMetricsListener(gauges)
    spark.streams.addListener(listener)
    gauges._listener = listener  # keep a handle for removeListener
    return gauges
