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
    """Reference metric names (metrics_manager.py:56-60), label app/topic,
    plus one beyond-reference gauge: ``messages_late`` (rows the event-time
    watermark refused — the reference has no watermark, so no counterpart;
    granularity note in ``streaming/late.py``: state-input rows, a lower
    bound on late source rows)."""

    NAMES = (
        "messages_consumed",
        "messages_produced",
        "message_errors",
        "external_requests",
        "seconds_behind",
        "messages_late",
    )

    def __init__(self, app_name: str):
        self.app_name = app_name
        self._lock = threading.Lock()
        self._values: dict[tuple[str, str], float] = {}
        #: the prometheus CollectorRegistry owning this set's gauges (None
        #: without prometheus_client) — hand it to MetricsPusher
        self.registry = None
        self._prom = self._init_prometheus()

    def _init_prometheus(self):
        try:  # pragma: no cover - optional dependency
            from prometheus_client import CollectorRegistry, Gauge

            # a PRIVATE registry per GaugeSet: registering in the library's
            # process-global default REGISTRY raises "Duplicated timeseries"
            # the moment a second GaugeSet exists (session restart, two
            # apps in one driver) — and that ValueError escaped the old
            # ImportError-only guard
            self.registry = CollectorRegistry()
            return {
                n: Gauge(n, n, ["app", "topic"], registry=self.registry)
                for n in self.NAMES
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
        late = 0
        for op in getattr(p, "stateOperators", None) or []:
            try:
                late += int(getattr(op, "numRowsDroppedByWatermark", 0) or 0)
            except Exception:
                pass
        if late:
            self.gauges.inc("messages_late", late)
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


class MetricsPusher:
    """Periodic pushgateway loop (reference
    ``fluvii/components/metrics/pusher/metrics_pusher.py:44-66``): a daemon
    thread that, every ``config.push_rate_seconds`` (reference default 10 s,
    pusher/config.py:10), resolves the metrics service to its (possibly
    several, redundant) gateway addresses and pushes the registry to each;
    a failed push triggers re-resolution, matching the reference's recovery.

    Differences from the reference, on purpose: ``stop()`` actually stops
    (threading.Event — the reference calls a nonexistent ``Thread.stop``),
    and the transport is injectable (``resolve_fn``/``push_fn``) so the loop
    is testable without prometheus_client or a cluster DNS.
    """

    def __init__(
        self,
        registry: Any,
        config,
        resolve_fn=None,
        push_fn=None,
        auto_start: bool = False,
    ):
        self._config = config
        self.registry = registry
        self._resolve_fn = resolve_fn or self._resolve_dns
        self._push_fn = push_fn or self._push_prometheus
        self._stop = threading.Event()
        self.push_thread: threading.Thread | None = None
        self.metrics_pod_ips: set[str] = set()
        if auto_start:
            self.start()

    # -- default transports (gated on optional deps) --------------------------
    def _resolve_dns(self) -> set[str]:
        import socket

        if not self._config.service_name:
            return set()
        infos = socket.getaddrinfo(
            self._config.service_name, self._config.service_port
        )
        return {f"{i[-1][0]}:{self._config.pod_app_port}" for i in infos}

    def _push_prometheus(self, gateway: str) -> None:  # pragma: no cover
        from prometheus_client import push_to_gateway

        push_to_gateway(
            gateway, job=self._config.hostname, registry=self.registry, timeout=15
        )

    # -- loop ------------------------------------------------------------------
    def _set_metrics_pod_ips(self) -> None:
        try:
            self.metrics_pod_ips = set(self._resolve_fn())
        except Exception:
            pass  # keep the previous addresses; retry next cycle

    def _push_metrics(self) -> None:
        for gateway in sorted(self.metrics_pod_ips):
            try:
                self._push_fn(gateway)
            except Exception:
                self._set_metrics_pod_ips()

    def _loop(self) -> None:
        self._set_metrics_pod_ips()
        while not self._stop.wait(self._config.push_rate_seconds):
            self._push_metrics()
            self._set_metrics_pod_ips()

    def start(self) -> None:
        if self.push_thread and self.push_thread.is_alive():
            return
        self._stop.clear()
        self.push_thread = threading.Thread(target=self._loop, daemon=True)
        self.push_thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self.push_thread:
            self.push_thread.join(timeout=5)


def install_metrics(spark, app_name: str) -> GaugeSet:
    """Attach a listener to the session; returns the live gauge set."""
    gauges = GaugeSet(app_name)
    listener = FluviiMetricsListener(gauges)
    spark.streams.addListener(listener)
    gauges._listener = listener  # keep a handle for removeListener
    return gauges
