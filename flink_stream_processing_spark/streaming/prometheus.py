"""Prometheus scrape endpoint (text exposition format 0.0.4).

The reference's observability plane is PULL-based: Prometheus scrapes
Flink's metrics reporter (reference ``flink-app/prometheus/prometheus.yaml:5-12``,
``flink-conf-taskmanager.yaml:9-23``) and a Spring service polls PromQL.
Our engine's native path is push (``StreamingQueryListener`` →
WebSocket/STOMP, streaming/push.py) — but anything already running a
Prometheus stack expects a ``/metrics`` endpoint to point at. This module
closes that gap with a dependency-free exposition server:

- ``PrometheusRegistry``: thread-safe gauge/counter store keyed by
  (metric name, frozen label set).
- ``render_exposition``: the text format — ``# HELP`` / ``# TYPE`` headers,
  ``name{label="value"} 1.23`` samples, label-value escaping per the spec.
- ``PrometheusScrapeEndpoint``: stdlib ThreadingHTTPServer answering
  ``GET /metrics`` with ``text/plain; version=0.0.4``.
- ``PrometheusMetricsListener``: maps ``StreamingQueryProgress`` onto the
  same metric names the reference dashboards read off Flink's reporter
  (records in/out per second, latency, state size), labeled by query name.

Scale note: the registry holds one entry per (metric, query) — O(queries),
not O(events); a scrape renders kilobytes. Executors never touch this: all
numbers arrive driver-side via the listener bus, which is how Spark's own
metrics sink works, so the endpoint adds zero load to the data path.
"""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any

from pyspark.sql.streaming import StreamingQueryListener

_LABEL_ESCAPES = {"\\": "\\\\", '"': '\\"', "\n": "\\n"}


def _escape_label(v: str) -> str:
    return "".join(_LABEL_ESCAPES.get(c, c) for c in str(v))


class PrometheusRegistry:
    """Gauge/counter store. ``set_gauge`` overwrites; ``inc_counter``
    accumulates (counters must be monotone per the exposition contract)."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        # name -> (type, help, {frozenset(labels.items()) -> (labels, value)})
        self._metrics: dict[str, tuple[str, str, dict[frozenset, tuple[dict, float]]]] = {}

    def _slot(self, name: str, mtype: str, help_text: str):
        if name not in self._metrics:
            self._metrics[name] = (mtype, help_text, {})
        return self._metrics[name][2]

    def set_gauge(self, name: str, value: float, labels: dict[str, str] | None = None,
                  help_text: str = "") -> None:
        labels = labels or {}
        with self._lock:
            self._slot(name, "gauge", help_text)[frozenset(labels.items())] = (
                labels, float(value))

    def inc_counter(self, name: str, delta: float, labels: dict[str, str] | None = None,
                    help_text: str = "") -> None:
        labels = labels or {}
        with self._lock:
            series = self._slot(name, "counter", help_text)
            key = frozenset(labels.items())
            prev = series.get(key, (labels, 0.0))[1]
            series[key] = (labels, prev + float(delta))

    def render(self) -> str:
        with self._lock:
            out: list[str] = []
            for name in sorted(self._metrics):
                mtype, help_text, series = self._metrics[name]
                if help_text:
                    out.append(f"# HELP {name} {help_text}")
                out.append(f"# TYPE {name} {mtype}")
                for labels, value in sorted(series.values(), key=lambda lv: repr(lv[0])):
                    if labels:
                        lbl = ",".join(
                            f'{k}="{_escape_label(v)}"' for k, v in sorted(labels.items())
                        )
                        out.append(f"{name}{{{lbl}}} {value}")
                    else:
                        out.append(f"{name} {value}")
            return "\n".join(out) + "\n"


def render_exposition(registry: PrometheusRegistry) -> str:
    return registry.render()


class PrometheusScrapeEndpoint:
    """``GET /metrics`` over stdlib HTTP; port 0 picks a free port. Pair
    with a ``PrometheusMetricsListener`` on the same registry and point a
    Prometheus ``scrape_configs`` target at ``host:port`` exactly as the
    reference's prometheus.yaml targets Flink's reporter."""

    def __init__(self, registry: PrometheusRegistry,
                 host: str = "127.0.0.1", port: int = 0) -> None:
        self.registry = registry
        endpoint = self

        class Handler(BaseHTTPRequestHandler):
            def do_GET(self):  # noqa: N802
                if self.path.split("?")[0] != "/metrics":
                    self.send_error(404)
                    return
                body = endpoint.registry.render().encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/plain; version=0.0.4; charset=utf-8")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *_args):  # silence per-request stderr noise
                pass

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self.host, self.port = self._httpd.server_address[:2]
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        self._thread.start()

    def close(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        self._thread.join(timeout=5)


class PrometheusMetricsListener(StreamingQueryListener):
    """Bridges ``StreamingQueryProgress`` into the registry using the same
    metric surface the reference scrapes from Flink's reporter
    (records-in/out rates, latency, state size — SURVEY.md §2.7 O1):
    gauges per query plus a monotone total-rows counter."""

    def __init__(self, registry: PrometheusRegistry) -> None:
        self.registry = registry

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        labels = {"query": p.name or str(p.id)}
        g = self.registry.set_gauge
        g("spark_streaming_input_rows_per_second", p.inputRowsPerSecond or 0.0,
          labels, "Source ingest rate (reference: flink records-in/s)")
        g("spark_streaming_processed_rows_per_second", p.processedRowsPerSecond or 0.0,
          labels, "Sink emit rate (reference: flink records-out/s)")
        g("spark_streaming_batch_duration_ms",
          float(p.durationMs.get("triggerExecution", 0)), labels,
          "Micro-batch latency (reference: flink latency metric)")
        state = p.stateOperators[0] if p.stateOperators else None
        g("spark_streaming_state_rows", float(state.numRowsTotal) if state else 0.0,
          labels, "Stateful-operator keyed rows")
        g("spark_streaming_state_bytes", float(state.memoryUsedBytes) if state else 0.0,
          labels, "Stateful-operator memory (reference: managed memory)")
        self.registry.inc_counter(
            "spark_streaming_input_rows_total", float(p.numInputRows), labels,
            "Cumulative input rows (counter)")

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass
