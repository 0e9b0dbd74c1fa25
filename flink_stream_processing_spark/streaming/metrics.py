"""Observability (SURVEY.md §2.7 O1-O3): the reference polls Prometheus
every 5 s and pushes formatted metrics over STOMP (MetricsService.java:78-112).
Spark inverts this: ``StreamingQueryListener`` receives progress events
push-style — no polling, no scrape gap.

Metric mapping (O1): input/output rec/s -> ``inputRowsPerSecond`` /
``processedRowsPerSecond``; latency -> ``durationMs``; state size ->
``stateOperators[].memoryUsedBytes``; backpressure has no direct analogue
(micro-batch pulls; a growing batch duration is the signal).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql.streaming import StreamingQueryListener


def bytes_to_mb(b: float) -> float:
    """O3 unit formatting (MetricsService.java:117-140)."""
    return b / (1024.0 * 1024.0)


def ratio_to_pct(r: float) -> float:
    return r * 100.0


class ProgressCollector(StreamingQueryListener):
    """Collects per-batch progress rows (O2's poll loop, push-style)."""

    def __init__(self) -> None:
        self.progress: list[dict[str, Any]] = []

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        state = p.stateOperators[0] if p.stateOperators else None
        self.progress.append(
            {
                "batch_id": p.batchId,
                "input_rows_per_sec": p.inputRowsPerSecond,
                "processed_rows_per_sec": p.processedRowsPerSecond,
                "num_input_rows": p.numInputRows,
                "batch_duration_ms": p.durationMs.get("triggerExecution"),
                "state_rows": state.numRowsTotal if state else 0,
                "state_memory_mb": bytes_to_mb(state.memoryUsedBytes) if state else 0.0,
            }
        )

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass


def observed(df, name: str, *metric_cols):
    """Attach ``Dataset.observe`` metrics to a pipeline stage (Spark's
    zero-cost in-flight accumulators — the batch/streaming analogue of the
    reference's per-operator Prometheus counters, MetricsService.java:33-63):
    the returned (DataFrame, Observation) pair lets a caller read row
    counts / null counts / sums AFTER the next action without a second
    scan of the data. In streaming, the same metrics surface per-batch via
    QueryProgress.observedMetrics under ``name``."""
    from pyspark.sql import Observation

    if df.isStreaming:
        # Streaming rejects Observation objects (one value per micro-batch);
        # the string form routes metrics into QueryProgress.observedMetrics.
        return df.observe(name, *metric_cols), None
    obs = Observation(name)
    return df.observe(obs, *metric_cols), obs
