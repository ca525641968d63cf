"""Engine-level observability: streaming query progress metrics.

The reference exposes engine latency through per-hop stamps (latency.rs)
and external sinks (prometheus gauge adapters/prometheus.rs:236, OTLP push
adapters/otlp.rs:165). Spark's native channel for the same facts is the
StreamingQueryListener's QueryProgressEvent: rows/sec, batch durations,
state-store sizes. :class:`ProgressListener` collects them; export to
Prometheus/OTLP by draining :attr:`progress` from a driver-side exporter
(the pull-endpoint pattern).

The reference's tracing-span instrumentation (tests/instrumentation.rs:
run → cycle → node span nesting per Dispatch mode) is engine-internal
scheduling observability; the Spark analogs are this listener's
micro-batch durations plus the Spark UI/event-log's stage→task spans —
documented mapping, nothing separately replayable."""

from __future__ import annotations

import json

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


class ProgressListener(StreamingQueryListener):
    """Collects per-micro-batch progress for all streaming queries.

    Each entry of :attr:`progress` is the raw progress dict (queryId,
    batchId, durationMs breakdown, inputRowsPerSecond,
    processedRowsPerSecond, stateOperators...).
    """

    def __init__(self) -> None:
        self.progress: list[dict] = []
        self.started: list[str] = []
        self.terminated: list[str] = []

    # StreamingQueryListener interface
    def onQueryStarted(self, event) -> None:
        self.started.append(str(event.id))

    def onQueryProgress(self, event) -> None:
        self.progress.append(json.loads(event.progress.json))

    def onQueryIdle(self, event) -> None:  # pragma: no cover
        pass

    def onQueryTerminated(self, event) -> None:
        self.terminated.append(str(event.id))

    # ------------------------------------------------------------- reporting

    def summary(self) -> dict:
        """Roll up throughput/duration stats across collected batches."""
        if not self.progress:
            return {"batches": 0}
        rates = [p.get("processedRowsPerSecond") or 0.0 for p in self.progress]
        durs = [
            (p.get("durationMs") or {}).get("triggerExecution") or 0
            for p in self.progress
        ]
        rows = [
            sum(s.get("numInputRows") or 0 for s in (p.get("sources") or []))
            for p in self.progress
        ]
        return {
            "batches": len(self.progress),
            "total_input_rows": sum(rows),
            "mean_rows_per_sec": sum(rates) / len(rates),
            "max_trigger_ms": max(durs),
            "mean_trigger_ms": sum(durs) / len(durs),
        }


def attach(spark: SparkSession) -> ProgressListener:
    """Register a fresh listener on this session and return it."""
    listener = ProgressListener()
    spark.streams.addListener(listener)
    return listener
