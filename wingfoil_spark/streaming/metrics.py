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
import math

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


# ---------------------------------------------------------- prometheus tier

#: Prometheus metric-name grammar (the exposition format's contract).
_METRIC_NAME = __import__("re").compile(r"^[a-zA-Z_:][a-zA-Z0-9_:]*$")


def _fmt_value(v) -> str:
    """Stringify a sample the way the reference's exporter does
    (prometheus.rs:224 `format!("{value}")`): integral values carry no
    decimal point (`test_counter 5`), floats print their shortest repr."""
    f = float(v)
    # NaN/±Inf are legal Prometheus gauge samples — int(f) on them raises,
    # and a raise here would kill the whole foreachBatch/streaming query
    # over one bad sample. Exposition spec spells them NaN / +Inf / -Inf.
    if not math.isfinite(f):
        return "NaN" if math.isnan(f) else ("+Inf" if f > 0 else "-Inf")
    return str(int(f)) if f == int(f) and abs(f) < 1e15 else repr(f)


def render_exposition(gauges: dict) -> str:
    """Prometheus text exposition body: `# TYPE {name} gauge\\n{name}
    {value}\\n` per metric (adapters/prometheus.rs:218-226), name-sorted
    for a deterministic scrape. Invalid metric names are a loud error at
    render (the registration-time guard below catches them earlier on the
    sink path)."""
    out = []
    for name in sorted(gauges):
        if not _METRIC_NAME.match(name):
            raise ValueError(f"invalid prometheus metric name {name!r}")
        out.append(f"# TYPE {name} gauge\n{name} {_fmt_value(gauges[name])}\n")
    return "".join(out)


def prometheus_textfile_sink(s, path: str, name_col: str = "metric",
                             value_col: str = "value",
                             checkpoint: str | None = None,
                             trigger: dict | None = None):
    """Export stream values as Prometheus gauges through the node-exporter
    TEXTFILE-COLLECTOR pattern — the Spark home for the reference's
    `prometheus_gauge` sink (adapters/prometheus.rs:247-268; the live
    `GET /metrics` HTTP tier is a protocol-gateway non-goal, COVERAGE
    §2.8 — node-exporter scrapes the textfile instead).

    Contracts mapped from the reference:

    - gauge semantics: the LAST value per metric name wins
      (the exporter's slot; here: max-by event order per name per batch,
      carried across batches in the driver-side registry — metrics absent
      from a micro-batch keep their previous sample, exactly as an
      unticked stream keeps its slot);
    - `# TYPE name gauge` header + stringified value
      (tests/prometheus_adapter.rs:55-77);
    - HISTORICAL runs export nothing: on a batch frame this sink is a
      NO-OP (tests/prometheus_adapter.rs:82-102 — metrics are realtime
      observability, a replay must not overwrite live gauges);
    - names validated against the metric grammar at WIRING;
    - the `.prom` file is written atomically (tmp + rename — the textfile
      collector's torn-read guard, same discipline as sources/cache.py).

    Returns the StreamingQuery (None on the batch no-op)."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    registry: dict = {}
    # deterministic "last": max by the stream's event order, never the
    # partition-order-dependent last() aggregate
    ordk = F.struct(
        F.col(s.ts).alias("t"),
        (F.col(s.seq) if s.seq else F.lit(0)).alias("q"),
    )

    def write_batch(df, _bid):
        rows = (
            df.groupBy(name_col)
            .agg(F.max_by(F.col(value_col), ordk).alias("__v"))
            .collect()
        )
        for r in rows:
            name = r[0]
            if name is None:
                continue
            if not _METRIC_NAME.match(name):
                raise ValueError(f"invalid prometheus metric name {name!r}")
            registry[name] = r["__v"]
        body = render_exposition(registry)
        d = os.path.dirname(os.path.abspath(path)) or "."
        os.makedirs(d, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            f.write(body)
        os.replace(tmp, path)  # atomic: a scrape never sees a torn file

    if not s.df.isStreaming:
        return None  # historical replay exports nothing (reference parity)
    w = s.df.writeStream.foreachBatch(write_batch)
    if checkpoint:
        w = w.option("checkpointLocation", checkpoint)
    w = w.trigger(**(trigger or {"availableNow": True}))
    return w.start()


# ---------------------------------------------------------------- otlp tier


def otlp_metrics_request(gauges: dict, service_name: str,
                         time_unix_nano: int) -> dict:
    """OTLP/HTTP **JSON** `ExportMetricsServiceRequest` body for a set of
    gauge samples — the protobuf-free encoding of the reference's OTLP
    gauge export (adapters/otlp.rs:126-133: endpoint + `service.name`
    resource attribute; the OTel SDK machinery is replaced by the public
    OTLP JSON schema: resourceMetrics → scopeMetrics → metrics →
    gauge.dataPoints, 64-bit nanos as STRINGS per the spec). Integral
    samples export `asInt`, others `asDouble` — the two OTLP NumberDataPoint
    arms."""
    points = []
    for name in sorted(gauges):
        if not _METRIC_NAME.match(name):
            raise ValueError(f"invalid metric name {name!r}")
        v = float(gauges[name])
        dp = {"timeUnixNano": str(int(time_unix_nano))}
        # non-finite: int(v) raises; OTLP JSON spells doubles "NaN"/
        # "Infinity"/"-Infinity" as strings in the asDouble arm
        if not math.isfinite(v):
            dp["asDouble"] = (
                "NaN" if math.isnan(v)
                else ("Infinity" if v > 0 else "-Infinity")
            )
        elif v == int(v) and abs(v) < 1e15:
            dp["asInt"] = str(int(v))
        else:
            dp["asDouble"] = v
        points.append({"name": name, "gauge": {"dataPoints": [dp]}})
    return {
        "resourceMetrics": [
            {
                "resource": {
                    "attributes": [
                        {
                            "key": "service.name",
                            "value": {"stringValue": service_name},
                        }
                    ]
                },
                "scopeMetrics": [
                    {
                        "scope": {"name": "wingfoil_spark"},
                        "metrics": points,
                    }
                ],
            }
        ]
    }


def otlp_gauge_sink(s, transport, service_name: str = "wingfoil_spark",
                    name_col: str = "metric", value_col: str = "value",
                    checkpoint: str | None = None,
                    trigger: dict | None = None):
    """Push stream values as OTLP gauges through a caller-supplied
    ``transport(json_body: dict) -> None`` — POST it to
    ``<endpoint>/v1/metrics`` in production (the reference's OTLP/HTTP
    push, adapters/otlp.rs; this sandbox has no network, so the transport
    is injected rather than baked in).

    Reference contracts mapped (tests/otlp_adapter.rs:33-70):

    - HISTORICAL runs drain without connecting: on a batch frame this
      sink is a NO-OP — no transport call is ever made;
    - a failing transport is non-fatal: export errors happen off the hot
      path and are swallowed per batch (the OTel background-thread
      discipline), the query keeps running.

    Gauge slots carry across micro-batches exactly as in
    :func:`prometheus_textfile_sink`. Event time of the LAST row in the
    batch stamps the export (``timeUnixNano`` — the stream's ts unit is
    the caller's; pass nanos for spec compliance)."""
    from pyspark.sql import functions as F

    registry: dict = {}
    ordk = F.struct(
        F.col(s.ts).alias("t"),
        (F.col(s.seq) if s.seq else F.lit(0)).alias("q"),
    )

    def write_batch(df, _bid):
        rows = (
            df.groupBy(name_col)
            .agg(F.max_by(F.col(value_col), ordk).alias("__v"),
                 F.max(F.col(s.ts)).alias("__t"))
            .collect()
        )
        t_max = 0
        for r in rows:
            if r[0] is None:
                continue
            registry[r[0]] = r["__v"]
            t_max = max(t_max, r["__t"] or 0)
        if not registry:
            return
        body = otlp_metrics_request(registry, service_name, t_max)
        try:
            transport(body)
        except Exception:  # noqa: BLE001 - the reference swallows export
            pass           # failures on the SDK's background thread
    if not s.df.isStreaming:
        return None  # historical replay drains without connecting
    w = s.df.writeStream.foreachBatch(write_batch)
    if checkpoint:
        w = w.option("checkpointLocation", checkpoint)
    w = w.trigger(**(trigger or {"availableNow": True}))
    return w.start()
