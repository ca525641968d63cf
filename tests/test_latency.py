"""Latency tracing + metrics listener tests."""

import pyspark.sql.functions as F

from wingfoil_spark import Stream
from wingfoil_spark.operators import latency


def test_stamp_and_report(spark):
    s = Stream(
        spark.createDataFrame([(i, float(i)) for i in range(1, 101)], "ts long, v double"),
        ts="ts",
    )
    s = latency.stamp(s, "ingest")
    s = s.map(v2=F.col("v") * 2)
    s = latency.stamp(s, "mapped")
    s = s.filter_value(F.col("v2") > 10)
    s = latency.stamp(s, "filtered")

    rep = latency.latency_report(s).collect()
    hops = {(r.from_stage, r.to_stage): r for r in rep}
    assert set(hops) == {("ingest", "mapped"), ("mapped", "filtered")}
    r = hops[("ingest", "mapped")]
    # stamps ride on rows: the 5 filtered-out rows drop out of every hop
    assert r.n == 95
    assert r.p99_ns >= r.p50_ns >= 0
    assert r.max_ns >= r.p99_ns


def test_report_requires_stamps(spark):
    s = Stream(spark.createDataFrame([(1, 1.0)], "ts long, v double"), ts="ts")
    try:
        latency.latency_report(s)
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_progress_listener_collects(spark, tmp_path):
    from wingfoil_spark.streaming import metrics

    listener = metrics.attach(spark)
    try:
        src = tmp_path / "m_src"
        src.mkdir()
        spark.createDataFrame([(1, 1.0)], "ts long, v double").write.parquet(
            str(src / "c")
        )
        sdf = spark.readStream.schema("ts long, v double").parquet(str(src / "c"))
        q = (
            sdf.writeStream.format("memory").queryName("metrics_test")
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(60)
        # listener delivery is async — poll briefly
        import time as _t

        for _ in range(40):
            if listener.progress:
                break
            _t.sleep(0.25)
        summ = listener.summary()
        assert summ["batches"] >= 1
        assert summ["total_input_rows"] >= 1
    finally:
        spark.streams.removeListener(listener)


# --------------------------------------------------------- prometheus tier


def test_prometheus_exposition_format():
    """prometheus_adapter.rs:55-77 + adapters/prometheus.rs:224: the body
    is '# TYPE name gauge' + the stringified value per metric (integral
    values carry no decimal point — 'test_counter 5'), name-sorted; and
    prometheus_adapter.rs:121+ — multiple metrics all appear."""
    from wingfoil_spark.streaming.metrics import render_exposition

    body = render_exposition({"test_counter": 5.0, "doubled": 10.0})
    assert "# TYPE test_counter gauge\ntest_counter 5\n" in body
    assert "# TYPE doubled gauge\ndoubled 10\n" in body
    assert body.index("doubled") < body.index("test_counter"), "name-sorted"
    assert render_exposition({"ratio": 2.5}) == "# TYPE ratio gauge\nratio 2.5\n"

    import pytest

    with pytest.raises(ValueError, match="invalid prometheus metric name"):
        render_exposition({"bad-name": 1.0})


def test_exporters_survive_non_finite_samples():
    """ADVICE r4: NaN/±Inf are legal gauge samples — int(f) raised and a
    single non-finite value would kill the exporting foreachBatch (and
    with it the streaming query). Prometheus exposition spells them
    NaN/+Inf/-Inf; OTLP JSON uses the string doubles arm."""
    import math

    from wingfoil_spark.streaming.metrics import (
        otlp_metrics_request, render_exposition,
    )

    body = render_exposition({
        "nan_g": float("nan"), "pinf": float("inf"),
        "ninf": float("-inf"), "ok": 7.0,
    })
    assert "nan_g NaN\n" in body
    assert "pinf +Inf\n" in body and "ninf -Inf\n" in body
    assert "ok 7\n" in body

    req = otlp_metrics_request(
        {"nan_g": float("nan"), "pinf": float("inf"), "ok": 7.0}, "svc", 1
    )
    pts = {
        m["name"]: m["gauge"]["dataPoints"][0]
        for m in req["resourceMetrics"][0]["scopeMetrics"][0]["metrics"]
    }
    assert pts["nan_g"]["asDouble"] == "NaN"
    assert pts["pinf"]["asDouble"] == "Infinity"
    assert pts["ok"]["asInt"] == "7"
    # the request stays JSON-serializable (no bare float nan leaks)
    import json

    json.dumps(req)


def test_prometheus_historical_mode_is_silent(spark, tmp_path):
    """prometheus_adapter.rs:82-102: under historical replay the sink is a
    no-op — a batch frame exports nothing, the textfile is never
    written."""
    from wingfoil_spark.sources.tables import ticker
    from wingfoil_spark.streaming.metrics import prometheus_textfile_sink

    s = ticker(spark, 100, 5).count()
    out = tmp_path / "metrics.prom"
    q = prometheus_textfile_sink(s, str(out), name_col="n", value_col="n")
    assert q is None and not out.exists()


def test_prometheus_textfile_sink_streams_gauges(spark, tmp_path):
    """Realtime parity of serves_registered_metric: the stream's LAST
    value per metric lands in the textfile with its TYPE header; metrics
    absent from a later micro-batch keep their previous sample (the
    exporter's slot semantics); the write is atomic (no .tmp leftover)."""
    import os
    import shutil
    import tempfile
    import time

    import pandas as pd

    from wingfoil_spark.stream import Stream
    from wingfoil_spark.streaming.metrics import prometheus_textfile_sink

    src_dir = tempfile.mkdtemp(prefix="wf_prom_src_")
    out = tmp_path / "metrics.prom"
    try:
        # batch 1: both metrics; batch 2: only test_counter advances
        pd.DataFrame({"ts": [1, 2, 3], "metric": ["test_counter", "doubled", "test_counter"],
                      "value": [3.0, 8.0, 4.0]}).to_parquet(f"{src_dir}/b0.parquet", index=False)
        os.utime(f"{src_dir}/b0.parquet", (time.time(), time.time()))
        pd.DataFrame({"ts": [4], "metric": ["test_counter"], "value": [5.0]}
                     ).to_parquet(f"{src_dir}/b1.parquet", index=False)
        os.utime(f"{src_dir}/b1.parquet", (time.time() + 1, time.time() + 1))

        stream = (
            spark.readStream.schema("ts long, metric string, value double")
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        q = prometheus_textfile_sink(Stream(stream, ts="ts"), str(out))
        q.awaitTermination(120)
        body = out.read_text()
    finally:
        shutil.rmtree(src_dir, ignore_errors=True)

    assert "# TYPE test_counter gauge\ntest_counter 5\n" in body, body
    assert "# TYPE doubled gauge\ndoubled 8\n" in body, \
        "metric absent from batch 2 keeps its slot"
    assert not [p for p in tmp_path.iterdir() if p.suffix == ".tmp"]


# --------------------------------------------------------------- otlp tier


def test_otlp_request_shape_and_arms():
    """The OTLP/HTTP JSON ExportMetricsServiceRequest shape: service.name
    resource attribute (adapters/otlp.rs:126-133), nanos as strings per
    the spec, integral samples in asInt and fractional in asDouble."""
    from wingfoil_spark.streaming.metrics import otlp_metrics_request

    body = otlp_metrics_request({"counter": 5.0, "ratio": 2.5}, "svc", 123)
    rm = body["resourceMetrics"][0]
    assert rm["resource"]["attributes"] == [
        {"key": "service.name", "value": {"stringValue": "svc"}}
    ]
    metrics = {m["name"]: m for m in rm["scopeMetrics"][0]["metrics"]}
    c = metrics["counter"]["gauge"]["dataPoints"][0]
    assert c == {"timeUnixNano": "123", "asInt": "5"}
    r = metrics["ratio"]["gauge"]["dataPoints"][0]
    assert r == {"timeUnixNano": "123", "asDouble": 2.5}


def test_otlp_historical_noop_and_graceful_failure(spark, tmp_path):
    """tests/otlp_adapter.rs:33-70: a historical (batch) run drains
    without connecting — the transport is never called; and a failing
    transport is non-fatal — the streaming query completes."""
    import os
    import shutil
    import tempfile
    import time

    import pandas as pd

    from wingfoil_spark.sources.tables import ticker
    from wingfoil_spark.stream import Stream
    from wingfoil_spark.streaming.metrics import otlp_gauge_sink

    calls = []
    s = ticker(spark, 100, 5).count()
    assert otlp_gauge_sink(s, calls.append, name_col="n", value_col="n") is None
    assert calls == [], "historical mode never hands a value to the exporter"

    src_dir = tempfile.mkdtemp(prefix="wf_otlp_src_")
    try:
        pd.DataFrame({"ts": [1], "metric": ["m"], "value": [1.5]}
                     ).to_parquet(f"{src_dir}/b0.parquet", index=False)
        os.utime(f"{src_dir}/b0.parquet", (time.time(), time.time()))
        stream = (
            spark.readStream.schema("ts long, metric string, value double")
            .parquet(src_dir)
        )

        def bad_transport(_body):
            raise ConnectionError("nothing listening")

        q = otlp_gauge_sink(Stream(stream, ts="ts"), bad_transport)
        q.awaitTermination(120)  # must complete despite the bad endpoint
        assert q.exception() is None

        good = []
        q2 = otlp_gauge_sink(Stream(stream, ts="ts"), good.append)
        q2.awaitTermination(120)
        dp = good[-1]["resourceMetrics"][0]["scopeMetrics"][0]["metrics"][0]
        assert dp["name"] == "m"
        assert dp["gauge"]["dataPoints"][0]["asDouble"] == 1.5
    finally:
        shutil.rmtree(src_dir, ignore_errors=True)


def test_latency_report_aggregates_known_stage_times(spark):
    """latency_report_aggregates_across_ticks (tests/latency.rs:189-214),
    exactly: three messages with stage times base, base+10, base+30,
    base+60 → per-hop counts of 3 and means 10/20/30ns. stamp_at carries
    the known times (the Traced::with_latency construction shape)."""
    import pyspark.sql.functions as F

    from wingfoil_spark.operators.latency import latency_report, stamp_at
    from wingfoil_spark.sources.tables import ticker
    from wingfoil_spark.stream import Stream

    c = ticker(spark, 1_000_000, 3).count()
    s = Stream(c.df.select("ts", "seq", (F.col("n") * 100).alias("base")),
               "ts", "seq")
    s = stamp_at(s, "ingest", F.col("base"))
    s = stamp_at(s, "decode", F.col("base") + 10)
    s = stamp_at(s, "strategy", F.col("base") + 30)
    s = stamp_at(s, "publish", F.col("base") + 60)
    rep = {(r.from_stage, r.to_stage): r for r in latency_report(s).collect()}
    assert rep[("ingest", "decode")].n == 3
    assert rep[("ingest", "decode")].mean_ns == 10.0
    assert rep[("decode", "strategy")].mean_ns == 20.0
    assert rep[("strategy", "publish")].mean_ns == 30.0


def test_latency_report_if_disabled_stays_empty(spark):
    """latency_report_if_disabled_stays_empty (tests/latency.rs:219-246):
    disabled → no observing sink, stats stay at zero — an empty frame in
    the report schema."""
    import pyspark.sql.functions as F

    from wingfoil_spark.operators.latency import latency_report, stamp_at
    from wingfoil_spark.sources.tables import ticker
    from wingfoil_spark.stream import Stream

    c = ticker(spark, 1_000_000, 3).count()
    s = stamp_at(Stream(c.df.select("ts", "seq", F.col("n").alias("v")),
                        "ts", "seq"), "ingest", 100)
    rep = latency_report(s, enabled=False)
    assert rep.count() == 0
    assert "from_stage" in rep.columns and "mean_ns" in rep.columns
