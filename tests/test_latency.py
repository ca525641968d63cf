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
