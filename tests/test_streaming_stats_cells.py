"""Duality tests for the r4 streaming stats cells (VERDICT r3 item 3):
cumulative tick stats, cumulative time-weighted stats, rows/range
time-weighted stats incl. the weighted MEDIAN — plus the pinned same-ts
burst contract for the range time-weighted mean (ADVICE r3) and the
rows-0 clamp (ADVICE r3). Pattern follows test_streaming_duality: the
decimal-staged batch window == step.run_batch == step.run_stream."""

import os

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pytest

from wingfoil_spark.sources.tables import load_table, ts_us_expr
from wingfoil_spark.stream import Stream
from wingfoil_spark.streaming.stateful import KeyedStateOp

from tests.test_streaming_duality import _run_stream_chunks


@pytest.fixture(scope="module")
def base_events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select("user_id", ts_us_expr(ev).alias("ts_us"), "event_id", "value")
        .where(F.col("user_id") < 10)
    )


def _assert_eq(frames, cols, key):
    ref = frames[0].sort_values(key).reset_index(drop=True)
    for other in frames[1:]:
        o = other[list(ref.columns)].sort_values(key).reset_index(drop=True)
        assert len(ref) == len(o) > 0
        for c in cols:
            a, b = ref[c].to_numpy(dtype=float), o[c].to_numpy(dtype=float)
            nan2 = (a != a) & (b != b)
            assert ((a == b) | nan2).all(), f"diverged on {c}"


def test_cum_stats_duality(spark, base_events):
    """Cumulative tick matrix: decimal window batch == step batch == step
    stream, bitwise (the r3 NotImplementedError cell)."""
    from wingfoil_spark.streaming.twins import cum_stats_step
    from pyspark.sql import Window

    s = Stream(base_events, ts="ts_us", seq="event_id", keys=("user_id",))
    w = s.w_cum()
    dec = F.col("value").cast("decimal(12,2)")
    dec2 = (dec * dec).cast("decimal(24,4)")
    s1 = F.sum(dec).over(w).cast("double")
    s2 = F.sum(dec2).over(w).cast("double")
    cnt = F.count(F.lit(1)).over(w).cast("double")
    var = F.when(cnt > 1, F.greatest((s2 - s1 * s1 / cnt) / (cnt - 1),
                                     F.lit(0.0))).otherwise(F.lit(0.0))
    arr = F.sort_array(F.collect_list("value").over(w))
    n_ = F.size(arr)
    med = (F.element_at(arr, ((n_ + 1) / 2).cast("int"))
           + F.element_at(arr, (n_ / 2 + 1).cast("int"))) / 2
    window_batch = s.df.select(
        "user_id", "ts_us", "event_id", "value",
        s1.alias("st_sum"), (s1 / cnt).alias("st_mean"),
        F.min("value").over(w).alias("st_min"),
        F.max("value").over(w).alias("st_max"),
        var.alias("st_var"), F.sqrt(var).alias("st_std"),
        med.alias("st_median"),
    ).toPandas()

    op = KeyedStateOp(
        cum_stats_step("value", "ts_us", "event_id", ["user_id"]),
        out_schema="user_id long, ts_us long, event_id long, value double, "
                   "st_sum double, st_mean double, st_min double, st_max double, "
                   "st_var double, st_std double, st_median double",
        init_state=None, ts="ts_us", seq="event_id", keys=("user_id",),
    )
    step_batch = op.run_batch(base_events).toPandas()
    streamed = _run_stream_chunks(
        spark, op, base_events.toPandas(),
        "user_id long, ts_us long, event_id long, value double",
        ["ts_us", "event_id"], name="cum_twin",
    )
    _assert_eq([window_batch, step_batch, streamed],
               ["st_sum", "st_mean", "st_min", "st_max", "st_var", "st_std",
                "st_median"],
               ["user_id", "ts_us", "event_id"])


def test_tw_cum_duality(spark, base_events):
    """Cumulative time-weighted mean/var/std: decimal window batch == step
    batch == step stream, bitwise."""
    from wingfoil_spark.streaming.twins import tw_cum_step
    from pyspark.sql import Window

    base = base_events.select("user_id", "ts_us", "value")
    s = Stream(base, ts="ts_us", seq=None, keys=("user_id",))
    b = s.map(__w=F.lead("ts_us").over(s._w_plain()) - F.col("ts_us"))
    wdec = F.col("__w").cast("decimal(13,0)")
    vdec = F.col("value").cast("decimal(12,2)")
    v2dec = (vdec * vdec).cast("decimal(24,4)")
    wa = b.w_rows(Window.unboundedPreceding, -1)
    sw = F.sum(wdec).over(wa).cast("double")
    swv = F.sum(wdec * vdec).over(wa).cast("double")
    swv2 = F.sum(wdec * v2dec).over(wa).cast("double")
    v0 = F.col("value").cast("double")
    mean = F.when(sw.isNull() | (sw == 0), v0).otherwise(swv / sw)
    var = F.when(sw.isNull() | (sw == 0), F.lit(0.0)).otherwise(
        F.greatest(swv2 / sw - (swv / sw) * (swv / sw), F.lit(0.0))
    )
    window_batch = b.df.select(
        "user_id", "ts_us", "value", mean.alias("tw_mean"),
        var.alias("tw_var"), F.sqrt(var).alias("tw_std"),
    ).toPandas()

    op = KeyedStateOp(
        tw_cum_step("value", "ts_us", ["user_id"]),
        out_schema="user_id long, ts_us long, value double, "
                   "tw_mean double, tw_var double, tw_std double",
        init_state=None, ts="ts_us", seq=None, keys=("user_id",),
    )
    step_batch = op.run_batch(base).toPandas()
    streamed = _run_stream_chunks(
        spark, op, base.toPandas(),
        "user_id long, ts_us long, value double", ["ts_us"], name="twc_twin",
    )
    _assert_eq([window_batch, step_batch, streamed],
               ["tw_mean", "tw_var", "tw_std"], ["user_id", "ts_us"])


def test_tw_rows_window_duality(spark, base_events):
    """Rows-frame time-weighted matrix incl. MEDIAN: batch window_stat
    (which runs the Fenwick kernel) == tw_window_step batch == stream."""
    from wingfoil_spark.streaming.twins import tw_window_step

    N = 8
    base = base_events.select("user_id", "ts_us", "value")
    s = Stream(base, ts="ts_us", seq=None, keys=("user_id",))
    batch = (
        s.stat("value", "mean", ("rows", N), weighting="time", out="tw_mean")
        .stat("value", "var", ("rows", N), weighting="time", out="tw_var")
        .stat("value", "median", ("rows", N), weighting="time", out="tw_median")
        .df.select("user_id", "ts_us", "value", "tw_mean", "tw_var",
                   "tw_median").toPandas()
    )
    op = KeyedStateOp(
        tw_window_step("value", ("rows", N), "ts_us", ["user_id"]),
        out_schema="user_id long, ts_us long, value double, tw_mean double, "
                   "tw_var double, tw_std double, tw_median double",
        init_state=None, ts="ts_us", seq=None, keys=("user_id",),
    )
    step_batch = op.run_batch(base).toPandas()
    streamed = _run_stream_chunks(
        spark, op, base.toPandas(),
        "user_id long, ts_us long, value double", ["ts_us"], name="twrow_twin",
    )
    key = ["user_id", "ts_us"]
    # median is bitwise across all three; mean/var: batch _time_weighted
    # accumulates doubles (not decimal), so step-vs-window is allclose
    # while step batch == step stream stays bitwise
    _assert_eq([step_batch, streamed], ["tw_mean", "tw_var", "tw_median"], key)
    a = batch.sort_values(key).reset_index(drop=True)
    b = step_batch[["user_id", "ts_us", "value", "tw_mean", "tw_var",
                    "tw_median"]].sort_values(key).reset_index(drop=True)
    assert len(a) == len(b) > 0
    assert (a["tw_median"].to_numpy() == b["tw_median"].to_numpy()).all()
    assert np.allclose(a["tw_mean"], b["tw_mean"], rtol=1e-12, atol=1e-9)
    assert np.allclose(a["tw_var"], b["tw_var"], rtol=1e-9, atol=1e-9)


def test_tw_range_median_duality(spark, base_events):
    """Range-frame time-weighted MEDIAN (the second r3 NotImplementedError
    cell): batch weighted_median == step batch == step stream, bitwise —
    the candidate set is strictly-prior samples, so no burst caveat."""
    from wingfoil_spark.streaming.twins import tw_window_step

    W = 6 * 3600_000_000
    base = base_events.select("user_id", "ts_us", "value")
    s = Stream(base, ts="ts_us", seq=None, keys=("user_id",))
    batch = (
        s.stat("value", "median", ("range", W), weighting="time", out="m")
        .df.select("user_id", "ts_us", "value", "m").toPandas()
    )
    op = KeyedStateOp(
        tw_window_step("value", ("range", W), "ts_us", ["user_id"]),
        out_schema="user_id long, ts_us long, value double, tw_mean double, "
                   "tw_var double, tw_std double, tw_median double",
        init_state=None, ts="ts_us", seq=None, keys=("user_id",),
    )
    step_batch = op.run_batch(base).toPandas().rename(columns={"tw_median": "m"})
    streamed = _run_stream_chunks(
        spark, op, base.toPandas(),
        "user_id long, ts_us long, value double", ["ts_us"], name="twrm_twin",
    ).rename(columns={"tw_median": "m"})
    _assert_eq([batch, step_batch[["user_id", "ts_us", "value", "m"]],
                streamed[["user_id", "ts_us", "value", "m"]]],
               ["m"], ["user_id", "ts_us"])


def test_tw_range_burst_contract(spark):
    """ADVICE r3 pinned contract: on a same-timestamp burst the batch
    rangeBetween window gives every burst row visibility of the whole
    instant's committed weight (look-ahead); the causal stream twin cannot.
    They agree everywhere EXCEPT non-last rows of a multi-row instant."""
    from wingfoil_spark.streaming.twins import tw_range_step

    W = 10_000_000
    pdf = pd.DataFrame({
        "user_id": [1] * 6,
        "ts_us": [1_000, 2_000, 2_000, 3_000, 3_000, 4_000],
        "value": [10.0, 20.0, 30.0, 40.0, 50.0, 60.0],
    })
    base = spark.createDataFrame(pdf)
    s = Stream(base, ts="ts_us", seq=None, keys=("user_id",))
    batch = (
        s.stat("value", "mean", ("range", W), weighting="time", out="m")
        .df.select("user_id", "ts_us", "value", "m").toPandas()
    )
    op = KeyedStateOp(
        tw_range_step("value", W, "ts_us", ["user_id"]),
        out_schema="user_id long, ts_us long, value double, "
                   "tw_mean double, tw_var double, tw_std double",
        init_state=None, ts="ts_us", seq=None, keys=("user_id",),
    )
    step = op.run_batch(base).toPandas()
    key = ["user_id", "ts_us", "value"]
    a = batch.sort_values(key).reset_index(drop=True)
    b = step.sort_values(key).reset_index(drop=True)
    # last row of each instant (and singletons): batch == stream
    is_last = ~a.duplicated(subset=["user_id", "ts_us"], keep="last")
    eq = a["m"].to_numpy() == b["tw_mean"].to_numpy()
    assert eq[is_last.to_numpy()].all(), "last-of-instant rows must agree"
    # the causal expectations for the non-last burst rows: committed
    # weights only (v=20 at t=2000 sees just 10@1000µs; v=40 at t=3000
    # sees 10@1000 + 30@1000 — v20's weight is 0, v30 carries the instant)
    causal = b.set_index(["ts_us", "value"])["tw_mean"]
    assert causal[(2_000, 20.0)] == 10.0
    assert causal[(3_000, 40.0)] == pytest.approx((10_000 + 30_000) / 2_000)
    # and the batch look-ahead on those rows differs (sees v30's weight)
    look = a.set_index(["ts_us", "value"])["m"]
    assert look[(2_000, 20.0)] != causal[(2_000, 20.0)]


def test_stream_stat_api_cum_and_median(spark, base_events, tmp_path):
    """API-level rebind on readStream for the r3 gap cells: ("cum",) tick
    median (exact — bitwise) and ("cum",) tick mean (allclose vs the
    double-summing batch window)."""
    base = base_events.select("user_id", "ts_us", "event_id", "value")
    s = Stream(base, ts="ts_us", seq="event_id", keys=("user_id",))
    batch = (
        s.stat("value", "median", ("cum",), out="md")
        .stat("value", "mean", ("cum",), out="mn")
        .df.select("user_id", "ts_us", "event_id", "md", "mn").toPandas()
    )
    src = str(tmp_path / "cum_src")
    os.makedirs(src, exist_ok=True)
    base.toPandas().sort_values(["ts_us", "event_id"]).to_parquet(
        os.path.join(src, "all.parquet"), index=False
    )
    sdf = (
        spark.readStream
        .schema("user_id long, ts_us long, event_id long, value double")
        .parquet(src)
    )
    st = Stream(sdf, ts="ts_us", seq="event_id", keys=("user_id",))
    out_md = st.stat("value", "median", ("cum",), out="md").df
    assert out_md.isStreaming
    q = (
        out_md.writeStream.format("memory").queryName("cum_md_twin")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    streamed = spark.sql("SELECT * FROM cum_md_twin").toPandas()
    key = ["user_id", "ts_us", "event_id"]
    a = batch.sort_values(key).reset_index(drop=True)
    b = streamed.sort_values(key).reset_index(drop=True)
    assert len(a) == len(b) > 0
    assert (a["md"].to_numpy() == b["md"].to_numpy()).all()

    # rows-0 clamp (ADVICE r3): streaming ("rows", 0) == ("rows", 1), no
    # IndexError — mirror of batch _frame_window's window.max(1)
    out0 = st.stat("value", "mean", ("rows", 0), out="m").df
    q = (
        out0.writeStream.format("memory").queryName("rows0_twin")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    r0 = spark.sql("SELECT * FROM rows0_twin").toPandas()
    b1 = (
        s.stat("value", "mean", ("rows", 1), out="m")
        .df.select("user_id", "ts_us", "event_id", "m").toPandas()
    )
    a = b1.sort_values(key).reset_index(drop=True)
    b = r0[["user_id", "ts_us", "event_id", "m"]].sort_values(key).reset_index(drop=True)
    assert len(a) == len(b) > 0
    assert np.allclose(a["m"], b["m"], rtol=1e-12, atol=1e-9)


def test_combine_latest_api_on_readstream(spark, base_events, tmp_path):
    """r4 API gap closed: Stream.combine_latest / join_passive on a
    readStream frame transparently rebind to the KeyedStateOp twin
    (previously the window fill raised AnalysisException)."""
    src = str(tmp_path / "cl_src")
    os.makedirs(src, exist_ok=True)
    ev_full = load_table(spark, "/root/testdata/sf0.001", "events")
    pdf = (
        ev_full.select("user_id", ts_us_expr(ev_full).alias("ts_us"),
                       "event_id", "event_type", "value")
        .where(F.col("user_id") < 10).toPandas()
        .sort_values(["ts_us", "event_id"])
    )
    pdf.to_parquet(os.path.join(src, "all.parquet"), index=False)

    def split(df):
        left = Stream(
            df.where(F.col("event_type") == "click")
            .select("ts_us", "event_id", "user_id",
                    F.col("value").alias("cv")),
            ts="ts_us", seq="event_id", keys=("user_id",),
        )
        right = Stream(
            df.where(F.col("event_type") == "purchase")
            .select("ts_us", "event_id", "user_id",
                    F.col("value").alias("pv")),
            ts="ts_us", seq="event_id", keys=("user_id",),
        )
        return left, right

    bdf = spark.createDataFrame(
        pdf, "user_id long, ts_us long, event_id long, event_type string, "
             "value double")
    bl, br = split(bdf)
    batch = bl.combine_latest(br).df.select(
        "user_id", "ts_us", "cv", "pv").toPandas()

    sdf = spark.readStream.schema(
        "user_id long, ts_us long, event_id long, event_type string, "
        "value double").parquet(src)
    sl, sr = split(sdf)
    out = sl.combine_latest(sr).df
    assert out.isStreaming
    q = (
        out.writeStream.format("memory").queryName("cl_api_twin")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    streamed = spark.sql("SELECT * FROM cl_api_twin").toPandas()

    key = ["user_id", "ts_us"]
    a = batch.sort_values(key).reset_index(drop=True)
    b = streamed[["user_id", "ts_us", "cv", "pv"]].sort_values(key).reset_index(drop=True)
    assert len(a) == len(b) > 0
    for c in ("cv", "pv"):
        x, y = a[c].to_numpy(dtype=float), b[c].to_numpy(dtype=float)
        nan2 = (x != x) & (y != y)
        assert ((x == y) | nan2).all(), c
