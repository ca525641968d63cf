"""Golden tests for the time-series analysis ops (augurs-adapter parity):
known synthetic series → exact expected outputs."""

import math

import numpy as np
import pyspark.sql.functions as F

from wingfoil_spark import Stream
from wingfoil_spark.operators import analysis


def make(spark, vals, key="k"):
    rows = [(key, i + 1, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k string, ts long, v double")
    return Stream(df, ts="ts", keys=("k",))


def test_mad_outlier_flags_spike(spark):
    vals = [10.0, 12.0] * 10 + [100.0]
    s = make(spark, vals)
    out = {r.ts: r for r in analysis.mad_outlier(s, "v", window_n=21).df.collect()}
    # window at the spike: ten 10s, ten 12s, one 100 → med 12, MAD 2
    # → score = 88 / (1.4826·2) ≈ 29.7
    assert out[21].is_outlier is True
    assert abs(out[21].outlier_score - 88 / (1.4826 * 2)) < 1e-3
    # balanced oscillating window (8×10, 8×12): med 11, MAD 1 → score ≈ 0.67
    assert out[16].is_outlier is False
    assert out[16].outlier_score < 1.0


def test_changepoint_peaks_at_shift(spark):
    vals = [0.0, 1.0] * 10 + [10.0, 11.0] * 10  # mean shifts 0.5 → 10.5
    s = make(spark, vals)
    out = analysis.mean_shift_changepoint(s, "v", half_n=10).df.collect()
    scores = {r.ts: r.shift_score for r in out}
    # at tick 30 the newer half is all-shifted, older half all-original
    assert scores[30] and scores[30] > 10
    # well inside a stable region the score is small
    assert scores[20] is None or scores[20] < 1.5


def test_linear_forecast_exact_on_line(spark):
    vals = [2.0 * i + 1 for i in range(1, 31)]  # y = 2x + 1
    s = make(spark, vals)
    out = {r.ts: r.forecast for r in analysis.linear_forecast(s, "v", window_n=10).df.collect()}
    # on an exact line the one-step forecast is the next point
    assert math.isclose(out[30], 2.0 * 31 + 1, rel_tol=1e-9)
    assert out[1] == 3.0  # n=1 → slope undefined → falls back to value


def test_detect_seasons_finds_period(spark):
    n, period = 128, 8
    vals = [math.sin(2 * math.pi * i / period) for i in range(n)]
    s = make(spark, vals)
    row = analysis.detect_seasons(s, "v").collect()[0]
    assert row.dominant_period == period
    assert row.power_ratio > 0.9


def test_dtw_identical_series_zero(spark):
    a = [(f"u{k}", i + 1, float(np.sin(i / 3.0) + k)) for k in range(3) for i in range(40)]
    df = spark.createDataFrame(a, "k string, ts long, v double")
    s = Stream(df, ts="ts", keys=("k",))
    out = {(r.key_a, r.key_b): r.dtw for r in analysis.dtw_distances(s, "v").collect()}
    # constant vertical offsets: warping reduces but can't erase them —
    # distances are positive and monotone in the offset
    assert 0 < out[("u0", "u1")] < out[("u0", "u2")]


def test_dtw_kernel_golden():
    a = np.array([0.0, 1.0, 2.0])
    b = np.array([0.0, 1.0, 2.0])
    assert analysis._dtw(a, b) == 0.0
    # warp path for +1 offset: (0,0)=1, (1,0)=0, (2,1)=0, (2,2)=1 → 2
    assert analysis._dtw(a, b + 1) == 2.0


def test_forecast_interval_and_min_points_gate(spark):
    """Binding knobs replayed (wingfoil-python test_augurs.py:45-84):
    level populates symmetric bounds around the point; min_points gates
    when the op TICKS (40 samples, gate 20 → 21 emissions; an unreachable
    gate never ticks); an unsupported level raises."""
    import numpy as np
    import pytest as _pytest

    from wingfoil_spark.operators.analysis import linear_forecast
    from wingfoil_spark.sources.tables import replay_rows

    rows = [(100 * i, i, float(i + 1)) for i in range(40)]
    s = replay_rows(spark, rows, "ts long, seq long, value double",
                    ts="ts", seq="seq")

    out = linear_forecast(s, "value", window_n=32, horizon=2, level=0.95)
    pdf = out.df.orderBy("ts").toPandas()
    assert {"forecast", "forecast_lower", "forecast_upper"} <= set(pdf.columns)
    tail = pdf.iloc[5:]  # past the 3-sample interval seed
    assert (tail["forecast_lower"] <= tail["forecast"]).all()
    assert (tail["forecast"] <= tail["forecast_upper"]).all()
    # a perfectly linear series → near-zero residual band
    assert float(tail.iloc[-1]["forecast_upper"] - tail.iloc[-1]["forecast_lower"]) < 1e-6
    # numpy oracle for one row: window fully linear → ŷ = x0 + 1 exactly
    assert abs(tail.iloc[-1]["forecast"] - (40 + 2)) < 1e-6

    assert linear_forecast(s, "value", 32, 1, min_points=20).df.count() == 21
    assert linear_forecast(s, "value", 32, 1, min_points=30).df.count() == 11
    assert linear_forecast(s, "value", 32, 1, min_points=100).df.count() == 0

    with _pytest.raises(ValueError, match="unsupported level"):
        linear_forecast(s, "value", level=0.5)
