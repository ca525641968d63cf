"""Numpy-oracle tests for the exact time-weighted statistics paths that
aren't window-expressible: trailing-duration time-weighted moments (partial
interval clipping) and the weighted median. Pattern 3 of the reference's
test strategy (SURVEY §5): statistics parity against an independent oracle.

Semantics pinned by the reference's tests/statistics_time_weighted.rs:
left-continuous step signal (a sample has weight only once the next tick
arrives), current sample excluded, mean seeds to the current value while no
weight has accumulated, population variance."""

import numpy as np
import pytest

from wingfoil_spark import Stream


def make(spark, pts):
    df = spark.createDataFrame(
        [("k", int(t), float(v)) for t, v in pts], "k string, ts long, v double"
    )
    return Stream(df, ts="ts", keys=("k",))


def oracle_tw_windowed(pts, W, stat):
    """O(n²) reference: integrate the step signal over [ts_i - W, ts_i]."""
    ts = np.array([p[0] for p in pts], dtype=float)
    v = np.array([p[1] for p in pts], dtype=float)
    res = []
    for i in range(len(ts)):
        t0, t1 = max(ts[0], ts[i] - W), ts[i]
        if t1 <= t0:
            res.append(v[i] if stat == "mean" else 0.0)
            continue
        # integral of the left-continuous step signal
        i1 = i2 = 0.0
        for j in range(i):
            a, b = max(ts[j], t0), min(ts[j + 1] if j + 1 <= i else t1, t1)
            if b > a:
                i1 += v[j] * (b - a)
                i2 += v[j] * v[j] * (b - a)
        span = t1 - t0
        m = i1 / span
        if stat == "mean":
            res.append(m)
        else:
            var = max(i2 / span - m * m, 0.0)
            res.append(var if stat == "var" else np.sqrt(var))
    return np.array(res)


PTS = [(0, 10.0), (10, 20.0), (15, 5.0), (40, 7.0), (41, 100.0), (60, 1.0)]


@pytest.mark.parametrize("stat", ["mean", "var", "std"])
def test_time_windowed_time_weighted_matches_oracle(spark, stat):
    from wingfoil_spark.operators.stateful import time_windowed_time_weighted

    s = make(spark, PTS)
    out = time_windowed_time_weighted(s, "v", stat, 20, out="x")
    got = np.array([r.x for r in out.df.orderBy("ts").collect()])
    want = oracle_tw_windowed(PTS, 20, stat)
    assert np.allclose(got, want, rtol=1e-9), f"{stat}: {got} vs {want}"


def test_weighted_median_matches_oracle(spark):
    s = make(spark, PTS)
    out = s.stat("v", "median", ("cum",), weighting="time", out="m")
    got = {r.ts: r.m for r in out.df.collect()}
    # at ts=0: no weight accumulated → seeds to current value
    assert got[0] == 10.0
    # at ts=60: weights are in-effect times of samples 0..4:
    # 10@10, 20@5, 5@25, 7@1, 100@19 (total 60, half 30)
    # sorted by value: 5(25), 7(1), 10(10), 20(5), 100(19)
    # cumsum: 25, 26, 36… crosses 30 at value 10
    assert got[60] == 10.0


def test_rolling_weighted_median_window(spark):
    s = make(spark, PTS)
    out = s.stat("v", "median", ("rows", 3), weighting="time", out="m")
    got = {r.ts: r.m for r in out.df.collect()}
    # frame = last 3 ticks with the current one zero-weighted (same
    # convention as the oracle-verified rolling tw mean/var): samples
    # @40 (7, w=1) and @41 (100, w=19); total 20, half 10;
    # sorted: 7(1), 100(19) → cumsum crosses 10 at 100
    assert got[60] == 100.0


def test_null_value_is_a_non_tick_for_recursive_ops(spark):
    """Null-value contract: the reference's streams cannot carry nulls; a
    NaN entering a recursion would poison the accumulator FOREVER (unlike
    window stats, which skip nulls per frame). The recursive operators
    treat a null-valued row as a NON-TICK: excluded from input and
    output."""
    from wingfoil_spark.operators.stateful import (
        ewma,
        time_weighted_profile,
        weighted_median,
    )
    from wingfoil_spark.sources.tables import replay_rows

    s = replay_rows(
        spark,
        [(0, 0, 1.0), (10, 1, None), (20, 2, 3.0)],
        "ts long, seq long, value double",
        ts="ts",
        seq="seq",
    )
    e = ewma(s, "value", alpha=0.5, out="f").df.orderBy("ts").collect()
    assert [(r.ts, r.f) for r in e] == [(0, 1.0), (20, 2.0)]
    m = (
        s.stat("value", "median", ("cum",), weighting="time", out="md")
        .df.orderBy("ts").collect()
    )
    assert [r.ts for r in m] == [0, 20]
    p = time_weighted_profile(s, "value", 100).df.orderBy("ts").collect()
    assert [r.ts for r in p] == [0, 20]
    assert all(r.tw_mean == r.tw_mean for r in p)  # no NaN
