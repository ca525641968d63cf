"""Golden replay of the reference's statistics test suites
(statistics_rolling.rs / statistics_cumulative.rs /
statistics_time_windowed.rs): the SAME input series through our stats
matrix must emit the reference's hand-pinned series value-by-value, and
the same tick times.

Conventions these goldens pin (statistics_rolling.rs:8-15):
- var/std are SAMPLE (ddof=1) and seed to 0.0 (not NULL/NaN) below two
  samples; std of a constant window is 0.0, never NaN;
- a rows-window of 0 clamps to 1; a zero-width time window keeps only the
  current sample;
- median averages the two middle values on even windows;
- stats ops tick once per upstream tick with NO seeding delay, at the
  upstream's tick times (ticker first activation AT start time,
  ops.rs:77-81).
"""

import math

import pyspark.sql.functions as F
import pytest

from wingfoil_spark.operators.stats import window_stat
from wingfoil_spark.sources.tables import ticker
from wingfoil_spark.stream import Stream


def _counter(spark, n=5):
    """ticker(100ns) → count → f64: values 1..n at ts 0,100,...  —
    statistics_rolling.rs:27-31 counter_f64."""
    s = ticker(spark, period_ns=100, n=n)
    return s.count(out="n").map(value=F.col("n").cast("double"))


def _non_monotonic(spark, n=8):
    """(n*7)%13 → 7,1,8,2,9,3,10,4 (statistics_rolling.rs:34-39)."""
    s = ticker(spark, period_ns=100, n=n)
    return s.count(out="n").map(value=((F.col("n") * 7) % 13).cast("double"))


def _series(stream, col):
    return [r[col] for r in stream.df.orderBy("ts").collect()]


def _approx(got, expected, tol=1e-10):
    assert len(got) == len(expected), (got, expected)
    for i, (g, e) in enumerate(zip(got, expected)):
        assert abs(g - e) < tol, f"at {i}: got {g}, expected {e}"


# ── statistics_rolling.rs ───────────────────────────────────────────────


def test_rolling_min_max_counter(spark):
    s = _counter(spark)
    assert _series(window_stat(s, "value", "min", ("rows", 2), out="o"), "o") \
        == [1.0, 1.0, 2.0, 3.0, 4.0]
    assert _series(window_stat(s, "value", "max", ("rows", 2), out="o"), "o") \
        == [1.0, 2.0, 3.0, 4.0, 5.0]


def test_rolling_min_max_non_monotonic(spark):
    s = _non_monotonic(spark)
    assert _series(window_stat(s, "value", "min", ("rows", 3), out="o"), "o") \
        == [7.0, 1.0, 1.0, 1.0, 2.0, 2.0, 3.0, 3.0]
    assert _series(window_stat(s, "value", "max", ("rows", 3), out="o"), "o") \
        == [7.0, 7.0, 8.0, 8.0, 9.0, 9.0, 10.0, 10.0]


def test_rolling_var_std_counter(spark):
    s = _counter(spark)
    expected = [0.0, 0.5, 1.0, 1.0, 1.0]
    _approx(_series(window_stat(s, "value", "var", ("rows", 3), out="o"), "o"), expected)
    _approx(_series(window_stat(s, "value", "std", ("rows", 3), out="o"), "o"),
            [math.sqrt(v) for v in expected])


def test_rolling_std_of_constant_window_is_zero_not_nan(spark):
    s = ticker(spark, period_ns=100, n=6).count(out="n").map(value=F.lit(7.0))
    for v in _series(window_stat(s, "value", "std", ("rows", 3), out="o"), "o"):
        assert v is not None and not math.isnan(v)
        assert abs(v) < 1e-10


def test_rolling_var_incremental_matches_direct_recompute(spark):
    N, W = 200, 10
    s = ticker(spark, period_ns=100, n=N).count(out="n").map(
        value=((F.col("n") % 7).cast("double") * 1.5 - 3.0)
    )
    got = _series(window_stat(s, "value", "var", ("rows", W), out="o"), "o")[-1]
    window = [((n % 7) * 1.5 - 3.0) for n in range(N - W + 1, N + 1)]
    mean = sum(window) / W
    expected = sum((v - mean) ** 2 for v in window) / (W - 1)
    assert abs(got - expected) < 1e-9


def test_rolling_median(spark):
    s = _counter(spark)
    assert _series(window_stat(s, "value", "median", ("rows", 3), out="o"), "o") \
        == [1.0, 1.5, 2.0, 3.0, 4.0]
    nm = _non_monotonic(spark, 5)
    assert _series(window_stat(nm, "value", "median", ("rows", 3), out="o"), "o") \
        == [7.0, 4.0, 7.0, 2.0, 8.0]


def test_rolling_window_zero_clamps_to_one(spark):
    s = _counter(spark)
    identity = [1.0, 2.0, 3.0, 4.0, 5.0]
    for stat, exp in (("min", identity), ("max", identity), ("median", identity),
                      ("var", [0.0] * 5), ("std", [0.0] * 5)):
        assert _series(window_stat(s, "value", stat, ("rows", 0), out="o"), "o") == exp, stat


def test_rolling_min_tick_times_match_upstream(spark):
    out = window_stat(_counter(spark), "value", "min", ("rows", 2), out="o").with_time()
    rows = out.df.orderBy("ts").collect()
    assert [r["time"] for r in rows] == [0, 100, 200, 300, 400]
    assert [r["o"] for r in rows] == [1.0, 1.0, 2.0, 3.0, 4.0]


# ── statistics_cumulative.rs ────────────────────────────────────────────


def test_cumulative_sum_min_max(spark):
    s = _counter(spark)
    assert _series(window_stat(s, "value", "sum", ("cum",), out="o"), "o") \
        == [1.0, 3.0, 6.0, 10.0, 15.0]
    desc = ticker(spark, period_ns=100, n=5).count(out="n").map(
        value=(6 - F.col("n")).cast("double"))
    assert _series(window_stat(desc, "value", "min", ("cum",), out="o"), "o") \
        == [5.0, 4.0, 3.0, 2.0, 1.0]
    assert _series(window_stat(s, "value", "max", ("cum",), out="o"), "o") \
        == [1.0, 2.0, 3.0, 4.0, 5.0]
    assert _series(window_stat(s, "value", "min", ("cum",), out="o"), "o") \
        == [1.0] * 5


def test_cumulative_mean_var_std_median(spark):
    s = _counter(spark)
    _approx(_series(window_stat(s, "value", "mean", ("cum",), out="o"), "o"),
            [1.0, 1.5, 2.0, 2.5, 3.0])
    expected_var = [0.0, 0.5, 1.0, 5.0 / 3.0, 2.5]
    _approx(_series(window_stat(s, "value", "var", ("cum",), out="o"), "o"), expected_var)
    _approx(_series(window_stat(s, "value", "std", ("cum",), out="o"), "o"),
            [math.sqrt(v) for v in expected_var])
    _approx(_series(window_stat(s, "value", "median", ("cum",), out="o"), "o"),
            [1.0, 1.5, 2.0, 2.5, 3.0])


SEQUENCE = [2.0, 4.0, 4.0, 4.0, 5.0, 5.0, 7.0, 9.0]


def _sequence(spark):
    vals = F.array(*[F.lit(v) for v in SEQUENCE])
    return ticker(spark, period_ns=100, n=len(SEQUENCE)).count(out="n").map(
        value=F.element_at(vals, F.col("n").cast("int")))


def test_cumulative_var_std_real_sequence_hand_computed(spark):
    s = _sequence(spark)
    got = _series(window_stat(s, "value", "var", ("cum",), out="o"), "o")[-1]
    assert abs(got - 32.0 / 7.0) < 1e-10
    got_std = _series(window_stat(s, "value", "std", ("cum",), out="o"), "o")[-1]
    assert abs(got_std - math.sqrt(32.0 / 7.0)) < 1e-10


def test_cumulative_median_real_sequence(spark):
    s = _sequence(spark)
    _approx(_series(window_stat(s, "value", "median", ("cum",), out="o"), "o"),
            [2.0, 3.0, 4.0, 4.0, 4.0, 4.0, 4.0, 4.5])


def test_cumulative_var_is_zero_with_single_sample(spark):
    s = _counter(spark, n=1)
    assert _series(window_stat(s, "value", "var", ("cum",), out="o"), "o") == [0.0]


def test_cumulative_sum_tick_times_match_upstream(spark):
    out = window_stat(_counter(spark), "value", "sum", ("cum",), out="o").with_time()
    rows = out.df.orderBy("ts").collect()
    assert [r["time"] for r in rows] == [0, 100, 200, 300, 400]
    assert [r["o"] for r in rows] == [1.0, 3.0, 6.0, 10.0, 15.0]


# ── statistics_time_windowed.rs (WIN = 250ns over 100ns ticks) ──────────

WIN = 250


def test_time_windowed_counter_suite(spark):
    s = _counter(spark)
    assert _series(window_stat(s, "value", "sum", ("range", WIN), out="o"), "o") \
        == [1.0, 3.0, 6.0, 9.0, 12.0]
    _approx(_series(window_stat(s, "value", "mean", ("range", WIN), out="o"), "o"),
            [1.0, 1.5, 2.0, 3.0, 4.0])
    assert _series(window_stat(s, "value", "min", ("range", WIN), out="o"), "o") \
        == [1.0, 1.0, 1.0, 2.0, 3.0]
    assert _series(window_stat(s, "value", "max", ("range", WIN), out="o"), "o") \
        == [1.0, 2.0, 3.0, 4.0, 5.0]
    _approx(_series(window_stat(s, "value", "median", ("range", WIN), out="o"), "o"),
            [1.0, 1.5, 2.0, 3.0, 4.0])


def test_time_windowed_var_std_counter(spark):
    s = _counter(spark)
    # windows {1},{1,2},{1,2,3},{2,3,4},{3,4,5}: var 0,0.5,1,1,1
    expected = [0.0, 0.5, 1.0, 1.0, 1.0]
    _approx(_series(window_stat(s, "value", "var", ("range", WIN), out="o"), "o"), expected)
    _approx(_series(window_stat(s, "value", "std", ("range", WIN), out="o"), "o"),
            [math.sqrt(v) for v in expected])


def test_time_windowed_zero_width_keeps_only_current(spark):
    s = _counter(spark)
    identity = [1.0, 2.0, 3.0, 4.0, 5.0]
    for stat, exp in (("sum", identity), ("mean", identity), ("min", identity),
                      ("max", identity), ("median", identity), ("var", [0.0] * 5)):
        got = _series(window_stat(s, "value", stat, ("range", 0), out="o"), "o")
        assert got == exp, stat


def test_time_windowed_tick_times_match_upstream(spark):
    out = window_stat(_counter(spark), "value", "min", ("range", WIN), out="o").with_time()
    rows = out.df.orderBy("ts").collect()
    assert [r["time"] for r in rows] == [0, 100, 200, 300, 400]
    assert [r["o"] for r in rows] == [1.0, 1.0, 1.0, 2.0, 3.0]


# ── statistics_time_weighted.rs / statistics_time_weighted_median.rs ────
# Weighting::Time semantics: each sample weighted by its in-effect
# interval; newest uncredited; mean seeds to current; var is population;
# time window evicts whole samples by age (no interval clipping); median
# crossing averages straddling values on an exact half.


def _tw(spark_stream, stat, frame):
    return _series(
        window_stat(spark_stream, "value", stat, frame, weighting="time", out="o"), "o"
    )


def test_cumulative_time_weighted_mean_lags_by_one_interval(spark):
    _approx(_tw(_counter(spark), "mean", ("cum",)), [1.0, 1.0, 1.5, 2.0, 2.5], 1e-9)


def test_cumulative_time_weighted_var_std(spark):
    expected = [0.0, 0.0, 0.25, 2.0 / 3.0, 1.25]
    _approx(_tw(_counter(spark), "var", ("cum",)), expected, 1e-9)
    _approx(_tw(_counter(spark), "std", ("cum",)), [math.sqrt(v) for v in expected], 1e-9)


def test_cumulative_time_weighted_std_constant_zero_not_nan(spark):
    s = ticker(spark, period_ns=100, n=6).count(out="n").map(value=F.lit(7.0))
    for v in _tw(s, "std", ("cum",)):
        assert v is not None and not math.isnan(v) and abs(v) < 1e-10


def test_rolling_time_weighted_mean_var_hand_computed(spark):
    s = _counter(spark)
    _approx(_tw(s, "mean", ("rows", 4)), [1.0, 1.0, 1.5, 2.0, 3.0], 1e-9)
    _approx(_tw(s, "var", ("rows", 4)), [0.0, 0.0, 0.25, 2.0 / 3.0, 2.0 / 3.0], 1e-9)


def test_rolling_time_weighted_matches_direct_recompute(spark):
    N, W = 200, 10
    s = ticker(spark, period_ns=100, n=N).count(out="n").map(
        value=((F.col("n") % 7).cast("double") * 1.5 - 3.0))
    got_mean = _tw(s, "mean", ("rows", W))[-1]
    got_var = _tw(s, "var", ("rows", W))[-1]
    retained = [(((n % 7) * 1.5 - 3.0), (n - 1) * 100) for n in range(N - W + 1, N + 1)]
    w_sum = mean = m2 = 0.0
    for (v, t), (_, nt) in zip(retained, retained[1:]):
        w = float(nt - t)
        w_sum += w
        old = mean
        mean += (w / w_sum) * (v - old)
        m2 += w * (v - old) * (v - mean)
    assert abs(got_mean - mean) < 1e-9
    assert abs(got_var - (m2 / w_sum)) < 1e-9


def test_wide_count_window_time_weighted_matches_cumulative(spark):
    s = _counter(spark)
    assert _tw(s, "mean", ("rows", 1000)) == _tw(s, "mean", ("cum",))
    assert _tw(s, "var", ("rows", 1000)) == _tw(s, "var", ("cum",))


def test_time_windowed_time_weighted_counter(spark):
    s = _counter(spark)
    _approx(_tw(s, "mean", ("range", WIN)), [1.0, 1.0, 1.5, 2.5, 3.5], 1e-9)
    _approx(_tw(s, "var", ("range", WIN)), [0.0, 0.0, 0.25, 0.25, 0.25], 1e-9)
    _approx(_tw(s, "std", ("range", WIN)), [0.0, 0.0, 0.5, 0.5, 0.5], 1e-9)


def test_time_weighted_median_series(spark):
    s = _counter(spark)
    _approx(_tw(s, "median", ("cum",)), [1.0, 1.0, 1.5, 2.0, 2.5], 1e-9)
    _approx(_tw(s, "median", ("rows", 4)), [1.0, 1.0, 1.5, 2.0, 3.0], 1e-9)
    _approx(_tw(s, "median", ("range", WIN)), [1.0, 1.0, 1.5, 2.5, 3.5], 1e-9)
    # wide count window == cumulative, tick for tick
    assert _tw(s, "median", ("rows", 1000)) == _tw(s, "median", ("cum",))


def test_time_weighted_median_constant_is_constant(spark):
    s = ticker(spark, period_ns=100, n=6).count(out="n").map(value=F.lit(7.0))
    for v in _tw(s, "median", ("cum",)):
        assert v is not None and not math.isnan(v) and abs(v - 7.0) < 1e-10


def test_time_weighted_tick_times_match_upstream(spark):
    out = window_stat(_counter(spark), "value", "mean", ("cum",),
                      weighting="time", out="o").with_time()
    rows = out.df.orderBy("ts").collect()
    assert [r["time"] for r in rows] == [0, 100, 200, 300, 400]
    _approx([r["o"] for r in rows], [1.0, 1.0, 1.5, 2.0, 2.5], 1e-9)


def test_time_windowed_min_max_non_monotonic_matches_brute_force(spark):
    """statistics_time_windowed.rs:100-138: min/max over (n*7)%13 in a
    250ns window vs a brute-force scan of the retained samples, every tick."""
    N = 40
    s = ticker(spark, period_ns=100, n=N).count(out="n").map(
        value=((F.col("n") * 7) % 13).cast("double"))
    got_min = _series(window_stat(s, "value", "min", ("range", WIN), out="o"), "o")
    got_max = _series(window_stat(s, "value", "max", ("range", WIN), out="o"), "o")
    for k in range(N):
        n = k + 1
        start = n - 2 if n > 3 else 1
        window = [float((m * 7) % 13) for m in range(start, n + 1)]
        assert got_min[k] == min(window), f"min mismatch at tick {k}"
        assert got_max[k] == max(window), f"max mismatch at tick {k}"


def test_time_windowed_moments_match_direct_recompute(spark):
    """statistics_time_windowed.rs:160-205: a 350ns window's final
    mean/var vs a from-scratch computation over the retained samples."""
    N, WIN_NS = 60, 350
    s = ticker(spark, period_ns=100, n=N).count(out="n").map(
        value=((F.col("n") % 7).cast("double") * 1.5 - 3.0))
    got_mean = _series(window_stat(s, "value", "mean", ("range", WIN_NS), out="o"), "o")[-1]
    got_var = _series(window_stat(s, "value", "var", ("range", WIN_NS), out="o"), "o")[-1]
    now = (N - 1) * 100
    retained = [((n % 7) * 1.5 - 3.0) for n in range(1, N + 1)
                if now - (n - 1) * 100 <= WIN_NS]
    em = sum(retained) / len(retained)
    ev = sum((v - em) ** 2 for v in retained) / (len(retained) - 1)
    assert abs(got_mean - em) < 1e-9
    assert abs(got_var - ev) < 1e-9


def test_time_windowed_std_of_constant_is_zero_not_nan(spark):
    """statistics_time_windowed.rs:210-230."""
    s = ticker(spark, period_ns=100, n=6).count(out="n").map(value=F.lit(7.0))
    for v in _series(window_stat(s, "value", "std", ("range", WIN), out="o"), "o"):
        assert v is not None and not math.isnan(v) and abs(v) < 1e-10


# ── statistics.rs (the EWMA op suite) ───────────────────────────────────


def test_ewma_of_sequence(spark):
    """statistics.rs:22-29: count 1,2,3,4 with alpha 0.5, seeded on the
    first sample → 1, 1.5, 2.25, 3.125."""
    from wingfoil_spark.operators.stateful import ewma

    s = _counter(spark, n=4)
    got = _series(ewma(s, "value", alpha=0.5, out="e"), "e")
    _approx(got, [1.0, 1.5, 2.25, 3.125])


def test_ewma_seeds_on_first_sample(spark):
    """statistics.rs:32-43: a constant stream of 5 stays 5.0."""
    from wingfoil_spark.operators.stateful import ewma

    s = _counter(spark, n=4).map(value=F.lit(5.0))
    got = _series(ewma(s, "value", alpha=0.3, out="e"), "e")
    _approx(got, [5.0] * 4)


def test_ewma_does_not_reset_at_zero(spark):
    """statistics.rs:46-58: inputs 0,0,5 with alpha 0.5 seed to 0 and
    DECAY (0 → 0 → 2.5) rather than re-seeding on the 5 — zero is a
    value, not an uninitialised slot."""
    from wingfoil_spark.operators.stateful import ewma

    s = _counter(spark, n=3).map(
        value=F.when(F.col("n") <= 2, 0.0).otherwise(5.0)
    )
    got = _series(ewma(s, "value", alpha=0.5, out="e"), "e")
    _approx(got, [0.0, 0.0, 2.5])


def test_ewma_half_life_of_constant_is_constant(spark):
    """statistics.rs:84-97: clock-driven decay of a constant stays at the
    seed for ANY half-life."""
    from wingfoil_spark.operators.stateful import ewma

    s = _counter(spark, n=5).map(value=F.lit(7.0))
    got = _series(ewma(s, "value", half_life_ns=50, out="e"), "e")
    _approx(got, [7.0] * 5)


def test_ewma_half_life_matches_per_tick_when_dt_equals_half_life(spark):
    """statistics.rs:99-113: with Δt equal to the half-life, the decay is
    0.5 every tick, so the half-life EWMA over 1,2,3,4 equals
    ewma_per_tick(0.5): 1, 1.5, 2.25, 3.125 — pins the actual decay math
    (a constant stream stays at its seed for any alpha)."""
    from wingfoil_spark.operators.stateful import ewma

    s = _counter(spark, n=4)
    got = _series(ewma(s, "value", half_life_ns=100, out="e"), "e")
    _approx(got, [1.0, 1.5, 2.25, 3.125])


def test_cumulative_moments_match_direct_recompute(spark):
    """statistics_cumulative.rs:167-192: 200 ticks of ((n%7)*1.5 - 3) —
    the expanding mean/var equal a direct whole-history recompute."""
    N = 200
    s = ticker(spark, period_ns=100, n=N).count(out="n").map(
        value=((F.col("n") % 7).cast("double") * 1.5 - 3.0))
    mean = _series(window_stat(s, "value", "mean", ("cum",), out="o"), "o")[-1]
    var = _series(window_stat(s, "value", "var", ("cum",), out="o"), "o")[-1]
    all_v = [((n % 7) * 1.5) - 3.0 for n in range(1, N + 1)]
    em = sum(all_v) / len(all_v)
    ev = sum((v - em) ** 2 for v in all_v) / (len(all_v) - 1)
    assert abs(mean - em) < 1e-9
    assert abs(var - ev) < 1e-9


def test_cumulative_std_of_constant_is_zero_not_nan(spark):
    """statistics_cumulative.rs:194-215: floating-point cancellation can
    push a constant stream's variance a hair negative — std must clamp to
    zero, never NaN."""
    s = ticker(spark, period_ns=100, n=6).count(out="n").map(
        value=F.lit(7.0))
    vals = _series(window_stat(s, "value", "std", ("cum",), out="o"), "o")
    for v in vals:
        assert v == v, "cumulative_std must not be NaN"  # NaN != NaN
        assert abs(v) < 1e-10
