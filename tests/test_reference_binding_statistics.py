"""Replays of the Python binding's statistics parity oracle
(/root/reference/crates/wingfoil-python/tests/test_statistics.py — itself
the port of the legacy binding's suite): the exact value sequences over
the shared ``1.0, 2.0, 3.0, …`` counts source, plus the argument-
shorthand marshaling contract (no window = cumulative, int = count
window, string weightings, average/variance aliases). The wiring idiom
maps: ``graph.counter(period_nanos=1e9).map(float)`` → ``ticker(1s).
count()``; ``accumulate().value()`` → the ordered column."""

import math

import pyspark.sql.functions as F
import pytest

from wingfoil_spark.sources.tables import ticker


def _counts(spark, n):
    """1.0, 2.0, ... one per second of graph time (ts in ns)."""
    return ticker(spark, 1_000_000_000, n).count().map(v=F.col("n").cast("double"))


def _run(spark, n, stat, frame=None, weighting="tick"):
    s = _counts(spark, n).stat("v", stat, frame, weighting=weighting, out="o")
    return [r.o for r in s.collect_ordered()]


def test_cumulative_default_and_explicit(spark):
    """test_cumulative_default / explicit_unbounded_matches_default:
    no window argument IS the unbounded window."""
    assert _run(spark, 5, "mean") == [1.0, 1.5, 2.0, 2.5, 3.0]
    assert _run(spark, 5, "mean", ("cum",)) == _run(spark, 5, "mean", None)


def test_count_window_and_int_shorthand(spark):
    """test_count_window / test_int_shorthand_matches_window_count:
    rolling mean of the last three samples; a bare int is that window."""
    assert _run(spark, 6, "mean", 3) == [1.0, 1.5, 2.0, 3.0, 4.0, 5.0]
    assert _run(spark, 6, "mean", ("rows", 3)) == _run(spark, 6, "mean", 3)


def test_time_window_inclusive_edge(spark):
    """test_time_window: a sample exactly `seconds` old is still in the
    window, so a 3s window holds four samples once warm."""
    got = _run(spark, 6, "mean", ("range", 3_000_000_000))
    assert got == [1.0, 1.5, 2.0, 2.5, 3.5, 4.5]


def test_time_weighting_differs_from_count(spark):
    """test_time_weighting_differs_from_count: the newest sample (in
    effect for zero time so far) carries no weight yet."""
    got = _run(spark, 5, "mean", None, weighting="time")
    assert got == [1.0, 1.0, 1.5, 2.0, 2.5]


def test_weighting_count_is_ticks_other_name(spark):
    """test_weighting_accepts_strings: "count" ≡ the tick weighting."""
    assert _run(spark, 5, "mean", None, weighting="count") == \
        _run(spark, 5, "mean", None, weighting="tick")


def test_average_and_variance_aliases(spark):
    """test_average_is_cumulative_mean + the variance alias."""
    assert _run(spark, 5, "average") == _run(spark, 5, "mean")
    assert _run(spark, 5, "variance") == _run(spark, 5, "var")


def test_cumulative_sample_variance_first_tick_zero(spark):
    """test_cumulative_sample_variance: ddof=1, first tick 0.0 rather
    than a division by zero."""
    got = _run(spark, 5, "var")
    expected = [0.0, 0.5, 1.0, 5.0 / 3.0, 2.5]
    assert all(math.isclose(g, e, rel_tol=1e-12) for g, e in zip(got, expected))


def test_std_is_sqrt_of_variance(spark):
    """test_std_is_sqrt_of_variance, on the rolling-4 window."""
    variances = _run(spark, 8, "var", 4)
    stds = _run(spark, 8, "std", 4)
    assert len(variances) == len(stds)
    for v, sd in zip(variances, stds):
        assert math.isclose(math.sqrt(v), sd, rel_tol=1e-12)


def test_std_time_weighted_non_negative(spark):
    """test_std_time_weighted_is_non_negative: population form, never
    negative, strictly positive once spread exists."""
    stds = _run(spark, 6, "std", None, weighting="time")
    assert all(sd >= 0.0 for sd in stds)
    assert stds[-1] > 0.0


def test_rolling_and_time_windowed_min_max(spark):
    """test_cumulative_min_and_max / rolling / time_windowed_min."""
    assert _run(spark, 5, "min") == [1.0] * 5
    assert _run(spark, 5, "max") == [1.0, 2.0, 3.0, 4.0, 5.0]
    assert _run(spark, 5, "min", 3) == [1.0, 1.0, 1.0, 2.0, 3.0]
    assert _run(spark, 5, "min", ("range", 2_000_000_000)) == \
        [1.0, 1.0, 1.0, 2.0, 3.0]


def test_median_unbounded_and_weighting_differs(spark):
    """test_unbounded (median straddle averaging) +
    test_time_weighted_differs."""
    assert _run(spark, 5, "median") == [1.0, 1.5, 2.0, 2.5, 3.0]
    cw = _run(spark, 6, "median", 5)
    tw = _run(spark, 6, "median", 5, weighting="time")
    assert len(cw) == len(tw) and cw != tw


def test_sum_windows(spark):
    """test_sum_no_args_is_cumulative / count / time windows."""
    assert _run(spark, 5, "sum") == [1.0, 3.0, 6.0, 10.0, 15.0]
    assert _run(spark, 5, "sum", 2) == [1.0, 3.0, 5.0, 7.0, 9.0]
    assert _run(spark, 5, "sum", ("range", 1_000_000_000)) == \
        [1.0, 3.0, 5.0, 7.0, 9.0]


def test_ewma_binding_goldens(spark):
    """TestEwma: the float shorthand is per-tick alpha (first sample
    seeds), alpha=1 is passthrough, half-life seeds then lags a rising
    input."""
    s = _counts(spark, 5).ewma("v", alpha=0.5, out="e")
    assert [r.e for r in s.collect_ordered()] == [1.0, 1.5, 2.25, 3.125, 4.0625]
    s1 = _counts(spark, 5).ewma("v", alpha=1.0, out="e")
    assert [r.e for r in s1.collect_ordered()] == [1.0, 2.0, 3.0, 4.0, 5.0]
    hl = _counts(spark, 5).ewma("v", half_life_ns=2_000_000_000, out="e")
    vals = [r.e for r in hl.collect_ordered()]
    assert vals[0] == 1.0
    for i in range(1, len(vals)):
        assert vals[i - 1] < vals[i] < float(i + 1)
