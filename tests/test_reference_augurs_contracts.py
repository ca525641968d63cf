"""Replays of the reference's augurs-adapter behavior contracts
(/root/reference/crates/wingfoil/tests/augurs_adapter.rs) that round-3
coverage had not yet pinned: the cross-sectional outlier shape, the
DBSCAN outlier mode, the silence gates (min_points / two-samples /
two-series), quiet-when-steady, and the selectable DTW metric. Each test
cites the legacy test it replays; inputs mirror the reference's synthetic
series (ticker → count → map shapes) keyed per series."""

import math

import numpy as np
import pyspark.sql.functions as F
import pytest

from wingfoil_spark import Stream
from wingfoil_spark.operators import analysis


def multi_series(spark, fns, n):
    """One row per (series key, tick): the reference's Vec<f64>-per-tick
    reading transposed to a keyed stream (series index as the key)."""
    rows = [
        (f"s{j}", i + 1, float(fn(i + 1)))
        for i in range(n)
        for j, fn in enumerate(fns)
    ]
    df = spark.createDataFrame(rows, "k string, ts long, v double")
    return Stream(df, ts="ts", keys=("k",))


def single(spark, vals, key="k"):
    rows = [(key, i + 1, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k string, ts long, v double")
    return Stream(df, ts="ts", keys=("k",))


# ---------------------------------------------------------- outlier (MAD)


def test_cross_outlier_flags_diverging_series(spark):
    """outlier_mad_flags_diverging_series (augurs_adapter.rs:158-179):
    three series move together except one that jumps away — flagged."""
    base = lambda n: 100.0 + math.sin(n * 0.4)
    s = multi_series(
        spark,
        [
            base,
            lambda n: base(n) + 0.1,
            lambda n: base(n) + (80.0 if n > 20 else 0.2),
        ],
        40,
    )
    out = analysis.cross_section_outlier(s, "v").df.collect()
    last = {r.k: r for r in out if r.ts == 40}
    assert len(last) == 3, "one score per series at the last tick"
    assert last["s2"].outlying is True
    assert last["s0"].outlying is False
    assert last["s1"].outlying is False
    # before the jump the diverging series is still in line with the group
    early = {r.k: r for r in out if r.ts == 10}
    assert early["s2"].outlying is False


def test_cross_outlier_quiet_when_aligned(spark):
    """outlier_quiet_when_aligned (augurs_adapter.rs:206-224): with all
    series moving together, nothing is flagged."""
    base = lambda n: 50.0 + math.sin(n * 0.3)
    s = multi_series(
        spark,
        [base, lambda n: base(n) + 0.05, lambda n: base(n) - 0.05],
        30,
    )
    out = analysis.cross_section_outlier(s, "v").df.collect()
    assert out, "aligned series still tick (scores emitted)"
    assert all(r.outlying is False for r in out)


def test_cross_outlier_waits_for_two_samples(spark):
    """outlier_waits_for_two_samples (augurs_adapter.rs:226-243): fewer
    than two samples (timestamps) → never ticks."""
    s = multi_series(spark, [lambda n: float(n), lambda n: n + 1.0], 1)
    assert analysis.cross_section_outlier(s, "v").df.count() == 0
    # and from the second sample on, every instant emits
    s2 = multi_series(spark, [lambda n: float(n), lambda n: n + 1.0], 3)
    ticked = analysis.cross_section_outlier(s2, "v").df
    assert sorted(r.ts for r in ticked.select("ts").distinct().collect()) == [2, 3]


def test_cross_outlier_no_spread_scores_null(spark):
    """The augurs detector needs spread to measure (augurs.rs:607-617):
    a cross-section where every key sits at the median has MAD 0 → null
    score, nothing flagged (never a divide-by-zero Infinity)."""
    s = multi_series(spark, [lambda n: 7.0, lambda n: 7.0, lambda n: 7.0], 5)
    out = analysis.cross_section_outlier(s, "v").df.collect()
    assert out and all(r.outlier_score is None and r.outlying is False for r in out)


# -------------------------------------------------------- outlier (DBSCAN)


def test_dbscan_outlier_flags_diverging_series(spark):
    """outlier_dbscan_flags_diverging_series (augurs_adapter.rs:184-204):
    three series cluster together, the diverging fourth is DBSCAN noise."""
    base = lambda n: 100.0 + math.sin(n * 0.4)
    # numeric keys: dbscan_clusters labels through a LongType key column
    rows = [
        (j, i + 1, float(v))
        for i in range(40)
        for j, v in enumerate(
            [
                base(i + 1),
                base(i + 1) + 0.1,
                base(i + 1) - 0.1,
                base(i + 1) + (90.0 if i + 1 > 15 else 0.3),
            ]
        )
    ]
    df = spark.createDataFrame(rows, "k long, ts long, v double")
    s = Stream(df, ts="ts", keys=("k",))
    out = {r.key: r.outlying for r in analysis.dbscan_outliers(s, "v", eps=30.0, min_pts=3).collect()}
    assert out[3] is True, "diverging series is noise"
    assert out[0] is False and out[1] is False and out[2] is False


# ------------------------------------------------------------- changepoint


def test_changepoint_quiet_when_steady(spark):
    """changepoint_quiet_when_steady (augurs_adapter.rs:279-297): a
    perfectly steady series has no spread to measure → null scores
    everywhere, no spurious changepoints."""
    s = single(spark, [5.0] * 30)
    out = analysis.mean_shift_changepoint(s, "v", half_n=5).df.collect()
    assert all(r.shift_score is None for r in out)


def test_changepoint_waits_for_min_points(spark):
    """changepoint_waits_for_min_points (augurs_adapter.rs:300-323): the
    node does not tick until min_points samples have arrived — rows are
    suppressed, not nulled."""
    s = single(spark, [float(i) for i in range(15)])
    assert analysis.mean_shift_changepoint(s, "v", half_n=4, min_points=20).df.count() == 0
    ticked = analysis.mean_shift_changepoint(s, "v", half_n=4, min_points=10).df
    assert sorted(r.ts for r in ticked.select("ts").collect()) == list(range(10, 16))


# ----------------------------------------------------------------- seasons


def test_seasons_waits_for_min_points(spark):
    """seasons_waits_for_min_points (augurs_adapter.rs:375-390): below
    min_points the key emits NOTHING."""
    vals = [math.sin(2 * math.pi * i / 4) for i in range(15)]
    s = single(spark, vals)
    assert analysis.detect_seasons(s, "v", min_points=20).count() == 0
    assert analysis.detect_seasons(s, "v", min_points=10).count() == 1


def test_seasons_below_model_floor_still_emits(spark):
    """seasons_window_below_floor_still_emits (augurs_adapter.rs:354-369):
    a series below the 8-tick periodogram floor still emits (a null-period
    row on the batch surface) rather than erroring or vanishing."""
    row = analysis.detect_seasons(single(spark, [1.0, 2.0, 3.0]), "v").collect()[0]
    assert row.dominant_period is None and row.n_ticks == 3


# --------------------------------------------------------------------- dtw


def test_dtw_waits_for_two_series(spark):
    """dtw_waits_for_two_series (augurs_adapter.rs:445-459): one series →
    the pair table is empty (strict key_a < key_b join has no pairs)."""
    s = single(spark, [float(i) for i in range(10)])
    assert analysis.dtw_distances(s, "v").count() == 0


def test_dtw_metric_rankings_and_validation(spark):
    """dtw_distances_reflect_similarity + dtw_manhattan_metric_ranks_
    similarity (augurs_adapter.rs:397-423, 462-484): under BOTH metrics the
    dissimilar series is farther than the near-identical pair; an unknown
    metric is a wiring-time error (the binding's loud-knob pattern)."""
    a = lambda n: math.sin(n * 0.3)
    s = multi_series(
        spark,
        [a, lambda n: a(n) + 0.02, lambda n: 5.0 * a(n) + 10.0],
        30,
    )
    for metric in ("manhattan", "euclidean"):
        d = {
            (r.key_a, r.key_b): r.dtw
            for r in analysis.dtw_distances(s, "v", metric=metric).collect()
        }
        assert d[("s0", "s2")] > d[("s0", "s1")], metric
    with pytest.raises(ValueError, match="unsupported dtw metric"):
        analysis.dtw_distances(s, "v", metric="chebyshev")


def test_dtw_euclidean_kernel_golden():
    """The euclidean kernel is the augurs univariate convention
    (augurs.rs:983): squared step costs along the optimal path, square root
    of the total. Hand-checked: a=[0,1], b=[0,3] → path pairs (0,0),(1,3)
    → sqrt(0 + 4) = 2; manhattan on the same pair → 0 + 2 = 2; offset
    series disagree between metrics once costs exceed 1."""
    a, b = np.array([0.0, 1.0]), np.array([0.0, 3.0])
    assert analysis._dtw(a, b, "euclidean") == 2.0
    assert analysis._dtw(a, b, "manhattan") == 2.0
    c, d = np.array([0.0, 0.0]), np.array([3.0, 3.0])
    # manhattan: 3+3=6; euclidean: sqrt(9+9)=4.24 — the metrics diverge
    assert analysis._dtw(c, d, "manhattan") == 6.0
    assert math.isclose(analysis._dtw(c, d, "euclidean"), math.sqrt(18.0))
    assert analysis._dtw(a, a, "euclidean") == 0.0


# ------------------------------------------------------------------- bocpd


def test_bocpd_detects_level_shift(spark):
    """changepoint_detects_level_shift (augurs_adapter.rs:250-274) with
    the REAL detector: a series jumping from a low to a high level
    reports the shift index within its window; the window-start artifact
    (index 0) never appears."""
    vals = [2.0 + 0.1 * math.sin(i) for i in range(30)] + [
        40.0 + 0.1 * math.sin(i) for i in range(30)
    ]
    s = single(spark, vals)
    out = analysis.bocpd_changepoints(s, "v", window_n=60)
    last = out.orderBy("ts").collect()[-1]
    assert 30 in last.cp_indices, last
    assert 0 not in last.cp_indices
    assert last.n_changepoints >= 1


def test_bocpd_quiet_when_steady(spark):
    """changepoint_quiet_when_steady (augurs_adapter.rs:279-297): a
    steady series yields no changepoints at any tick."""
    s = single(spark, [5.0] * 40)
    out = analysis.bocpd_changepoints(s, "v", window_n=40)
    rows = out.collect()
    assert rows, "ticks from min_points on"
    assert all(r.n_changepoints == 0 and r.cp_indices == [] for r in rows)


def test_bocpd_waits_for_min_points_and_floor(spark):
    """changepoint_waits_for_min_points (augurs_adapter.rs:300-323): no
    emission until min_points; a window below the floor is grown to it
    (augurs.rs:782-786) rather than never ticking."""
    s = single(spark, [float(i) for i in range(10)])
    assert analysis.bocpd_changepoints(s, "v", min_points=20).count() == 0
    # window 2 < min_points 8 → grown to 8 → ticks at 8, 9, 10
    out = analysis.bocpd_changepoints(s, "v", window_n=2, min_points=8)
    assert sorted(r.ts for r in out.collect()) == [8, 9, 10]


def test_bocpd_kernel_two_regime_golden():
    """Two clean regime changes in one window → exactly their start
    indices (the MAP run-length restart reader)."""
    y = np.concatenate(
        [np.full(20, 0.0), np.full(20, 10.0), np.full(20, -5.0)]
    )
    assert analysis._bocpd_scan(y, 250.0) == [20, 40]
    assert analysis._bocpd_scan(np.array([]), 250.0) == []


# ------------------------------------------------------- seasonal forecast


def test_mstl_forecast_captures_season(spark):
    """forecast_mstl_captures_season (augurs_adapter.rs:75-99): a
    period-12 sine riding a gentle ramp forecasts a horizon-12 vector
    that SWINGS by a meaningful fraction of the 10.0 peak-to-peak
    amplitude, rather than flat-lining."""
    vals = [0.1 * t + 5.0 * math.sin(t * 2 * math.pi / 12.0)
            for t in range(1, 81)]
    s = single(spark, vals)
    out = analysis.seasonal_forecast(s, "v", window_n=120, horizon=12,
                                     periods=[12])
    last = out.orderBy("ts").collect()[-1]
    assert len(last.forecast) == 12, "horizon == 12 point forecasts"
    swing = max(last.forecast) - min(last.forecast)
    assert swing > 2.0, f"expected a seasonal swing, got {swing:.3f}"
    # and the ramp is still rising: the mean forecast exceeds the window
    # mean (the forecast_ramp_predicts_ahead direction check)
    assert sum(last.forecast) / 12 > sum(vals) / len(vals)


def test_mstl_rejects_invalid_period(spark):
    """forecast_mstl_rejects_invalid_period (augurs_adapter.rs:122-136):
    a period below 2 is rejected with a clear error at wiring."""
    s = single(spark, [1.0, 2.0, 3.0])
    with pytest.raises(ValueError, match="period must be >= 2"):
        analysis.seasonal_forecast(s, "v", 10, 2, periods=[1])


def test_mstl_window_below_floor_still_emits(spark):
    """forecast_window_below_floor_still_emits (augurs_adapter.rs:102-119):
    a short window still warms up and emits (horizon-length vector), gated
    only by min_points."""
    vals = [float(i) + math.sin(i * 0.5) for i in range(1, 31)]
    s = single(spark, vals)
    out = analysis.seasonal_forecast(s, "v", window_n=10, horizon=2,
                                     periods=[4])
    rows = out.orderBy("ts").collect()
    assert rows and all(len(r.forecast) == 2 for r in rows)
    assert rows[0].ts == 8, "min_points gate"


# ----------------------------------------------------------------- cluster


def test_dtw_and_cluster_wait_for_two_samples(spark):
    """dtw_waits_for_two_samples + cluster_waits_for_two_samples
    (augurs_adapter.rs:426-442, 538-554): two series with a single sample
    each stay SILENT through the whole dtw → dbscan chain — a distance
    over length-1 columns is not a windowed-history distance."""
    df = spark.createDataFrame([(0, 1, 1.0), (1, 1, 2.0)], "k long, ts long, v double")
    s = Stream(df, ts="ts", keys=("k",))
    pairs = analysis.dtw_distances(s, "v")
    assert pairs.count() == 0
    assert analysis.dbscan_clusters(pairs, eps=1.0).count() == 0


def test_cluster_waits_for_two_series(spark):
    """cluster_waits_for_two_series (augurs_adapter.rs:521-536): one
    series → no pairs → no cluster output."""
    df = spark.createDataFrame([(0, t, float(t)) for t in range(10)],
                               "k long, ts long, v double")
    s = Stream(df, ts="ts", keys=("k",))
    assert analysis.dbscan_outliers(s, "v", eps=1.0).count() == 0


def test_cluster_groups_similar_series(spark):
    """cluster_groups_similar_series (augurs_adapter.rs:489-518): two
    tight groups of series plus one singleton — groups get distinct
    cluster ids, the odd series out is noise."""
    rows = []
    for t in range(1, 31):
        a = math.sin(t * 0.3)
        for k, v in enumerate([a, a + 0.02, 10 + 2 * a, 10 + 2 * a + 0.02,
                               1000.0 * ((t % 7) - 3)]):
            rows.append((k, t, float(v)))
    s = Stream(spark.createDataFrame(rows, "k long, ts long, v double"),
               ts="ts", keys=("k",))
    pairs = analysis.dtw_distances(s, "v")
    labs = {r.key: r for r in analysis.dbscan_clusters(pairs, eps=5.0, min_pts=2).collect()}
    assert labs[0].cluster == labs[1].cluster != -1
    assert labs[2].cluster == labs[3].cluster != -1
    assert labs[0].cluster != labs[2].cluster
    assert labs[4].cluster == -1, "singleton is noise"
