"""Unit coverage for the small pass-through combinators that previously had
none: with_time / ticked_at_elapsed / not_ / collapse / filter_none.
Reference cites in each operator's docstring (fluent.rs)."""

import pyspark.sql.functions as F

from wingfoil_spark.stream import Stream


def _s(spark, rows, schema="ts_us long, event_id long, user_id long, value double"):
    df = spark.createDataFrame(rows, schema)
    return Stream(df, ts="ts_us", seq="event_id", keys=("user_id",))


def test_with_time_pairs_engine_time(spark):
    s = _s(spark, [(10, 1, 1, 2.0), (20, 2, 1, 3.0)])
    out = s.with_time(out="t").df.collect()
    assert all(r.t == r.ts_us for r in out)


def test_ticked_at_elapsed_per_key(spark):
    s = _s(spark, [(10, 1, 1, 0.0), (25, 2, 1, 0.0), (100, 3, 2, 0.0), (130, 4, 2, 0.0)])
    out = {(r.user_id, r.event_id): r.elapsed
           for r in s.ticked_at_elapsed().df.collect()}
    assert out == {(1, 1): 0, (1, 2): 15, (2, 3): 0, (2, 4): 30}


def test_not_negates_boolean(spark):
    df = spark.createDataFrame(
        [(1, 1, 1, True), (2, 2, 1, False)],
        "ts_us long, event_id long, user_id long, flag boolean",
    )
    s = Stream(df, ts="ts_us", seq="event_id", keys=("user_id",))
    out = {r.event_id: r.flag for r in s.not_("flag").df.collect()}
    assert out == {1: False, 2: True}


def test_collapse_takes_last_item_and_drops_empty(spark):
    df = spark.createDataFrame(
        [(1, 1, 1, [1.0, 2.0, 3.0]), (2, 2, 1, []), (3, 3, 1, [7.0])],
        "ts_us long, event_id long, user_id long, arr array<double>",
    )
    s = Stream(df, ts="ts_us", seq="event_id", keys=("user_id",))
    out = {r.event_id: r.last for r in s.collapse("arr").df.collect()}
    assert out == {1: 3.0, 3: 7.0}  # empty-array tick is quiet


def test_filter_none_drops_nulls(spark):
    df = spark.createDataFrame(
        [(1, 1, 1, 5.0), (2, 2, 1, None), (3, 3, 1, 6.0)],
        "ts_us long, event_id long, user_id long, value double",
    )
    s = Stream(df, ts="ts_us", seq="event_id", keys=("user_id",))
    out = [r.event_id for r in s.filter_none("value").df.collect()]
    assert sorted(out) == [1, 3]


def test_fluent_delegations(spark, sf_dir):
    """Every kernel/analysis operator is reachable as a fluent Stream
    method (reference StreamOps/StatisticsOps/augurs trait parity) and
    returns the same result as the module operator."""
    import pyspark.sql.functions as F

    from wingfoil_spark.operators.stateful import drop_small_change
    from wingfoil_spark.sources.tables import load_table, ts_us_expr
    from wingfoil_spark.stream import Stream

    ev = load_table(spark, sf_dir, "events")
    s = Stream(
        ev.select("user_id", ts_us_expr(ev).alias("ts_us"), "event_id", "value")
        .where(F.col("user_id") < 5),
        ts="ts_us", seq="event_id", keys=("user_id",),
    )
    a = s.drop_small_change("value", 25.0).df.orderBy("user_id", "ts_us").collect()
    b = drop_small_change(s, "value", 25.0).df.orderBy("user_id", "ts_us").collect()
    assert a == b and len(a) > 0

    assert s.throttle_exact(3600_000_000).df.count() > 0
    assert "forecast" in s.forecast("value").df.columns
    assert "shift_score" in s.changepoint("value").df.columns
    assert "outlier_score" in s.outlier("value").df.columns
    assert {"tw_mean", "tw_var", "tw_median"} <= set(
        s.time_weighted_profile("value", 3600_000_000).df.columns
    )
    assert s.seasons("value").count() > 0
    assert {"key_a", "key_b", "dtw"} <= set(s.dtw_distances("value").columns)
    acc = s.fold_pandas(lambda acc, row: acc + row["value"], 0.0, out="tot")
    assert "tot" in acc.df.columns
