"""Golden replay of the reference's user-op suites (tests/custom_node.rs,
tests/custom_op.rs §2.9): a user-declared operator must be
indistinguishable from the built-in it shadows — same values, same tick
times, same suppression behavior. Here a @register_op fn IS plan
construction, so the equality is structural; these pin it anyway with the
reference's own cases.
"""

import pyspark.sql.functions as F

from wingfoil_spark.operators.registry import register_op
from wingfoil_spark.operators.stateful import fold_pandas
from wingfoil_spark.sources.tables import ticker
from wingfoil_spark.stream import Stream


def _counter(spark, n=4):
    s = ticker(spark, period_ns=100, n=n).count(out="n")
    return Stream(
        s.df.select("ts", F.col("n").cast("long").alias("v")), ts="ts",
    )


def _vals(stream, col="v"):
    return [r[col] for r in stream.df.orderBy("ts").collect()]


def test_custom_node_reading_upstream_matches_map(spark):
    """custom_node.rs:26-45: a user node reading its upstream equals the
    built-in map, value for value."""

    @register_op()
    def user_double(stream, col, out):
        return stream.map(**{out: F.col(col) * 2})

    s = _counter(spark)
    got = s.user_double("v", "d")
    ref = s.map(d=F.col("v") * 2)
    assert _vals(got, "d") == _vals(ref, "d") != []


def test_custom_node_quiet_suppresses_tick_like_map_filter(spark):
    """custom_node.rs:52-76: a user node emitting Quiet suppresses the
    tick exactly like map_filter — evens [2, 4, 6], odd instants absent."""

    @register_op()
    def user_evens(stream, col):
        return stream.map_filter(F.col(col) % 2 == 0)

    s = _counter(spark, n=6)
    got = s.user_evens("v")
    ref = s.map_filter(F.col("v") % 2 == 0)
    assert _vals(got) == _vals(ref) == [2, 4, 6]
    assert [r["ts"] for r in got.df.orderBy("ts").collect()] == \
        [r["ts"] for r in ref.df.orderBy("ts").collect()]


def test_custom_node_with_owned_state_matches_fold(spark):
    """custom_node.rs:111-132: a user node with engine-owned state equals
    the built-in fold — running sum 1, 3, 6, 10."""
    s = _counter(spark)
    got = fold_pandas(s, lambda acc, row: acc + row["v"], 0.0, out="acc")
    ref = s.fold("v", "sum", out="acc")
    assert [float(x) for x in _vals(got, "acc")] == \
        [float(x) for x in _vals(ref, "acc")] == [1.0, 3.0, 6.0, 10.0]


def test_custom_op_two_input_spread(spark):
    """custom_op.rs:129-148 (spread): a minimal two-active-input user op
    (a - b) via the combine machinery equals the hand-written map over the
    combined frame."""

    @register_op()
    def user_spread(stream, other, out="spread"):
        return stream.combine_latest(other).map(
            **{out: F.col("a") - F.col("b")})

    a = Stream(_counter(spark).df.select("ts", F.col("v").alias("a")), ts="ts")
    b = Stream(
        _counter(spark).df.select("ts", (F.col("v") * 2).alias("b")), ts="ts")
    got = a.user_spread(b)
    # a - 2a = -a at each shared instant
    assert _vals(got, "spread") == [-1, -2, -3, -4]


def test_registered_op_registry_roundtrip(spark):
    """custom_op.rs's declare-once contract: the registry lists the op and
    re-registering overwrites (interactive workflows)."""
    from wingfoil_spark.operators.registry import registered_ops

    @register_op(name="user_scale")
    def _scale(stream, col, k, out="scaled"):
        return stream.map(**{out: F.col(col) * k})

    assert "user_scale" in registered_ops()
    s = _counter(spark)
    assert _vals(s.user_scale("v", 10), "scaled") == [10, 20, 30, 40]

    @register_op(name="user_scale")
    def _scale2(stream, col, k, out="scaled"):
        return stream.map(**{out: F.col(col) * k + 1})

    assert _vals(s.user_scale("v", 10), "scaled") == [11, 21, 31, 41]
