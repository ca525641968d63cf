"""build_dataframe goldens — the Python binding's pandas-interop contract
replayed one for one (wingfoil-python/tests/test_pandas.py:1-171; itself
the port of the legacy engine's test_pandas suite). The counter source
maps to replay_rows; `.toPandas()` is the binding-surface read."""

import math

import pyspark.sql.functions as F
import pytest

from wingfoil_spark.frames import build_dataframe
from wingfoil_spark.sources.tables import replay_rows
from wingfoil_spark.stream import Stream


def _counter(spark, n, period=100):
    """counter(period): 1..n at t = 0, period, ... (test_pandas.py:35)."""
    return replay_rows(
        spark,
        [(period * i, i, i + 1) for i in range(n)],
        "ts long, seq long, c long",
        ts="ts",
        seq="seq",
    )


def test_dict_of_streams(spark):
    """test_pandas.py:32-52: two branches of one source, joined on time."""
    src = _counter(spark, 3)
    a = src.map(col_a=F.col("c") - 1).select_cols("col_a")
    b = src.map(col_b=(F.col("c") - 1) * 2).select_cols("col_b")
    df = build_dataframe({"col_a": a, "col_b": b}).toPandas()
    assert len(df) == 3
    assert list(df["ts"]) == [0, 100, 200]
    assert df.iloc[0]["col_a"] == 0 and df.iloc[0]["col_b"] == 0
    assert df.iloc[2]["col_a"] == 2 and df.iloc[2]["col_b"] == 4


def test_async_frequencies(spark):
    """test_pandas.py:55-83: tickers at different speeds outer-join with
    NaN where the slow one was silent."""
    fast = _counter(spark, 4, 100).map(fast=F.col("c") * 10).select_cols("fast")
    slow = _counter(spark, 2, 200).map(slow=F.col("c") * 100).select_cols("slow")
    df = build_dataframe({"fast": fast, "slow": slow}).toPandas()
    assert len(df) == 4
    assert list(df["fast"]) == [10, 20, 30, 40]
    assert df.iloc[0]["slow"] == 100 and df.iloc[2]["slow"] == 200
    assert math.isnan(df.iloc[1]["slow"]) and math.isnan(df.iloc[3]["slow"])


def test_massive_fan_out(spark):
    """test_pandas.py:86-104: three branches, all aligned."""
    src = _counter(spark, 3)
    parts = {
        "add": src.map(add=F.col("c") + 5).select_cols("add"),
        "sub": src.map(sub=F.col("c") - 5).select_cols("sub"),
        "mult": src.map(mult=F.col("c") * 5).select_cols("mult"),
    }
    df = build_dataframe(parts).toPandas()
    assert len(df) == 3
    assert df.iloc[2]["add"] == 8 and df.iloc[2]["sub"] == -2 and df.iloc[2]["mult"] == 15


def test_skips_empty_streams(spark):
    """test_pandas.py:107-121: a stream that never ran contributes no
    column."""
    empty = Stream(
        spark.createDataFrame([], "ts long, seq long, c long"), ts="ts", seq="seq"
    )
    live = _counter(spark, 3)
    df = build_dataframe({"empty": empty, "live": (live, "c")}).toPandas()
    assert "live" in df.columns and "empty" not in df.columns
    assert len(df) == 3


def test_all_empty_is_empty(spark):
    """test_pandas.py:131-137."""
    empty = Stream(
        spark.createDataFrame([], "ts long, seq long, c long"), ts="ts", seq="seq"
    )
    assert build_dataframe({}, spark=spark).count() == 0
    assert build_dataframe({"empty": empty}).count() == 0


def test_preserves_column_order(spark):
    """test_pandas.py:140-151: dict insertion order, after time."""
    src = _counter(spark, 2)
    parts = {
        "c": src.map(v3=F.col("c") * 3).select_cols("v3"),
        "a": src.map(v1=F.col("c")).select_cols("v1"),
        "b": src.map(v2=F.col("c") * 2).select_cols("v2"),
    }
    df = build_dataframe(parts)
    assert df.columns == ["ts", "c", "a", "b"]


def test_rejects_non_stream_values(spark):
    """test_pandas.py:168-171: clear error, not a crash."""
    with pytest.raises(ValueError, match="not a wingfoil Stream"):
        build_dataframe({"nope": [(0, 1)]})


def test_burst_contributes_its_last_row(spark):
    """Wingfoil-side pin: a same-instant burst joins as its LAST row (by
    seq) — the Runner::value slot read, not an arbitrary one."""
    s = replay_rows(
        spark,
        [(0, 0, 1), (0, 1, 7), (100, 2, 9)],
        "ts long, seq long, c long",
        ts="ts",
        seq="seq",
    )
    df = build_dataframe({"v": (s, "c")}).toPandas()
    assert list(df["ts"]) == [0, 100]
    assert list(df["v"]) == [7, 9]


def test_keyed_streams_join_per_key(spark):
    """Spark-side extension: keyed streams outer-join on (key, ts)."""
    a = Stream(
        spark.createDataFrame(
            [(1, 0, 10.0), (2, 0, 20.0)], "user_id long, ts long, x double"
        ),
        ts="ts", keys=("user_id",),
    )
    b = Stream(
        spark.createDataFrame([(1, 0, 1.0)], "user_id long, ts long, y double"),
        ts="ts", keys=("user_id",),
    )
    df = build_dataframe({"x": a, "y": b}).toPandas()
    assert df.columns.tolist() == ["user_id", "ts", "x", "y"]
    assert len(df) == 2
    assert math.isnan(df[df.user_id == 2].iloc[0]["y"])


def test_stream_collect_and_dataframe_sugar(spark):
    """The binding's read-back shapes (tests/test_pandas.py:10-13,
    test_dict_of_streams): stream.collect() is (time, value) tuples in
    replay order; stream.dataframe() is the engine-built pandas frame
    with time/value columns; both feed build_dataframe's join."""
    import pyspark.sql.functions as F

    from wingfoil_spark.sources.tables import ticker

    src = ticker(spark, 100, 3).count()
    a = src.map(v=(F.col("n") - 1).cast("double"))
    a = Stream(a.df.select("ts", "seq", "v"), "ts", "seq")
    assert a.collect() == [(0, 0.0), (100, 1.0), (200, 2.0)]

    pdf = a.dataframe()
    assert list(pdf.columns) == ["time", "value"]
    assert list(pdf["time"]) == [0, 100, 200]
    assert list(pdf["value"]) == [0.0, 1.0, 2.0]

    # explicit col= when several value columns exist
    multi = src.map(v=F.col("n") * 1.0, w=F.col("n") * 2.0)
    assert multi.collect(col="w") == [(0, 2.0), (100, 4.0), (200, 6.0)]
    with pytest.raises(ValueError, match="one value column"):
        multi.collect()
