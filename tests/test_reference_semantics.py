"""Goldens replayed from the reference's own semantic cross-validation
suite (/root/reference/crates/wingfoil/tests/engine_semantics.rs) — the
tests the reference uses to prove a new engine reproduces legacy observable
behavior. Same wiring, same expected values, expressed on Stream.
"""

import pyspark.sql.functions as F

from wingfoil_spark.sources.tables import constant, ticker
from wingfoil_spark.stream import Stream


def test_constant_and_sample_match_reference(spark):
    """engine_semantics.rs:34-42: a constant ticks once; sampling it on a
    ticker re-emits it each trigger tick → [7, 7, 7]."""
    tick = ticker(spark, period_ns=100, n=3)
    const = constant(spark, 7.0, ts_ns=0)
    out = const.sample(tick, cols=["value"])
    vals = [r.value for r in out.df.orderBy("ts").collect()]
    assert vals == [7.0, 7.0, 7.0]


def test_filter_suppresses_like_reference(spark):
    """engine_semantics.rs:45-54: counts gated by an is-even latch pass
    only even counts → [2, 4, 6]."""
    count = ticker(spark, period_ns=100, n=6).count(out="n")
    count = Stream(
        count.df.select("ts", "seq", F.col("n").cast("long").alias("n")),
        ts="ts", seq="seq",
    )
    is_even = Stream(
        count.df.select("ts", "seq", (F.col("n") % 2 == 0).alias("flag")),
        ts="ts", seq="seq",
    )
    out = count.filter_latch(is_even, "flag")
    vals = [r.n for r in out.df.orderBy("ts").collect()]
    assert vals == [2, 4, 6]


def test_join_combines_current_values_like_reference(spark):
    """engine_semantics.rs:57-66: count joined with its doubled self,
    summed at each tick → [3, 6, 9]."""
    count = ticker(spark, period_ns=100, n=3).count(out="a")
    count = Stream(
        count.df.select("ts", "seq", F.col("a").cast("long").alias("a")),
        ts="ts", seq="seq",
    )
    doubled = Stream(
        count.df.select("ts", "seq", (F.col("a") * 2).alias("b")),
        ts="ts", seq="seq",
    )
    joined = count.combine_latest(doubled).map(s=F.col("a") + F.col("b"))
    vals = [r.s for r in joined.df.orderBy("ts").collect()]
    assert vals == [3, 6, 9]


def test_for_each_observes_every_tick_like_reference(spark):
    """engine_semantics.rs:90-105: a sink side effect runs once per source
    tick, in tick order → [1, 2, 3]."""
    import os
    import tempfile

    count = ticker(spark, period_ns=100, n=3).count(out="n")
    with tempfile.TemporaryDirectory() as d:
        marker = os.path.join(d, "seen")

        def sink(row):
            with open(marker, "a") as f:
                f.write(f"{row.n}\n")

        Stream(count.df.orderBy("ts").coalesce(1), ts="ts", seq="seq").for_each(sink)
        with open(marker) as f:
            assert [int(x) for x in f.read().split()] == [1, 2, 3]
