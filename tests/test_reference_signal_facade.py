"""Goldens from the builder-less Signal facade suite (tests/signal.rs):
whole programs in the legacy idiom — free source functions, run, read the
final value. Our API is builder-less by construction (no GraphBuilder
object: `ticker(spark, ...)` / `replay_rows(...)` return Streams, and
`last_values()` is the `peek_value` read), so these pin that the
script-style surface computes what the fluent ops do."""

from pyspark.sql import functions as F

from wingfoil_spark.stream import Stream
from wingfoil_spark.sources.tables import replay_rows, ticker


def test_legacy_counter_runs(spark):
    """signal.rs:22-27 — count a 100ns ticker for 5 cycles; peek 5."""
    t = ticker(spark, period_ns=100, n=5)
    counted = t.count()
    assert [r.n for r in counted.last_values().collect()] == [5]


def test_legacy_chain_maps_filters_accumulates(spark):
    """signal.rs:30-38 — ticker → count → map(is_even) → filter(cond
    stream) → accumulate: evens [2,4,6] survive, at source instants."""
    count = ticker(spark, period_ns=100, n=6).count()
    is_even = count.map(flag=(F.col("n") % 2 == 0)).select_cols("flag")
    evens = count.filter_latch(is_even, "flag")
    rows = evens.df.orderBy("ts").collect()
    assert [r.n for r in rows] == [2, 4, 6]
    assert [r.ts for r in rows] == [100, 300, 500]


def test_legacy_fold_running_sum(spark):
    """signal.rs (fold golden) — running sum off a counter: 1,3,6,10,15."""
    s = ticker(spark, period_ns=100, n=5).count().fold("n", "sum", out="acc")
    assert [r.acc for r in s.df.orderBy("ts").collect()] == [1, 3, 6, 10, 15]
