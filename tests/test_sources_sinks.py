"""Behavioral tests for the primitive sources (ticker/constant/never) and
the side-effecting sinks (for_each / for_each_batch) — previously
import-level only."""

import os
import tempfile

import pyspark.sql.functions as F

from wingfoil_spark.sources.tables import constant, never, ticker


def test_ticker_emits_n_ticks_with_period(spark):
    s = ticker(spark, period_ns=1000, n=5, start_ns=100)
    rows = sorted((r.ts, r.seq) for r in s.df.collect())
    # first activation AT start time (ops.rs:77-81 schedules start_time();
    # tick-time golden statistics_rolling.rs:198-209: 0,100,...,400)
    assert rows == [(100, 1), (1100, 2), (2100, 3), (3100, 4), (4100, 5)]


def test_constant_ticks_once(spark):
    s = constant(spark, 42.5, ts_ns=7)
    rows = s.df.collect()
    assert len(rows) == 1 and rows[0].ts == 7 and rows[0].value == 42.5


def test_never_is_empty_with_schema(spark):
    s = never(spark, schema="value double")
    assert s.df.count() == 0
    assert [f.name for f in s.df.schema.fields] == ["ts", "value"]
    # still composable: downstream ops on the empty stream are fine
    assert s.map(v2=F.col("value") * 2).df.count() == 0


def test_for_each_fires_per_row_and_for_each_batch_once(spark):
    s = ticker(spark, period_ns=10, n=7)
    with tempfile.TemporaryDirectory() as d:
        marker = os.path.join(d, "rows")

        def sink(row):
            with open(marker, "a") as f:
                f.write(f"{row.seq}\n")

        s.for_each(sink)
        with open(marker) as f:
            assert len(f.readlines()) == 7

        seen = []
        s.for_each_batch(lambda df: seen.append(df.count()))
        assert seen == [7]
