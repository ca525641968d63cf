"""Replays of the Python binding's ``CustomStream`` contracts
(/root/reference/crates/wingfoil-python/tests/test_custom_stream.py) —
the subclass form of a user-defined node: the constructor returns the
wired Stream (which chains), upstreams read in wired order with ``None``
before a tick, quiet cycles leave the previous value and do not tick,
``__init__`` receives the remaining constructor args and may seed a value
before wiring, a missing ``cycle`` raises NotImplementedError, and an
exception in ``cycle`` aborts the run."""

import math

import pyspark.sql.functions as F
import pytest

from wingfoil_spark import Stream
from wingfoil_spark.custom import CustomStream, UpstreamValue
from wingfoil_spark.sources.tables import ticker


def counts(spark, n):
    c = ticker(spark, 100, n).count()
    return Stream(
        c.df.select("ts", "seq", F.col("n").cast("double").alias("v")),
        "ts", "seq",
    )


class Doubler(CustomStream):
    def cycle(self):
        (v,) = self.upstreams()
        self.set_value(v.peek_value() * 2.0)
        return True


def test_subclass_wires_and_ticks(spark):
    """test_subclass_wires_and_ticks: cycle runs per tick, values out."""
    out = Doubler(counts(spark, 5))
    assert [r.value for r in out.collect_ordered()] == [2.0, 4.0, 6.0, 8.0, 10.0]


def test_constructor_returns_a_stream_that_chains(spark):
    """test_constructor_returns_a_stream_that_chains: not the subclass
    instance — the wired Stream, which chains fluently."""
    out = Doubler(counts(spark, 4))
    assert isinstance(out, Stream)
    chained = out.map(half=F.col("value") / 4)
    assert [r.half for r in chained.collect_ordered()] == [0.5, 1.0, 1.5, 2.0]


def test_upstreams_are_ordered_and_independent(spark):
    """test_upstreams_are_ordered_and_independent: two upstreams read in
    the order they were wired."""

    class Digits(CustomStream):
        def cycle(self):
            a, b = self.upstreams()
            av = a.peek_value() or 0.0
            bv = b.peek_value() or 0.0
            self.set_value(av * 10 + bv)
            return True

    tens = counts(spark, 4)
    ones = Stream(
        counts(spark, 4).df.withColumn("v", F.col("v") + 0.0), "ts", "seq"
    )
    out = Digits([tens, ones])
    got = [r.value for r in out.collect_ordered()]
    assert got == [11.0, 22.0, 33.0, 44.0]


def test_subclass_can_stay_quiet(spark):
    """test_subclass_can_stay_quiet: returning False neither ticks nor
    clears the previous value."""

    class Evens(CustomStream):
        def cycle(self):
            (v,) = self.upstreams()
            if v.peek_value() % 2 == 0:
                self.set_value(v.peek_value())
                return True
            return False

    out = Evens(counts(spark, 6))
    assert [r.value for r in out.collect_ordered()] == [2.0, 4.0, 6.0]


def test_subclass_init_receives_remaining_args(spark):
    """test_subclass_init_receives_remaining_args: graph wiring consumed,
    config args forwarded."""

    class Scaled(CustomStream):
        def __init__(self, factor, offset=0.0):
            self.factor, self.offset = factor, offset

        def cycle(self):
            (v,) = self.upstreams()
            self.set_value(v.peek_value() * self.factor + self.offset)
            return True

    out = Scaled(counts(spark, 3), 10.0, offset=1.0)
    assert [r.value for r in out.collect_ordered()] == [11.0, 21.0, 31.0]


def test_init_may_seed_a_value_before_wiring(spark):
    """test_init_may_seed_a_value_before_wiring: a set_value in __init__
    is readable by a passive latch before the first tick."""

    class Seeded(CustomStream):
        def __init__(self):
            self.set_value(99.0)

        def cycle(self):
            (v,) = self.upstreams()
            self.set_value(v.peek_value())
            return True

    out = Seeded(counts(spark, 3))
    assert out._passive_seed is not None
    seed_rows = out._passive_seed.collect()
    assert [r.value for r in seed_rows] == [99.0]


def test_missing_cycle_raises_not_implemented(spark):
    """test_missing_cycle_raises_not_implemented."""

    class Incomplete(CustomStream):
        pass

    out = Incomplete(counts(spark, 2))
    with pytest.raises(Exception, match="must implement cycle"):
        out.collect_ordered()


def test_exception_in_cycle_aborts_the_run(spark):
    """test_exception_in_cycle_aborts_the_run."""

    class Boom(CustomStream):
        def cycle(self):
            raise RuntimeError("boom in cycle")

    out = Boom(counts(spark, 2))
    with pytest.raises(Exception, match="boom in cycle"):
        out.collect_ordered()


def test_upstream_value_reads_none_before_a_tick(spark):
    """test_upstream_value_reads_none_before_a_tick: a later-starting
    upstream reads None until its first tick; repr is useful."""

    class Watcher(CustomStream):
        out_type = "string"

        def cycle(self):
            a, b = self.upstreams()
            self.set_value(f"{a.peek_value()}|{b.peek_value()}")
            return True

    early = counts(spark, 4)
    late = Stream(
        counts(spark, 4).df.where(F.col("ts") >= 200), "ts", "seq"
    )
    out = Watcher([early, late])
    got = [r.value for r in out.collect_ordered()]
    assert got[0] == "1.0|None", "un-ticked upstream reads None"
    assert got[-1] == "4.0|4.0"
    assert repr(UpstreamValue(7)) == "UpstreamValue(7)"


def test_keyed_custom_stream_is_per_key(spark):
    """Spark extension of the contract: on a KEYED stream each key gets a
    fresh node instance — per-key state exactly like per-node state,
    parallel across keys."""

    class RunningSum(CustomStream):
        def __init__(self):
            self.total = 0.0

        def cycle(self):
            (v,) = self.upstreams()
            self.total += v.peek_value()
            self.set_value(self.total)
            return True

    rows = [(k, t, float(t)) for k in ("a", "b") for t in (1, 2, 3)]
    s = Stream(spark.createDataFrame(rows, "k string, ts long, v double"),
               ts="ts", keys=("k",))
    out = RunningSum(s)
    got = {(r.k, r.ts): r.value for r in out.collect_ordered()}
    assert got == {("a", 1): 1.0, ("a", 2): 3.0, ("a", 3): 6.0,
                   ("b", 1): 1.0, ("b", 2): 3.0, ("b", 3): 6.0}
