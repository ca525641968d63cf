"""Golden replay of the reference's try-join catalog suite
(tests/catalog_ops.rs): fallible 2- and 3-input combines, the passive
variant's fire-only-on-active contract, and error routing.

Error-handling deviation (documented on Stream.try_map): the reference
ABORTS the run on a closure error; at 100 TB we quarantine the failing
rows on an error side-stream instead — the goldens assert the routing is
total (every row lands on exactly one side).
"""

import pyspark.sql.functions as F

from wingfoil_spark.sources.tables import ticker
from wingfoil_spark.stream import Stream


def _counts(spark, period_ns, n, val, name):
    s = ticker(spark, period_ns=period_ns, n=n).count(out="n")
    return Stream(
        s.df.select("ts", (F.col("n") * val).cast("long").alias(name)),
        ts="ts", seq=None, keys=(),
    )


def test_try_join_success(spark):
    """catalog_ops.rs:16-28: a + b*10 over one ticker, last = 55."""
    a = _counts(spark, 100, 5, 1, "a")
    b = _counts(spark, 100, 5, 10, "b")
    joined = a.combine_latest(b)
    ok, err = joined.try_map(lambda r: r["a"] + r["b"], out="v")
    rows = sorted((r["ts"], int(r["v"])) for r in ok.df.collect())
    assert [v for _, v in rows] == [11, 22, 33, 44, 55]
    assert rows[-1][1] == 55
    assert err.df.count() == 0


def test_try_join_error_routes_rows(spark):
    """catalog_ops.rs:31-43 (abort) → our quarantine contract: the raising
    closure sends every row to the error stream, none to ok."""
    a = _counts(spark, 100, 3, 1, "a")
    b = _counts(spark, 100, 3, 10, "b")

    def boom(_row):
        raise ValueError("oops")

    ok, err = a.combine_latest(b).try_map(boom, out="v")
    assert ok.df.count() == 0
    errs = err.df.collect()
    assert len(errs) == 3
    assert all("oops" in r["error"] for r in errs)


def test_try_join_passive_does_not_trigger(spark):
    """catalog_ops.rs:45-61: active 100ns counter, passive 50ns counter —
    the combine fires only on the active's ticks, at t = 0, 100, 200."""
    slow = _counts(spark, 100, 3, 1, "a")
    fast = _counts(spark, 50, 6, 1, "b")
    ok, _ = slow.join_passive(fast).try_map(lambda r: r["a"] + r["b"], out="v")
    assert sorted(r["ts"] for r in ok.df.collect()) == [0, 100, 200]


def test_try_join3_success(spark):
    """catalog_ops.rs:65-79: a + b*10 + c*100 over one ticker, last = 555."""
    a = _counts(spark, 100, 5, 1, "a")
    b = _counts(spark, 100, 5, 10, "b")
    c = _counts(spark, 100, 5, 100, "c")
    ok, err = a.join3(b, c).try_map(lambda r: r["a"] + r["b"] + r["c"], out="v")
    rows = sorted((r["ts"], int(r["v"])) for r in ok.df.collect())
    assert [v for _, v in rows] == [111, 222, 333, 444, 555]
    assert err.df.count() == 0


def test_try_join3_passive_does_not_trigger(spark):
    """catalog_ops.rs:97-131: one active + two passive inputs — fires at
    the active's t = 0, 100, 200 only."""
    a = _counts(spark, 100, 3, 1, "a")
    b = _counts(spark, 50, 6, 10, "b")
    c = _counts(spark, 50, 6, 100, "c")
    # two chained passive reads keep b and c non-triggering
    joined = a.join_passive(b).join_passive(c)
    ok, _ = joined.try_map(lambda r: r["a"] + r["b"] + r["c"], out="v")
    assert sorted(r["ts"] for r in ok.df.collect()) == [0, 100, 200]
