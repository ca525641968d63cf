"""Golden replay of the reference's feedback and repetition suites
(tests/feedback.rs, tests/repetition.rs): the feedback edge is the one
true DAG-breaker — a value sent to the sink re-enters on a paired source
one cycle later. The Spark-native expression (plans/iterate.py) is batch
iteration: one pass per cycle, the loop state re-fed; the goldens pin that
the digit-shift / doubling progressions come out identical.
"""

import pyspark.sql.functions as F

from wingfoil_spark.plans.iterate import feedback_iterate
from wingfoil_spark.sources.tables import ticker
from wingfoil_spark.stream import Stream


def _emissions(df):
    return [int(r["v"]) for r in df.orderBy("cycle").collect()]


def test_feedback_active_matches_legacy_engine(spark):
    """feedback.rs:36-50: constant(1) joined with the fed-back value
    (a + b*10), result fed back → 1, 11, 111, 1111, 11111."""
    state = spark.createDataFrame([(1, 1)], "cycle int, v long")

    def step(cur, i):
        last = cur.where(F.col("cycle") == F.lit(i + 1)).select(
            F.lit(i + 2).alias("cycle"), (F.lit(1) + F.col("v") * 10).alias("v")
        )
        return cur.unionByName(last)

    out = feedback_iterate(state, step, max_iters=4)
    assert _emissions(out) == [1, 11, 111, 1111, 11111]


def test_feedback_passive_matches_legacy_engine(spark):
    """feedback.rs:19-33: a counter joined with a PASSIVELY read feedback
    value (src + fb*10) — advances once per counter tick → the digit-shift
    1, 12, 123, 1234, 12345, 123456."""
    state = spark.createDataFrame([(1, 1)], "cycle int, v long")

    def step(cur, i):
        src = i + 2  # counter emits 1,2,3,... per cycle
        last = cur.where(F.col("cycle") == F.lit(i + 1)).select(
            F.lit(i + 2).alias("cycle"),
            (F.lit(src) + F.col("v") * 10).alias("v"),
        )
        return cur.unionByName(last)

    out = feedback_iterate(state, step, max_iters=5)
    assert _emissions(out) == [1, 12, 123, 1234, 12345, 123456]


def test_feedback_self_sustains(spark):
    """feedback.rs:53-74: constant seeds once, then the loop doubles the
    fed-back value each cycle → 1, 2, 4, 8, 16."""
    state = spark.createDataFrame([(1, 1)], "cycle int, v long")

    def step(cur, i):
        last = cur.where(F.col("cycle") == F.lit(i + 1)).select(
            F.lit(i + 2).alias("cycle"), (F.col("v") * 2).alias("v")
        )
        return cur.unionByName(last)

    out = feedback_iterate(state, step, max_iters=4)
    assert _emissions(out) == [1, 2, 4, 8, 16]


def test_fan_map_n_match_hand_unrolling(spark):
    """repetition.rs:31-49: fan(3, map_n(2, +1)) over a ticker counter ==
    the hand-written three branches merged, tick for tick."""
    def src():
        return ticker(spark, period_ns=10, n=8).count(out="n").map(
            value=F.col("n").cast("double"))

    sugared = src().fan(3, lambda s, _i: s.map_n(2, lambda x: x.map(
        value=F.col("value") + 1)))

    a = src().map_n(2, lambda x: x.map(value=F.col("value") + 1))
    b = src().map_n(2, lambda x: x.map(value=F.col("value") + 1))
    c = src().map_n(2, lambda x: x.map(value=F.col("value") + 1))
    manual = a.merge(b, c)

    sug = [(r["ts"], r["value"]) for r in sugared.df.orderBy("ts").collect()]
    man = [(r["ts"], r["value"]) for r in manual.df.orderBy("ts").collect()]
    assert sug == man
    # 8 cycles of counter+2, one emission per instant
    assert [v for _, v in sug] == [float(n + 2) for n in range(1, 9)]
