"""Feedback iteration (transitive closure to fixpoint) and the user-op
registry (reference #[op] analog)."""

import pyspark.sql.functions as F

from wingfoil_spark import Stream, replay_rows
from wingfoil_spark.plans.iterate import feedback_iterate, iterate_until_stable


def test_transitive_closure_fixpoint(spark):
    # reach the minimum distance from node 1 over edges — label propagation
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (9, 10)], "src int, dst int"
    )
    edges.cache()
    nodes = spark.createDataFrame(
        [(n,) for n in range(1, 11)], "node int"
    ).withColumn("dist", F.when(F.col("node") == 1, 0).otherwise(F.lit(None)))

    def step(state, i):
        prop = (
            state.join(edges, state.node == edges.src)
            .where(F.col("dist").isNotNull())
            .select(F.col("dst").alias("node"), (F.col("dist") + 1).alias("dist"))
        )
        return (
            state.select("node", "dist").unionByName(prop)
            .groupBy("node").agg(F.min("dist").alias("dist"))
        )

    out = iterate_until_stable(nodes, step, ["node"], ["dist"], max_iters=10)
    d = {r.node: r.dist for r in out.collect()}
    assert [d[n] for n in (1, 2, 3, 4, 5)] == [0, 1, 2, 3, 4]
    assert d[9] is None and d[10] is None  # disconnected component


def test_feedback_iterate_counts_iterations(spark):
    df = spark.createDataFrame([(0,)], "x int")
    calls = []

    def step(state, i):
        calls.append(i)
        return state.withColumn("x", F.col("x") + 1)

    out = feedback_iterate(df, step, max_iters=3)
    assert out.first().x == 3
    assert calls == [0, 1, 2]


def test_register_op_fluent(spark):
    from wingfoil_spark.operators.registry import register_op, registered_ops

    @register_op()
    def double_plus(stream, col, bump=0.0, out="dp"):
        """User op: 2x + bump."""
        return stream.map(**{out: F.col(col) * 2 + bump})

    s = replay_rows(spark, [(1, 3.0)], "ts long, v double")
    got = s.double_plus("v", bump=1.0).df.first()
    assert got.dp == 7.0
    assert "double_plus" in registered_ops()


def test_register_op_rejects_builtin_collision(spark):
    import pytest

    from wingfoil_spark.operators.registry import register_op

    with pytest.raises(ValueError):
        @register_op("map")
        def bad(stream):
            return stream


def test_register_op3_reads_three_actives_and_owns_its_state(spark):
    """fluent_primitives.rs:245-287 golden: a registered MULTI-INPUT op
    (three actives) with engine-owned state — blended total accumulates
    x+y+z per instant, emitted × a cfg weight. 60, 180, 360."""
    import pyspark.sql.functions as F

    from wingfoil_spark.operators.registry import register_op
    from wingfoil_spark.sources.tables import ticker

    @register_op()
    def blend3(stream, b, c, weight=10.0, out="blend"):
        j = stream.join3(b, c)
        return j.fold(
            F.col("x") + F.col("y") + F.col("z"), "sum", out="__t"
        ).map(**{out: F.col("__t") * weight})

    from wingfoil_spark.stream import Stream

    def proj(s, **cols):
        m = s.map(**cols)
        return Stream(m.df.drop("n"), ts=m.ts, seq=m.seq, keys=m.keys)

    base = ticker(spark, period_ns=100, n=3).count(out="n")
    a = proj(base, x=F.col("n").cast("double"))
    b = proj(base, y=(F.col("n") * 2).cast("double"))
    c = proj(base, z=(F.col("n") * 3).cast("double"))
    out = a.blend3(b, c)
    got = [(r["ts"], r["blend"]) for r in out.df.orderBy("ts").collect()]
    assert got == [(0, 60.0), (100, 180.0), (200, 360.0)]

    # state_init re-seeds on a re-run (fluent_primitives.rs:289-328):
    # a second execution replays from a clean accumulator
    again = [(r["ts"], r["blend"]) for r in out.df.orderBy("ts").collect()]
    assert got == again, "re-run must not continue state"


def test_register_op4_reads_four_actives(spark):
    """fluent_primitives.rs:330-374 golden: the four-active-input rung —
    totals 10, 30, 60."""
    import pyspark.sql.functions as F

    from wingfoil_spark.operators.registry import register_op
    from wingfoil_spark.sources.tables import ticker

    @register_op()
    def sum4(stream, b, c, d, out="total"):
        j = stream.join3(b, c).combine_latest(d)
        return j.fold(
            F.col("w") + F.col("x") + F.col("y") + F.col("z"), "sum", out=out
        )

    from wingfoil_spark.stream import Stream

    def proj(s, **cols):
        m = s.map(**cols)
        return Stream(m.df.drop("n"), ts=m.ts, seq=m.seq, keys=m.keys)

    base = ticker(spark, period_ns=100, n=3).count(out="n")
    a = proj(base, w=F.col("n").cast("double"))
    b = proj(base, x=(F.col("n") * 2).cast("double"))
    c = proj(base, y=(F.col("n") * 3).cast("double"))
    d = proj(base, z=(F.col("n") * 4).cast("double"))
    out = a.sum4(b, c, d)
    got = [(r["ts"], r["total"]) for r in out.df.orderBy("ts").collect()]
    assert got == [(0, 10.0), (100, 30.0), (200, 60.0)]
