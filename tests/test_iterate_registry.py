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
