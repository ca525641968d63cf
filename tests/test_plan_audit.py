"""The plan-audit surface (plans/audit.py): physical plans as data, and
the assertion gate — the Spark-native analog of the reference's
node-visit-count test discipline (SURVEY §5)."""

import pyspark.sql.functions as F
import pytest

from wingfoil_spark.plans.audit import assert_plan, plan_summary
from wingfoil_spark.sources.tables import load_table


def test_summary_counts_shape(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    q = (ev.where(F.col("user_id") < 10)
           .groupBy("user_id").agg(F.sum("value").alias("s")))
    q.collect()  # execute THIS plan so AQE finalizes it (codegen visible)
    s = plan_summary(q)
    assert s["exchanges"] >= 1, "one shuffle for the groupBy"
    assert s["cartesian_products"] == 0
    assert s["python_stages"] == 0, "pure JVM aggregation"
    assert s["codegen_spans"] >= 1
    assert any("user_id" in (sc.get("pushed_filters") or "")
               for sc in s["scans"]), "filter reached the scan"


def test_summary_accepts_streams_and_sees_python_stages(spark, sf_dir):
    import wingfoil_spark as wf

    ev = wf.events_stream(spark, sf_dir)
    e = ev.ewma("value", alpha=0.5)
    s = plan_summary(e)  # Stream accepted directly
    assert s["python_stages"] >= 1, "the Arrow kernel stage is visible"


def test_assert_plan_gates_and_reports(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    q = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    out = assert_plan(q, max_exchanges=2, max_python_stages=0)
    assert out["exchanges"] <= 2

    with pytest.raises(AssertionError, match="exchanges > max"):
        assert_plan(q, max_exchanges=0)
    with pytest.raises(AssertionError, match="forbidden operator"):
        assert_plan(q, forbid=["HashAggregate"])
    with pytest.raises(AssertionError, match="required operator"):
        assert_plan(q, require=["SortMergeJoin"])


def test_broadcast_vs_smj_visibility(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem")
    n = load_table(spark, sf_dir, "nation")
    j = l.join(F.broadcast(n), l.l_suppkey % 25 == n.n_nationkey)
    s = plan_summary(j)
    assert s["broadcast_joins"] + s["nested_loop_joins"] >= 1
    assert s["sort_merge_joins"] == 0


def test_dedup_keep_gated_with_assert_plan(spark, sf_dir):
    """Realistic use: gate the dedup decision's plan — the corpus anti-
    join must not cartesian, and the only Python stage allowed is the
    packed union-find over the (tiny) component table."""
    from wingfoil_spark.functions import dedup as dd

    docs = load_table(spark, sf_dir, "documents")
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "a long, b long")
    kept = dd.dedup_keep(docs, pairs)
    s = assert_plan(kept, forbid=["CartesianProduct"], max_python_stages=1)
    assert s["n_scans"] >= 1
