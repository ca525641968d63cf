"""Scale primitives: bucketed co-located joins and skew-salted aggregation.

These are the 100 TB levers the brief calls out (bucketing for co-located
joins, salting for skew) — plan-gated so the shuffle savings are pinned,
value-gated so the rewrites stay semantically exact.
"""

import re

import pyspark.sql.functions as F
import pytest

from wingfoil_spark.operators.scale import salted_agg
from wingfoil_spark.sources.io import write_bucketed
from wingfoil_spark.sources.tables import load_table


def _shuffles(plan: str) -> int:
    return len(re.findall(r"Exchange (?:hashpartitioning|rangepartitioning|SinglePartition)", plan))


def test_bucketed_join_skips_shuffle(spark, sf_dir, tmp_path):
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("ev_bucketed", "cust_totals_bucketed"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        # a prior session's managed-table dir outlives the in-memory catalog
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    totals = ev.groupBy("user_id").agg(F.count("*").alias("n"))
    write_bucketed(ev, "ev_bucketed", ["user_id"], n_buckets=8)
    write_bucketed(totals, "cust_totals_bucketed", ["user_id"], n_buckets=8)

    a = spark.table("ev_bucketed")
    b = spark.table("cust_totals_bucketed")
    # no broadcast: force the join strategy that would normally shuffle both
    joined = a.join(b.hint("merge"), "user_id")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert _shuffles(plan) == 0, f"bucketed join should not shuffle:\n{plan}"
    # values still correct
    n = joined.count()
    assert n == ev.count()

    # aggregation on the bucket key also skips its exchange
    agg = a.groupBy("user_id").agg(F.sum("value").alias("s"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert _shuffles(plan) == 0, f"bucketed agg should not shuffle:\n{plan}"


def test_salted_agg_matches_plain_agg(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("user_id", "value")
    # simulate skew: pile most rows onto one key
    skewed = ev.withColumn(
        "user_id", F.when(F.col("value") > 50, F.lit(7)).otherwise(F.col("user_id"))
    )
    plain = {
        r["user_id"]: (r["total"], r["cnt"], r["mx"])
        for r in skewed.groupBy("user_id")
        .agg(
            F.sum(F.col("value").cast("decimal(12,2)")).alias("total"),
            F.count("*").alias("cnt"),
            F.max("value").alias("mx"),
        )
        .collect()
    }
    salted = {
        r["user_id"]: (r["total"], r["cnt"], r["mx"])
        for r in salted_agg(
            skewed,
            ["user_id"],
            {
                "total": F.sum(F.col("value").cast("decimal(12,2)")),
                "cnt": F.count("*"),
                "mx": F.max("value"),
            },
            salt_buckets=8,
        ).collect()
    }
    assert plain == salted


def test_salted_agg_spreads_hot_key(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("user_id", "value")
    out = salted_agg(ev, ["user_id"], {"cnt": F.count("*")}, salt_buckets=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # two-level: partial on (key, salt), combine on key — exactly 2 exchanges
    assert _shuffles(plan) == 2, plan
