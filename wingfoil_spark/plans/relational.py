"""Relational analytics plans over the star schema.

The reference has no SQL/relational surface (SURVEY §2.10) — these are the
"free" Spark-native extensions we expose beyond parity: equi-joins, grouped
aggregation, ranking, sessionization. They double as the benchmark headline
queries (bench.py) because they exercise shuffle/join/agg machinery at data
scale.

Numeric policy for oracle exactness: monetary columns are 2-decimal doubles
in the source data → cast to DECIMAL before arithmetic/accumulation (exact
in both Spark and DuckDB), cast the final aggregate back to DOUBLE. Derived
ratios do the identical double ops in both engines.

Scale notes per query are inline; every join below either broadcasts a dim
table or shuffles on the join key with AQE handling skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from wingfoil_spark.sources.tables import load_table, ts_us_expr

D18 = "decimal(18,2)"
D4 = "decimal(4,2)"


def _dec(c: str, t: str = D18):
    return F.col(c).cast(t)


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: pricing summary by returnflag/linestatus.
    One scan + one partial-agg shuffle; all arithmetic decimal-exact.
    Filter pushes to parquet (PushedFilters on l_shipdate)."""
    l = load_table(spark, sf_dir, "lineitem")
    disc_price = _dec("l_extendedprice") * (F.lit(1).cast(D4) - _dec("l_discount", D4))
    charge = disc_price * (F.lit(1).cast(D4) + _dec("l_tax", D4))
    return (
        l.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(_dec("l_extendedprice")).cast("double") / F.count(F.lit(1))).alias("avg_price"),
            (F.sum(_dec("l_discount", D4)).cast("double") / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: top-10 open orders by revenue for one segment.
    customer is broadcast (tiny dim); orders⋈lineitem shuffles on orderkey."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz")
    )
    l = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp_ntz")
    )
    revenue = _dec("l_extendedprice") * (F.lit(1).cast(D4) - _dec("l_discount", D4))
    # orders is a FACT table (grows with sf): never force-broadcast it —
    # and customer ALSO scales with sf (150k × sf rows), so no hint there
    # either; AQE broadcasts it on MEASURED size while it's small and
    # shuffle-joins when it isn't. Hints are reserved for fixed-cardinality
    # dims (nation/region) only.
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select(
            "l_orderkey",
            F.col("o_orderdate").cast("date").cast("string").alias("orderdate"),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


def q5_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue per nation where customer and supplier share
    the nation. All dims broadcast; the fact join shuffles once on orderkey."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    revenue = _dec("l_extendedprice") * (F.lit(1).cast(D4) - _dec("l_discount", D4))
    # orders is a FACT table: the fact⋈fact join shuffles on orderkey
    # (AQE may broadcast at small sf on measured size). customer and
    # supplier ALSO scale with sf (150k/10k × sf rows) — an unfiltered
    # broadcast hint on them blows the broadcast limit at the 100 TB
    # posture exactly as orders would, so AQE size-decides them too. Only
    # the fixed-cardinality dims (nation=25, region=5 rows at EVERY sf)
    # keep hints.
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            s,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: single-row filtered revenue delta. Pure scan+filter
    (pushed down) + one partial agg — the codegen showcase."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & (_dec("l_discount", D4) >= F.lit(0.05).cast(D4))
            & (_dec("l_discount", D4) <= F.lit(0.07).cast(D4))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec("l_extendedprice") * _dec("l_discount", D4))
            .cast("double")
            .alias("revenue")
        )
    )


def topk_customers(spark: SparkSession, sf_dir: str, k: int = 10) -> DataFrame:
    """Top-k customers by order revenue with rank — ranking windows are a
    Spark-side extension over the reference (SURVEY §2.10)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    per_cust = (
        o.groupBy("o_custkey")
        .agg(
            F.sum(_dec("o_totalprice")).cast("double").alias("total_revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    # Take-ordered first (TakeOrderedAndProject — no single-partition
    # exchange of the full aggregate), then rank within the k-row result.
    top = per_cust.orderBy(
        F.col("total_revenue").desc(), F.col("o_custkey").asc()
    ).limit(k)
    w = Window.orderBy(F.col("total_revenue").desc(), F.col("o_custkey").asc())
    # top is k rows — IT is the broadcast side; customer scales with sf so
    # it carries no hint (the k-row side is always the one to ship)
    ranked = F.broadcast(top.withColumn("rank", F.row_number().over(w)))
    return (
        c.join(ranked, F.col("o_custkey") == F.col("c_custkey"))
        .select("rank", "o_custkey", "c_name", "total_revenue", "n_orders")
    )


def sessionize(spark: SparkSession, sf_dir: str, gap_us: int = 30 * 60 * 1_000_000) -> DataFrame:
    """Gap-based sessionization of the events stream (30-min inactivity):
    a watermark/session-window capability the reference lacks entirely
    (SURVEY §2.10 — no session windows). Per-user windows → parallel."""
    e = load_table(spark, sf_dir, "events")
    e = e.withColumn("ts_us", ts_us_expr(e))
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    new_sess = (
        (F.col("ts_us") - F.lag("ts_us").over(w) > gap_us)
        | F.lag("ts_us").over(w).isNull()
    ).cast("int")
    sess = e.withColumn("new_sess", new_sess).withColumn(
        "session_id",
        F.sum("new_sess").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.max("ts_us") - F.min("ts_us")).alias("duration_us"),
            F.min("ts_us").alias("start_us"),
        )
    )
