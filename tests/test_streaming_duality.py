"""Differential test: the SAME stateful operator produces byte-identical
results under historical (batch) and realtime (Structured Streaming)
execution — the reference's run-mode duality (RunMode::HistoricalFrom vs
RealTime, runtime/run.rs:16-29), its test pattern 2 (SURVEY §5: differential
parity across engines/tiers)."""

import os
import shutil
import tempfile
import time

import pyspark.sql.functions as F
import pytest

from wingfoil_spark.sources.tables import load_table
from wingfoil_spark.streaming.stateful import KeyedStateOp, ewma_step

OUT_SCHEMA = "user_id long, ts_us long, event_id long, value double, ewma double"


def _op():
    return KeyedStateOp(
        step=ewma_step("value", 0.25, "ewma", ["user_id", "ts_us", "event_id", "value"]),
        out_schema=OUT_SCHEMA,
        init_state=(False, 0.0),
        ts="ts_us",
        seq="event_id",
        keys=("user_id",),
    )


@pytest.fixture(scope="module")
def events_df(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            F.expr("ts div 1000").alias("ts_us"),
            "event_id",
            "value",
        )
        .where(F.col("user_id") < 10)
    )


def test_batch_vs_stream_identical(spark, events_df, tmp_path):
    batch = _op().run_batch(events_df).toPandas()

    # feed the same rows as 4 time-ordered micro-batches via the file source
    src_dir = tempfile.mkdtemp(prefix="wf_stream_src_")
    try:
        pdf = events_df.toPandas().sort_values(["ts_us", "event_id"])
        n = len(pdf)
        bounds = [0, n // 4, n // 2, 3 * n // 4, n]
        for i in range(4):
            chunk = pdf.iloc[bounds[i]:bounds[i + 1]]
            path = os.path.join(src_dir, f"chunk-{i:03d}.parquet")
            chunk.to_parquet(path, index=False)
            os.utime(path, (time.time() + i, time.time() + i))

        stream_df = (
            spark.readStream.schema("user_id long, ts_us long, event_id long, value double")
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        out = _op().run_stream(stream_df)
        q = (
            out.writeStream.format("memory")
            .queryName("duality_test")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        streamed = spark.sql("SELECT * FROM duality_test").toPandas()
    finally:
        shutil.rmtree(src_dir, ignore_errors=True)

    key = ["user_id", "ts_us", "event_id"]
    b = batch.sort_values(key).reset_index(drop=True)
    s = streamed.sort_values(key).reset_index(drop=True)
    assert len(b) == len(s) > 0
    assert (b["ewma"].to_numpy() == s["ewma"].to_numpy()).all(), (
        "batch and streaming EWMA diverged"
    )


def test_order_book_batch_vs_stream(spark, events_df):
    """The flagship stateful op (order book) under both run modes."""
    from pyspark.sql import types as T

    from wingfoil_spark.operators import market
    from wingfoil_spark.stream import Stream

    s = Stream(events_df, ts="ts_us", seq="event_id", keys=("user_id",))
    updates = market.book_updates_from_events(s)
    renamed = updates.df.withColumnRenamed("ts_us", "ts")
    op = market.order_book_op([T.StructField("user_id", T.LongType())])

    batch = op.run_batch(renamed).toPandas()

    src_dir = tempfile.mkdtemp(prefix="wf_book_src_")
    try:
        pdf = renamed.toPandas().sort_values(["ts", "upd_seq"])
        n = len(pdf)
        bounds = [0, n // 3, 2 * n // 3, n]
        for i in range(3):
            path = os.path.join(src_dir, f"chunk-{i:03d}.parquet")
            pdf.iloc[bounds[i]:bounds[i + 1]].to_parquet(path, index=False)
            os.utime(path, (time.time() + i, time.time() + i))
        schema = ("user_id long, ts long, upd_seq long, kind string, "
                  "side string, level long, qty_delta long")
        stream_df = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        q = (
            op.run_stream(stream_df)
            .writeStream.format("memory")
            .queryName("book_duality")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        streamed = spark.sql("SELECT * FROM book_duality").toPandas()
    finally:
        shutil.rmtree(src_dir, ignore_errors=True)

    key = ["user_id", "ts", "upd_seq"]
    b = batch.sort_values(key).reset_index(drop=True)
    st = streamed.sort_values(key).reset_index(drop=True)
    assert len(b) == len(st) > 0
    for c in ("best_bid", "bid_qty", "best_ask", "ask_qty", "n_bid_levels"):
        bv = b[c].to_numpy(dtype=float)
        sv = st[c].to_numpy(dtype=float)
        both_nan = (bv != bv) & (sv != sv)
        assert ((bv == sv) | both_nan).all(), f"order book diverged on {c}"
