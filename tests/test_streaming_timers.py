"""TRUE event-time timer delivery (VERDICT r2 item 1): a pending
``delay`` / ``delay_with_reset`` delivery fires when the WATERMARK passes
its fire time — with ZERO further input rows on the key. This is the
reference's timer-node contract (delay ops.rs:3090-3155, timer cancel
:3486-3604): engine time, not key traffic, drives delivery.

Binding: applyInPandasWithState + GroupStateTimeout.EventTimeTimeout
(streaming/twins.py:EventTimeTimerOp). The tests advance the global
watermark via sentinel rows on ONE key only (user 0) and assert every
OTHER key's pending emissions still fired, bitwise-equal to the batch
operator.
"""

import os
import shutil
import tempfile
import time

import pandas as pd
import pyspark.sql.functions as F
import pytest

from wingfoil_spark.sources.tables import load_table, ts_us_expr
from wingfoil_spark.stream import Stream

DELAY = 1_000_000  # 1s in µs


@pytest.fixture(scope="module")
def events_pdf(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select("user_id", ts_us_expr(ev).alias("ts_us"), "event_id",
                  "event_type", "value")
        .where(F.col("user_id") < 10)
        .toPandas()
        .sort_values(["ts_us", "event_id"])
        .reset_index(drop=True)
    )


def _run_files(spark, op, chunks, schema_str, name):
    """Write each pdf in ``chunks`` as one file; one micro-batch per file."""
    src_dir = tempfile.mkdtemp(prefix=f"wf_{name}_src_")
    try:
        for i, chunk in enumerate(chunks):
            path = os.path.join(src_dir, f"chunk-{i:03d}.parquet")
            chunk.to_parquet(path, index=False)
            os.utime(path, (time.time() + i, time.time() + i))
        stream_df = (
            spark.readStream.schema(schema_str)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        q = (
            op.run_stream(stream_df)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return spark.sql(f"SELECT * FROM {name}").toPandas()
    finally:
        shutil.rmtree(src_dir, ignore_errors=True)


def _time_chunks(pdf, n_chunks, ts_col="ts_us"):
    uniq = sorted(pdf[ts_col].unique())
    cuts = [uniq[len(uniq) * i // n_chunks] for i in range(1, n_chunks)]
    bounds = [0] + [pdf[ts_col].searchsorted(c, side="left") for c in cuts] + [len(pdf)]
    return [pdf.iloc[bounds[i]:bounds[i + 1]] for i in range(n_chunks)]


def test_delay_fires_without_new_key_input(spark, events_pdf):
    """Keys 1..9 stop sending after the data chunks; only key 0 carries the
    watermark forward. Every key's delayed emission must still fire."""
    from wingfoil_spark.streaming.twins import delay_timer_op

    base = events_pdf[["user_id", "ts_us", "value"]]
    # batch semantics: re-stamp +DELAY (seq-carrying stream → no dedup)
    expected = base.assign(ts_us=base["ts_us"] + DELAY)

    t_far = int(base["ts_us"].max()) + 2 * DELAY
    sent1 = pd.DataFrame({"user_id": [0], "ts_us": [t_far], "value": [0.0]})
    sent2 = pd.DataFrame({"user_id": [0], "ts_us": [t_far + 1000], "value": [0.0]})
    chunks = _time_chunks(base, 3) + [sent1, sent2]

    op = delay_timer_op(
        DELAY, "ts_us", ["value"], ["user_id"],
        out_schema="user_id long, ts_us long, value double",
    )
    streamed = _run_files(
        spark, op, chunks, "user_id long, ts_us long, value double",
        name="delay_timer",
    )
    # drop the sentinels' own deliveries (key 0 at/after t_far + DELAY)
    streamed = streamed[streamed["ts_us"] < t_far]
    expected = expected[expected["ts_us"] < t_far]

    key = ["user_id", "ts_us", "value"]
    e = expected.drop_duplicates().sort_values(key).reset_index(drop=True)
    s = streamed[key].drop_duplicates().sort_values(key).reset_index(drop=True)
    assert len(s) == len(e) > 0, (len(s), len(e))
    assert e.equals(s), "watermark-driven delay diverged from batch"
    # the property itself: keys 1..9 had NO rows in the sentinel chunks yet
    # their deliveries (scheduled before the cut) all fired
    for uid in range(1, 10):
        n_exp = (e["user_id"] == uid).sum()
        n_got = (s["user_id"] == uid).sum()
        assert n_got == n_exp > 0, f"user {uid}: {n_got}/{n_exp} deliveries"


def test_delay_timer_random_splits(spark, events_pdf):
    """Property: ANY time-ordered micro-batch partitioning yields the same
    deliveries (the step only assumes per-key arrival order, which sorted
    chunk boundaries preserve). Three random 6-way splits."""
    import numpy as np

    from wingfoil_spark.streaming.twins import delay_timer_op

    base = events_pdf[["user_id", "ts_us", "value"]]
    expected = (
        base.assign(ts_us=base["ts_us"] + DELAY)
        .drop_duplicates().sort_values(["user_id", "ts_us", "value"])
        .reset_index(drop=True)
    )
    t_far = int(base["ts_us"].max()) + 2 * DELAY
    sent1 = pd.DataFrame({"user_id": [0], "ts_us": [t_far], "value": [0.0]})
    sent2 = pd.DataFrame({"user_id": [0], "ts_us": [t_far + 1000], "value": [0.0]})

    for seed in (1, 2, 3):
        rng = np.random.default_rng(seed)
        cuts = sorted(rng.integers(1, len(base), 5).tolist())
        bounds = [0] + cuts + [len(base)]
        srt = base.sort_values(["ts_us"]).reset_index(drop=True)
        chunks = [srt.iloc[bounds[i]:bounds[i + 1]] for i in range(6)]
        chunks = [c for c in chunks if len(c)] + [sent1, sent2]
        op = delay_timer_op(
            DELAY, "ts_us", ["value"], ["user_id"],
            out_schema="user_id long, ts_us long, value double",
        )
        streamed = _run_files(
            spark, op, chunks, "user_id long, ts_us long, value double",
            name=f"delay_rs_{seed}",
        )
        got = (
            streamed[streamed["ts_us"] < t_far][["user_id", "ts_us", "value"]]
            .drop_duplicates().sort_values(["user_id", "ts_us", "value"])
            .reset_index(drop=True)
        )
        assert got.equals(expected), f"seed {seed}: split-dependent delivery"


def test_delay_with_reset_timer_duality(spark, events_pdf):
    """Timer-cancel op under watermark firing == the batch timer walk.
    Sources = click values, triggers = purchases; sentinels on key 0 only."""
    from wingfoil_spark.operators.stateful import delay_with_reset
    from wingfoil_spark.streaming.twins import delay_with_reset_timer_op

    src = events_pdf[events_pdf["event_type"] == "click"][
        ["user_id", "ts_us", "event_id", "value"]]
    trg = events_pdf[events_pdf["event_type"] == "purchase"][
        ["user_id", "ts_us", "event_id"]]

    s = Stream(spark.createDataFrame(src), ts="ts_us", seq="event_id",
               keys=("user_id",))
    t = Stream(spark.createDataFrame(trg), ts="ts_us", seq="event_id",
               keys=("user_id",))
    batch = (
        delay_with_reset(s, DELAY, t, value_cols=["value"], strategy="timer")
        .df.toPandas()
    )

    union = pd.concat([
        src.rename(columns={"ts_us": "__t", "event_id": "__seq"})
           .assign(__trig=0),
        trg.rename(columns={"ts_us": "__t", "event_id": "__seq"})
           .assign(__trig=1, value=float("nan")),  # typed NaN, not an
           # all-NA object column (concat dtype deprecation)
    ], ignore_index=True).astype({"value": "float64"})
    union = union[["user_id", "__t", "__trig", "__seq", "value"]] \
        .sort_values(["__t", "__trig", "__seq"]).reset_index(drop=True)

    t_far = int(union["__t"].max()) + 2 * DELAY
    sent1 = pd.DataFrame({"user_id": [0], "__t": [t_far], "__trig": [0],
                          "__seq": [-1], "value": [0.0]})
    sent2 = pd.DataFrame({"user_id": [0], "__t": [t_far + 1000], "__trig": [0],
                          "__seq": [-1], "value": [0.0]})
    chunks = _time_chunks(union, 3, ts_col="__t") + [sent1, sent2]

    op = delay_with_reset_timer_op(
        DELAY, "ts_us", ["value"], ["user_id"],
        out_schema="user_id long, ts_us long, value double",
    )
    streamed = _run_files(
        spark, op, chunks,
        "user_id long, __t long, __trig long, __seq long, value double",
        name="dwr_timer",
    )
    streamed = streamed[streamed["ts_us"] < t_far]
    batch = batch[batch["ts_us"] < t_far]

    key = ["user_id", "ts_us", "value"]
    b = batch[key].drop_duplicates().sort_values(key).reset_index(drop=True)
    st = streamed[key].drop_duplicates().sort_values(key).reset_index(drop=True)
    assert len(b) == len(st) > 0, (len(b), len(st))
    assert b.equals(st), "watermark-driven delay_with_reset diverged from batch"
    # non-sentinel keys drained without any further input
    assert set(st["user_id"].unique()) >= set(range(1, 10))


def test_delay_timer_late_data_contract(spark):
    """Pinned late-data contract (the reference FORBIDS out-of-order
    sources — adapters/csv.rs:110-115 panics on a backwards timestamp —
    so this is engine-defined behavior, pinned here): a row arriving
    BEHIND the watermark (its key's timers may already have fired) is
    NOT silently dropped. applyInPandasWithState delivers it to the
    step, which schedules t+delay; that fire time is already ≤ the
    watermark, so the delivery emits in the same micro-batch, stamped
    at its LOGICAL fire time (behind the watermark). Deliveries are
    never lost; downstream watermark-sensitive consumers see the late
    output row — the documented append semantics."""
    from wingfoil_spark.streaming.twins import delay_timer_op

    S = 1_000_000
    chunks = [
        # batch 1 advances the watermark to 30s (0s delay watermark)
        pd.DataFrame({"user_id": [1, 1, 0], "ts_us": [1 * S, 2 * S, 30 * S],
                      "value": [10.0, 20.0, 0.0]}),
        # batch 2: key 1's row at 5s is LATE (wm = 30s)
        pd.DataFrame({"user_id": [1, 0], "ts_us": [5 * S, 31 * S],
                      "value": [99.0, 0.0]}),
        pd.DataFrame({"user_id": [0], "ts_us": [60 * S], "value": [0.0]}),
    ]
    op = delay_timer_op(
        DELAY, "ts_us", ["value"], ["user_id"],
        out_schema="user_id long, ts_us long, value double",
    )
    out = _run_files(
        spark, op, chunks, "user_id long, ts_us long, value double",
        name="delay_late",
    )
    k1 = out[out["user_id"] == 1].sort_values("ts_us").reset_index(drop=True)
    # on-time deliveries at 2s and 3s, AND the late row's delivery at 6s —
    # emitted behind the watermark rather than dropped
    assert k1["ts_us"].tolist() == [2 * S, 3 * S, 6 * S]
    assert k1["value"].tolist() == [10.0, 20.0, 99.0]
