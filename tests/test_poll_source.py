"""The reference's `poll` source (fluent.rs:344; ops.rs:2899-2929) as a
Spark 4 Python DataSource (sources/poll.py): one user-function call per
tick, None = quiet cycle, realtime-only, checkpoint-resumable."""

import os
import shutil
import tempfile

import pytest

from wingfoil_spark.sources.poll import (
    FORMAT_NAME,
    demo_poll,
    register_poll_source,
)


def _poll_df(spark, ticks=7):
    register_poll_source(spark)
    return (
        spark.readStream.format(FORMAT_NAME)
        .option("fn", "wingfoil_spark.sources.poll:demo_poll")
        .option("schema", "tick bigint, value double")
        .option("ticks_per_batch", ticks)
        .load()
    )


def _drain(df, out, ckpt):
    q = (
        df.writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)


def test_poll_emits_ticks_and_skips_quiet_cycles(spark):
    """One availableNow admission = ticks_per_batch calls of f, rows in
    tick order, every None (tick % 5 == 4 for the demo fn) a quiet
    cycle — present in the tick count, absent from the output."""
    tmp = tempfile.mkdtemp(prefix="wf_poll_t1_")
    try:
        out, ckpt = os.path.join(tmp, "out"), os.path.join(tmp, "ck")
        _drain(_poll_df(spark, ticks=7), out, ckpt)
        rows = sorted(
            (r.tick, r.value) for r in spark.read.parquet(out).collect()
        )
        assert rows == [
            (t, t * 0.5 + 0.25) for t in range(7) if t % 5 != 4
        ]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_poll_restart_resumes_from_checkpoint(spark):
    """A restarted query resumes at the NEXT tick (the offset is the
    checkpoint state) — no re-emission, no gap; the deterministic demo
    fn makes the whole two-run history exactly-once."""
    tmp = tempfile.mkdtemp(prefix="wf_poll_t2_")
    try:
        out, ckpt = os.path.join(tmp, "out"), os.path.join(tmp, "ck")
        df = _poll_df(spark, ticks=7)
        _drain(df, out, ckpt)
        first = {r.tick for r in spark.read.parquet(out).collect()}
        _drain(df, out, ckpt)
        both = sorted(
            (r.tick, r.value) for r in spark.read.parquet(out).collect()
        )
        assert [t for t, _ in both] == [
            t for t in range(14) if t % 5 != 4
        ]
        assert len(both) == len(set(both)), "no re-emission"
        assert first < {t for t, _ in both}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_poll_guards(spark):
    """Wiring errors fail loudly at PLAN time: a non-import-path fn, a
    missing schema, a sub-1 ticks_per_batch; and the realtime-only
    contract — batch spark.read raises (interp.rs:2715-2727)."""
    register_poll_source(spark)
    base = (
        spark.readStream.format(FORMAT_NAME)
        .option("schema", "tick bigint, value double")
    )
    with pytest.raises(Exception, match="import path"):
        base.option("fn", "not_a_path").load()
    with pytest.raises(Exception, match="ticks_per_batch"):
        base.option("fn", "wingfoil_spark.sources.poll:demo_poll") \
            .option("ticks_per_batch", 0).load()
    with pytest.raises(Exception, match="schema"):
        spark.readStream.format(FORMAT_NAME) \
            .option("fn", "wingfoil_spark.sources.poll:demo_poll").load()
    with pytest.raises(Exception, match="realtime-only"):
        spark.read.format(FORMAT_NAME) \
            .option("schema", "tick bigint, value double") \
            .option("fn", "wingfoil_spark.sources.poll:demo_poll") \
            .load().collect()


def test_demo_poll_contract():
    assert demo_poll(4) is None and demo_poll(9) is None
    assert demo_poll(6) == (6, 3.25)


def test_at_start_emits_exactly_once(spark):
    """The source_at_start recipe: one row at tick 0, quiet forever —
    across TWO availableNow drains (the second resumes at tick 7 and
    emits nothing)."""
    import shutil as _sh

    from wingfoil_spark.sources.poll import at_start  # noqa: F401

    tmp = tempfile.mkdtemp(prefix="wf_poll_t3_")
    try:
        out, ckpt = os.path.join(tmp, "out"), os.path.join(tmp, "ck")
        register_poll_source(spark)
        df = (
            spark.readStream.format(FORMAT_NAME)
            .option("fn", "wingfoil_spark.sources.poll:at_start")
            .option("schema", "tick bigint, value double")
            .option("ticks_per_batch", 7)
            .load()
        )
        _drain(df, out, ckpt)
        _drain(df, out, ckpt)
        rows = [(r.tick, r.value) for r in spark.read.parquet(out).collect()]
        assert rows == [(0, 1.0)]
    finally:
        _sh.rmtree(tmp, ignore_errors=True)


def test_poll_realtime_trigger_multibatch(spark):
    """The RealTime half of the run-mode duality the source exists for
    (VERDICT r12 Next #7): a live `trigger(processingTime=...)` run must
    advance the tick offset across MULTIPLE wall-clock micro-batches —
    availableNow drains one admission; this pins the recurring-cycle
    path. Ticks must stay gap-free and in order across batches (the
    offset is the only state). Wall-clock dependent, so the assertion is
    on ≥2 batches having fired, not on an exact count — under extreme
    host load the query gets a generous stop deadline instead of a tight
    schedule."""
    import time

    tmp = tempfile.mkdtemp(prefix="wf_poll_rt_")
    try:
        out, ckpt = os.path.join(tmp, "out"), os.path.join(tmp, "ck")
        df = _poll_df(spark, ticks=5)
        q = (
            df.writeStream.format("parquet").option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="300 milliseconds").start()
        )
        deadline = time.time() + 60
        while time.time() < deadline:
            done = {p["batchId"] for p in q.recentProgress if p["numInputRows"] > 0}
            if len(done) >= 3:
                break
            time.sleep(0.3)
        q.stop()
        q.awaitTermination(60)
        batches = {p["batchId"] for p in q.recentProgress if p["numInputRows"] > 0}
        assert len(batches) >= 2, (
            f"expected >=2 live micro-batches, saw {sorted(batches)}"
        )
        ticks = sorted(r.tick for r in spark.read.parquet(out).collect())
        # if the query wrote nothing before the deadline the >=2-batches
        # assert above is the real failure; don't mask it with max([])
        assert ticks, "realtime poll query wrote zero rows before the deadline"
        # gap-free prefix of the demo stream: every non-quiet tick below
        # the max seen, none twice
        expect = [t for t in range(max(ticks) + 1) if t % 5 != 4]
        assert ticks == expect
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
