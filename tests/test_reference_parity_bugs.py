"""Replays of the reference's cross-path parity pins
(tests/parity_bugs.rs) — engine-level init/timing behaviors that legacy
keeps at the node level and the reference enforces identically across its
interpreted/compiled/nested paths. Our single batch path must produce the
same observable values.

BUG 1 (:17-63)  — a fold's value slot seeds with ``init``, so a passive
                  read before the fold's first tick sees init, not 0.
BUG 2 (:396)    — delay(0) emits inline in the same cycle.
BUG 3 (:398)    — delay seeds its first upstream value without ticking,
                  so passive readers see it while the delay is pending.
BUG 4 (:89-140) — historical sources reject pre-start and out-of-order
                  timestamps instead of rewinding/sorting.
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from wingfoil_spark.stream import Stream
from wingfoil_spark.sources.tables import replay_rows
from wingfoil_spark.sources.io import validate_replay
from wingfoil_spark.operators.stateful import fold_pandas


def _ticker_counts(spark, n, period, value_fn=lambda c: c):
    """count() over an n-tick ticker starting AT t=0 (ticker first-fire
    convention): rows (ts, v) with v = value_fn(1-based count)."""
    rows = [(i * period, value_fn(i + 1)) for i in range(n)]
    return replay_rows(spark, rows, "ts long, v long")


def test_bug1_fold_non_default_init_seed(spark):
    """parity_bugs.rs:17-63: fold(init=100) over a source delayed to
    t=25ns, sampled by a 10ns trigger — reads at t=0/10/20 observe the
    SEED 100 (not 0); t=30 observes 100+1 (the delayed count 1 folded at
    t=25). Six engine cycles: instants 0,10,20,25,30,35."""
    trig = _ticker_counts(spark, 4, 10).df.select("ts")  # 0,10,20,30
    trig = Stream(trig, ts="ts")
    base = _ticker_counts(spark, 2, 10)                  # counts 1,2 @ 0,10
    delayed = Stream(base.df, ts="ts").delay(25)         # 1@25, 2@35
    acc = fold_pandas(delayed, lambda a, r: a + r["v"], 100, out="acc",
                      dtype=T.LongType())
    sampled = acc.sample(trig, cols=["acc"])
    got = [r.acc for r in sampled.df.orderBy("ts").collect()]
    assert got == [100, 100, 100, 101], \
        "passive read before first tick sees init (100), then init+fold"


def test_bug1_builtin_fold_init(spark):
    """Stream.fold(init=...) — the JVM-builtin form of the same contract."""
    src = Stream(_ticker_counts(spark, 3, 10).df, ts="ts")
    acc = src.fold("v", "sum", out="acc", init=100)
    got = [r.acc for r in acc.df.orderBy("ts").collect()]
    assert got == [101, 103, 106]
    trig = Stream(_ticker_counts(spark, 1, 1).df.select((F.col("ts") - 5).alias("ts")), ts="ts")
    # a trigger firing BEFORE the fold's first tick reads the seed
    pre = acc.sample(trig, cols=["acc"])
    assert [r.acc for r in pre.df.collect()] == [100]
    with pytest.raises(ValueError, match="fold_pandas"):
        src.fold("v", "min", out="m", init=5)


def test_bug2_zero_delay_emits_inline(spark):
    """parity_bugs.rs:396-432 (legacy zero_delay_works): delay(0) emits in
    the same cycle, so 4 ticks accumulate 1,2,3,4 — not 1,2."""
    src = Stream(_ticker_counts(spark, 4, 10).df, ts="ts")
    acc = src.delay(0).accumulate("v")
    rows = acc.df.orderBy("ts").collect()
    assert [r.values for r in rows] == ["1", "1,2", "1,2,3", "1,2,3,4"]
    assert [r.ts for r in rows] == [0, 10, 20, 30], "same instants as source"


def test_bug3_delay_seeds_first_value_for_sample(spark):
    """parity_bugs.rs:434-466: source 5,6,7,… (1s ticks) delayed 5s; a 1s
    trigger samples at t=0..4 — before the delay elapses — and observes
    the seeded first value 5 every time (not null/default)."""
    S = 1_000_000_000
    trig = Stream(_ticker_counts(spark, 5, S).df.select("ts"), ts="ts")
    src = Stream(_ticker_counts(spark, 5, S, lambda c: c + 4).df, ts="ts")
    sampled = src.delay(5 * S).sample(trig, cols=["v"])
    got = [r.v for r in sampled.df.orderBy("ts").collect()]
    assert got == [5, 5, 5, 5, 5], "passive read before delay elapses sees the seed"


def test_bug3_delay_initializes_to_first_value_legacy_port(spark):
    """parity_bugs.rs:468-489 (legacy delay_initializes_to_first_value):
    join_passive(source, delay(source, 5s), a - b) reads the seed 5 while
    the delay is pending → differences 0,1,2,3,4 then settle at 5."""
    S = 1_000_000_000
    src = Stream(_ticker_counts(spark, 10, S, lambda c: c + 4).df, ts="ts")
    src_b = Stream(src.df.withColumnRenamed("v", "b"), ts="ts")
    delayed = src_b.delay(5 * S)
    j = src.join_passive(delayed)
    diff = [r.v - r.b for r in j.df.orderBy("ts").collect()]
    assert diff == [0, 1, 2, 3, 4, 5, 5, 5, 5, 5]


def test_bug3_delay_seed_does_not_tick(spark):
    """The seed is slot state, not a tick: consuming the delayed stream
    ACTIVELY (accumulate) sees only the delayed emissions."""
    src = Stream(_ticker_counts(spark, 3, 10).df, ts="ts")
    acc = src.delay(25).accumulate("v")
    rows = acc.df.orderBy("ts").collect()
    assert [r.ts for r in rows] == [25, 35, 45]
    assert [r.values for r in rows] == ["1", "1,2", "1,2,3"]


def test_bug4_pre_start_timestamp_rejected(spark):
    """parity_bugs.rs:97-117: a timestamp before the run start must error
    (it would rewind the run clock), with an error that explains it."""
    s = replay_rows(spark, [(50, 1)], "ts long, v long", seq=None)
    with pytest.raises(ValueError, match="before the run start"):
        validate_replay(s, start_ts=100)


def test_bug4_out_of_order_timestamps_rejected(spark):
    """parity_bugs.rs:119-139: out-of-order timestamps error (legacy
    parity) rather than being silently sorted."""
    s = replay_rows(spark, [(200, 1, 0), (100, 2, 1)], "ts long, v long, seq long",
                    seq="seq")
    with pytest.raises(ValueError, match="out of order"):
        validate_replay(s)
    # in-order passes and chains
    ok = replay_rows(spark, [(100, 1, 0), (100, 2, 1), (200, 3, 2)],
                     "ts long, v long, seq long", seq="seq")
    assert validate_replay(ok, start_ts=100) is ok


def test_bug3_seed_latches_in_combine_latest_without_ticking(spark):
    """The seed also serves combine_latest ('either' emission): it fills
    the right latch from the first source instant but contributes no
    emission of its own — tick count equals the two sides' tick count."""
    src = Stream(_ticker_counts(spark, 3, 10).df, ts="ts")           # v @ 0,10,20
    other = Stream(
        _ticker_counts(spark, 3, 10, lambda c: c * 100).df
        .withColumnRenamed("v", "w"), ts="ts")
    delayed = other.delay(25)                                        # w @ 25,35,45
    j = src.combine_latest(delayed)
    rows = j.df.orderBy("ts").collect()
    # instants: 0,10,20 (left) + 25,35,45 (right) — the seed adds none
    assert [r.ts for r in rows] == [0, 10, 20, 25, 35, 45]
    # left ticks before the delay elapses see the seeded first value 100
    assert [r.w for r in rows] == [100, 100, 100, 100, 200, 300]
