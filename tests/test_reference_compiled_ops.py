"""Goldens from the reference's three-engine parity suite
(tests/compiled_stateful_ops.rs): the nitro!-compiled, interpreted, and
nested-island engines must agree exactly — our analog of "three engines"
is ONE declarative plan Catalyst may execute many ways, so the goldens
replay as plain value pins on the batch operators.

compiled_lifecycle_ops.rs (teardown hooks: `finally` fires exactly once
at run end, cleanup in node order, first error wins) pins engine-runtime
lifecycle that Spark's task/executor teardown owns outright — documented
mapping only (COVERAGE.md §2.2 for_each/finally row), nothing separately
replayable.
"""

import pyspark.sql.functions as F

from wingfoil_spark.operators.stateful import throttle_exact
from wingfoil_spark.sources.tables import replay_rows

#: the suite's 10ns counter: count c at t = (c-1)*10
def _counter(spark, cycles):
    return replay_rows(
        spark,
        [(10 * i, i, float(i + 1)) for i in range(cycles)],
        "ts long, seq long, value double",
        ts="ts",
        seq="seq",
    ).map(cnt=(F.col("seq") + 1).cast("long"))


def test_throttle_value_golden(spark):
    """compiled_stateful_ops.rs:82-96: the 10ns counter throttled at 25ns
    emits VALUES 1, 4, 7 at TIMES 0, 30, 60 — the timer measures from the
    last emission, and the emitted value is the suppression-window's first
    tick (not its last)."""
    src = _counter(spark, 7)
    out = throttle_exact(src, 25)
    rows = sorted((r.ts, r.cnt) for r in out.df.collect())
    assert rows == [(0, 1), (30, 4), (60, 7)]


def test_window_membership_golden(spark):
    """compiled_stateful_ops.rs:112-138: window(25ns) over the 10ns
    counter groups counts [1,2,3] then [4,5] — a tick exactly ON a
    boundary (count 6 at t=50) belongs to the NEXT window.

    Emission-time mapping (documented divergence): the reference's Window
    op has no timer — it flushes when the first tick AT/past the boundary
    arrives and stamps THAT tick's time (30, 50). Our batch tumbling
    stamps the interval end (25, 50): same membership, deterministic
    timestamps that don't depend on the next tick's arrival. The
    reference also DROPS a final-cycle value pushed in the same cycle as
    a boundary flush (count 6 vanishes — ops.rs:637-648: the
    is_last_cycle flush is skipped when `out` is already Some); batch
    materializes every bucket, so [6] appears here as the trailing
    partial."""
    src = _counter(spark, 6)
    t = src.tumbling(25, {"vals": F.sort_array(F.collect_list("cnt"))})
    rows = sorted((r.ts, list(r.vals)) for r in t.df.collect())
    assert rows == [(25, [1, 2, 3]), (50, [4, 5]), (75, [6])]


def test_join3_value_golden(spark):
    """compiled_stateful_ops.rs:142-157: a ⋈ 2a ⋈ 3a summed per tick →
    6c = 6, 12, 18 (three active edges, all ticking together)."""
    a = _counter(spark, 3)
    b = a.map(d2=(F.col("cnt") * 2)).select_cols("d2")
    c = a.map(d3=(F.col("cnt") * 3)).select_cols("d3")
    j = a.select_cols("cnt").join3(b, c)
    out = j.map(total=F.col("cnt") + F.col("d2") + F.col("d3"))
    assert sorted(r.total for r in out.df.collect()) == [6, 12, 18]
