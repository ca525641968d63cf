"""Golden replays of the node-catalog promotion suites
(tests/catalog_not_collapse.rs, tests/catalog_filter_value_scan.rs):
`not` / `collapse` / `filter_value` / `scan` pinned value-for-value AND
tick-for-tick against the desugarings they replaced — tick times matter
because collapse's quiet-on-empty is a tick-suppression contract, not a
value mapping."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from wingfoil_spark.stream import Stream
from wingfoil_spark.sources.tables import replay_rows
from wingfoil_spark.operators.stateful import fold_pandas

P = 100  # the suites' tick period (ns)


def _counts(spark, n):
    return Stream(
        replay_rows(spark, [(i * P, i + 1) for i in range(n)], "ts long, n long").df,
        ts="ts",
    )


# --- not (catalog_not_collapse.rs:25-61) -----------------------------------

def test_not_negates_each_value(spark):
    """:27-38 — count 1..4 → is_even f,t,f,t → not t,f,t,f."""
    s = _counts(spark, 4).map(flag=(F.col("n") % 2 == 0)).not_("flag")
    assert [r.flag for r in s.df.orderBy("ts").collect()] == [True, False, True, False]


def test_not_matches_map_desugar(spark):
    """:41-50 — equivalence with map(|v| !v), values and tick times."""
    base = _counts(spark, 6).map(flag=(F.col("n") % 2 == 0))
    via_op = [(r.ts, r.flag) for r in base.not_("flag").df.orderBy("ts").collect()]
    via_map = [(r.ts, r.flag) for r in
               base.map(flag=~F.col("flag")).df.orderBy("ts").collect()]
    assert via_op == via_map


def test_not_integer_bitwise_negation(spark):
    """:53-61 — generic over Not: i64 negates bitwise (!3 == -4)."""
    s = _counts(spark, 3).not_("n")
    assert [r.n for r in s.df.orderBy("ts").collect()] == [~1, ~2, ~3]
    assert ~3 == -4


# --- collapse (catalog_not_collapse.rs:63-150) -----------------------------

def test_collapse_emits_last_item(spark):
    """:65-77 — vec![i, i*10] collapses to its last item."""
    s = _counts(spark, 3).map(arr=F.array(F.col("n"), F.col("n") * 10)).collapse("arr")
    assert [r.last for r in s.df.orderBy("ts").collect()] == [10, 20, 30]


def test_collapse_is_quiet_on_empty(spark):
    """:80-108 — empty iterables emit NOTHING; surviving ticks keep the
    source's instants (t=0,200,400) rather than shifting."""
    s = _counts(spark, 6).map(
        arr=F.when(F.col("n") % 2 == 0, F.array().cast("array<long>"))
            .otherwise(F.array(F.col("n")))
    ).collapse("arr")
    rows = s.df.orderBy("ts").collect()
    assert [(r.ts, r.last) for r in rows] == [(0, 1), (200, 3), (400, 5)]


def test_collapse_matches_map_filter_desugar(spark):
    """:111-133 — equivalence with the map_filter desugar, including the
    suppressed cycles."""
    base = _counts(spark, 9).map(
        arr=F.when(F.col("n") % 3 == 0, F.array().cast("array<long>"))
            .otherwise(F.array(F.col("n"), F.col("n") + 1))
    )
    via_op = [(r.ts, r.last) for r in base.collapse("arr").df.orderBy("ts").collect()]
    desugar = base.map_filter(
        F.size("arr") > 0, last=F.try_element_at(F.col("arr"), F.lit(-1))
    )
    via_desugar = [(r.ts, r.last) for r in desugar.df.orderBy("ts").collect()]
    assert via_op == via_desugar


def test_collapse_works_on_a_burst(spark):
    """:136-150 — same-instant values ride one burst; collapse takes the
    instant's last item: sends 1@0, 2@0, 3@100 → 2, 3."""
    s = Stream(
        replay_rows(spark, [(0, 0, 1), (0, 1, 2), (100, 0, 3)],
                    "ts long, seq long, v long", seq="seq").df,
        ts="ts", seq="seq",
    )
    rows = s.collapse().df.orderBy("ts").collect()
    assert [(r.ts, r.v) for r in rows] == [(0, 2), (100, 3)]
    with pytest.raises(ValueError, match="seq"):
        _counts(spark, 2).collapse()


# --- filter_value (catalog_filter_value_scan.rs:29-97) ---------------------

def test_filter_value_passes_when_predicate_true(spark):
    """:31-41 (legacy port) — keep the even counts of 1..=6."""
    s = _counts(spark, 6).filter_value(F.col("n") % 2 == 0)
    assert [r.n for r in s.df.orderBy("ts").collect()] == [2, 4, 6]


def test_filter_value_suppresses_all_when_always_false(spark):
    """:44-... — an always-false predicate emits nothing."""
    s = _counts(spark, 6).filter_value(F.lit(False))
    assert s.df.count() == 0


def test_filter_value_preserves_source_tick_times(spark):
    """:59-... — surviving ticks keep the source instants (no shift)."""
    s = _counts(spark, 6).filter_value(F.col("n") % 2 == 0)
    assert [r.ts for r in s.df.orderBy("ts").collect()] == [100, 300, 500]


def test_filter_value_matches_map_plus_filter(spark):
    """:87-98 — equivalence with the two-node desugar."""
    base = _counts(spark, 8)
    via_op = [(r.ts, r.n) for r in
              base.filter_value(F.col("n") > 2).df.orderBy("ts").collect()]
    via_desugar = [(r.ts, r.n) for r in
                   base.map(keep=F.col("n") > 2).filter_value(F.col("keep"))
                   .df.orderBy("ts").select("ts", "n").collect()]
    assert via_op == via_desugar


def test_filter_latch_quiet_until_source_then_samples_on_condition(spark):
    """catalog_filter_value_scan.rs:100-122 — the condition-STREAM filter:
    quiet until the source's first passing tick, then condition ticks
    re-emit (sample) the held value. 100ns source (values ≥2 pass), 30ns
    always-true condition, 10 cycles → the exact reference sequence."""
    src = Stream(
        replay_rows(spark, [(i * 100, i) for i in range(1, 3)], "ts long, v long").df,
        ts="ts",
    ).map(v=F.col("v") + 1)  # values 2@100, 3@200
    cond = Stream(
        replay_rows(spark, [(i * 30, True) for i in range(8)], "ts long, flag boolean").df,
        ts="ts",
    )
    out = src.filter_latch(cond, "flag", resample=True)
    got = [(r.ts, r.v) for r in out.df.orderBy("ts").collect()]
    assert got == [(100, 2), (120, 2), (150, 2), (180, 2), (200, 3), (210, 3)]


# --- scan (catalog_filter_value_scan.rs:100-226) ---------------------------

def test_scan_accumulates_returning_values(spark):
    """:100-112 — running sum of 1..=5: 1,3,6,10,15."""
    s = _counts(spark, 5).scan("n", "sum", out="acc")
    assert [r.acc for r in s.df.orderBy("ts").collect()] == [1, 3, 6, 10, 15]


def test_scan_agrees_with_fold_on_values_and_times(spark):
    """:115-146 — scan == fold value-for-value and tick-for-tick."""
    base = _counts(spark, 6)
    scanned = [(r.ts, r.acc) for r in base.scan("n", "sum", out="acc").df.orderBy("ts").collect()]
    folded = [(r.ts, r.acc) for r in base.fold("n", "sum", out="acc").df.orderBy("ts").collect()]
    assert scanned == folded


def test_scan_accumulator_may_differ_from_input(spark):
    """:196-214 — a String accumulator over u64 input, seeded at the call
    site: start-1, start-1-2, start-1-2-3."""
    s = fold_pandas(
        _counts(spark, 3),
        lambda acc, r: f"{acc}-{r['n']}",
        "start",
        out="label",
        dtype=T.StringType(),
    )
    assert [r.label for r in s.df.orderBy("ts").collect()] == [
        "start-1", "start-1-2", "start-1-2-3"]


def test_scan_reseeds_on_rerun(spark):
    """:217-226 — re-running the same graph re-seeds from the wiring-time
    init (batch: re-collecting the same lazy plan is a fresh run)."""
    s = fold_pandas(_counts(spark, 5), lambda a, r: a + r["n"], 0, out="acc",
                    dtype=T.LongType())
    first = [r.acc for r in s.df.orderBy("ts").collect()]
    second = [r.acc for r in s.df.orderBy("ts").collect()]
    assert first[-1] == 15 and second[-1] == 15
