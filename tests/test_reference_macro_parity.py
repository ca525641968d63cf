"""Replays of the reference's dual-engine parity goldens
(/root/reference/crates/wingfoil/tests/macro_parity.rs and
compiled_parity.rs): the same graph wiring must produce identical values
on two independent executions of the same operator semantics. There the
engines are interpreted vs ``nitro!``-compiled; here they are the Catalyst
batch plan vs a hand-rolled pure-Python replay of the same dataflow (the
compiled_parity.rs structure exactly — "both calling the same cycle
semantics, no re-implemented node logic trusted on one side only"), with
the streaming twins covered separately by tests/test_streaming_duality.py.

Run-loop nuances are out of scope by design: RunFor::Duration's
stop-check uses the last COMPLETED cycle's elapsed time (runtime/
run.rs:45-49), letting one cycle past the deadline through — scheduler
mechanics, not dataflow semantics; the Cycles-bound goldens replayed here
are engine-independent."""

import pyspark.sql.functions as F

from wingfoil_spark.sources import tables


def last_acc(stream, col="values"):
    """The accumulated value after the final cycle (runner.value(&acc))."""
    rows = stream.collect_ordered()
    return rows[-1][col] if rows else ""


def test_odds_evens_interpreted_matches_python_twin(spark):
    """macro_interpreted_matches_macro_compiled (macro_parity.rs:28-41) /
    compiled_parity.rs:235-273: ticker → count → even/odd classification →
    two filtered format branches → merge → accumulate, 12 cycles."""
    t = tables.ticker(spark, 10_000_000, 12)  # 10ms period, 12 cycles
    c = t.count()
    flagged = c.map(flag=(F.col("n") % 2 == 0))
    odd = flagged.map_filter(
        ~F.col("flag"),
        s=F.concat(F.col("n").cast("string"), F.lit(" is odd")),
    )
    even = flagged.map_filter(
        F.col("flag"),
        s=F.concat(F.col("n").cast("string"), F.lit(" is even")),
    )
    acc = odd.merge(even).accumulate("s")

    got = last_acc(acc).split(",")
    assert len(got) == 12
    assert got[0] == "1 is odd"
    assert got[1] == "2 is even"
    assert got[11] == "12 is even"

    # second engine: the hand-rolled replay of the same cycle semantics
    twin = []
    for n in range(1, 13):
        twin.append(f"{n} is even" if n % 2 == 0 else f"{n} is odd")
    assert got == twin


def test_delay_graph_golden(spark):
    """macro_handles_delay_on_both_engines (macro_parity.rs:67-93), the
    dataflow half: ticker(10ns) → count → delay(100ns) → accumulate —
    every count arrives exactly 100ns late, order preserved."""
    t = tables.ticker(spark, 10, 12)
    acc = t.count().delay(100)
    rows = acc.collect_ordered()
    assert [(r.ts, r.n) for r in rows] == [
        (100 + 10 * i, i + 1) for i in range(12)
    ]
    # the Duration(120)-bounded prefix (run-loop admits the cycle that
    # trips the deadline check — run.rs:45-49 — so [1,2,3,4] there; the
    # pure graph-clock cutoff at 120 is the first three arrivals)
    assert [r.n for r in rows if r.ts <= 120] == [1, 2, 3]


def test_sample_and_constant_golden(spark):
    """macro_handles_sample_and_constant (macro_parity.rs:95-110):
    constant(7).sample(ticker) accumulates [7,7,7] over 3 cycles."""
    tick = tables.ticker(spark, 100, 3)
    const = tables.constant(spark, 7, schema="value long")
    acc = const.sample(tick).accumulate("value")
    assert last_acc(acc) == "7,7,7"


def test_passthrough_config_golden(spark):
    """macro_allows_passthrough_statements (macro_parity.rs:126-136):
    count.map(saturating_sub(threshold)) with threshold=2 over 5 cycles →
    [0, 0, 1, 2, 3]."""
    c = tables.ticker(spark, 100, 5).count()
    acc = c.map(v=F.greatest(F.col("n") - 2, F.lit(0))).accumulate("v")
    assert last_acc(acc) == "0,0,1,2,3"


def test_staged_map_golden(spark):
    """macro_interleaves_passthrough_with_wiring (macro_parity.rs:147-159):
    count.map(i * 3) over 3 cycles → [3, 6, 9]."""
    c = tables.ticker(spark, 50, 3).count()
    acc = c.map(v=F.col("n") * 3).accumulate("v")
    assert last_acc(acc) == "3,6,9"


def test_join_two_outputs_golden(spark):
    """joined (macro_parity.rs:162-168): count.join(doubled, a+b) — a
    same-cycle combine of a stream with its own map — accumulates
    [3, 6, 9, ...]; both outputs of the wiring stay usable."""
    c = tables.ticker(spark, 100, 4).count()
    doubled = c.map(d=F.col("n") * 2)
    summed = doubled.map(v=F.col("n") + F.col("d"))
    acc = summed.accumulate("v")
    assert last_acc(acc) == "3,6,9,12"
    # the second output (doubled) remains independently consumable
    assert [r.d for r in doubled.collect_ordered()] == [2, 4, 6, 8]
