"""Goldens replayed from the reference's own semantic cross-validation
suite (/root/reference/crates/wingfoil/tests/engine_semantics.rs) — the
tests the reference uses to prove a new engine reproduces legacy observable
behavior. Same wiring, same expected values, expressed on Stream.
"""

import pyspark.sql.functions as F

from wingfoil_spark.sources.tables import constant, ticker
from wingfoil_spark.stream import Stream


def test_constant_and_sample_match_reference(spark):
    """engine_semantics.rs:34-42: a constant ticks once; sampling it on a
    ticker re-emits it each trigger tick → [7, 7, 7]."""
    tick = ticker(spark, period_ns=100, n=3)
    const = constant(spark, 7.0, ts_ns=0)
    out = const.sample(tick, cols=["value"])
    vals = [r.value for r in out.df.orderBy("ts").collect()]
    assert vals == [7.0, 7.0, 7.0]


def test_filter_suppresses_like_reference(spark):
    """engine_semantics.rs:45-54: counts gated by an is-even latch pass
    only even counts → [2, 4, 6]."""
    count = ticker(spark, period_ns=100, n=6).count(out="n")
    count = Stream(
        count.df.select("ts", "seq", F.col("n").cast("long").alias("n")),
        ts="ts", seq="seq",
    )
    is_even = Stream(
        count.df.select("ts", "seq", (F.col("n") % 2 == 0).alias("flag")),
        ts="ts", seq="seq",
    )
    out = count.filter_latch(is_even, "flag")
    vals = [r.n for r in out.df.orderBy("ts").collect()]
    assert vals == [2, 4, 6]


def test_join_combines_current_values_like_reference(spark):
    """engine_semantics.rs:57-66: count joined with its doubled self,
    summed at each tick → [3, 6, 9]."""
    count = ticker(spark, period_ns=100, n=3).count(out="a")
    count = Stream(
        count.df.select("ts", "seq", F.col("a").cast("long").alias("a")),
        ts="ts", seq="seq",
    )
    doubled = Stream(
        count.df.select("ts", "seq", (F.col("a") * 2).alias("b")),
        ts="ts", seq="seq",
    )
    joined = count.combine_latest(doubled).map(s=F.col("a") + F.col("b"))
    vals = [r.s for r in joined.df.orderBy("ts").collect()]
    assert vals == [3, 6, 9]


def test_rerun_reproduces_fresh_graph(spark, sf_dir):
    """rerun.rs: a re-runnable graph restores wiring-time state each run —
    two runs reproduce a freshly-built graph exactly. Spark plans are pure
    (state lives in the execution, not the plan), so the same holds for the
    stateful pandas ops: byte-identical output across runs."""
    import __spark_entry__ as entry

    a = entry.q_ewma(spark, sf_dir).toPandas()
    b = entry.q_ewma(spark, sf_dir).toPandas()
    key = ["user_id", "event_id"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert (a["ewma_tick"].to_numpy() == b["ewma_tick"].to_numpy()).all()
    assert (a["ewma_hl"].to_numpy() == b["ewma_hl"].to_numpy()).all()


def test_fan_map_n_sugar_equals_manual_wiring(spark):
    """repetition.rs: fan/map_n sugar unrolls to the same graph as
    hand-written maps + merges — same values out."""
    src = ticker(spark, period_ns=10, n=5).count(out="v")
    src = Stream(
        src.df.select("ts", "seq", F.col("v").cast("long").alias("v")),
        ts="ts", seq="seq",
    )
    sugared = src.fan(3, lambda s, i: s.map_n(2, lambda x: x.map(v=F.col("v") + 1)))

    def branch(s):
        return s.map(v=F.col("v") + 1).map(v=F.col("v") + 1)

    # fan == hand-written MERGES (repetition.rs:31-49): same-instant branch
    # ticks collapse to one emission per instant
    manual = branch(src).merge(branch(src), branch(src))
    a = sorted((r.ts, r.v) for r in sugared.df.collect())
    b = sorted((r.ts, r.v) for r in manual.df.collect())
    assert a == b and len(a) == 5


def test_throttle_timing_goldens(spark):
    """catalog_flow.rs:173-219: 10ns source throttled at 25ns emits at
    t = 0, 30, 60 (timer-exact: next emission >= last + interval); a zero
    interval throttles nothing."""
    from wingfoil_spark.operators.stateful import throttle_exact
    from wingfoil_spark.sources.tables import replay_rows

    src = replay_rows(
        spark, [(t, t // 10 + 1, 0.0) for t in range(0, 70, 10)],
        "ts long, seq long, value double", ts="ts", seq="seq",
    )
    out = throttle_exact(src, 25)
    assert sorted(r.ts for r in out.df.collect()) == [0, 30, 60]
    out0 = throttle_exact(src, 0)
    assert sorted(r.ts for r in out0.df.collect()) == list(range(0, 70, 10))


def test_delay_with_reset_never_reset_matches_delay(spark):
    """catalog_flow.rs:42-55: with a never-ticking trigger,
    delay_with_reset degenerates to plain delay; and zero delay passes
    every tick through unchanged (:145-162)."""
    from wingfoil_spark.operators.stateful import delay_with_reset
    from wingfoil_spark.sources.tables import never, replay_rows

    src = replay_rows(
        spark, [(100 * i, i, float(i)) for i in range(1, 11)],
        "ts long, seq long, v double", ts="ts", seq="seq",
    )
    nv = never(spark, schema="v double")
    nv = Stream(nv.df.select("ts", F.lit(0).alias("seq"), "v"), ts="ts", seq="seq")

    with_reset = delay_with_reset(src, 300, nv, ["v"])
    plain = sorted((r.ts + 300, r.v) for r in src.df.collect())
    got = sorted((r.ts, r.v) for r in with_reset.df.collect())
    assert got == plain

    zero = delay_with_reset(src, 0, nv, ["v"])
    assert sorted((r.ts, r.v) for r in zero.df.collect()) == sorted(
        (r.ts, r.v) for r in src.df.collect()
    )


def test_combine_gathers_only_ticked_inputs_in_supplied_order(spark):
    """combine_n.rs:96-146: a burst carries ONLY the inputs that ticked at
    the instant, in supplied order — fast=10ns counts, slow=30ns counts+100:
    [1,101], [2], [3], [4,102], [5], [6]."""
    from wingfoil_spark.sources.tables import replay_rows

    fast = replay_rows(
        spark, [(t, i + 1, float(i + 1)) for i, t in enumerate(range(0, 60, 10))],
        "ts long, seq long, value double", ts="ts", seq="seq",
    )
    slow = replay_rows(
        spark, [(0, 1, 101.0), (30, 2, 102.0)],
        "ts long, seq long, value double", ts="ts", seq="seq",
    )
    out = fast.gather(slow)
    got = [tuple(r.burst) for r in out.df.orderBy("ts").collect()]
    assert got == [(1.0, 101.0), (2.0,), (3.0,), (4.0, 102.0), (5.0,), (6.0,)]


def test_drop_small_change_compares_to_last_emitted(spark):
    """catalog.rs:60-83: the reference point is the last EMITTED value, not
    the last seen one — an accumulating drift of individually-small steps
    ticks once it crosses the threshold, and suppressed ticks are absent
    (tick times are part of the contract)."""
    from wingfoil_spark.operators.stateful import drop_small_change
    from wingfoil_spark.sources.tables import replay_rows

    prices = replay_rows(
        spark,
        [(0, 1, 1, 100.000), (100, 2, 1, 100.005),
         (200, 3, 1, 100.020), (300, 4, 1, 100.025)],
        "ts long, seq long, k long, price double",
        ts="ts", seq="seq", keys=("k",),
    )
    out = drop_small_change(prices, "price", tol=0.01)
    got = sorted((r.ts, r.price) for r in out.df.collect())
    assert got == [(0, 100.000), (200, 100.020)]


def test_dynamic_group_live_price_book(spark):
    """dynamic_graph.rs:308-360: feed (key=c%2, price=10c), add key0@1 and
    key1@2, del key0@4 (control-first: key0 never sees the cycle-4 price)
    plus a no-op del of key 99@5. Member emissions are exactly
    key0:(2,20), key1:(3,30),(5,50) — the final live book {1: 50}."""
    from wingfoil_spark.operators.dynamic import dynamic_group
    from wingfoil_spark.sources.tables import replay_rows

    data = replay_rows(
        spark,
        [(c, c, c % 2, float(10 * c)) for c in range(1, 7)],
        "ts long, seq long, k long, price double",
        ts="ts", seq="seq", keys=("k",),
    )
    add = replay_rows(
        spark, [(1, 1, 0), (2, 2, 1)], "ts long, seq long, k long",
        ts="ts", seq="seq", keys=("k",),
    )
    rem = replay_rows(
        spark, [(4, 4, 0), (5, 5, 99)], "ts long, seq long, k long",
        ts="ts", seq="seq", keys=("k",),
    )
    out = dynamic_group(data, add, rem, "price",
                        fold_fn=lambda acc, v: v, init=0.0, out="latest")
    rows = sorted((r.k, r.ts, r.price) for r in out.df.collect())
    assert rows == [(0, 2, 20.0), (1, 3, 30.0), (1, 5, 50.0)]
    # the group-level read: last emission per still-live key
    book = {r.k: r.latest for r in out.df.collect() if r.k == 1}
    assert max(book.items()) == (1, 50.0)


def test_for_each_observes_every_tick_like_reference(spark):
    """engine_semantics.rs:90-105: a sink side effect runs once per source
    tick, in tick order → [1, 2, 3]."""
    import os
    import tempfile

    count = ticker(spark, period_ns=100, n=3).count(out="n")
    with tempfile.TemporaryDirectory() as d:
        marker = os.path.join(d, "seen")

        def sink(row):
            with open(marker, "a") as f:
                f.write(f"{row.n}\n")

        Stream(count.df.orderBy("ts").coalesce(1), ts="ts", seq="seq").for_each(sink)
        with open(marker) as f:
            assert [int(x) for x in f.read().split()] == [1, 2, 3]


def test_rerun_reseeds_state_identically(spark):
    """tests/rerun.rs: state_init re-seeds on a re-run — running the same
    stateful graph twice yields identical results (HistoricalFrom replay
    is a pure function of the input rowset). Exercised on the order book
    (engine-owned dict state) and the ewma kernel (C path)."""
    import __spark_entry__ as entry

    for name in ("order_book_top", "ewma"):
        q = entry.queries()[name]
        a = q(spark, "/root/testdata/sf0.001").toPandas()
        b = q(spark, "/root/testdata/sf0.001").toPandas()
        key = sorted(a.columns)
        a = a[key].sort_values(key).reset_index(drop=True)
        b = b[key].sort_values(key).reset_index(drop=True)
        assert a.equals(b), f"{name}: re-run diverged"


def test_combine_gathers_only_the_inputs_that_ticked(spark):
    """tests/combine_n.rs:127-146 golden: fast (10ns) and slow (30ns)
    tickers — each instant's burst carries ONLY the inputs that ticked,
    in supplied order: [1,101], [2], [3], [4,102], [5], [6]. (The
    empty-gather instant is unreachable by construction — combine_n.rs:
    148-160 — which in DataFrame terms means no row is produced where
    no input has one.)"""
    from wingfoil_spark.sources.tables import ticker

    fast = ticker(spark, period_ns=10, n=6).count(out="v")
    slow = (
        ticker(spark, period_ns=30, n=2).count(out="v")
        .map(v=(F.col("v") + 100))
    )
    g = fast.gather(slow, value_col="v")
    got = [(r["ts"], list(r["burst"])) for r in g.df.orderBy("ts").collect()]
    assert got == [
        (0, [1, 101]), (10, [2]), (20, [3]),
        (30, [4, 102]), (40, [5]), (50, [6]),
    ]


def test_drop_small_change_zero_tol_degenerates_to_distinct(spark):
    """wingfoil-python/tests/test_interop.py:83-93: an equality predicate
    (here: tol=0 — emit only when the value actually changed) degenerates
    drop_small_change to distinct_until_changed, value for value."""
    from wingfoil_spark.operators.stateful import drop_small_change
    from wingfoil_spark.sources.tables import replay_rows

    # counter 1..6 at t=0..500 mapped n//2 -> 0,1,1,2,2,3
    rows = [(100 * i, i, float((i + 1) // 2)) for i in range(6)]
    s = replay_rows(spark, rows, "ts long, seq long, value double",
                    ts="ts", seq="seq")
    dsc = [r.value for r in
           drop_small_change(s, "value", tol=0.0).df.orderBy("ts").collect()]
    dis = [r.value for r in
           s.distinct_until_changed("value").df.orderBy("ts").collect()]
    assert dsc == [0.0, 1.0, 2.0, 3.0]
    assert dsc == dis


def _snap_rows(spark, trigger_period, n_trig, end_ts):
    """catalog_flow.rs:57-74 harness: source=ticker(100).count, plain
    delay(500) vs delay_with_reset(500, trigger), all three joined and
    accumulated. Batch replays every scheduled event, so the reference's
    RunFor window is applied as a ts cutoff (pops past the run end exist
    here but the reference's runner never cycled them)."""
    from wingfoil_spark.sources import tables

    cnt = tables.ticker(spark, 100, 22).count()
    a = Stream(cnt.df.select("ts", "seq", F.col("n").alias("a")), ts="ts", seq="seq")
    b = Stream(cnt.df.select("ts", "seq", F.col("n").alias("b")),
               ts="ts", seq="seq").delay(500)
    trig = tables.ticker(spark, trigger_period, n_trig)
    c = Stream(cnt.df.select("ts", "seq", F.col("n").alias("c")),
               ts="ts", seq="seq").delay_with_reset(500, trig, value_cols=["c"])
    j = a.join3(b, c)
    return [(r.a, r.b, r.c) for r in j.collect_ordered() if r.ts <= end_ts]


def test_delay_with_reset_snaps_on_trigger(spark):
    """catalog_flow.rs:76-104 (legacy delay_with_reset_snaps_on_trigger),
    value-by-value: the 1000ns trigger snaps the delayed output back to
    the live value (rows 11→16 hold the snapped 11 while plain delay walks
    6..11), pending pops resume after the snap (row 17: 12), and the first
    upstream value seeds both delayed slots before any pop (rows 1-6 read
    b=c=1 — ops.rs:3144-3149 Tick::Silent)."""
    got = _snap_rows(spark, 1000, 3, end_ts=2100)
    assert got == [
        (1, 1, 1), (2, 1, 1), (3, 1, 1), (4, 1, 1), (5, 1, 1), (6, 1, 1),
        (7, 2, 2), (8, 3, 3), (9, 4, 4), (10, 5, 5),
        (11, 6, 11), (12, 7, 11), (13, 8, 11), (14, 9, 11), (15, 10, 11),
        (16, 11, 11), (17, 12, 12), (18, 13, 13), (19, 14, 14), (20, 15, 15),
        (21, 16, 21), (22, 17, 21),
    ]


def test_delay_with_reset_snaps_on_trigger_2(spark):
    """catalog_flow.rs:106-140: the 750ns cadence, where the trigger fires
    BETWEEN source ticks — the snap emits its own instant (a=8 appears
    twice: the pop row at 700, then the snap row at 750) and a trigger
    landing ON a source tick (1500) folds into that instant's single
    emission."""
    got = _snap_rows(spark, 750, 3, end_ts=2100)
    assert got == [
        (1, 1, 1), (2, 1, 1), (3, 1, 1), (4, 1, 1), (5, 1, 1), (6, 1, 1),
        (7, 2, 2), (8, 3, 3), (8, 3, 8), (9, 4, 8), (10, 5, 8), (11, 6, 8),
        (12, 7, 8), (13, 8, 8), (14, 9, 9), (15, 10, 10),
        (16, 11, 16), (17, 12, 16), (18, 13, 16), (19, 14, 16), (20, 15, 16),
        (21, 16, 16), (22, 17, 17),
    ]


def test_drop_small_change_predicate_form(spark):
    """The binding's predicate form (wingfoil-python
    tests/test_interop.py:68-107): (cur, prev_emitted) -> is-the-change-
    small. Comparison is against the last EMITTED value (3,6,9 dropped
    under <8 until 12 fires); an equality predicate degenerates to
    distinct; a raising predicate aborts the run; a non-bool return
    errors naming the contract."""
    import pytest

    from wingfoil_spark.operators.stateful import drop_small_change
    from wingfoil_spark.sources.tables import ticker

    c = ticker(spark, 100, 6).count()
    tripled = Stream(
        c.df.select("ts", "seq", (F.col("n") * 3.0).alias("v")), "ts", "seq"
    )
    out = drop_small_change(tripled, "v", lambda cur, prev: abs(cur - prev) < 8)
    assert out.collect() == [(0, 3.0), (300, 12.0)]

    stepped = Stream(
        c.df.select("ts", "seq", (F.col("n") / 2).cast("long").alias("v")),
        "ts", "seq",
    )
    eq = drop_small_change(stepped, "v", lambda cur, prev: cur == prev)
    distinct = stepped.distinct_until_changed("v")
    assert [v for _, v in eq.collect()] == [r.v for r in distinct.collect_ordered()]

    with pytest.raises(Exception, match="no_such_attr"):
        drop_small_change(tripled, "v",
                          lambda cur, prev: cur.no_such_attr).collect()
    with pytest.raises(Exception, match="must return a bool"):
        drop_small_change(tripled, "v", lambda cur, prev: "not a bool").collect()


def test_map_python_callable_form(spark):
    """The binding's lambda idiom (wingfoil-python test_interop.py:14-19,
    43-48, 109-113): map(fn) applies per value (Arrow-batched), string
    returns via dtype=, a raising callable aborts the run, and a
    non-callable positional is a wiring-time TypeError."""
    import pytest

    from wingfoil_spark.sources.tables import ticker

    c = ticker(spark, 100, 3).count()
    s = Stream(c.df.select("ts", "seq", F.col("n").cast("double").alias("v")),
               "ts", "seq")
    assert [v for _, v in s.map(lambda n: n * 3).collect()] == [3.0, 6.0, 9.0]
    labeled = s.map(lambda n: f"hello world {int(n)}", dtype="string")
    assert [v for _, v in labeled.collect()] == [
        "hello world 1", "hello world 2", "hello world 3"]
    with pytest.raises(Exception, match="boom"):
        s.map(lambda n: (_ for _ in ()).throw(RuntimeError("boom"))).collect()
    with pytest.raises(TypeError, match="must be a callable"):
        s.map("not a fn")


def test_filter_python_predicate_form(spark):
    """test_filter_by_python_predicate (wingfoil-python
    test_interop.py:50-58): the callable form filters per value; the
    Column form stays the codegen path."""
    from wingfoil_spark.sources.tables import ticker

    c = ticker(spark, 100, 5).count()
    s = Stream(c.df.select("ts", "seq", F.col("n").cast("double").alias("v")),
               "ts", "seq")
    got = [v for _, v in s.filter_value(lambda n: n > 2).collect()]
    assert got == [3.0, 4.0, 5.0]
    assert got[-1] == 5.0, "last passing value is the 5th tick"
    assert [v for _, v in s.filter_value(F.col("v") > 2).collect()] == got
