"""Golden tests for dynamic_group membership lifecycle (reference
interp.rs:3901-4047 / tests/dynamic_graph.rs pattern): add creates fresh
state, del drops, re-add resets, non-member ticks ignored."""

from wingfoil_spark import Stream
from wingfoil_spark.operators.dynamic import dynamic_group


def _s(spark, rows, schema="k string, ts long, v double", **kw):
    kw.setdefault("keys", ("k",))
    return Stream(spark.createDataFrame(rows, schema), ts="ts", **kw)


def test_membership_lifecycle(spark):
    data = _s(spark, [("a", 1, 1.0), ("a", 3, 2.0), ("a", 5, 4.0), ("a", 7, 8.0)])
    add = _s(spark, [("a", 2), ("a", 6)], "k string, ts long")
    rem = _s(spark, [("a", 4)], "k string, ts long")
    out = dynamic_group(data, add, rem, "v")
    got = [(r.ts, r.v, r.member_acc) for r in out.df.orderBy("ts").collect()]
    # t=1: not yet member (dropped); t=2 add; t=3 folds 2.0; t=4 del;
    # t=5 dropped; t=6 re-add (FRESH state); t=7 folds 8.0 from init
    assert got == [(3, 2.0, 2.0), (7, 8.0, 8.0)]


def test_add_del_same_instant_order(spark):
    # control applies at cycle start, add(0) before del(1): an add+del at
    # the same instant nets to non-member
    data = _s(spark, [("a", 5, 1.0)])
    add = _s(spark, [("a", 5)], "k string, ts long")
    rem = _s(spark, [("a", 5)], "k string, ts long")
    out = dynamic_group(data, add, rem, "v")
    assert out.df.count() == 0


def test_data_tick_same_instant_as_add(spark):
    # membership changes at cycle START: a data tick at the add instant folds
    data = _s(spark, [("a", 5, 3.0)])
    add = _s(spark, [("a", 5)], "k string, ts long")
    rem = _s(spark, [], "k string, ts long")
    out = dynamic_group(data, add, rem, "v")
    assert [(r.ts, r.member_acc) for r in out.df.collect()] == [(5, 3.0)]


def test_keys_independent(spark):
    data = _s(spark, [("a", 2, 1.0), ("b", 2, 10.0)])
    add = _s(spark, [("a", 1)], "k string, ts long")
    rem = _s(spark, [], "k string, ts long")
    out = dynamic_group(data, add, rem, "v")
    got = {r.k: r.member_acc for r in out.df.collect()}
    assert got == {"a": 1.0}  # b never added


def test_member_from_start(spark):
    data = _s(spark, [("a", 1, 1.0), ("a", 2, 2.0)])
    add = _s(spark, [], "k string, ts long")
    rem = _s(spark, [], "k string, ts long")
    out = dynamic_group(data, add, rem, "v", member_from_start=True)
    got = [(r.ts, r.member_acc) for r in out.df.orderBy("ts").collect()]
    assert got == [(1, 1.0), (2, 3.0)]
