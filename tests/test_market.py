"""Market-op goldens: order-book fold semantics (snapshot replace, delta
add/remove, level drop at qty≤0), VWAP exactness, gap detection — modeled on
the reference's deterministic replay tests (SURVEY §5 pattern 1)."""

import pyspark.sql.functions as F

from wingfoil_spark import Stream, replay_rows
from wingfoil_spark.operators import market


def _updates(spark, rows):
    df = spark.createDataFrame(
        rows, "inst string, ts long, upd_seq long, kind string, side string, "
              "level long, qty_delta long"
    )
    return Stream(df, ts="ts", seq="upd_seq", keys=("inst",))


def test_order_book_fold(spark):
    u = _updates(
        spark,
        [
            ("A", 1, 1, "delta", "bid", 100, 5),
            ("A", 2, 2, "delta", "ask", 102, 3),
            ("A", 3, 3, "delta", "bid", 101, 2),   # better bid
            ("A", 4, 4, "delta", "bid", 101, -2),  # removes the level
            ("A", 5, 5, "snapshot", "bid", 99, 7), # clears book, seeds 99
        ],
    )
    out = {r.upd_seq: r for r in market.order_book(u).df.collect()}
    assert (out[1].best_bid, out[1].bid_qty, out[1].best_ask) == (100, 5, None)
    assert (out[2].best_bid, out[2].best_ask, out[2].ask_qty) == (100, 102, 3)
    assert (out[3].best_bid, out[3].bid_qty) == (101, 2)
    assert (out[4].best_bid, out[4].n_bid_levels) == (100, 1)   # level dropped
    assert (out[5].best_bid, out[5].n_bid_levels, out[5].n_ask_levels) == (99, 1, 0)


def test_order_book_instruments_independent(spark):
    u = _updates(
        spark,
        [
            ("A", 1, 1, "delta", "bid", 100, 5),
            ("B", 1, 2, "delta", "bid", 500, 1),
        ],
    )
    out = {r.inst: r for r in market.order_book(u).df.collect()}
    assert out["A"].best_bid == 100 and out["B"].best_bid == 500


def test_tumbling_vwap_exact(spark):
    t = Stream(
        spark.createDataFrame(
            [("A", 5, 1, 10.0, 2.0), ("A", 7, 2, 20.0, 2.0), ("A", 15, 3, 30.0, 1.0)],
            "inst string, ts long, trade_seq long, px double, qty double",
        ).select(
            "inst", "ts", "trade_seq",
            F.col("px").cast(market.PX).alias("px"),
            F.col("qty").cast(market.QTY).alias("qty"),
        ),
        ts="ts", seq="trade_seq", keys=("inst",),
    )
    out = {r.ts: r for r in market.tumbling_vwap(t, 10).df.collect()}
    assert out[10].vwap == 15.0 and out[10].volume == 4.0 and out[10].n_trades == 2
    assert out[20].vwap == 30.0


def test_detect_seq_gaps(spark):
    s = Stream(
        spark.createDataFrame(
            [(1, 1), (2, 2), (3, 5), (4, 6), (5, 9)], "ts long, seq long"
        ),
        ts="ts", seq="seq",
    )
    got = [(r.gap_from_seq, r.gap_to_seq, r.n_missing)
           for r in market.detect_seq_gaps(s).df.orderBy("ts").collect()]
    assert got == [(2, 5, 2), (6, 9, 2)]
