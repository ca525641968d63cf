"""FIX tag=value codec (sources/fix.py) — behaviors replayed from the
reference's own codec tests (adapters/fix.rs:3339-3430) plus the message
model (fix.rs:356-495). One difference is structural and documented: the
reference frames a live socket BUFFER (an overstated BodyLength reads as
Incomplete — more bytes may arrive); our unit is a captured-log ROW that
already holds every byte it will ever have, so the same frame decodes as
a BodyLength error."""

import pandas as pd
import pyspark.sql.functions as F
import pytest

from wingfoil_spark.sources import fix as fx

SOH = b"\x01"


def enc(msg_type, seq, extra=(), sender="THEM", target="US",
        st="20240627-11:17:25.223"):
    """Local mirror of the reference encode_message (fix.rs:1065-1090),
    used to BUILD fixtures the wire could really produce."""
    body = b""
    for tag, val in [(35, msg_type), (49, sender), (56, target),
                     (34, str(seq)), (52, st), *extra]:
        body += f"{tag}={val}".encode("latin-1") + SOH
    frame = b"8=FIX.4.4" + SOH + f"9={len(body)}".encode() + SOH + body
    ck = sum(frame) % 256
    return frame + f"10={ck:03d}".encode() + SOH


def decode_rows(spark, frames):
    df = spark.createDataFrame(
        [(bytearray(f),) for f in frames], "value binary"
    )
    return fx.decode_fix(df).select("fix.*").collect()


def fields_dict(row):
    return [(f["tag"], f["val"]) for f in row["fields"]]


def test_encode_decode_roundtrip(spark):
    """fix.rs:3233 — NewOrderSingle through encoder and decoder."""
    df = spark.createDataFrame(
        [("D", "SENDER", "TARGET", 1, "20240627-11:17:25.223",
          [(55, "AAPL"), (54, "1"), (38, "100"), (44, "150.00")])],
        "mt string, snd string, tgt string, seq long, st string, "
        "flds array<struct<tag:int,val:string>>",
    )
    enc_df = df.select(
        fx.encode_fix("mt", "snd", "tgt", "seq", "st", "flds").alias("value")
    )
    row = fx.decode_fix(enc_df).select("fix.*").collect()[0]
    assert row["valid"] and row["error"] is None
    assert row["msg_type"] == "D" and row["seq_num"] == 1
    got = dict(fields_dict(row))
    assert got[55] == "AAPL" and got[54] == "1"
    assert got[38] == "100" and got[44] == "150.00"


def test_framing_uses_body_length_not_a_trailer_scan(spark):
    """fix.rs:3346 — the headline framing bug: a RawData (96) payload
    containing an embedded '\\x0110=999\\x01' trailer must NOT split the
    frame; the field after it survives."""
    payload = "\x0110=999\x01embedded"
    frame = enc("8", 7, [(95, str(len(payload))), (96, payload),
                         (37, "ORDER-1")])
    row = decode_rows(spark, [frame])[0]
    assert row["valid"], row["error"]
    assert row["msg_type"] == "8" and row["seq_num"] == 7
    got = dict(fields_dict(row))
    assert got[37] == "ORDER-1", "frame was cut short at the embedded trailer"
    assert got[96] == payload


def test_corrupt_checksum_rejected(spark):
    """fix.rs:3372 — rewritten checksum digits are rejected; the intact
    original still decodes."""
    good = enc("0", 1)
    corrupt = good[:-4] + b"000" + good[-1:]
    rows = decode_rows(spark, [corrupt, good])
    assert rows[0]["valid"] is False and rows[0]["error"] == "CheckSum mismatch"
    assert rows[1]["valid"] is True


def test_body_length_that_misses_the_trailer_rejected(spark):
    """fix.rs:3395 (understated) + fix.rs:3410 adapted to the captured-log
    model (overstated cannot become 'wait for more bytes' on a complete
    row, so it is the same BodyLength error)."""
    good = enc("0", 1)
    n = good.split(SOH)[1].decode()[2:]  # the true 9= value
    under = good.replace(f"9={n}".encode() + SOH, b"9=10" + SOH, 1)
    over = good.replace(f"9={n}".encode() + SOH, b"9=4500" + SOH, 1)
    assert under != good and over != good
    rows = decode_rows(spark, [under, over])
    for row in rows:
        assert row["valid"] is False
        assert row["error"] == "BodyLength does not match the frame"


def test_missing_msg_type_is_invalid(spark):
    """fix.rs:1408 — framed and checksum-clean but with no MsgType (35):
    structurally fine, semantically unusable."""
    body = b"49=THEM" + SOH + b"56=US" + SOH + b"34=1" + SOH
    frame = b"8=FIX.4.4" + SOH + f"9={len(body)}".encode() + SOH + body
    frame += f"10={sum(frame) % 256:03d}".encode() + SOH
    row = decode_rows(spark, [frame])[0]
    assert row["valid"] is False and row["error"] == "missing MsgType"


def test_junk_header_rejected(spark):
    row = decode_rows(spark, [b"garbage bytes"])[0]
    assert row["valid"] is False
    assert row["error"] == "malformed message header"


def test_sending_time_precision_variants(spark):
    """fix.rs:1179-1196 — second/milli/micro/nano all parse (nanos
    truncate to the engine's µs); a bad value maps to 0, not a reject."""
    frames = [
        enc("0", 1, st="20240627-11:17:25"),
        enc("0", 2, st="20240627-11:17:25.223"),
        enc("0", 3, st="20240627-11:17:25.223456"),
        enc("0", 4, st="20240627-11:17:25.223456789"),
        enc("0", 5, st="not-a-time"),
    ]
    rows = decode_rows(spark, frames)
    base = rows[0]["sending_time_us"]
    assert base > 0
    assert rows[1]["sending_time_us"] == base + 223_000
    assert rows[2]["sending_time_us"] == base + 223_456
    assert rows[3]["sending_time_us"] == base + 223_456  # ns truncates
    assert rows[4]["valid"] and rows[4]["sending_time_us"] == 0


def test_repeating_groups(spark):
    """fix.rs:437-475 — entries start at each delimiter after the count
    tag, capped at the declared count; the LAST entry extends to the end
    of the message; a delimiter-valued tag before the count tag is not an
    entry."""
    frame = enc("W", 3, [
        (55, "AAPL"),
        (268, "2"),
        (269, "0"), (270, "150.10"), (271, "500"),
        (269, "1"), (270, "150.20"), (271, "700"),
        (262, "REQ-1"),  # after the last entry: folds into it on the wire
    ])
    df = spark.createDataFrame([(bytearray(frame),)], "value binary")
    d = fx.decode_fix(df).select("fix.*").where("valid")
    e = fx.explode_groups(d, "fields", 268, 269)
    rows = e.select(
        fx.fix_field("entry", 269).alias("side"),
        fx.fix_field("entry", 270).alias("px"),
        fx.fix_field("entry", 271).alias("qty"),
        fx.fix_field("entry", 262).alias("tail"),
    ).collect()
    assert len(rows) == 2
    assert (rows[0]["side"], rows[0]["px"], rows[0]["qty"]) == ("0", "150.10", "500")
    assert (rows[1]["side"], rows[1]["px"], rows[1]["qty"]) == ("1", "150.20", "700")
    assert rows[0]["tail"] is None and rows[1]["tail"] == "REQ-1"
    # declared count caps the entries even if more delimiters follow
    frame2 = enc("W", 4, [
        (268, "1"),
        (269, "0"), (270, "1.0"),
        (269, "1"), (270, "2.0"),
    ])
    df2 = spark.createDataFrame([(bytearray(frame2),)], "value binary")
    d2 = fx.decode_fix(df2).select("fix.*").where("valid")
    assert fx.explode_groups(d2, "fields", 268, 269).count() == 1


def test_fix_field_first_and_all(spark):
    """FixMessage::field returns the FIRST value; fields_all every value
    in wire order (fix.rs:382-403)."""
    frame = enc("X", 9, [(279, "0"), (270, "1.5"), (279, "2"), (270, "2.5")])
    df = spark.createDataFrame([(bytearray(frame),)], "value binary")
    d = fx.decode_fix(df).select("fix.*")
    row = d.select(
        fx.fix_field("fields", 270).alias("first"),
        fx.fix_fields_all("fields", 270).alias("all"),
    ).collect()[0]
    assert row["first"] == "1.5"
    assert row["all"] == ["1.5", "2.5"]


def test_md_entries_table(spark):
    """W (snapshot, delimiter 269) and X (incremental, delimiter 279)
    normalize into one typed MD-entry table."""
    w = enc("W", 1, [
        (55, "AAPL"), (268, "2"),
        (269, "0"), (270, "150.10"), (271, "500"),
        (269, "1"), (270, "150.20"), (271, "700"),
    ])
    x = enc("X", 2, [
        (55, "AAPL"), (268, "2"),
        (279, "0"), (269, "0"), (270, "150.15"), (271, "300"),
        (279, "2"), (269, "1"), (270, "150.20"), (271, "0"),
    ])
    hb = enc("0", 3)  # non-MD message: excluded
    df = spark.createDataFrame([(bytearray(f),) for f in (w, x, hb)],
                               "value binary")
    out = fx.md_entries(fx.decode_fix(df)).orderBy("seq_num", "px").collect()
    assert len(out) == 4
    snap = [r for r in out if r["msg_type"] == "W"]
    inc = [r for r in out if r["msg_type"] == "X"]
    assert all(r["action"] == "new" for r in snap)
    assert {(r["entry_type"], str(r["px"])) for r in snap} == {
        ("bid", "150.100000"), ("ask", "150.200000")}
    assert {(r["action"], r["entry_type"]) for r in inc} == {
        ("new", "bid"), ("delete", "ask")}
    assert all(r["symbol"] == "AAPL" for r in out)


def test_decode_is_row_local_no_shuffle(spark):
    """Scale shape: the decode is one Arrow-batched projection — zero
    exchanges in the plan."""
    df = spark.createDataFrame([(bytearray(enc("0", i)),) for i in range(4)],
                               "value binary")
    plan = (
        fx.decode_fix(df).select("fix.msg_type")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan


def test_groups_split_is_pure_catalyst(spark):
    """r5 (VERDICT r4 task 8): the repeating-group split was the one
    Python loop on the codec path — it is now indexed higher-order
    functions + dynamic slice, so a groups read over an ALREADY-DECODED
    fields table plans with zero Python stages and zero exchanges."""
    fields = [
        [{"tag": 268, "val": "2"},
         {"tag": 269, "val": "0"}, {"tag": 270, "val": "150.10"},
         {"tag": 269, "val": "1"}, {"tag": 270, "val": "150.20"}],
    ]
    df = spark.createDataFrame(
        [(f,) for f in fields],
        "fields array<struct<tag:int,val:string>>",
    )
    out = df.select(fx.groups_col("fields", 268, 269).alias("g"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan, plan
    assert "Exchange" not in plan, plan
    g = out.collect()[0]["g"]
    assert [[(f["tag"], f["val"]) for f in e] for e in g] == [
        [(269, "0"), (270, "150.10")],
        [(269, "1"), (270, "150.20")],
    ]


def test_fix_to_book_feed_end_to_end(spark):
    """The reference's real BookUpdate pipeline (market.rs:603-651) from
    wire bytes to top-of-book: W snapshots carry Vec<Level> per side; X
    change batches apply ABSOLUTE level sizes in wire order under one
    MsgSeqNum (LevelChange, market.rs:501-519); the REST+WS race buffers
    pre-snapshot deltas; a seq gap makes the book unquotable."""
    from wingfoil_spark.operators.market import book_feed
    from wingfoil_spark.stream import Stream

    t = "20240627-11:17:2{s}"  # distinct second per message
    frames = [
        # X before the snapshot: buffered (seq 2 > snapshot seq 1: replays)
        enc("X", 2, [(55, "AAPL"), (268, "1"),
                     (279, "0"), (269, "0"), (270, "101"), (271, "9")],
            st=t.format(s=0)),
        # the snapshot: 2 bids + 1 ask
        enc("W", 1, [(55, "AAPL"), (268, "3"),
                     (269, "0"), (270, "100"), (271, "5"),
                     (269, "0"), (270, "99"), (271, "4"),
                     (269, "1"), (270, "103"), (271, "7")],
            st=t.format(s=1)),
        # one X message, one seq, THREE changes in wire order: set a better
        # bid, change it (absolute overwrite), delete the ask
        enc("X", 3, [(55, "AAPL"), (268, "3"),
                     (279, "0"), (269, "0"), (270, "102"), (271, "1"),
                     (279, "1"), (269, "0"), (270, "102"), (271, "6"),
                     (279, "2"), (269, "1"), (270, "103"), (271, "0")],
            st=t.format(s=2)),
        # seq gap (5 skips 4): unquotable
        enc("X", 5, [(55, "AAPL"), (268, "1"),
                     (279, "0"), (269, "0"), (270, "90"), (271, "1")],
            st=t.format(s=3)),
    ]
    df = spark.createDataFrame([(bytearray(f),) for f in frames],
                               "value binary")
    upd = fx.book_updates_from_fix(fx.decode_fix(df))
    s = Stream(upd, ts="ts", seq="seq", keys=("symbol",))
    out = (
        book_feed(s, order_col="__ord")
        .df.orderBy("ts")
        .collect()
    )
    # tick 1 (the snapshot instant): snapshot + replayed buffered delta
    # (seq 2 > 1) → best bid 101@9, levels {99,100,101}, ask 103@7
    r = out[0]
    assert (r["status"], r["best_bid"], r["bid_qty"]) == ("live", 101.0, 9.0)
    assert (r["best_ask"], r["ask_qty"]) == (103.0, 7.0)
    assert (r["n_bid_levels"], r["n_ask_levels"]) == (3, 1)
    # tick 2: the 3-change batch under one seq — ABSOLUTE overwrite to 6,
    # ask deleted; same-seq continuation is NOT a gap
    r = out[1]
    assert (r["status"], r["best_bid"], r["bid_qty"]) == ("live", 102.0, 6.0)
    assert r["best_ask"] is None and r["n_ask_levels"] == 0
    assert r["n_bid_levels"] == 4
    # tick 3: the gap → unquotable
    r = out[2]
    assert r["status"] == "gapped" and r["best_bid"] is None
    assert len(out) == 3


def test_book_feed_multilevel_snapshot_step():
    """Multi-level snapshot arrays (BookSnapshot Vec<Level>, market.rs:603)
    through the raw step — no Spark."""
    import pandas as pd

    from wingfoil_spark.operators.market import book_feed_step

    rows = [dict(ts=100, seq=1, kind="snapshot", side=None, price=None,
                 qty=None, bid_price=None, bid_qty=None, ask_price=None,
                 ask_qty=None,
                 bid_prices=[100.0, 99.0], bid_qtys=[5.0, 4.0],
                 ask_prices=[103.0], ask_qtys=[7.0])]
    _, out = book_feed_step(None, pd.DataFrame(rows))
    r = out.iloc[0]
    assert (r["best_bid"], r["bid_qty"], r["best_ask"], r["ask_qty"]) == \
        (100.0, 5.0, 103.0, 7.0)
    assert (r["n_bid_levels"], r["n_ask_levels"]) == (2, 1)


def test_fix_book_stream_duality(spark, tmp_path):
    """Run-mode duality for the FIX pipeline: readStream of framed
    messages → decode_fix → book_updates_from_fix → book_feed_op
    .run_stream equals the batch binding row-for-row (the codec stages
    are stateless projections; the book is a KeyedStateOp)."""
    import os

    from pyspark.sql import types as T

    from wingfoil_spark.operators.market import book_feed_op
    from wingfoil_spark.stream import Stream

    t = "20240627-11:17:2{s}"
    frames = [
        enc("W", 1, [(55, "AAPL"), (268, "2"),
                     (269, "0"), (270, "100"), (271, "5"),
                     (269, "1"), (270, "103"), (271, "7")],
            st=t.format(s=0)),
        enc("X", 2, [(55, "AAPL"), (268, "2"),
                     (279, "0"), (269, "0"), (270, "101"), (271, "2"),
                     (279, "1"), (269, "1"), (270, "103"), (271, "9")],
            st=t.format(s=1)),
        enc("X", 3, [(55, "AAPL"), (268, "1"),
                     (279, "2"), (269, "0"), (270, "101"), (271, "0")],
            st=t.format(s=2)),
        enc("X", 4, [(55, "AAPL"), (268, "1"),
                     (279, "0"), (269, "1"), (270, "102"), (271, "4")],
            st=t.format(s=3)),
    ]

    def pipeline(df):
        upd = fx.book_updates_from_fix(fx.decode_fix(df))
        op = book_feed_op([T.StructField("symbol", T.StringType())],
                          order_col="__ord")
        return op, upd

    bdf = spark.createDataFrame([(bytearray(f),) for f in frames],
                                "value binary")
    op, upd = pipeline(bdf)
    batch = op.run_batch(upd).toPandas()

    src = str(tmp_path / "fix_stream")
    os.makedirs(src, exist_ok=True)
    import pandas as pd
    for i, half in enumerate((frames[:2], frames[2:])):
        pd.DataFrame({"value": [bytes(f) for f in half]}).to_parquet(
            os.path.join(src, f"c{i:02d}.parquet"), index=False)
    sdf = spark.readStream.schema("value binary").option(
        "maxFilesPerTrigger", 1).parquet(src)
    op2, upd2 = pipeline(sdf)
    q = (
        op2.run_stream(upd2)
        .writeStream.format("memory").queryName("fix_book_twin")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    streamed = spark.sql("SELECT * FROM fix_book_twin").toPandas()

    key = ["symbol", "ts"]
    a = batch.sort_values(key).reset_index(drop=True)
    b = streamed[list(batch.columns)].sort_values(key).reset_index(drop=True)
    assert len(a) == len(b) == 4
    for c in batch.columns:
        x, y = a[c], b[c]
        assert ((x == y) | (x.isna() & y.isna())).all(), c


@pytest.mark.filterwarnings("ignore::hypothesis.errors.HypothesisWarning")
def test_groups_split_differential_vs_python_walk(spark):
    """Property (hypothesis): the Catalyst groups split equals the
    reference's imperative walk (fix.rs:437-475 — first count tag, starts
    at delimiters after it capped at the declared count, entries run to
    the next start / message end) on RANDOM tag sequences, including
    garbage counts, missing delimiters, and delimiters before the count
    tag."""
    from hypothesis import given, settings, strategies as st

    CT, DT = 268, 269

    def python_walk(pairs, declared_raw):
        count_at = next((i for i, (t, _) in enumerate(pairs) if t == CT), None)
        if count_at is None:
            return []
        try:
            declared = int(pairs[count_at][1])
        except ValueError:
            return []
        if declared <= 0:
            return []
        starts = [i for i, (t, _) in enumerate(pairs)
                  if t == DT and i > count_at][:declared]
        out = []
        for n, s in enumerate(starts):
            e = starts[n + 1] if n + 1 < len(starts) else len(pairs)
            out.append(pairs[s:e])
        return out

    tag = st.sampled_from([CT, DT, 270, 271, 55])
    val = st.sampled_from(["0", "1", "2", "3", "x", "150.10", ""])

    @settings(max_examples=25, deadline=None)
    @given(st.lists(st.tuples(tag, val), min_size=0, max_size=12))
    def prop(pairs):
        df = spark.createDataFrame(
            [([{"tag": t, "val": v} for t, v in pairs],)],
            "fields array<struct<tag:int,val:string>>",
        )
        got = df.select(fx.groups_col("fields", CT, DT).alias("g")) \
            .collect()[0]["g"]
        got = [[(f["tag"], f["val"]) for f in e] for e in got]
        assert got == python_walk(pairs, None), pairs

    prop()
