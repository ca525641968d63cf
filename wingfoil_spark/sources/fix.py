"""FIX 4.4 tag=value message codec over DataFrame columns.

Reference: ``adapters/fix.rs`` (4,377 LoC). That adapter is three tiers:
(1) the wire CODEC — framing, checksum, tag=value decode with
length-delimited data fields, repeating groups (fix.rs:1065-1210,
356-495); (2) the SESSION layer — logon/heartbeat/resend/seq-num stores
(fix.rs:497-1060); (3) TRANSPORT — TCP/TLS connect/accept
(fix.rs:2787-2967). Spark-first split of those tiers:

- The CODEC is implemented HERE, over columns: a venue's captured FIX
  logs (one framed message per row — files, Kafka values, JDBC blobs)
  decode at data scale, Arrow-batched, with the reference's exact framing
  semantics (body-length framing, not trailer scan; checksum validation;
  data fields that may contain SOH are length-delimited by their
  preceding length tag — fix.rs:1092-1124). Field access and repeating
  groups are pure Catalyst where possible (:func:`fix_field` /
  :func:`fix_fields_all` are higher-order array expressions).
- The SESSION + TRANSPORT tiers remain protocol-gateway NON-GOALS
  (COVERAGE.md §2.8): a live FIX session is a low-latency stateful
  socket conversation (logon handshakes, heartbeats, resend windows) —
  the standard architecture bridges it to Kafka and lets Spark consume
  the bridge; this module decodes what arrives.

Codec behaviors are replayed from the reference's own tests
(fix.rs:3339-3430) in tests/test_fix_codec.py: framing uses BodyLength
(not a trailer scan), corrupt checksums are rejected, a BodyLength that
misses the trailer is rejected, encode→decode roundtrips, and SOH-bearing
data fields survive.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

SOH = b"\x01"

#: standard header/trailer tags excluded from application fields
#: (fix.rs:341-350)
HEADER_TAGS = frozenset({8, 9, 35, 49, 56, 34, 52, 10})

#: FIX 4.4 length-delimited data fields, (data tag → its length tag): the
#: value may contain ANY byte, SOH included, so it is delimited by the
#: immediately preceding length field (fix.rs:1092-1124)
DATA_FIELDS = {
    91: 90, 96: 95, 213: 212, 349: 348, 351: 350, 353: 352, 355: 354,
    357: 356, 359: 358, 361: 360, 363: 362, 365: 364, 446: 445, 619: 618,
    622: 621,
}

#: decoded-message struct: valid frames carry msg_type/seq/sending time in
#: µs and the application fields in WIRE ORDER (groups are positional)
FIX_STRUCT = T.StructType([
    T.StructField("valid", T.BooleanType()),
    T.StructField("error", T.StringType()),
    T.StructField("msg_type", T.StringType()),
    T.StructField("seq_num", T.LongType()),
    T.StructField("sending_time_us", T.LongType()),
    T.StructField("fields", T.ArrayType(T.StructType([
        T.StructField("tag", T.IntegerType()),
        T.StructField("val", T.StringType()),
    ]))),
])


def _decode_fields(data: bytes) -> list[tuple[int, str]]:
    """tag=value walk with data-field length handling (fix.rs:1125-1178).
    A data field's length comes from the field before it; otherwise values
    end at SOH. Unparseable tags are skipped; binary values decode lossy
    rather than empty."""
    fields: list[tuple[int, str]] = []
    pos = 0
    n = len(data)
    while pos < n:
        eq = data.find(b"=", pos)
        if eq < 0:
            break
        try:
            tag = int(data[pos:eq])
        except ValueError:
            pos = eq + 1
            continue
        declared = None
        len_tag = DATA_FIELDS.get(tag)
        if len_tag is not None and fields and fields[-1][0] == len_tag:
            try:
                declared = int(fields[-1][1])
            except ValueError:
                declared = None
        if declared is not None and eq + 1 + declared <= n:
            value_end = eq + 1 + declared
            nxt = value_end + 1
        else:
            soh = data.find(SOH, eq + 1)
            if soh < 0:
                break
            value_end = soh
            nxt = soh + 1
        fields.append((tag, data[eq + 1:value_end].decode("utf-8", "replace")))
        pos = nxt
    return fields


def _parse_sending_time_us(value: str) -> int:
    """``YYYYMMDD-HH:MM:SS[.fff[fff[fff]]]`` → µs since epoch; 0 for an
    absent/bad value (a bad timestamp on an otherwise valid
    ExecutionReport should not cost the fill — fix.rs:1179-1196).
    Nanosecond precision truncates to µs (engine time is µs here)."""
    from datetime import datetime, timezone

    base, _, frac = value.partition(".")
    try:
        dt = datetime.strptime(base, "%Y%m%d-%H:%M:%S").replace(
            tzinfo=timezone.utc
        )
    except ValueError:
        return 0
    us = int(dt.timestamp()) * 1_000_000
    if frac:
        if not frac.isdigit():
            return 0
        us += int(frac.ljust(9, "0")[:9]) // 1000
    return us


def _decode_one(raw) -> tuple:
    """Frame + decode one message. Framing uses BodyLength, never a
    trailer scan (fix.rs:3346); the checksum is the byte sum of everything
    before the ``10=`` field mod 256 (fix.rs:1087)."""
    if raw is None:
        return (False, "null input", None, None, None, None)
    data = raw if isinstance(raw, (bytes, bytearray)) else str(raw).encode("latin-1")
    data = bytes(data)
    if not data.startswith(b"8=FIX"):
        return (False, "malformed message header", None, None, None, None)
    soh1 = data.find(SOH)
    if soh1 < 0 or not data[soh1 + 1:].startswith(b"9="):
        return (False, "malformed message header", None, None, None, None)
    soh2 = data.find(SOH, soh1 + 1)
    if soh2 < 0:
        return (False, "malformed message header", None, None, None, None)
    try:
        body_len = int(data[soh1 + 3:soh2])
    except ValueError:
        return (False, "malformed message header", None, None, None, None)
    body_start = soh2 + 1
    trailer_at = body_start + body_len
    # BodyLength must land exactly on the 10= trailer (fix.rs:3395)
    if not data[trailer_at:].startswith(b"10="):
        return (False, "BodyLength does not match the frame",
                None, None, None, None)
    trailer_end = data.find(SOH, trailer_at)
    if trailer_end < 0:
        return (False, "BodyLength does not match the frame",
                None, None, None, None)
    declared_ck = data[trailer_at + 3:trailer_end]
    computed = sum(data[:trailer_at]) % 256
    try:
        ok = int(declared_ck) == computed
    except ValueError:
        ok = False
    if not ok:
        return (False, "CheckSum mismatch", None, None, None, None)

    all_fields = _decode_fields(data[:trailer_at])
    msg_type = next((v for t, v in all_fields if t == 35), None)
    if msg_type is None:
        # framed and checksum-clean but with no MsgType (fix.rs:1408):
        # structurally valid, semantically unusable
        return (False, "missing MsgType", None, None, None, None)
    seq = 0
    for t, v in all_fields:
        if t == 34:
            try:
                seq = int(v)
            except ValueError:
                seq = 0
            break
    st = next((v for t, v in all_fields if t == 52), None)
    st_us = _parse_sending_time_us(st) if st is not None else 0
    app = [(t, v) for t, v in all_fields if t not in HEADER_TAGS]
    return (True, None, msg_type, seq, st_us, app)


@F.pandas_udf(FIX_STRUCT)
def _decode_udf(raw: pd.Series) -> pd.DataFrame:
    rows = [_decode_one(r) for r in raw]
    return pd.DataFrame(
        rows,
        columns=["valid", "error", "msg_type", "seq_num", "sending_time_us",
                 "fields"],
    )


def decode_fix(df: DataFrame, col: str = "value", out: str = "fix") -> DataFrame:
    """Decode a column of framed FIX messages (binary or string, one
    message per row — the captured-log shape) into a ``FIX_STRUCT``
    column. Row-local, Arrow-batched — no shuffle; scales with the scan."""
    return df.withColumn(out, _decode_udf(F.col(col)))


def fix_field(fields, tag: int):
    """FIRST value for ``tag`` (FixMessage::field, fix.rs:382-392) — pure
    Catalyst. For a tag inside a repeating group this returns only the
    first entry's value; use :func:`explode_groups` to keep entries
    correlated."""
    col = F.col(fields) if isinstance(fields, str) else fields
    # try_element_at: an absent tag is NULL, not an ANSI index error
    return F.try_element_at(F.filter(col, lambda f: f.tag == F.lit(tag)),
                            F.lit(1)).val


def fix_fields_all(fields, tag: int):
    """Every value for ``tag`` in wire order (fields_all, fix.rs:394-403)
    — the flat way to read one tag out of a repeating group."""
    col = F.col(fields) if isinstance(fields, str) else fields
    return F.transform(
        F.filter(col, lambda f: f.tag == F.lit(tag)), lambda f: f.val
    )


_GROUPS_SCHEMA = T.ArrayType(FIX_STRUCT["fields"].dataType)


def groups_col(fields, count_tag: int, delimiter_tag: int):
    """Split a repeating group into entries (FixMessage::groups,
    fix.rs:437-475): entries start at each ``delimiter_tag`` after the
    ``count_tag``, capped at the declared count; each entry runs to the
    next delimiter, the LAST to the end of the message (the wire does not
    delimit it — fix.rs:428-435). Returns array<array<struct<tag,val>>>.

    Pure Catalyst (VERDICT r4 task 8 — this was the one Python loop on
    the codec path): positions come from indexed ``transform``/``filter``
    higher-order functions, entries from dynamic ``slice``; everything
    stays inside whole-stage codegen."""
    ct, dt = count_tag, delimiter_tag
    col = F.col(fields) if isinstance(fields, str) else fields
    # 1-based position of the FIRST count_tag (0 = absent), and its value
    # parsed as the declared entry count (NULL on garbage, like the
    # reference's failed parse)
    count_at = F.array_position(
        F.transform(col, lambda f: f.tag), F.lit(ct)
    )
    declared = (
        F.try_element_at(
            F.filter(col, lambda f: f.tag == F.lit(ct)), F.lit(1)
        ).val.try_cast("int")
    )
    # 1-based positions of delimiters strictly after the count tag,
    # capped at the declared count
    starts = F.slice(
        F.filter(
            F.transform(
                col,
                lambda f, i: F.when(
                    (f.tag == F.lit(dt)) & (i + 1 > count_at), i + 1
                ),
            ),
            lambda x: x.isNotNull(),
        ),
        F.lit(1),
        declared,
    )
    # entry n spans [starts[n], starts[n+1]) — the last runs to the end
    entries = F.transform(
        starts,
        lambda s, n: F.slice(
            col,
            s.cast("int"),
            (
                F.coalesce(
                    F.try_element_at(starts, (n + 2).cast("int")),
                    F.size(col).cast("bigint") + 1,
                )
                - s
            ).cast("int"),
        ),
    )
    empty = F.array().cast(_GROUPS_SCHEMA)
    return F.when(
        col.isNotNull() & (count_at > 0) & declared.isNotNull()
        & (declared > 0),
        entries,
    ).otherwise(empty)


def explode_groups(df: DataFrame, fields: str, count_tag: int,
                   delimiter_tag: int, out: str = "entry") -> DataFrame:
    """One row per repeating-group entry: ``out`` is the entry's fields
    (array<struct<tag,val>>), readable with :func:`fix_field`.
    ``explode`` (not _outer): messages without the group drop, matching
    the reference's empty-Vec return."""
    return df.withColumn(
        out, F.explode(groups_col(fields, count_tag, delimiter_tag))
    )


def encode_fix(msg_type, sender, target, seq, sending_time, fields):
    """Encode one framed FIX message per row (encode_message,
    fix.rs:1065-1090): header 8,9 then body 35,49,56,34,52 + application
    fields in order, then the computed 3-digit checksum. ``fields`` is an
    array<struct<tag,val>> column; ``sending_time`` a string column in FIX
    format. Returns BINARY (frames may carry SOH in data fields)."""

    @F.pandas_udf(T.BinaryType())
    def enc(mt: pd.Series, sn: pd.Series, tg: pd.Series, sq: pd.Series,
            st: pd.Series, fs: pd.Series) -> pd.Series:
        out = []
        for i in range(len(mt)):
            body = bytearray()
            for tag, val in [(35, mt[i]), (49, sn[i]), (56, tg[i]),
                             (34, str(int(sq[i]))), (52, st[i])]:
                body += f"{tag}={val}".encode("latin-1") + SOH
            for f in (fs[i] if fs[i] is not None else []):
                body += (f"{int(f['tag'])}=".encode("latin-1")
                         + str(f["val"]).encode("latin-1") + SOH)
            frame = bytearray(b"8=FIX.4.4" + SOH)
            frame += f"9={len(body)}".encode("latin-1") + SOH
            frame += body
            ck = sum(frame) % 256
            frame += f"10={ck:03d}".encode("latin-1") + SOH
            out.append(bytes(frame))
        return pd.Series(out)

    cols = [F.col(c) if isinstance(c, str) else c
            for c in (msg_type, sender, target, seq, sending_time, fields)]
    return enc(*cols)


def md_entries(decoded: DataFrame, fix_col: str = "fix") -> DataFrame:
    """Normalized market-data entry table from MarketDataSnapshot (W) /
    IncrementalRefresh (X) messages — the typed MD vocabulary the
    reference builds in adapters/market.rs: one row per MDEntry with
    (sending_time_us, seq_num, symbol, msg_type, action, entry_type,
    px, qty).

    Group delimiters per FIX 4.4: W groups on 269 (MDEntryType), X groups
    on 279 (MDUpdateAction); both count with 268 (NoMDEntries). Snapshot
    rows carry action 'new' by definition. Feeding the incremental (X)
    stream into the order book requires the venue's size convention
    (absolute level size vs delta) — compose with
    ``operators.market`` accordingly; snapshot (W) feeds map directly
    (epoch-clearing snapshot + per-level sets)."""
    fx = F.col(fix_col)
    base = decoded.where(fx.valid & fx.msg_type.isin("W", "X")).select(
        fx.sending_time_us.alias("sending_time_us"),
        fx.seq_num.alias("seq_num"),
        fx.msg_type.alias("msg_type"),
        fix_field(fx.fields, 55).alias("symbol"),
        fx.fields.alias("__fields"),
    )
    w = explode_groups(base.where(F.col("msg_type") == "W"),
                       "__fields", 268, 269)
    x = explode_groups(base.where(F.col("msg_type") == "X"),
                       "__fields", 268, 279)
    act = fix_field(F.col("entry"), 279)
    action = (
        F.when(F.col("msg_type") == "W", F.lit("new"))
        .when(act == "0", "new").when(act == "1", "change")
        .when(act == "2", "delete").otherwise(act)
    )
    et = fix_field(F.col("entry"), 269)
    entry_type = (
        F.when(et == "0", "bid").when(et == "1", "ask")
        .when(et == "2", "trade").otherwise(et)
    )
    out_cols = [
        "sending_time_us", "seq_num", "symbol",
        "msg_type",
        action.alias("action"),
        entry_type.alias("entry_type"),
        fix_field(F.col("entry"), 270).cast("decimal(18,6)").alias("px"),
        fix_field(F.col("entry"), 271).cast("decimal(18,2)").alias("qty"),
    ]
    return w.select(*out_cols).unionByName(x.select(*out_cols))


def book_updates_from_fix(decoded: DataFrame, fix_col: str = "fix") -> DataFrame:
    """Decoded FIX W/X messages → the feed-handler book-update stream
    consumed by ``operators.market.book_feed`` — the reference's real
    BookUpdate pipeline (market.rs:603-651) end to end:

    - one MarketDataSnapshot (W) → ONE ``kind='snapshot'`` row carrying
      the full per-side level arrays (BookSnapshot's Vec<Level>);
    - one IncrementalRefresh (X) → one ``kind='delta'`` row per MDEntry,
      all sharing the message's MsgSeqNum (BookDelta.changes under one
      sequencing — book_feed_step accepts same-seq rows as one batch);
      qty is the ABSOLUTE new size (LevelChange, market.rs:501-519), and
      a delete (279=2) maps to qty 0 = level removal.

    Level extraction is pure Catalyst over the grouped entries. Output:
    (symbol, ts, seq, __ord, kind, side, price, qty, bid_prices,
    bid_qtys, ask_prices, ask_qtys) — ``__ord`` (seq·2²⁰ + entry index)
    keeps a change batch's wire order through Spark's unstable partition
    sort; feed ``Stream(..., ts='ts', seq='seq', keys=('symbol',))`` into
    ``market.book_feed(s, order_col='__ord')``."""
    fx_ = F.col(fix_col)
    base = decoded.where(fx_.valid & fx_.msg_type.isin("W", "X")).select(
        fx_.sending_time_us.alias("ts"),
        fx_.seq_num.alias("seq"),
        fx_.msg_type.alias("msg_type"),
        fix_field(fx_.fields, 55).alias("symbol"),
        fx_.fields.alias("__fields"),
    )

    def _levels(entries, et: str, what: int):
        side_of = lambda e: fix_field(e, 269)  # noqa: E731
        return F.transform(
            F.filter(entries, lambda e: side_of(e) == et),
            lambda e: fix_field(e, what).cast("double"),
        )

    w_ent = groups_col("__fields", 268, 269)
    w = base.where(F.col("msg_type") == "W").select(
        "symbol", "ts", "seq",
        (F.col("seq") * (1 << 20)).alias("__ord"),
        F.lit("snapshot").alias("kind"),
        F.lit(None).cast("string").alias("side"),
        F.lit(None).cast("double").alias("price"),
        F.lit(None).cast("double").alias("qty"),
        _levels(w_ent, "0", 270).alias("bid_prices"),
        _levels(w_ent, "0", 271).alias("bid_qtys"),
        _levels(w_ent, "1", 270).alias("ask_prices"),
        _levels(w_ent, "1", 271).alias("ask_qtys"),
    )
    xe = base.where(F.col("msg_type") == "X").select(
        "symbol", "ts", "seq",
        F.posexplode(groups_col("__fields", 268, 279)).alias("pos", "entry"),
    )
    e = F.col("entry")
    is_del = fix_field(e, 279) == "2"
    none_arr = F.lit(None).cast("array<double>")
    x = xe.select(
        "symbol", "ts", "seq",
        (F.col("seq") * (1 << 20) + F.col("pos")).alias("__ord"),
        F.lit("delta").alias("kind"),
        F.when(fix_field(e, 269) == "0", "bid").otherwise("ask").alias("side"),
        fix_field(e, 270).cast("double").alias("price"),
        F.when(is_del, F.lit(0.0))
        .otherwise(fix_field(e, 271).cast("double")).alias("qty"),
        none_arr.alias("bid_prices"), none_arr.alias("bid_qtys"),
        none_arr.alias("ask_prices"), none_arr.alias("ask_qtys"),
    )
    return w.unionByName(x)
