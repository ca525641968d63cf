"""ZMQ adapter wire codec (`WireMessage<T>` frames) over DataFrame columns.

Reference: ``adapters/zmq.rs:168-221`` — the bincode-framed envelope a
wingfoil ZMQ publisher/subscriber exchanges. The layout is **byte-compatible
with the legacy engine's ``channel::Message<T>``** and that is a wire
contract (zmq.rs:170-187): bincode 1.x legacy (fixed-width little-endian,
no varint), enum variant order IS the format, ``NanoTime`` is a u64 of
nanos. Variants, in pinned declaration order (zmq.rs:192-214):

===  ==================  =======================================
idx  variant             payload
===  ==================  =======================================
0    CheckPoint          NanoTime (u64 LE) — clock advance, no value
1    EndOfStream         none — clean publisher shutdown
2    HistoricalValue     (NanoTime, Vec<T>) — same-time burst, in order
3    Value               T — the only value variant a live pub emits
4    Error               String (u64-len utf8)
===  ==================  =======================================

Spark-first split, same shape as the FIX (:mod:`.fix`) and web
(:mod:`.wire`) tiers: the CODEC lives here — captured ZMQ frames (files,
a zmq→Kafka bridge, JDBC blobs) decode at data scale, Arrow-batched; the
live SUB/PUB socket tier (monitor events, etcd discovery, buffer
timeouts — zmq.rs:120-155, zmq/registry.rs) stays a protocol-gateway
non-goal. Decode failures are synthesized as ``Error`` rows, routed
through the same arm as a peer-sent ``Error`` — exactly the reference
subscriber's behavior (zmq.rs:209-213).

Byte layouts are replayed from the reference's own pins
(``wire_format_matches_legacy_message``, zmq.rs:735-772;
``historical_burst_decodes_to_every_value``, zmq.rs:777-793) in
tests/test_zmq_wire.py.

Element types: the reference's ``T`` is any serde type; a cross-engine
peer in practice sends primitives or serde tuples of them. Supported
``dtype``: ``u64`` / ``i64`` (8-byte LE int), ``f64`` (8-byte LE double),
``str`` (u64-length utf8), ``bytes`` (u64-length raw = ``Vec<u8>``),
``unit`` (zero bytes).
"""

from __future__ import annotations

import struct as _struct

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from wingfoil_spark.sources.wire import WireCodecError, _Reader

#: WireMessage variant indices — append-only legacy wire contract
_VARIANTS = {"CheckPoint": 0, "EndOfStream": 1, "HistoricalValue": 2,
             "Value": 3, "Error": 4}
_NAMES = {v: k for k, v in _VARIANTS.items()}

_DTYPES = ("u64", "i64", "f64", "str", "bytes", "unit")


def _check_dtype(dtype: str) -> str:
    if dtype not in _DTYPES:
        raise WireCodecError(f"wire codec: unknown element dtype {dtype!r} ({'|'.join(_DTYPES)})")
    return dtype


def _enc_elem(v, dtype: str) -> bytes:
    if dtype == "u64":
        return _struct.pack("<Q", int(v))
    if dtype == "i64":
        return _struct.pack("<q", int(v))
    if dtype == "f64":
        return _struct.pack("<d", float(v))
    if dtype == "str":
        b = str(v).encode("utf-8")
        return _struct.pack("<Q", len(b)) + b
    if dtype == "bytes":
        b = bytes(v)
        return _struct.pack("<Q", len(b)) + b
    return b""  # unit


def _dec_elem(r: _Reader, dtype: str):
    if dtype == "u64":
        return _struct.unpack("<Q", r.take(8, "element"))[0]
    if dtype == "i64":
        return _struct.unpack("<q", r.take(8, "element"))[0]
    if dtype == "f64":
        return _struct.unpack("<d", r.take(8, "element"))[0]
    if dtype == "str":
        return r.string("element")
    if dtype == "bytes":
        n = r.u64("element length")
        return r.take(n, "element")
    return None  # unit


def encode_message(kind: str, *, time_ns: int | None = None, value=None,
                   values=None, error: str | None = None,
                   dtype: str = "f64") -> bytes:
    """One ``WireMessage`` to frame bytes (legacy ``channel::Message``
    layout, zmq.rs:168-221)."""
    _check_dtype(dtype)
    if kind not in _VARIANTS:
        raise WireCodecError(f"wire codec: unknown WireMessage kind {kind!r}")
    out = _struct.pack("<I", _VARIANTS[kind])
    if kind == "CheckPoint":
        out += _struct.pack("<Q", int(time_ns))
    elif kind == "EndOfStream":
        pass
    elif kind == "HistoricalValue":
        vs = list(values if values is not None else [])
        out += _struct.pack("<Q", int(time_ns)) + _struct.pack("<Q", len(vs))
        for v in vs:
            out += _enc_elem(v, dtype)
    elif kind == "Value":
        out += _enc_elem(value, dtype)
    else:  # Error
        b = str(error or "").encode("utf-8")
        out += _struct.pack("<Q", len(b)) + b
    return out


def decode_message(frame: bytes, dtype: str = "f64") -> dict:
    """Frame bytes → ``{"kind", "time_ns", "values", "error"}``.

    ``Value(v)`` decodes to ``values=[v]`` and ``HistoricalValue`` to the
    whole burst IN ORDER (a realtime subscriber must fan same-time values
    back out rather than drop all but one — zmq.rs:777-779); the burst
    timestamp rides in ``time_ns``. Raises :class:`WireCodecError` on a
    corrupt frame — callers that mirror the subscriber turn that into a
    synthesized ``Error`` row (zmq.rs:209-213)."""
    _check_dtype(dtype)
    r = _Reader(bytes(frame))
    idx = r.u32("WireMessage variant")
    kind = _NAMES.get(idx)
    if kind is None:
        raise WireCodecError(f"wire codec: bincode decode: bad WireMessage variant {idx}")
    if kind == "CheckPoint":
        return {"kind": kind, "time_ns": r.u64("CheckPoint time"), "values": None, "error": None}
    if kind == "EndOfStream":
        return {"kind": kind, "time_ns": None, "values": None, "error": None}
    if kind == "HistoricalValue":
        tns = r.u64("HistoricalValue time")
        n = r.u64("Vec length")
        if n > len(frame):  # corrupt length cannot exceed the frame itself
            raise WireCodecError(f"wire codec: bincode decode: Vec length {n} exceeds frame")
        return {"kind": kind, "time_ns": tns,
                "values": [_dec_elem(r, dtype) for _ in range(n)], "error": None}
    if kind == "Value":
        return {"kind": kind, "time_ns": None, "values": [_dec_elem(r, dtype)], "error": None}
    return {"kind": kind, "time_ns": None, "values": None, "error": r.string("Error message")}


def end_of_stream_bytes() -> bytes:
    """Payload-free teardown frame — identical for every element type
    (zmq.rs:216-221)."""
    return encode_message("EndOfStream")


# ---------------------------------------------------------------------------
# DataFrame tier
# ---------------------------------------------------------------------------

_SPARK_ELEM = {"u64": T.LongType(), "i64": T.LongType(), "f64": T.DoubleType(),
               "str": T.StringType(), "bytes": T.BinaryType(), "unit": T.NullType()}


def zmq_struct(dtype: str) -> T.StructType:
    return T.StructType([
        T.StructField("valid", T.BooleanType()),
        T.StructField("kind", T.StringType()),
        T.StructField("time_ns", T.LongType()),
        T.StructField("values", T.ArrayType(_SPARK_ELEM[dtype])),
        T.StructField("error", T.StringType()),
    ])


def decode_zmq(df: DataFrame, col: str = "value", dtype: str = "f64",
               out: str = "msg") -> DataFrame:
    """Decode captured ZMQ frames, Arrow-batched. A frame that fails to
    decode becomes a synthesized ``Error`` row (``valid=false``) routed
    through the same ``kind`` column as a peer-sent ``Error`` — the
    reference subscriber's exact recovery (zmq.rs:209-213), so one corrupt
    row in a 100 TB capture never kills the decode."""
    _check_dtype(dtype)

    @F.pandas_udf(zmq_struct(dtype))
    def _udf(raw: pd.Series) -> pd.DataFrame:
        rows = []
        for b in raw:
            if b is None:
                rows.append((False, "Error", None, None, "wire codec: null frame"))
                continue
            try:
                m = decode_message(bytes(b), dtype)
                tns = m["time_ns"]
                if tns is not None and tns >= 1 << 63:
                    rows.append((False, "Error", None, None,
                                 f"wire codec: time_ns {tns} exceeds i64"))
                    continue
                rows.append((m["kind"] != "Error", m["kind"], tns, m["values"], m["error"]))
            except WireCodecError as e:
                rows.append((False, "Error", None, None, str(e)))
        return pd.DataFrame(rows, columns=["valid", "kind", "time_ns", "values", "error"])

    return df.withColumn(out, _udf(F.col(col)))


def zmq_values(df: DataFrame, msg: str = "msg", out: str = "v",
               seq: str = "__seq") -> DataFrame:
    """Value-bearing frames → one row per value, burst order preserved.

    ``Value`` frames are one-element bursts; ``HistoricalValue`` bursts
    fan out in wire order with their shared ``time_ns`` and a ``seq``
    within the instant (zmq.rs:777-793) — Stream-ready. ``CheckPoint`` /
    ``EndOfStream`` / ``Error`` rows carry no value and drop here; route
    them beforehand via the ``kind`` column (the data/status split of
    zmq.rs:305-311)."""
    has_vals = F.col(f"{msg}.kind").isin("Value", "HistoricalValue")
    return (
        df.where(has_vals)
        .select("*", F.posexplode(F.col(f"{msg}.values")).alias(seq, out))
    )
