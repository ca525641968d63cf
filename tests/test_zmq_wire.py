"""ZMQ wire codec: byte layouts replayed from the reference's own pins
(adapters/zmq.rs:735-793) plus the DataFrame decode/fan-out tier."""

import struct

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from wingfoil_spark.sources import zmq_wire as zw
from wingfoil_spark.sources.wire import WireCodecError


def test_wire_format_matches_legacy_message():
    # zmq.rs:735-772 — the legacy channel::Message byte contract, pinned
    # value-for-value. Variant order IS the wire format.
    value = zw.encode_message("Value", value=7, dtype="u64")
    assert value == bytes([3, 0, 0, 0, 7, 0, 0, 0, 0, 0, 0, 0])

    assert zw.end_of_stream_bytes() == bytes([1, 0, 0, 0])

    checkpoint = zw.encode_message("CheckPoint", time_ns=42)
    assert checkpoint == bytes([0, 0, 0, 0, 42, 0, 0, 0, 0, 0, 0, 0])

    historical = zw.encode_message("HistoricalValue", time_ns=1, values=[9], dtype="u64")
    assert historical == bytes(
        [2, 0, 0, 0,
         1, 0, 0, 0, 0, 0, 0, 0,   # NanoTime(1)
         1, 0, 0, 0, 0, 0, 0, 0,   # Vec len 1
         9, 0, 0, 0, 0, 0, 0, 0]   # values[0]
    )

    error = zw.encode_message("Error", error="bad")
    assert error == bytes([4, 0, 0, 0, 3, 0, 0, 0, 0, 0, 0, 0]) + b"bad"


def test_historical_burst_decodes_to_every_value():
    # zmq.rs:777-793 — same-time burst fans back out in order
    b = zw.encode_message("HistoricalValue", time_ns=5, values=[1, 2, 3], dtype="u64")
    m = zw.decode_message(b, "u64")
    assert m == {"kind": "HistoricalValue", "time_ns": 5, "values": [1, 2, 3], "error": None}


@pytest.mark.parametrize("dtype,vals", [
    ("u64", [0, 7, (1 << 63) - 1]),
    ("i64", [-5, 0, 9]),
    ("f64", [-1.5, 0.0, 2.25]),
    ("str", ["", "hé", "x" * 100]),
    ("bytes", [b"", b"\x00\x01\xff"]),
])
def test_roundtrip_every_dtype(dtype, vals):
    for v in vals:
        m = zw.decode_message(zw.encode_message("Value", value=v, dtype=dtype), dtype)
        assert m["kind"] == "Value" and m["values"] == [v]
    burst = zw.encode_message("HistoricalValue", time_ns=9, values=vals, dtype=dtype)
    assert zw.decode_message(burst, dtype)["values"] == list(vals)


def test_corrupt_frames_rejected():
    with pytest.raises(WireCodecError, match="variant"):
        zw.decode_message(struct.pack("<I", 99))
    with pytest.raises(WireCodecError, match="EOF"):
        zw.decode_message(bytes([3, 0, 0, 0, 1]))  # truncated Value payload
    # corrupt Vec length must not allocate/loop
    bad = struct.pack("<I", 2) + struct.pack("<Q", 1) + struct.pack("<Q", 1 << 40)
    with pytest.raises(WireCodecError):
        zw.decode_message(bad)


def test_dataframe_decode_synthesizes_error_rows(spark):
    # decode failure routes through the same Error arm a peer uses
    # (zmq.rs:209-213): valid=false, kind='Error', error message kept
    frames = [
        (zw.encode_message("CheckPoint", time_ns=10),),
        (zw.encode_message("Value", value=1.5),),
        (zw.encode_message("HistoricalValue", time_ns=20, values=[2.0, 3.0]),),
        (b"\xff\xff",),
        (zw.end_of_stream_bytes(),),
    ]
    df = spark.createDataFrame(frames, T.StructType([T.StructField("value", T.BinaryType())]))
    dec = zw.decode_zmq(df)
    rows = dec.collect()
    assert [r.msg.kind for r in rows] == [
        "CheckPoint", "Value", "HistoricalValue", "Error", "EndOfStream"]
    assert [r.msg.valid for r in rows] == [True, True, True, False, True]
    assert "wire codec" in rows[3].msg.error

    # burst fan-out in order; clock/teardown/error frames carry no value
    vals = zw.zmq_values(dec).select(
        F.col("msg.time_ns").alias("tns"), "__seq", "v")
    got = [tuple(r) for r in vals.collect()]
    assert got == [(None, 0, 1.5), (20, 0, 2.0), (20, 1, 3.0)]
    # the fan-out itself is pure Catalyst (posexplode, no extra Python)
    plan = vals._jdf.queryExecution().executedPlan().toString()
    assert "posexplode" in plan
