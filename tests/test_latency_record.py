"""The cross-process latency record goldens — the Python binding's
Latency / TracedBytes surface and its wire header, replayed from
wingfoil-python/tests/test_latency.py (itself the legacy parity port).
The in-pipeline column stamping tier is tests/test_latency.py here."""

import pytest

from wingfoil_spark.operators.latency import Latency, TracedBytes, decode_traced


def test_a_new_record_is_unstamped():
    """test_latency.py:55-59."""
    record = Latency(["a", "b", "c"])
    assert record.stages == ["a", "b", "c"]
    assert record.stamps == [0, 0, 0]


def test_stamps_are_addressed_by_stage_name():
    """test_latency.py:62-69."""
    record = Latency(["a", "b"])
    record["b"] = 7
    assert record["b"] == 7 and record["a"] == 0
    with pytest.raises(KeyError):
        _ = record["missing"]
    with pytest.raises(KeyError):
        record["missing"] = 5


def test_repr_names_every_stage():
    """test_latency.py:72-76 + the carrier repr :139-142."""
    assert repr(Latency(["s1", "s2"])) == "Latency(s1=0, s2=0)"
    assert "Latency(s1=0, s2=0)" in repr(TracedBytes(b"x", Latency(["s1", "s2"])))


def test_invalid_stage_lists_raise():
    """test_latency.py:79-86 + :160-163 (deviation 5: from_bytes
    validates the stage list, not just the byte length)."""
    with pytest.raises(ValueError):
        Latency([])
    with pytest.raises(ValueError):
        Latency(["a", "a"])
    with pytest.raises(ValueError):
        Latency.from_bytes(b"\x00" * 16, ["a", "a"])


def test_the_wire_header_round_trips():
    """test_latency.py:97-108: 8 LE bytes per stage."""
    record = Latency(["a", "b"])
    record["a"] = 12345
    record["b"] = 67890
    data = record.to_bytes()
    assert isinstance(data, bytes) and len(data) == 16
    restored = Latency.from_bytes(data, ["a", "b"])
    assert restored.stamps == [12345, 67890]
    assert restored["a"] == 12345


def test_a_trailing_payload_does_not_disturb_the_header():
    """test_latency.py:110-116 — the adapter shape: header, then body."""
    record = Latency(["a"])
    record["a"] = 99
    restored = Latency.from_bytes(record.to_bytes() + b"body", ["a"])
    assert restored.stamps == [99]


def test_a_short_header_raises():
    """test_latency.py:118-120."""
    with pytest.raises(ValueError):
        Latency.from_bytes(b"\x00" * 4, ["a", "b"])


def test_the_record_is_shared_not_copied():
    """test_latency.py:144-150: stamping through the carrier mutates the
    caller's record in place."""
    record = Latency(["s"])
    message = TracedBytes(b"x", record)
    message.latency["s"] = 5
    assert record["s"] == 5


def test_traced_bytes_round_trip():
    """carrier egress/ingress: header + body split back exactly."""
    rec = Latency(["in", "out"])
    rec["in"] = 1
    rec["out"] = 2
    msg = TracedBytes(b"hello world", rec)
    back = TracedBytes.from_bytes(msg.to_bytes(), ["in", "out"])
    assert back.payload == b"hello world"
    assert back.latency.stamps == [1, 2]


def test_decode_traced_at_data_scale(spark):
    """Captured TracedBytes decode to per-stage stamp columns + payload
    in one Arrow-batched row-local stage."""
    stages = ["ingress", "parse"]
    rows = []
    for i in range(6):
        r = Latency(stages)
        r["ingress"] = 1000 + i
        r["parse"] = 2000 + i
        rows.append((i, TracedBytes(f"m{i}".encode(), r).to_bytes()))
    df = spark.createDataFrame(rows, "id long, raw binary")
    out = decode_traced(df, "raw", stages).orderBy("id").collect()
    for i, r in enumerate(out):
        assert r.ingress == 1000 + i and r.parse == 2000 + i
        assert bytes(r.payload) == f"m{i}".encode()


def test_stamp_disabled_wires_nothing(spark):
    """test_latency.py:189-194: a disabled stamp leaves the plan and the
    frame untouched (identical object — zero cost, not just zero rows)."""
    from wingfoil_spark.operators.latency import stamp
    from wingfoil_spark.sources.tables import replay_rows

    s = replay_rows(spark, [(0, 0, 1.0)], "ts long, seq long, value double",
                    ts="ts", seq="seq")
    assert stamp(s, "start", enabled=False) is s
    out = stamp(stamp(s, "off", enabled=False), "on", enabled=True)
    row = out.df.collect()[0]
    assert [e.stage for e in row["__stamps"]] == ["on"]
