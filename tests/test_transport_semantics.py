"""aeron / iceoryx2 portable-tier semantics, replayed from the
reference's own mock-backend tests (no media driver / shared memory
needed there either): channel.rs URI builders, aeron_adapter.rs
fragment→burst + status contracts, iceoryx2_adapter.rs wiring guards and
the service contract."""

import struct

import pytest

from wingfoil_spark.sources import transport as tp


# ----------------------------------------------------------- channel URIs


def test_channel_uri_shapes():
    """channel.rs tests: the four canonical shapes."""
    assert tp.ChannelUri.ipc() == "aeron:ipc"
    assert tp.ChannelUri.udp("127.0.0.1:40123") == \
        "aeron:udp?endpoint=127.0.0.1:40123"
    assert tp.ChannelUri.udp("[::1]:40123") == \
        "aeron:udp?endpoint=[::1]:40123"
    assert tp.ChannelUri.udp("aeron-host.example.com:40123") == \
        "aeron:udp?endpoint=aeron-host.example.com:40123"
    assert tp.ChannelUri.mdc_publication("127.0.0.1:40456") == \
        "aeron:udp?control=127.0.0.1:40456|control-mode=dynamic"
    assert tp.ChannelUri.mdc_subscription("127.0.0.1:40789",
                                          "127.0.0.1:40456") == \
        ("aeron:udp?endpoint=127.0.0.1:40789|control=127.0.0.1:40456"
         "|control-mode=dynamic")


@pytest.mark.parametrize("bad", [
    "",                      # empty endpoint
    "host|evil:1",           # pipe (Aeron separator)
    "host?x:1",              # question mark
    "host=1:1",              # equals
    "host#1:1",              # hash
    "host 1:1",              # space
    "host,1:1",              # comma
    "host;1:1",              # semicolon
    "höst:1",           # non-ASCII
    "host​:1",          # zero-width space
    "hostonly",              # no colon
    "::1:40123",             # bare IPv6 (ambiguous)
    "host:70000",            # port > u16
    "host:abc",              # non-numeric port
    ":40123",                # empty host
    "[::1:40123",            # unclosed bracket
    "[::1]40123",            # bracket without :port
    "[nope]:1",              # invalid IPv6 in brackets
])
def test_channel_uri_rejects_invalid_endpoints(bad):
    """channel.rs error tests (the full rejection matrix)."""
    with pytest.raises(tp.TransportError):
        tp.ChannelUri.udp(bad)


def test_channel_uri_mdc_rejects_empty_params():
    with pytest.raises(tp.TransportError):
        tp.ChannelUri.mdc_publication("")
    with pytest.raises(tp.TransportError):
        tp.ChannelUri.mdc_subscription("", "127.0.0.1:1")
    with pytest.raises(tp.TransportError):
        tp.ChannelUri.mdc_subscription("127.0.0.1:1", "")


def test_transport_error_display_strings():
    """error.rs:31-41 display contract."""
    assert str(tp.TransportError("backpressure")) == "Back-pressure: buffer full"
    assert str(tp.TransportError("connection", "x")) == "Connection error: x"
    assert str(tp.TransportError("backend", "y")) == "Backend error: y"
    assert str(tp.TransportError("invalid", "z")) == "Invalid operation: z"


# --------------------------------------------- subscriber fragments→bursts


def _le64(v: int) -> bytes:
    return struct.pack("<q", v)


def _make_i64_parser():
    """The reference tests' i64 parser: wrong length → None (skip).
    Built as a NESTED function so cloudpickle ships it by value — a
    module-level test function would pickle by reference, and executor
    workers don't import test modules."""

    def parse(b: bytes):
        return struct.unpack("<q", b)[0] if len(b) == 8 else None

    return parse


_i64_parser = _make_i64_parser()


def _frames(spark, batches):
    rows = [
        (cyc, i, bytearray(p))
        for cyc, batch in enumerate(batches)
        for i, p in enumerate(batch)
    ]
    return spark.createDataFrame(
        rows or [(0, 0, bytearray(b""))],
        "cycle long, frag_idx long, payload binary",
    ).where("frag_idx >= 0" if rows else "frag_idx < 0")


def test_no_fragments_yields_no_values(spark):
    out = tp.aeron_sub_bursts(_frames(spark, [[]]), _i64_parser)
    assert out.count() == 0


def test_single_fragment_yields_one_value(spark):
    out = tp.aeron_sub_bursts(_frames(spark, [[_le64(42)]]), _i64_parser)
    assert [r.burst for r in out.collect()] == [[42]]


def test_three_fragments_in_one_poll_ride_one_burst(spark):
    out = tp.aeron_sub_bursts(
        _frames(spark, [[_le64(1), _le64(2), _le64(3)]]), _i64_parser
    ).collect()
    assert len(out) == 1, "one poll => one atomic burst"
    assert out[0].burst == [1, 2, 3]


def test_parser_none_skips_the_fragment(spark):
    out = tp.aeron_sub_bursts(
        _frames(spark, [[b"\x00" * 4, _le64(42)]]), _i64_parser
    ).collect()
    assert [r.burst for r in out] == [[42]]


def test_parser_err_drops_the_fragment_and_the_cycle_continues(spark):
    """Legacy's zero-stopping rule: the middle fragment errors; the valid
    fragments either side are still collected."""

    def parser(b: bytes):
        if len(b) == 8:
            return struct.unpack("<q", b)[0]
        if len(b) == 6:
            raise tp.TransportError("invalid", "bad")
        return None

    out = tp.aeron_sub_bursts(
        _frames(spark, [[_le64(1), b"\xde\xad\xbe\xef\xde\xad", _le64(3)]]),
        parser,
    ).collect()
    assert [r.burst for r in out] == [[1, 3]]


def test_bursts_group_per_cycle_across_polls(spark):
    out = tp.aeron_sub_bursts(
        _frames(spark, [[_le64(1)], [], [_le64(2), _le64(3)]]), _i64_parser
    ).orderBy("cycle").collect()
    assert [(r.cycle, r.burst) for r in out] == [(0, [1]), (2, [2, 3])]


# ------------------------------------------------------ status side-channel


def _polls(spark, rows):
    return spark.createDataFrame(
        rows, "cycle long, connected boolean, closed boolean"
    )


def test_status_connected_backend_emits_one_transition(spark):
    polls = _polls(spark, [(i, True, False) for i in range(4)])
    got = tp.aeron_sub_status(polls).collect()
    assert [(r.cycle, r.status) for r in got] == [(0, "Connected")], \
        "one transition, no re-emission in steady state"


def test_status_disconnected_backend_emits_nothing(spark):
    """Disconnected equals the initial default — no transition."""
    polls = _polls(spark, [(i, False, False) for i in range(4)])
    assert tp.aeron_sub_status(polls).count() == 0


def test_status_close_is_terminal_and_checked_first(spark):
    """Connected for two polls, then closed (with connected still true —
    Closed wins precedence): Connected -> Closed, nothing after."""
    polls = _polls(spark, [(0, True, False), (1, True, False),
                           (2, True, True), (3, True, True),
                           (4, True, False)])
    got = tp.aeron_sub_status(polls).orderBy("cycle").collect()
    assert [(r.cycle, r.status) for r in got] == \
        [(0, "Connected"), (2, "Closed")]


def test_pub_status_fold(spark):
    """write.rs publisher fold: ok->Connected once; backpressure;
    closed terminal checked first; empty burst (NULL result) falls back
    to is_connected."""
    offers = spark.createDataFrame(
        [(0, "ok", False), (1, "ok", False), (2, "ok", False)],
        "cycle long, result string, connected boolean",
    )
    got = tp.aeron_pub_status(offers).collect()
    assert [(r.cycle, r.status) for r in got] == [(0, "Connected")]

    bp = spark.createDataFrame(
        [(0, "backpressure", False)],
        "cycle long, result string, connected boolean",
    )
    assert [r.status for r in tp.aeron_pub_status(bp).collect()] == \
        ["BackPressured"]

    cl = spark.createDataFrame(
        [(0, "closed", True), (1, "ok", True)],
        "cycle long, result string, connected boolean",
    )
    assert [r.status for r in tp.aeron_pub_status(cl).collect()] == ["Closed"]

    # aeron_adapter.rs:477-497 — offers for two cycles then empty bursts:
    # Connected then (is_connected default false) Disconnected
    mixed = spark.createDataFrame(
        [(0, "ok", False), (1, "ok", False), (2, None, False), (3, None, False)],
        "cycle long, result string, connected boolean",
    )
    got = tp.aeron_pub_status(mixed).orderBy("cycle").collect()
    assert [(r.cycle, r.status) for r in got] == \
        [(0, "Connected"), (2, "Disconnected")]


def test_status_derivation_is_pure_catalyst(spark):
    polls = _polls(spark, [(0, True, False)])
    plan = tp.aeron_sub_status(polls)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


# ------------------------------------------------------------ wiring guards


def test_aeron_sub_rejects_historical_and_validates(spark):
    with pytest.raises(tp.TransportError, match="RealTime-only"):
        tp.aeron_sub(spark, "HistoricalFrom", tp.ChannelUri.ipc(), 1001)
    with pytest.raises(tp.TransportError, match="aeron: URI"):
        tp.aeron_sub(spark, "RealTime", "udp://nope", 1001)
    with pytest.raises(NotImplementedError, match="bridge"):
        tp.aeron_sub(spark, "RealTime", tp.ChannelUri.ipc(), 1001)


def test_iceoryx2_sub_rejects_historical_naming_the_adapter(spark):
    """iceoryx2_adapter.rs:246-281: every mode rejects HistoricalFrom at
    wiring; the error names the adapter and says historical."""
    for mode in tp.ICEORYX2_MODES:
        with pytest.raises(tp.TransportError) as ei:
            tp.iceoryx2_sub(spark, "HistoricalFrom", "wingfoil/test", mode)
        msg = str(ei.value)
        assert "iceoryx2_sub" in msg
        assert "historical" in msg.lower()


def test_iceoryx2_service_contract():
    """mod.rs:156-183 + iceoryx2_adapter.rs:113-150: buffer floors at the
    default; a mismatched re-open errors naming service + both sizes; an
    empty service name fails at open (start), not wiring."""
    tp._SERVICES.clear()
    c = tp.iceoryx2_open_or_create("svc/a", "local", history_size=5)
    assert c.subscriber_max_buffer_size == 16, "floored at the default"
    big = tp.iceoryx2_open_or_create("svc/b", "local", history_size=40)
    assert big.subscriber_max_buffer_size == 40
    # same contract re-opens fine
    assert tp.iceoryx2_open_or_create("svc/a", "local", 5) == c
    with pytest.raises(tp.TransportError) as ei:
        tp.iceoryx2_open_or_create("svc/a", "local", history_size=7)
    msg = str(ei.value)
    assert "svc/a" in msg and "5" in msg and "7" in msg and "local" in msg
    with pytest.raises(tp.TransportError, match="must not be empty"):
        tp.iceoryx2_open_or_create("", "local")
    assert tp.signal_service_name("svc/a") == "svc/a.signal"


# ----------------------------------------------------- zmq service discovery


def test_zmq_registry_register_lookup_revoke(tmp_path):
    """zmq/registry.rs contract: register -> lookup returns the address;
    revoke removes the key immediately; unknown names error naming the
    service (registry.rs:268)."""
    for reg in (tp.MemoryZmqRegistry(),
                tp.FileZmqRegistry(str(tmp_path / "reg"))):
        h = reg.register("quotes", "tcp://host:5556")
        assert reg.lookup("quotes") == "tcp://host:5556"
        h.revoke()
        with pytest.raises(tp.TransportError, match="no publisher named 'quotes'"):
            reg.lookup("quotes")
        with pytest.raises(tp.TransportError, match="no publisher named 'nope'"):
            reg.lookup("nope")
        h.revoke()  # double revoke is a no-op (teardown never fails the run)


def test_zmq_registry_lease_expiry_and_keepalive(tmp_path):
    """The etcd lease model (registry.rs:109-111): a registration with no
    keepalive is invisible ~TTL after the last heartbeat (crash cleanup);
    keepalive extends it."""
    now = [1000.0]
    reg = tp.FileZmqRegistry(str(tmp_path / "reg"), ttl_s=30,
                             clock=lambda: now[0])
    h = reg.register("quotes", "tcp://host:5556")
    now[0] += 29
    assert reg.lookup("quotes") == "tcp://host:5556", "inside the lease"
    now[0] += 2  # past TTL, no keepalive -> crashed publisher
    with pytest.raises(tp.TransportError, match="no publisher named"):
        reg.lookup("quotes")
    # a live publisher heartbeats every KEEPALIVE_INTERVAL < TTL
    h2 = reg.register("live", "tcp://host:5557")
    for _ in range(6):
        now[0] += 10
        h2.keepalive()
    assert reg.lookup("live") == "tcp://host:5557"


def test_zmq_sub_config_resolution(tmp_path):
    """ZmqSubConfig From impls (registry.rs:57-93): a bare address passes
    through; (name, registry) resolves one-shot at wiring."""
    assert tp.resolve_zmq_address("tcp://direct:5556") == "tcp://direct:5556"
    reg = tp.MemoryZmqRegistry()
    reg.register("quotes", "tcp://found:5556")
    assert tp.resolve_zmq_address(("quotes", reg)) == "tcp://found:5556"
    assert tp.resolve_zmq_address("quotes", registry=reg) == "tcp://found:5556"
    with pytest.raises(tp.TransportError):
        tp.resolve_zmq_address(("missing", reg))


def test_burst_grouping_single_cycle_shuffle(spark):
    """Scale gate: the fragment->burst grouping shuffles ONCE on the
    cycle key (the parser stage is row-local Arrow)."""
    import re

    frames = _frames(spark, [[_le64(1), _le64(2)]])
    plan = tp.aeron_sub_bursts(frames, _i64_parser) \
        ._jdf.queryExecution().executedPlan().toString()
    n = len(re.findall(
        r"Exchange hashpartitioning|Exchange rangepartitioning"
        r"|Exchange SinglePartition", plan))
    assert n == 1, plan
    assert "Exchange SinglePartition" not in plan, plan


def test_binding_knob_validation(spark):
    """wingfoil-python tests/test_aeron.py:52-92 + test_iceoryx2.py:
    73-116: the binding's wiring knobs validate with the reference's
    exact messages, before anything touches a driver."""
    ipc = tp.ChannelUri.ipc()
    with pytest.raises(tp.TransportError, match="expected 'spin' or 'threaded'"):
        tp.aeron_sub(spark, "RealTime", ipc, 1001, mode="polling")
    with pytest.raises(tp.TransportError, match="fragment_limit must be at least 1"):
        tp.aeron_sub(spark, "RealTime", ipc, 1001, fragment_limit=0)
    for bad in (0.0, -1.0, float("nan")):
        with pytest.raises(tp.TransportError, match="timeout_secs"):
            tp.aeron_sub(spark, "RealTime", ipc, 1001, timeout_secs=bad)
    with pytest.raises(tp.TransportError, match="HistoricalFrom"):
        tp.aeron_sub(spark, "HistoricalFrom", ipc, 1001)
    with pytest.raises(tp.TransportError, match="unknown service variant"):
        tp.iceoryx2_sub(spark, "RealTime", "svc", variant="shm")
    with pytest.raises(tp.TransportError,
                       match="initial_max_slice_len must be at least 1"):
        tp.iceoryx2_sub(spark, "RealTime", "svc", initial_max_slice_len=0)
