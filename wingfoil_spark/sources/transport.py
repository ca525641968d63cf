"""Shared-memory / UDP transport adapters (aeron, iceoryx2) — the
portable tiers.

The reference ships two low-latency transport adapters:

- **aeron** (adapters/aeron/) — UDP / IPC term-buffer pub-sub via a media
  driver (channel.rs URI builders, read.rs fragment→burst subscriber with
  a status side-channel, write.rs offer-based publisher,
  status.rs lifecycle enum, error.rs TransportError).
- **iceoryx2** (adapters/iceoryx2/) — zero-copy shared-memory pub-sub
  (mod.rs service contracts + three polling modes, read.rs subscriber,
  write.rs publisher, the ``<name>.signal`` Event service).

Neither transport can exist inside a Spark executor fleet — shared-memory
segments and media-driver term buffers are single-host constructs, and
the production bridge is documented (COVERAGE.md §2.8): a tiny native
relay publishes into Kafka, and `sources.io.kafka_*` takes it from there.
What IS portable — and what the reference itself unit-tests WITHOUT a
driver, via mock backends (tests/aeron_adapter.rs:136-511,
tests/iceoryx2_adapter.rs:246-320) — are the adapter SEMANTICS:

1. the aeron channel-URI builder/validator (channel.rs:1-260) — wiring-
   time config, pure strings;
2. the subscriber contract: each poll cycle's fragments ride ONE atomic
   burst; a parser returning None SKIPS the fragment; a parser error
   DROPS the fragment and the cycle continues (legacy's zero-stopping
   rule, read.rs);
3. the status side-channel: Closed is checked first and terminal;
   transitions only (the initial Disconnected default is never emitted,
   steady state never re-emits) — status.rs + read.rs;
4. the publisher status fold: offer ok → Connected, back-pressure →
   BackPressured, closed terminal; an empty burst falls back to the
   backend's ``is_connected`` (write.rs);
5. the iceoryx2 service CONTRACT: history_size / derived
   subscriber_max_buffer_size must agree across participants
   (open_or_create mismatch errors name the service, variant and both
   sizes, mod.rs:150-212); the ``<name>.signal`` Event-service naming
   (read.rs:73); and the wiring guards — historical run modes rejected
   at wiring naming the adapter, invalid service names failing at OPEN
   (start), not wiring (tests/iceoryx2_adapter.rs:246-300).

Here those semantics run over captured-poll FRAMES (batch or streaming):
column shape ``(cycle, frag_idx, payload)`` mirrors the mock backend's
poll batches, and everything but the user's parser callable is pure
Catalyst. At 100 TB posture the burst grouping shuffles on the cycle key
only, and the (tiny, control-plane) status derivation is windowed over an
optional endpoint key.
"""

from __future__ import annotations

import dataclasses
import ipaddress

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


class TransportError(ValueError):
    """Unified transport error (error.rs:11-29). ``kind`` mirrors the
    reference's variants: 'backpressure' | 'connection' | 'backend' |
    'invalid'. Display strings match error.rs:31-41."""

    def __init__(self, kind: str, msg: str = ""):
        self.kind = kind
        prefix = {
            "backpressure": "Back-pressure: buffer full",
            "connection": "Connection error: ",
            "backend": "Backend error: ",
            "invalid": "Invalid operation: ",
        }[kind]
        super().__init__(prefix + msg if kind != "backpressure" else prefix)


# --------------------------------------------------------------- channel URIs

#: ASCII punctuation accepted in URI parameter values (channel.rs:21).
_URI_ALLOWED_PUNCT = set(":[].-_")


def _is_uri_char(c: str) -> bool:
    return c.isascii() and (c.isalnum() or c in _URI_ALLOWED_PUNCT)


def _validate_param(label: str, value: str) -> None:
    """channel.rs:28-41 — non-empty + ASCII allowlist (rejects Aeron URI
    separators ``|?=#,;``, whitespace, Unicode invisibles)."""
    if not value:
        raise TransportError("invalid", f"{label} must not be empty")
    for ch in value:
        if not _is_uri_char(ch):
            raise TransportError(
                "invalid",
                f"{label} contains invalid character '{ch}' "
                f"(U+{ord(ch):04X}); only ASCII alphanumerics and "
                "':[].-_' are permitted",
            )


def _validate_host_port(label: str, value: str) -> None:
    """channel.rs:44-105 — 'host:port' or '[ipv6]:port'; bare IPv6 is
    rejected as ambiguous; port must be a u16."""
    _validate_param(label, value)
    if value.startswith("["):
        rest = value[1:]
        close = rest.find("]")
        if close < 0:
            raise TransportError(
                "invalid",
                f"{label} bracketed IPv6 address missing closing ']' in "
                f"'{value}'",
            )
        host, after = rest[:close], rest[close + 1:]
        if not after.startswith(":"):
            raise TransportError(
                "invalid",
                f"{label} bracketed IPv6 address must be followed by "
                f"':port' in '{value}'",
            )
        port = after[1:]
        try:
            ipaddress.IPv6Address(host)
        except ValueError:
            raise TransportError(
                "invalid",
                f"{label} bracketed IPv6 '{host}' is not a valid IPv6 "
                f"address in '{value}'",
            ) from None
    else:
        colons = value.count(":")
        if colons == 0:
            raise TransportError(
                "invalid", f"{label} expected 'host:port' in '{value}'"
            )
        if colons > 1:
            raise TransportError(
                "invalid",
                f"{label} bare IPv6 must be bracketed like '[::1]:port' "
                f"(got '{value}')",
            )
        host, port = value.split(":", 1)
        if "[" in host or "]" in host:
            raise TransportError(
                "invalid",
                f"{label} brackets are only allowed as the bracketed-IPv6 "
                f"prefix '[ipv6]:port' (got '{value}')",
            )
    if not host:
        raise TransportError(
            "invalid", f"{label} host part must not be empty"
        )
    if not (port.isdigit() and int(port) <= 65535):
        raise TransportError(
            "invalid", f"{label} port '{port}' must be a valid u16 (0-65535)"
        )


class ChannelUri:
    """Type-safe Aeron channel-URI builders (channel.rs:107-206): the
    canonical strings for the common channel shapes, validated at wiring
    (a typo'd URI is silently accepted by a media driver and surfaces
    only as a non-connecting publication)."""

    @staticmethod
    def ipc() -> str:
        return "aeron:ipc"

    @staticmethod
    def udp(endpoint: str) -> str:
        _validate_host_port("endpoint", endpoint)
        return f"aeron:udp?endpoint={endpoint}"

    @staticmethod
    def mdc_publication(control: str) -> str:
        _validate_host_port("control", control)
        return f"aeron:udp?control={control}|control-mode=dynamic"

    @staticmethod
    def mdc_subscription(endpoint: str, control: str) -> str:
        _validate_host_port("endpoint", endpoint)
        _validate_host_port("control", control)
        return (
            f"aeron:udp?endpoint={endpoint}|control={control}"
            "|control-mode=dynamic"
        )


# --------------------------------------------------- subscriber: frag→bursts

#: Lifecycle statuses (status.rs:9-19); Disconnected is the initial state.
AERON_STATUSES = ("Connected", "Disconnected", "BackPressured", "Closed")


def aeron_sub_bursts(
    frames: DataFrame,
    parser,
    value_type: str = "long",
    cycle_col: str = "cycle",
    idx_col: str = "frag_idx",
    payload_col: str = "payload",
) -> DataFrame:
    """Fragments → per-cycle bursts (read.rs; tests/aeron_adapter.rs:136-215).

    ``frames`` carries one row per polled fragment: ``(cycle, frag_idx,
    payload binary)``. ``parser(payload: bytes) -> value | None`` is the
    user fragment parser; the reference contract is replayed exactly:

    - ``None`` → the fragment is SKIPPED (wrong-length frame);
    - a raised ``TransportError`` (or any exception) → the fragment is
      DROPPED and the cycle continues — legacy's zero-stopping rule;
    - every fragment a single poll returned rides ONE atomic burst
      (array column ``burst``, wire order by ``frag_idx``);
    - a cycle with no surviving fragments yields no row ("no fragments
      yields no values").

    Scale shape: the parser runs row-local (Arrow-batched); the only
    shuffle is the groupBy on the cycle key.
    """
    @F.pandas_udf(value_type)
    def parse(payloads: pd.Series) -> pd.Series:
        out = []
        for p in payloads:
            try:
                out.append(parser(bytes(p)) if p is not None else None)
            except Exception:
                out.append(None)  # drop the fragment, continue the cycle
        return pd.Series(out, dtype=object)

    parsed = frames.withColumn("__v", parse(F.col(payload_col)))
    return (
        parsed.where(F.col("__v").isNotNull())
        .groupBy(cycle_col)
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col(idx_col).alias("i"),
                                            F.col("__v").alias("v")))
                ),
                lambda s: s.v,
            ).alias("burst")
        )
    )


def _status_transitions(per_cycle: DataFrame, status_col, cycle_col: str,
                        key_cols: tuple) -> DataFrame:
    """Shared transition logic (read.rs / write.rs): Closed is terminal,
    only CHANGES are emitted, and the initial Disconnected default never
    is (status.rs: Disconnected = Default)."""
    w = (Window.partitionBy(*key_cols) if key_cols else
         Window.partitionBy(F.lit(1))).orderBy(cycle_col)
    s = per_cycle.withColumn("__st", status_col)
    first_closed = F.min(
        F.when(F.col("__st") == "Closed", F.col(cycle_col))
    ).over(
        Window.partitionBy(*key_cols) if key_cols else
        Window.partitionBy(F.lit(1))
    )
    s = s.withColumn("__term", first_closed).where(
        F.col("__term").isNull() | (F.col(cycle_col) <= F.col("__term"))
    )
    prev = F.lag("__st").over(w)
    return (
        s.withColumn("__prev", F.coalesce(prev, F.lit("Disconnected")))
        .where(F.col("__st") != F.col("__prev"))
        .select(*key_cols, cycle_col, F.col("__st").alias("status"))
    )


def aeron_sub_status(
    polls: DataFrame,
    cycle_col: str = "cycle",
    connected_col: str = "connected",
    closed_col: str = "closed",
    key_cols: tuple = (),
) -> DataFrame:
    """The subscriber's status side-channel (read.rs:143+;
    tests/aeron_adapter.rs:246-320): per poll cycle, ``Closed`` is checked
    FIRST and is terminal; otherwise ``Connected``/``Disconnected`` from
    the backend's flag. Output is the TRANSITION stream: one row per
    state change, the initial Disconnected default never emitted, steady
    state never re-emitted. Pure Catalyst (windowed lag); the status
    plane is control-rate, so the keyless single-partition window is
    deliberate — pass ``key_cols`` (e.g. per endpoint) to parallelize."""
    status = (
        F.when(F.col(closed_col), F.lit("Closed"))
        .when(F.col(connected_col), F.lit("Connected"))
        .otherwise(F.lit("Disconnected"))
    )
    return _status_transitions(polls, status, cycle_col, key_cols)


def aeron_pub_status(
    offers: DataFrame,
    cycle_col: str = "cycle",
    result_col: str = "result",
    connected_col: str = "connected",
    key_cols: tuple = (),
) -> DataFrame:
    """The publisher's status fold (write.rs;
    tests/aeron_adapter.rs:446-497): per cycle, ``result`` is the offer
    outcome for that cycle's burst — ``'ok'`` → Connected,
    ``'backpressure'`` → BackPressured, ``'closed'`` → Closed (terminal,
    checked first), and NULL result (an EMPTY burst offered nothing) falls
    back to the backend's ``is_connected`` flag. Transition-only output,
    same rules as the subscriber side."""
    status = (
        F.when(F.col(result_col) == "closed", F.lit("Closed"))
        .when(F.col(result_col) == "backpressure", F.lit("BackPressured"))
        .when(F.col(result_col) == "ok", F.lit("Connected"))
        .when(F.col(connected_col), F.lit("Connected"))
        .otherwise(F.lit("Disconnected"))
    )
    return _status_transitions(offers, status, cycle_col, key_cols)


def aeron_sub(spark, run_mode: str, channel: str, stream_id: int,
              mode: str = "spin", fragment_limit: int = 10,
              timeout_secs: float | None = None):
    """Wiring-time front door for a live Aeron subscription. Validates
    the channel URI shape and the binding's knobs with the reference's
    exact wiring errors (wingfoil-python tests/test_aeron.py:52-92:
    unknown mode → "expected 'spin' or 'threaded'"; ``fragment_limit``
    must be ≥ 1; ``timeout_secs`` must be a positive finite number;
    historical rejection mentions HistoricalFrom and must not touch a
    driver). The live transport itself is the documented non-goal:
    bridge the media driver into Kafka and read via
    ``sources.io.kafka_source``; the burst/status semantics above then
    apply unchanged."""
    import math

    if not str(channel).startswith("aeron:"):
        raise TransportError("invalid", f"channel must be an aeron: URI, got '{channel}'")
    if not (0 <= int(stream_id) <= 2**31 - 1):
        raise TransportError("invalid", f"stream_id {stream_id} out of range")
    if mode not in ("spin", "threaded"):
        raise TransportError(
            "invalid", f"unknown mode '{mode}': expected 'spin' or 'threaded'"
        )
    if int(fragment_limit) < 1:
        raise TransportError("invalid", "fragment_limit must be at least 1")
    if timeout_secs is not None and not (
        isinstance(timeout_secs, (int, float))
        and math.isfinite(timeout_secs) and timeout_secs > 0
    ):
        raise TransportError(
            "invalid",
            f"timeout_secs must be a positive finite number, got {timeout_secs!r}",
        )
    if run_mode != "RealTime":
        raise TransportError(
            "invalid",
            f"aeron_sub is RealTime-only: run mode '{run_mode}' is not "
            "supported (no historical timeline exists for a live "
            "subscription; replay a captured-poll frame instead)",
        )
    raise NotImplementedError(
        "live Aeron transport is a documented non-goal in the Spark port: "
        "bridge the media driver into Kafka (sources.io.kafka_source) and "
        "apply aeron_sub_bursts/aeron_sub_status to the captured polls"
    )


# ------------------------------------------------------------------ iceoryx2

ICEORYX2_DEFAULT_HISTORY_SIZE = 5
ICEORYX2_DEFAULT_SUBSCRIBER_MAX_BUFFER_SIZE = 16
ICEORYX2_DEFAULT_INITIAL_MAX_SLICE_LEN = 128 * 1024


@dataclasses.dataclass(frozen=True)
class Iceoryx2ServiceContract:
    """The service-level contract every participant must agree on
    (mod.rs:156-183): ``subscriber_max_buffer_size`` derives from
    ``history_size`` floored at the default."""

    history_size: int = ICEORYX2_DEFAULT_HISTORY_SIZE

    @property
    def subscriber_max_buffer_size(self) -> int:
        return max(self.history_size,
                   ICEORYX2_DEFAULT_SUBSCRIBER_MAX_BUFFER_SIZE)


def signal_service_name(service: str) -> str:
    """The Event service a publisher notifies so a ``signaled``
    subscriber wakes (read.rs:73): ``<name>.signal``."""
    return f"{service}.signal"


#: The three polling modes (mod.rs:26-45). In the Spark port these select
#: the STREAMING TRIGGER of the bridged source: spin → continuous
#: processingTime=0, threaded → a short processingTime interval,
#: signaled → availableNow (wake on data).
ICEORYX2_MODES = ("spin", "threaded", "signaled")

#: Local (in-process) vs Ipc (shared-memory) service variants.
ICEORYX2_VARIANTS = ("local", "ipc")

#: In-process service registry modeling open_or_create: the reference
#: enforces the contract where the ports are built (run start, one host);
#: the Spark analog is the driver.
_SERVICES: dict = {}


def iceoryx2_open_or_create(
    service: str, variant: str = "local",
    history_size: int = ICEORYX2_DEFAULT_HISTORY_SIZE,
) -> Iceoryx2ServiceContract:
    """open_or_create with the reference's contract check
    (tests/iceoryx2_adapter.rs:113-150): the first participant CREATES
    the service under its contract; later participants must match or the
    open fails with the service name, variant, and both contract sizes in
    the message. An invalid (empty) service name fails HERE — at start,
    where ports are built — not at wiring
    (tests/iceoryx2_adapter.rs:283-295)."""
    if not service:
        raise TransportError("invalid", "iceoryx2 service name must not be empty")
    if variant not in ICEORYX2_VARIANTS:
        raise TransportError("invalid", f"unknown service variant '{variant}'")
    contract = Iceoryx2ServiceContract(int(history_size))
    key = (service, variant)
    existing = _SERVICES.get(key)
    if existing is None:
        _SERVICES[key] = contract
        return contract
    if existing != contract:
        raise TransportError(
            "backend",
            f"service config mismatch opening '{service}' ({variant}): "
            f"existing history_size={existing.history_size}/"
            f"buffer={existing.subscriber_max_buffer_size}, requested "
            f"history_size={contract.history_size}/"
            f"buffer={contract.subscriber_max_buffer_size}",
        )
    return existing


def iceoryx2_sub(spark, run_mode: str, service: str, mode: str = "spin",
                 variant: str = "local",
                 history_size: int = ICEORYX2_DEFAULT_HISTORY_SIZE,
                 initial_max_slice_len: int =
                 ICEORYX2_DEFAULT_INITIAL_MAX_SLICE_LEN):
    """Wiring-time front door for an iceoryx2 subscription. Historical
    run modes are rejected AT WIRING with the adapter named
    (tests/iceoryx2_adapter.rs:246-281: the Threaded/Signaled modes ride
    a channel layer whose historical receiver would block-collect a
    never-closing producer and deadlock); the service contract is only
    checked at start (:func:`iceoryx2_open_or_create`). The live
    shared-memory transport is the documented non-goal — bridge to Kafka
    and group samples per poll cycle with :func:`aeron_sub_bursts`'s
    grouping (burst semantics are identical)."""
    if mode not in ICEORYX2_MODES:
        raise TransportError("invalid", f"unknown iceoryx2 mode '{mode}'")
    if variant not in ICEORYX2_VARIANTS:
        raise TransportError("invalid", f"unknown service variant '{variant}'")
    if int(initial_max_slice_len) < 1:
        # wingfoil-python tests/test_iceoryx2.py:112-116
        raise TransportError("invalid",
                             "initial_max_slice_len must be at least 1")
    if run_mode != "RealTime":
        raise TransportError(
            "invalid",
            f"iceoryx2_sub is RealTime-only: historical replay "
            f"(run mode '{run_mode}') has no timeline for a live "
            "shared-memory subscription",
        )
    raise NotImplementedError(
        "live iceoryx2 transport is a documented non-goal in the Spark "
        "port: bridge to Kafka (sources.io.kafka_source); open the "
        "service contract with iceoryx2_open_or_create at start"
    )


# ------------------------------------------------- zmq service discovery

class ZmqRegistryHandle:
    """Handle returned by a registry's ``register`` (zmq/registry.rs:28-33):
    ``revoke()`` cleans the registration up on clean shutdown; errors are
    logged, never propagated (teardown must not fail the run)."""

    def revoke(self) -> None:  # pragma: no cover - interface default
        raise NotImplementedError


class FileZmqRegistry:
    """ZMQ service discovery over a shared filesystem — the Spark-cluster
    analog of the reference's ``EtcdRegistry`` (zmq/registry.rs:96-297):
    publishers write their address under a LEASE (an expiry the keepalive
    refreshes), so a crashed publisher's registration disappears ~TTL
    after its last heartbeat while clean shutdown revokes immediately;
    subscribers do a one-shot lookup at wiring. etcd's lease/keepalive
    machinery maps to (expiry stamp in the file, ``keepalive()`` rewrites
    it); the shared directory plays the etcd cluster (any DBFS/NFS/S3FS
    path every node mounts).

    Contracts pinned from the reference:
    - register → lookup returns the address;
    - ``revoke()`` removes the key immediately;
    - a lease past its TTL with no keepalive is INVISIBLE to lookup
      (crash cleanup);
    - ``keepalive()`` extends the lease (KEEPALIVE_INTERVAL < TTL);
    - lookup of an unknown name raises naming the service:
      ``no publisher named '<name>' found`` (registry.rs:268).

    ``clock`` is injectable for deterministic tests (defaults to
    ``time.time``)."""

    LEASE_TTL_SECS = 30
    KEEPALIVE_INTERVAL_SECS = 10

    def __init__(self, root: str, ttl_s: float | None = None, clock=None):
        import os
        import time as _time

        self.root = root
        self.ttl_s = float(ttl_s if ttl_s is not None else self.LEASE_TTL_SECS)
        self._clock = clock or _time.time
        os.makedirs(root, exist_ok=True)

    def _path(self, name: str) -> str:
        import hashlib
        import os

        if not name:
            raise TransportError("invalid", "registry name must not be empty")
        # names may carry '/' (service paths): key on a digest, keep the
        # name inside the record
        return os.path.join(
            self.root, hashlib.sha256(name.encode()).hexdigest()[:32] + ".json"
        )

    def register(self, name: str, address: str) -> "ZmqRegistryHandle":
        import json
        import os

        path = self._path(name)
        reg = self

        def write():
            tmp = path + ".tmp"
            with open(tmp, "w") as f:
                json.dump({"name": name, "address": address,
                           "expires_at": reg._clock() + reg.ttl_s}, f)
            os.replace(tmp, path)  # atomic: lookups never see a torn write

        write()

        class Handle(ZmqRegistryHandle):
            def keepalive(self) -> None:
                write()

            def revoke(self) -> None:
                try:
                    os.remove(path)
                except OSError:
                    pass  # teardown errors are logged-not-propagated

        return Handle()

    def lookup(self, name: str) -> str:
        import json

        path = self._path(name)
        try:
            with open(path) as f:
                rec = json.load(f)
        except (OSError, ValueError):
            rec = None
        if rec is None or rec.get("expires_at", 0) <= self._clock():
            raise TransportError(
                "connection", f"no publisher named '{name}' found"
            )
        return rec["address"]


class MemoryZmqRegistry:
    """In-process registry for tests and single-driver wiring — the mock
    the reference's own registry tests use. Same contract surface as
    :class:`FileZmqRegistry` minus leases (entries live until revoked)."""

    def __init__(self):
        self._entries: dict = {}

    def register(self, name: str, address: str) -> "ZmqRegistryHandle":
        if not name:
            raise TransportError("invalid", "registry name must not be empty")
        self._entries[name] = address
        entries = self._entries

        class Handle(ZmqRegistryHandle):
            def revoke(self) -> None:
                entries.pop(name, None)

        return Handle()

    def lookup(self, name: str) -> str:
        try:
            return self._entries[name]
        except KeyError:
            raise TransportError(
                "connection", f"no publisher named '{name}' found"
            ) from None


def resolve_zmq_address(config, registry=None) -> str:
    """The ZmqSubConfig resolution (zmq/registry.rs:57-93): a bare
    address string passes through; a ``(name, registry)`` pair (or a name
    plus the ``registry`` argument) resolves through the registry at
    wiring — one-shot, exactly like the reference subscriber's
    construction-time GET."""
    if isinstance(config, tuple):
        name, registry = config
        return registry.lookup(name)
    if registry is not None:
        return registry.lookup(config)
    return config
