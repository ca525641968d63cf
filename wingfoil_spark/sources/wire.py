"""Web/WASM wire-format codec (Envelope frames) over DataFrame columns.

Reference: the ``web`` adapter's wire layer — shared between the native
server and the browser client so the two cannot diverge
(``crates/wingfoil-wire-types/src/lib.rs:1-106``, re-exported by
``adapters/web/codec.rs``). Every binary WebSocket frame in both
directions is one ``Envelope { topic: String, time_ns: u64, payload:
Vec<u8> }`` serialized by the connection's ``CodecKind`` (``Bincode``
default — bincode 1.x legacy layout: fixed-int little-endian, u64 length
prefixes, u32 enum variant tags — or ``Json`` for devtools debugging).
Control-plane messages (``Hello`` / ``Subscribe`` / ``Unsubscribe`` /
``Complete``) travel on the reserved ``$ctrl`` topic
(wire-types lib.rs:52-77).

Spark-first split, same shape as the FIX tier (:mod:`.fix`):

- The CODEC lives HERE, over columns: captured web frames (files, Kafka
  values of a ws→Kafka bridge, JDBC blobs) decode at data scale,
  Arrow-batched.  Array-valued payloads are same-``time_ns`` bursts
  (wire-types lib.rs:33-36, ``web_pub_bursts`` write.rs:84-127) and
  explode into tick-ordered burst rows — pure Catalyst for the JSON
  codec.  Encode produces bytes the reference's own decoder accepts
  (layout pinned byte-for-byte in tests/test_wire_codec.py against the
  reference's wire-compat guard, codec.rs:72-88).
- The live SERVER/SOCKET tier (axum upgrade loop, per-client mpsc
  fan-out, drop-newest backpressure — web/server.rs) remains a
  protocol-gateway NON-GOAL (COVERAGE.md §2.8): bridge the socket to
  Kafka and decode the bridge with this module.

Codec behaviors replayed from the reference's tests (web/codec.rs:15-95):
bincode/json envelope roundtrips, control roundtrips for every variant,
the hardcoded variant-index wire-compat pins (Hello stays variant 0,
Subscribe stays 1 — appending ``Complete`` must not renumber v1 frames),
and corrupt-envelope rejection with ``wire codec`` context.
"""

from __future__ import annotations

import json
import struct as _struct

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

#: wire-types lib.rs:24 — Hello frames carry this; peers reject mismatches
WIRE_PROTOCOL_VERSION = 2

#: wire-types lib.rs:27 — reserved topic for control frames
CONTROL_TOPIC = "$ctrl"

_CODECS = ("bincode", "json")
#: CodecKind bincode variant indices (wire-types lib.rs:84-88)
_CODEC_VARIANTS = {"Bincode": 0, "Json": 1}
_CODEC_NAMES = {v: k for k, v in _CODEC_VARIANTS.items()}
#: ControlMessage bincode variant indices — append-only wire contract
#: (wire-types lib.rs:19-23; pinned by codec.rs:72-88)
_CTRL_VARIANTS = {"Hello": 0, "Subscribe": 1, "Unsubscribe": 2, "Complete": 3}
_CTRL_NAMES = {v: k for k, v in _CTRL_VARIANTS.items()}


class WireCodecError(ValueError):
    """Decode failure; message carries ``wire codec`` context like the
    reference's anyhow contexts (wire-types lib.rs:94-103)."""


def _check_codec(codec: str) -> str:
    if codec not in _CODECS:
        raise WireCodecError(f"wire codec: unknown codec {codec!r} (bincode|json)")
    return codec


# ---------------------------------------------------------------------------
# bincode 1.x legacy primitives (fixint LE, u64 lengths, u32 variants)
# ---------------------------------------------------------------------------

def _b_str(s: str) -> bytes:
    b = s.encode("utf-8")
    return _struct.pack("<Q", len(b)) + b


def _b_bytes(b: bytes) -> bytes:
    return _struct.pack("<Q", len(b)) + bytes(b)


class _Reader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def take(self, n: int, what: str) -> bytes:
        if self.pos + n > len(self.data):
            raise WireCodecError(
                f"wire codec: bincode decode: unexpected EOF reading {what} "
                f"({n} bytes at offset {self.pos}, frame is {len(self.data)})"
            )
        out = self.data[self.pos : self.pos + n]
        self.pos += n
        return out

    def u64(self, what: str) -> int:
        return _struct.unpack("<Q", self.take(8, what))[0]

    def u32(self, what: str) -> int:
        return _struct.unpack("<I", self.take(4, what))[0]

    def u16(self, what: str) -> int:
        return _struct.unpack("<H", self.take(2, what))[0]

    def string(self, what: str) -> str:
        n = self.u64(f"{what} length")
        raw = self.take(n, what)
        try:
            return raw.decode("utf-8")
        except UnicodeDecodeError as e:
            raise WireCodecError(f"wire codec: bincode decode: {what}: {e}") from None


# ---------------------------------------------------------------------------
# Envelope encode/decode (row level)
# ---------------------------------------------------------------------------

def encode_envelope(topic: str, time_ns: int, payload: bytes, codec: str = "bincode") -> bytes:
    """One ``Envelope`` to its frame bytes (wire-types lib.rs:39-50).
    ``time_ns`` is graph time for server frames and 0 for client frames
    (clients cannot set graph time — lib.rs:36-37)."""
    _check_codec(codec)
    if not 0 <= int(time_ns) < 1 << 64:
        raise WireCodecError(f"wire codec: time_ns out of u64 range: {time_ns}")
    if codec == "bincode":
        return _b_str(topic) + _struct.pack("<Q", int(time_ns)) + _b_bytes(payload)
    # serde_json: Vec<u8> is an array of numbers; struct field order is
    # declaration order (topic, time_ns, payload)
    return json.dumps(
        {"topic": topic, "time_ns": int(time_ns), "payload": list(bytes(payload))},
        separators=(",", ":"),
    ).encode("utf-8")


def decode_envelope(frame: bytes, codec: str = "bincode") -> tuple[str, int, bytes]:
    """Frame bytes → ``(topic, time_ns, payload)``. Trailing bytes are
    ignored, matching ``bincode::deserialize``'s leniency; structural
    errors raise :class:`WireCodecError` with ``wire codec`` context
    (codec.rs:89-95 asserts the context string)."""
    _check_codec(codec)
    if codec == "bincode":
        r = _Reader(bytes(frame))
        topic = r.string("Envelope.topic")
        time_ns = r.u64("Envelope.time_ns")
        n = r.u64("Envelope.payload length")
        payload = r.take(n, "Envelope.payload")
        return topic, time_ns, payload
    try:
        obj = json.loads(bytes(frame).decode("utf-8"))
        return str(obj["topic"]), int(obj["time_ns"]), bytes(obj["payload"])
    except WireCodecError:
        raise
    except Exception as e:  # malformed JSON / missing fields / bad bytes
        raise WireCodecError(f"wire codec: json decode: {e}") from None


# ---------------------------------------------------------------------------
# ControlMessage encode/decode (row level)
# ---------------------------------------------------------------------------

def encode_control(msg: dict, codec: str = "bincode") -> bytes:
    """A control message (``{"kind": "Hello"|"Subscribe"|"Unsubscribe"|
    "Complete", ...}``) to payload bytes (wire-types lib.rs:52-77)."""
    _check_codec(codec)
    kind = msg.get("kind")
    if kind not in _CTRL_VARIANTS:
        raise WireCodecError(f"wire codec: unknown control kind {kind!r}")
    if codec == "bincode":
        out = _struct.pack("<I", _CTRL_VARIANTS[kind])
        if kind == "Hello":
            ck = msg.get("codec", "Bincode")
            if ck not in _CODEC_VARIANTS:
                raise WireCodecError(f"wire codec: unknown CodecKind {ck!r}")
            out += _struct.pack("<I", _CODEC_VARIANTS[ck])
            out += _struct.pack("<H", int(msg.get("version", WIRE_PROTOCOL_VERSION)))
        elif kind in ("Subscribe", "Unsubscribe"):
            topics = list(msg.get("topics", []))
            out += _struct.pack("<Q", len(topics))
            for t in topics:
                out += _b_str(t)
        else:  # Complete
            out += _b_str(msg["topic"])
        return out
    # serde externally-tagged enum JSON
    if kind == "Hello":
        body = {"codec": msg.get("codec", "Bincode"),
                "version": int(msg.get("version", WIRE_PROTOCOL_VERSION))}
    elif kind in ("Subscribe", "Unsubscribe"):
        body = {"topics": list(msg.get("topics", []))}
    else:
        body = {"topic": msg["topic"]}
    return json.dumps({kind: body}, separators=(",", ":")).encode("utf-8")


def decode_control(payload: bytes, codec: str = "bincode") -> dict:
    """Payload bytes (from a ``$ctrl`` envelope) → control dict."""
    _check_codec(codec)
    if codec == "bincode":
        r = _Reader(bytes(payload))
        idx = r.u32("ControlMessage variant")
        kind = _CTRL_NAMES.get(idx)
        if kind is None:
            raise WireCodecError(f"wire codec: bincode decode: bad ControlMessage variant {idx}")
        if kind == "Hello":
            ck = r.u32("CodecKind variant")
            if ck not in _CODEC_NAMES:
                raise WireCodecError(f"wire codec: bincode decode: bad CodecKind variant {ck}")
            return {"kind": kind, "codec": _CODEC_NAMES[ck],
                    "version": r.u16("Hello.version")}
        if kind in ("Subscribe", "Unsubscribe"):
            n = r.u64("topics length")
            if n > len(payload):  # a corrupt length cannot exceed the frame
                raise WireCodecError(f"wire codec: bincode decode: topics length {n} exceeds frame")
            return {"kind": kind, "topics": [r.string(f"topics[{i}]") for i in range(n)]}
        return {"kind": kind, "topic": r.string("Complete.topic")}
    try:
        obj = json.loads(bytes(payload).decode("utf-8"))
        (kind, body), = obj.items()
    except Exception as e:
        raise WireCodecError(f"wire codec: json decode: {e}") from None
    if kind not in _CTRL_VARIANTS:
        raise WireCodecError(f"wire codec: unknown control kind {kind!r}")
    return {"kind": kind, **body}


def check_hello(ctrl: dict) -> dict:
    """Validate a decoded ``Hello`` — peers reject version mismatches
    early (wire-types lib.rs:15-18). Returns the dict for chaining."""
    if ctrl.get("kind") != "Hello":
        raise WireCodecError(f"wire codec: expected Hello, got {ctrl.get('kind')!r}")
    if ctrl.get("version") != WIRE_PROTOCOL_VERSION:
        raise WireCodecError(
            f"wire codec: protocol version mismatch: peer {ctrl.get('version')} "
            f"!= ours {WIRE_PROTOCOL_VERSION}"
        )
    return ctrl


def hello_frame(codec: str = "bincode") -> bytes:
    """The server's post-upgrade greeting frame (wire-types lib.rs:55-62)."""
    ctrl = {"kind": "Hello", "codec": "Bincode" if codec == "bincode" else "Json",
            "version": WIRE_PROTOCOL_VERSION}
    return encode_envelope(CONTROL_TOPIC, 0, encode_control(ctrl, codec), codec)


def subscribe_frame(topics: list[str], codec: str = "bincode") -> bytes:
    return encode_envelope(CONTROL_TOPIC, 0,
                           encode_control({"kind": "Subscribe", "topics": topics}, codec), codec)


def unsubscribe_frame(topics: list[str], codec: str = "bincode") -> bytes:
    return encode_envelope(CONTROL_TOPIC, 0,
                           encode_control({"kind": "Unsubscribe", "topics": topics}, codec), codec)


def complete_frame(topic: str, codec: str = "bincode") -> bytes:
    """End-of-stream marker for a publish topic, broadcast when a finite
    run drains (``encode_complete_frame``, web/write.rs:188-203)."""
    return encode_envelope(CONTROL_TOPIC, 0,
                           encode_control({"kind": "Complete", "topic": topic}, codec), codec)


# ---------------------------------------------------------------------------
# DataFrame tier
# ---------------------------------------------------------------------------

ENVELOPE_STRUCT = T.StructType([
    T.StructField("valid", T.BooleanType()),
    T.StructField("error", T.StringType()),
    T.StructField("topic", T.StringType()),
    T.StructField("time_ns", T.LongType()),
    T.StructField("payload", T.BinaryType()),
])

CONTROL_STRUCT = T.StructType([
    T.StructField("valid", T.BooleanType()),
    T.StructField("error", T.StringType()),
    T.StructField("kind", T.StringType()),
    T.StructField("codec", T.StringType()),
    T.StructField("version", T.IntegerType()),
    T.StructField("topics", T.ArrayType(T.StringType())),
    T.StructField("topic", T.StringType()),
])


def decode_envelopes(df: DataFrame, col: str = "value", codec: str = "bincode",
                     out: str = "env") -> DataFrame:
    """Decode a binary frame column to an envelope struct, Arrow-batched.
    Undecodable frames surface as ``valid=false`` rows (error kept) rather
    than failing the job — at data scale one corrupt capture row must not
    kill a 100 TB decode; filter or route on ``valid``."""
    _check_codec(codec)

    @F.pandas_udf(ENVELOPE_STRUCT)
    def _udf(raw: pd.Series) -> pd.DataFrame:
        rows = []
        for b in raw:
            if b is None:
                rows.append((False, "wire codec: null frame", None, None, None))
                continue
            try:
                topic, tns, payload = decode_envelope(bytes(b), codec)
                # u64 → LongType: graph times (ns since epoch) fit i64;
                # a wild length/time from corruption must not wrap silently
                if tns >= 1 << 63:
                    rows.append((False, f"wire codec: time_ns {tns} exceeds i64",
                                 topic, None, payload))
                else:
                    rows.append((True, None, topic, tns, payload))
            except WireCodecError as e:
                rows.append((False, str(e), None, None, None))
        return pd.DataFrame(rows, columns=["valid", "error", "topic", "time_ns", "payload"])

    return df.withColumn(out, _udf(F.col(col)))


def decode_controls(df: DataFrame, env: str = "env", codec: str = "bincode",
                    out: str = "ctrl") -> DataFrame:
    """Decode ``$ctrl``-topic payloads to a control struct (other rows get
    a null struct). Compose after :func:`decode_envelopes`."""
    _check_codec(codec)

    @F.pandas_udf(CONTROL_STRUCT)
    def _udf(payload: pd.Series) -> pd.DataFrame:
        rows = []
        for b in payload:
            if b is None:
                rows.append((False, "wire codec: null payload", None, None, None, None, None))
                continue
            try:
                c = decode_control(bytes(b), codec)
                rows.append((True, None, c["kind"], c.get("codec"),
                             c.get("version"), c.get("topics"), c.get("topic")))
            except WireCodecError as e:
                rows.append((False, str(e), None, None, None, None, None))
        return pd.DataFrame(rows, columns=["valid", "error", "kind", "codec",
                                           "version", "topics", "topic"])

    is_ctrl = F.col(f"{env}.topic") == F.lit(CONTROL_TOPIC)
    return df.withColumn(
        out, F.when(is_ctrl, _udf(F.col(f"{env}.payload"))).otherwise(F.lit(None).cast(CONTROL_STRUCT))
    )


def encode_envelopes(df: DataFrame, topic, time_ns, payload, codec: str = "bincode",
                     out: str = "frame") -> DataFrame:
    """Encode columns to frame bytes — the ``web_pub`` data path
    (web/write.rs:131-181) minus the live socket: write the frames to a
    Kafka bridge / files and any reference client decodes them.
    ``topic`` may be a literal str or a column name."""
    _check_codec(codec)

    @F.pandas_udf(T.BinaryType())
    def _udf(t: pd.Series, tns: pd.Series, p: pd.Series) -> pd.Series:
        return pd.Series(
            [encode_envelope(tv, 0 if pd.isna(nv) else int(nv),
                             b"" if bv is None else bytes(bv), codec)
             for tv, nv, bv in zip(t, tns, p)],
            dtype=object,
        )

    tcol = F.lit(topic) if isinstance(topic, str) and topic not in df.columns else F.col(topic)
    return df.withColumn(out, _udf(tcol, F.col(time_ns), F.col(payload)))


def json_payload_rows(df: DataFrame, schema, env: str = "env",
                      out: str = "item", seq: str = "__seq") -> DataFrame:
    """JSON-codec payloads → typed rows with burst semantics, pure
    Catalyst. A scalar payload is a one-element burst; an array payload is
    a same-``time_ns`` burst whose rows keep wire order in ``seq``
    (wire-types lib.rs:33-36; the browser client surfaces the array as the
    whole group). Feeds :class:`~wingfoil_spark.stream.Stream` directly:
    ``Stream(out_df, ts="time_ns", seq=seq)``."""
    s = F.col(f"{env}.payload").cast("string")
    arr = F.when(F.startswith(F.ltrim(s), F.lit("[")), s).otherwise(
        F.concat(F.lit("["), s, F.lit("]"))
    )
    parsed = F.from_json(arr, T.ArrayType(schema))
    return (
        df.withColumn("__burst", parsed)
        .select("*", F.posexplode("__burst").alias(seq, out))
        .drop("__burst")
    )


def split_control(df: DataFrame, env: str = "env", codec: str = "bincode"):
    """Route a decoded frame DataFrame into ``(data, control)`` — the
    server's dispatch: ``$ctrl`` frames drive subscriptions, every other
    topic carries values (web/server.rs routing; read.rs:21-27)."""
    data = df.where(F.col(f"{env}.valid") & (F.col(f"{env}.topic") != CONTROL_TOPIC))
    ctrl = decode_controls(
        df.where(F.col(f"{env}.valid") & (F.col(f"{env}.topic") == CONTROL_TOPIC)),
        env=env, codec=codec,
    )
    return data, ctrl


# ------------------------------------------------ ws reconnect policy tier

#: Query-key stems whose values are masked (ws.rs:150): best-effort
#: defence against the common secret shapes, not a licence to log URLs.
WS_SECRET_QUERY_KEYS = ("key", "token", "secret", "sign", "pass", "auth",
                        "cred")

#: What a mask replaces a secret with, in both userinfo and query values.
WS_REDACTED = "***"


def redact_ws_url(url: str) -> str:
    """Mask credentials in a WebSocket URL — userinfo passwords and
    secret-looking query values (ws.rs:372-421, byte-for-byte algorithm).
    Deliberately STRING-level, never URL-parsing: its only job is to make
    an error message safe to print, so it must never fail or change the
    URL's shape. A string with no ``scheme://`` still has its query
    masked; only the userinfo step needs an authority."""
    base, _, query = url.partition("?")
    if "://" in base:
        scheme, _, rest = base.partition("://")
        cut = rest.find("/")
        authority, path = (rest, "") if cut < 0 else (rest[:cut], rest[cut:])
        if "@" in authority:
            userinfo, _, host = authority.rpartition("@")
            user = userinfo.split(":", 1)[0]
            base = f"{scheme}://{user}:{WS_REDACTED}@{host}{path}"
    if not query and "?" not in url:
        return base
    masked = "&".join(
        f"{k}={WS_REDACTED}"
        if any(stem in k.lower() for stem in WS_SECRET_QUERY_KEYS)
        else pair
        for pair in query.split("&")
        for k, _, _v in [pair.partition("=")]
    )
    return f"{base}?{masked}"


class WsBackoff:
    """Exponential reconnect backoff (ws.rs:238-273):
    ``delay(attempt) = min(initial * multiplier^(attempt-1), max)``, with
    optional EQUAL jitter — the sleep draws uniformly from
    ``[delay/2, delay]`` (not full jitter, which can retry almost
    immediately). Jitter matters more than it looks: a venue restart
    disconnects its whole fleet at once, and an unjittered fleet then
    reconnects in lockstep forever. ``max_attempts=None`` retries
    forever; a number aborts the run when exhausted."""

    def __init__(self, initial: float = 0.25, max: float = 30.0,
                 multiplier: float = 2.0, jitter: bool = True,
                 max_attempts: int | None = None):
        self.initial = float(initial)
        self.max = float(max)
        self.multiplier = float(multiplier)
        self.jitter = bool(jitter)
        self.max_attempts = max_attempts


def ws_backoff_delay(backoff: WsBackoff, attempt: int, seed: int) -> float:
    """The backoff sleep before retry ``attempt`` (1-based) in seconds —
    a PURE function (ws.rs:432-457): the caller supplies the jitter seed
    (a wall-clock read in production), keeping it testable. A multiplier
    below 1.0 clamps to 1.0 (a shrinking backoff is always a config
    mistake); the exponent saturates so growth can't overflow past the
    cap."""
    multiplier = max(backoff.multiplier, 1.0)
    exponent = min(max(attempt - 1, 0), 64)
    grown = backoff.initial * multiplier ** exponent
    capped = min(grown, backoff.max)
    delay = capped if capped > 0.0 else backoff.max
    if not backoff.jitter:
        return delay
    # Equal jitter over [delay/2, delay]; xorshift of the seed (u64
    # wrapping, matching ws.rs:450-455) spreads a reconnect storm with
    # zero dependencies.
    m = (1 << 64) - 1
    x = (seed | 1) & m
    x ^= (x << 13) & m
    x ^= x >> 7
    x ^= (x << 17) & m
    fraction = (x % 1_000_000) / 1_000_000.0
    return delay * (0.5 + fraction / 2.0)


def validate_ws_url(url: str, run_mode: str = "RealTime",
                    tls_available: bool = False) -> str:
    """The ws_sub/ws_connect wiring guards (tests/ws_adapter.rs:269-335),
    every error printed through :func:`redact_ws_url` so credentials
    never reach a message:

    - historical runs: "HistoricalFrom is unsupported" (a live socket
      has no historical timeline to replay);
    - a non-WebSocket scheme is "not a WebSocket URL";
    - ``wss://`` without TLS support fails AT WIRING naming what fixes
      it (the backoff loop would bury a connect-time failure).

    Returns the url unchanged when valid."""
    safe = redact_ws_url(url)
    if run_mode != "RealTime":
        raise WireCodecError(
            f"ws_sub: RunMode::HistoricalFrom is unsupported — a live "
            f"socket has no historical timeline to replay ({safe})"
        )
    scheme = url.split("://", 1)[0].lower() if "://" in url else ""
    if scheme not in ("ws", "wss"):
        raise WireCodecError(
            f"'{scheme}://' is not a WebSocket URL scheme (this is not a "
            f"WebSocket URL; expected ws:// or wss://): {safe}"
        )
    if scheme == "wss" and not tls_available:
        raise WireCodecError(
            f"wss:// needs TLS support (the reference's ws-tls feature); "
            f"terminate TLS at the bridge or supply a TLS-capable relay: "
            f"{safe}"
        )
    return url
