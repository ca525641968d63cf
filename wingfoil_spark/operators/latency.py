"""Latency tracing: per-stage wall-clock stamps on rows + a report
aggregation — the reference's ``Traced<T, L>`` payload stamps and
``latency_report`` (/root/reference/crates/wingfoil/src/latency.rs:
stamp/stamp_precise + toggles; report trait latency.rs:177-204, aggregation
op interp.rs:2105).

Spark shape: a ``__stamps`` array<struct<stage,ts_ns>> column rides the row
through the pipeline; :func:`stamp` appends an executor-side wall-clock
reading (Arrow-batched — one clock read per batch, the vectorized analog of
the reference's lazy clock snap, kernel.rs:301); :func:`latency_report`
explodes consecutive stamp pairs into per-hop deltas and aggregates
count/mean/p50/p95/p99/max per hop — the reference's ``StageStats``.

Engine-level metrics (micro-batch durations, input rates) come from
:class:`wingfoil_spark.streaming.metrics.ProgressListener` instead — the
QueryProgressEvent path.
"""

from __future__ import annotations

import time

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from wingfoil_spark.stream import Stream

STAMPS = "__stamps"


@F.pandas_udf(T.LongType())
def _now_ns(batch: pd.Series) -> pd.Series:
    """One wall-clock read per Arrow batch (vectorized stamp)."""
    now = time.time_ns()
    return pd.Series([now] * len(batch), dtype="int64")


def stamp(s: Stream, stage: str, enabled: bool = True) -> Stream:
    """Append a (stage, wall-clock-ns) stamp to each row's trace. First call
    creates the trace column. Reference: ``stamp`` (latency.rs);
    ``enabled=False`` is the ``stamp_if`` toggle — it wires NOTHING (the
    stream passes through untouched, zero plan cost — the binding's
    disabled-stamp contract, test_latency.py:189-194)."""
    if not enabled:
        return s
    entry = F.struct(F.lit(stage).alias("stage"), _now_ns(F.col(s.ts)).alias("ts_ns"))
    if STAMPS in s.df.columns:
        df = s.df.withColumn(STAMPS, F.concat(F.col(STAMPS), F.array(entry)))
    else:
        df = s.df.withColumn(STAMPS, F.array(entry))
    return s._derive(df)


def stamp_at(s: Stream, stage: str, ns, enabled: bool = True) -> Stream:
    """Deterministic stamp: the stage timestamp comes from a Column (or
    int literal) instead of the wall clock — the ``Traced::with_latency``
    construction shape (tests/latency.rs:189-214 builds records with
    known stage times) and the replay path for analyzing RECORDED
    latencies, where wall time would be meaningless. Same trace column,
    same toggle contract as :func:`stamp`."""
    if not enabled:
        return s
    c = F.lit(ns) if isinstance(ns, int) else ns
    entry = F.struct(F.lit(stage).alias("stage"), c.cast("long").alias("ts_ns"))
    if STAMPS in s.df.columns:
        df = s.df.withColumn(STAMPS, F.concat(F.col(STAMPS), F.array(entry)))
    else:
        df = s.df.withColumn(STAMPS, F.array(entry))
    return s._derive(df)


def latency_report(s: Stream, enabled: bool = True) -> DataFrame:
    """Aggregate per-hop deltas across all traced rows:
    (from_stage, to_stage, n, mean_ns, p50_ns, p95_ns, p99_ns, max_ns).
    Reference: ``latency_report`` / ``StageStats`` (latency.rs:177-204).
    ``enabled=False`` is ``latency_report_if(false)`` — no observing sink
    installs and the stats stay empty (tests/latency.rs:219-246): an
    empty frame in the report schema, zero plan cost."""
    if not enabled:
        spark = s.df.sparkSession
        return spark.createDataFrame(
            [],
            "from_stage string, to_stage string, n long, mean_ns double, "
            "p50_ns long, p95_ns long, p99_ns long, max_ns long",
        )
    if STAMPS not in s.df.columns:
        raise ValueError("stream has no stamps; call stamp() first")
    n = F.size(F.col(STAMPS))
    hops = F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.struct(
            F.element_at(F.col(STAMPS), i)["stage"].alias("from_stage"),
            F.element_at(F.col(STAMPS), i + 1)["stage"].alias("to_stage"),
            (
                F.element_at(F.col(STAMPS), i + 1)["ts_ns"]
                - F.element_at(F.col(STAMPS), i)["ts_ns"]
            ).alias("delta_ns"),
        ),
    )
    exploded = (
        s.df.where(n >= 2)
        .select(F.explode(hops).alias("h"))
        .select("h.from_stage", "h.to_stage", "h.delta_ns")
    )
    return exploded.groupBy("from_stage", "to_stage").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("delta_ns").alias("mean_ns"),
        F.percentile_approx("delta_ns", 0.5).alias("p50_ns"),
        F.percentile_approx("delta_ns", 0.95).alias("p95_ns"),
        F.percentile_approx("delta_ns", 0.99).alias("p99_ns"),
        F.max("delta_ns").alias("max_ns"),
    )


def timed(s: Stream, label: str = "run") -> tuple[int, float]:
    """Materialize the stream and report (rows, wall seconds) — the
    reference's ``timed`` end-of-run summary (fluent.rs:1047,
    ops.rs:532-582). Engine-internal stage timings live in the Spark UI /
    QueryExecution metrics; this is the user-facing wall number."""
    t0 = time.perf_counter()
    n = s.df.count()
    dt = time.perf_counter() - t0
    print(f"[wingfoil_spark] {label}: {n} rows in {dt:.3f}s")
    return n, dt


# ---------------------------------------------------------------------------
# The cross-process latency record: the Python binding's `Latency` /
# `TracedBytes` surface and its 8-byte-per-stage wire header
# (wingfoil-python/src/latency.rs; goldens in
# wingfoil-python/tests/test_latency.py:40-126, 128-160). An adapter
# prepends `to_bytes()` to the message body; the far side restores with
# `from_bytes(data, stages)` — trailing payload ignored. This is the
# carrier contract; the in-pipeline stamping above is the column tier.
# ---------------------------------------------------------------------------

import struct


class Latency:
    """Named-stage latency record: u64 nanosecond stamps, dict-style
    access by stage name, and the little-endian 8-byte-per-stage wire
    header. A fresh record is unstamped (all zeros)."""

    __slots__ = ("stages", "stamps")

    def __init__(self, stages):
        stages = list(stages)
        if not stages:
            raise ValueError("Latency needs at least one stage")
        if len(set(stages)) != len(stages):
            raise ValueError(f"duplicate stage names: {stages}")
        self.stages = stages
        self.stamps = [0] * len(stages)

    def _idx(self, stage: str) -> int:
        try:
            return self.stages.index(stage)
        except ValueError:
            raise KeyError(stage) from None

    def __getitem__(self, stage: str) -> int:
        return self.stamps[self._idx(stage)]

    def __setitem__(self, stage: str, ns: int) -> None:
        self.stamps[self._idx(stage)] = int(ns)

    def __repr__(self) -> str:
        inner = ", ".join(f"{s}={v}" for s, v in zip(self.stages, self.stamps))
        return f"Latency({inner})"

    def to_bytes(self) -> bytes:
        """The wire header: one little-endian u64 per stage, stage order."""
        return struct.pack(f"<{len(self.stamps)}Q", *self.stamps)

    @classmethod
    def from_bytes(cls, data: bytes, stages) -> "Latency":
        """Restore from a header (+ optional trailing payload, ignored).
        Validates the byte length AND the stage list (the binding's
        deviation 5 from legacy: a duplicate stage list is an error, not
        just a length check)."""
        rec = cls(stages)  # validates non-empty + unique
        need = 8 * len(rec.stages)
        if len(data) < need:
            raise ValueError(
                f"header needs {need} bytes for {len(rec.stages)} stages, got {len(data)}"
            )
        rec.stamps = list(struct.unpack(f"<{len(rec.stages)}Q", data[:need]))
        return rec


class TracedBytes:
    """The carrier: a payload plus its latency record. The record is
    SHARED, not copied — a stamp through the carrier mutates the caller's
    record (the binding's in-place contract)."""

    __slots__ = ("payload", "latency")

    def __init__(self, payload: bytes, latency: Latency):
        self.payload = payload
        self.latency = latency

    def to_bytes(self) -> bytes:
        """header + body — the adapter egress shape."""
        return self.latency.to_bytes() + self.payload

    @classmethod
    def from_bytes(cls, data: bytes, stages) -> "TracedBytes":
        rec = Latency.from_bytes(data, stages)
        return cls(data[8 * len(rec.stages):], rec)

    def __repr__(self) -> str:
        return f"TracedBytes(len={len(self.payload)}, {self.latency!r})"


def decode_traced(df: DataFrame, col: str, stages: list[str],
                  payload_out: str = "payload") -> DataFrame:
    """Data-scale decode of captured TracedBytes: split each binary value
    into per-stage stamp columns (long ns) + the trailing payload.
    Arrow-batched, row-local (one Python stage, no shuffle)."""
    n = len(stages)
    if len(set(stages)) != n or n == 0:
        raise ValueError(f"invalid stage list: {stages}")
    fields = [T.StructField(s, T.LongType()) for s in stages]
    fields.append(T.StructField(payload_out, T.BinaryType()))

    @F.pandas_udf(T.StructType(fields))
    def dec(b: pd.Series) -> pd.DataFrame:
        rows = []
        for v in b:
            rec = TracedBytes.from_bytes(bytes(v), stages)
            rows.append((*rec.latency.stamps, rec.payload))
        return pd.DataFrame(rows, columns=[*stages, payload_out])

    out = df.withColumn("__tr", dec(F.col(col)))
    for s in stages:
        out = out.withColumn(s, F.col(f"__tr.{s}"))
    return out.withColumn(payload_out, F.col(f"__tr.{payload_out}")).drop("__tr")
