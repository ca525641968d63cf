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


def stamp(s: Stream, stage: str) -> Stream:
    """Append a (stage, wall-clock-ns) stamp to each row's trace. First call
    creates the trace column. Reference: ``stamp`` (latency.rs) — the
    ``stamp_if`` toggle is ordinary conditional wiring here."""
    entry = F.struct(F.lit(stage).alias("stage"), _now_ns(F.col(s.ts)).alias("ts_ns"))
    if STAMPS in s.df.columns:
        df = s.df.withColumn(STAMPS, F.concat(F.col(STAMPS), F.array(entry)))
    else:
        df = s.df.withColumn(STAMPS, F.array(entry))
    return s._derive(df)


def latency_report(s: Stream) -> DataFrame:
    """Aggregate per-hop deltas across all traced rows:
    (from_stage, to_stage, n, mean_ns, p50_ns, p95_ns, p99_ns, max_ns).
    Reference: ``latency_report`` / ``StageStats`` (latency.rs:177-204)."""
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
