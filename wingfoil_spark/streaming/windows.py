"""Event-time windowed aggregation with watermarks — streaming twins of the
batch window ops.

The reference has NO late-data machinery: historical replay requires
non-decreasing timestamps (adapters/csv.rs:110-115) and realtime processes
arrival order (SURVEY §2.10). Watermarks are our Spark-native extension:
the same tumbling/session aggregation runs over unbounded input, tolerating
``allowed_lateness`` of out-of-order data, emitting finalized windows.

Time model bridge: engine time is int64 ns/µs (the reference's NanoTime);
Spark's watermark machinery needs TimestampType — these helpers derive a
timestamp column from the long, aggregate, and hand back long-stamped
results, so the rest of the engine never sees TimestampType."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from wingfoil_spark.stream import Stream


def _to_ts(col: Column, unit_ns: int) -> Column:
    """int64 engine time → TimestampType (µs precision for Spark)."""
    return F.timestamp_micros((col * unit_ns / 1000).cast("long"))


def tumbling_stream(
    s: Stream,
    interval_ns: int,
    aggs: dict[str, Column],
    allowed_lateness_s: int = 60,
    unit_ns: int = 1,
) -> DataFrame:
    """Streaming tumbling window: same emission contract as
    :meth:`Stream.tumbling` (one row per (keys, bucket), stamped at the
    interval end) plus a watermark so late rows within
    ``allowed_lateness_s`` still land in their window.

    ``unit_ns``: nanoseconds per unit of the stream's ts column (1 for ns
    timestamps, 1000 for µs)."""
    secs = max(interval_ns * unit_ns // 1_000_000_000, 1)
    df = s.df.withColumn("__t", _to_ts(F.col(s.ts), unit_ns))
    df = df.withWatermark("__t", f"{allowed_lateness_s} seconds")
    out = (
        df.groupBy(*s.keys, F.window("__t", f"{secs} seconds").alias("__w"))
        .agg(*[v.alias(k) for k, v in aggs.items()])
        .withColumn(s.ts, (F.unix_micros(F.col("__w.end")) * 1000) / unit_ns)
        .withColumn(s.ts, F.col(s.ts).cast("long"))
        .drop("__w")
    )
    return out


def session_stream(
    s: Stream,
    gap_s: int,
    aggs: dict[str, Column],
    allowed_lateness_s: int = 60,
    unit_ns: int = 1,
) -> DataFrame:
    """Streaming gap-based session windows (``session_window``) — the
    sessionization capability the reference lacks entirely, in streaming
    form. Emits one row per closed session with start/end in engine time."""
    df = s.df.withColumn("__t", _to_ts(F.col(s.ts), unit_ns))
    df = df.withWatermark("__t", f"{allowed_lateness_s} seconds")
    out = (
        df.groupBy(*s.keys, F.session_window("__t", f"{gap_s} seconds").alias("__w"))
        .agg(*[v.alias(k) for k, v in aggs.items()])
        .withColumn("start_ts", (F.unix_micros(F.col("__w.start")) * 1000 / unit_ns).cast("long"))
        .withColumn("end_ts", (F.unix_micros(F.col("__w.end")) * 1000 / unit_ns).cast("long"))
        .drop("__w")
    )
    return out
