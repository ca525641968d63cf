"""Streaming twins for the window-function core combinators.

The batch implementations of ``combine_latest`` / ``join_passive`` /
``filter_latch`` / the rolling stats matrix / ``delay`` compile to SQL
window functions, which Structured Streaming rejects — so round-1's
run-mode duality (reference ``RunMode``, runtime/run.rs:16-29) held only
for KeyedStateOp ops. This module closes the gap: each combinator gets a
:class:`~wingfoil_spark.streaming.stateful.KeyedStateOp` step function
whose ``run_batch`` output equals the window-based batch operator (pinned
by tests/test_streaming_duality.py) and whose ``run_stream`` binding runs
the SAME step under ``applyInPandasWithState``.

Input convention (combine/filter/delay): a *tagged union* frame built by
:func:`tagged_union` — both sides' rows with a ``__side`` column (0 =
right/passive first within an instant, 1 = left/active), ``__seq`` the
upstream seq. This mirrors the batch ``_combine`` union exactly
(stream.py), so ordering semantics are shared by construction.

Burst atomicity note: an instant's rows must arrive within one micro-batch
(the reference delivers bursts in one cycle — runtime/burst.rs:16; Kafka
partition order gives this in practice). ``combine`` emission happens when
the instant completes inside the batch.

Timer API note: Spark 4.1's ``transformWithStateInPandas`` offers true
event-time timers (a pending delivery would fire on watermark passage with
no new data for the key — the exact reference timer node, ops.rs:3090).
Its state protocol requires ``google.protobuf``, absent from this
environment (verified: the TWS driver worker crashes importing
StateMessage_pb2), so the twins here bind via ``applyInPandasWithState``
and check pending deliveries against each batch's max event time; swap the
binding when protobuf is available — the step functions carry over.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wingfoil_spark.stream import Stream
from wingfoil_spark.streaming.stateful import KeyedStateOp, StepFn


def tagged_union(left: Stream, right: Stream, lvals: list[str], rvals: list[str]) -> DataFrame:
    """The batch ``_combine`` union shape, reusable by both run modes:
    (keys, ts, __side, __seq, lvals..., rvals...) with nulls on the other
    side's columns."""
    if left.keys != right.keys:
        raise ValueError("tagged_union requires equal keys")
    ts = left.ts
    ldf = left.df.select(
        *left.keys, F.col(left.ts).alias(ts), F.lit(1).alias("__side"),
        (F.col(left.seq) if left.seq else F.lit(0)).cast("long").alias("__seq"),
        *lvals,
        *[F.lit(None).cast(right.df.schema[c].dataType).alias(c) for c in rvals],
    )
    rdf = right.df.select(
        *right.keys, F.col(right.ts).alias(ts), F.lit(0).alias("__side"),
        (F.col(right.seq) if right.seq else F.lit(0)).cast("long").alias("__seq"),
        *[F.lit(None).cast(left.df.schema[c].dataType).alias(c) for c in lvals],
        *rvals,
    )
    return ldf.unionByName(rdf)


def combine_step(
    ts: str, lvals: list[str], rvals: list[str], keys: list[str], emit: str = "either"
) -> StepFn:
    """Combine-latest as a resumable step. State = the two latches (dict of
    col → last value). ``emit='either'``: one row per completed instant
    carrying both latches (reference ``join``, ops.rs:2983-3008);
    ``emit='left'``: one row per left tick (``join_passive`` / ``sample``,
    ops.rs:3033-3063). Matches the batch window implementation row-for-row
    when instants don't straddle micro-batches."""
    cols = [*lvals, *rvals]

    def step(state, pdf: pd.DataFrame):
        lat = dict(state) if state else {c: None for c in cols}
        pdf = pdf.sort_values([ts, "__side", "__seq"], kind="mergesort")
        keyvals = tuple(pdf.iloc[0][k] for k in keys) if len(pdf) else ()
        t_arr = pdf[ts].to_numpy()
        side_arr = pdf["__side"].to_numpy()
        val_arrs = {c: pdf[c].to_numpy() for c in cols}
        rows = []
        n = len(pdf)
        for i in range(n):
            own = lvals if side_arr[i] == 1 else rvals
            for c in own:
                v = val_arrs[c][i]
                if not (isinstance(v, float) and np.isnan(v)) and v is not None:
                    lat[c] = v
            if emit == "left":
                if side_arr[i] == 1:
                    rows.append((int(t_arr[i]), *[lat[c] for c in cols]))
            else:  # either: emit when the instant completes
                if i + 1 == n or t_arr[i + 1] != t_arr[i]:
                    rows.append((int(t_arr[i]), *[lat[c] for c in cols]))
        out = pd.DataFrame(
            [(*keyvals, t, *vs) for t, *vs in rows], columns=[*keys, ts, *cols]
        )
        return lat, out

    return step


def combine_latest_op(
    left: Stream, right: Stream, lvals: list[str], rvals: list[str], emit: str = "either"
) -> tuple[KeyedStateOp, DataFrame]:
    """(op, tagged-union frame) for a combine-latest: ``op.run_batch(u)``
    equals the window-based ``Stream.combine_latest``; feed a readStream
    union to ``op.run_stream`` for realtime."""
    keys = list(left.keys)
    schema_fields = []
    from pyspark.sql import types as T

    for k in keys:
        schema_fields.append(left.df.schema[k])
    schema_fields.append(T.StructField(left.ts, T.LongType()))
    for c in lvals:
        schema_fields.append(T.StructField(c, left.df.schema[c].dataType))
    for c in rvals:
        schema_fields.append(T.StructField(c, right.df.schema[c].dataType))
    op = KeyedStateOp(
        combine_step(left.ts, lvals, rvals, keys, emit),
        out_schema=T.StructType(schema_fields),
        init_state=None,
        ts=left.ts,
        seq="__seq",
        keys=tuple(keys),
    )
    return op, tagged_union(left, right, lvals, rvals)


def rolling_stats_step(
    col: str, n: int, ts: str, seq: str | None, keys: list[str]
) -> StepFn:
    """Trailing-``n``-ticks stats matrix as a resumable step. State = the
    last n (cents, value) pairs. Sums accumulate in exact integers and
    convert with the same double op-order as the window/SQL implementation
    ((s2 - s1²/n)/(n-1) decimal-exact → double), so all three bindings
    (window batch, step batch, step stream) agree bitwise."""

    def step(state, pdf: pd.DataFrame):
        hist: list[tuple[int, float]] = list(state) if state else []
        out_rows = []
        order = [ts] + ([seq] if seq else [])
        pdf = pdf.sort_values(order, kind="mergesort")
        keyvals = tuple(pdf.iloc[0][k] for k in keys) if len(pdf) else ()
        meta = pdf[order].to_numpy()
        vals = pdf[col].to_numpy(dtype=np.float64)
        for i in range(len(pdf)):
            v = float(vals[i])
            vc = int(round(v * 100))
            hist.append((vc, v))
            if len(hist) > n:
                hist.pop(0)
            cs = [c for c, _ in hist]
            vs = sorted(x for _, x in hist)
            cnt = len(hist)
            s1 = float(sum(cs)) / 100.0
            s2 = float(sum(c * c for c in cs)) / 10000.0
            var = max((s2 - s1 * s1 / cnt) / (cnt - 1), 0.0) if cnt > 1 else None
            med = (vs[(cnt + 1) // 2 - 1] + vs[cnt // 2]) / 2
            out_rows.append(
                (*[int(m) for m in meta[i]], v, s1, s1 / cnt, min(vs), max(vs),
                 var, np.sqrt(var) if var is not None else None, med)
            )
        out = pd.DataFrame(
            [(*keyvals, *r) for r in out_rows],
            columns=[*keys, *order, col, "st_sum", "st_mean", "st_min", "st_max",
                     "st_var", "st_std", "st_median"],
        )
        return hist, out

    return step


def throttle_step(interval_ns: int, ts: str, keys: list[str]) -> StepFn:
    """Timer-accurate throttle as a resumable step (state = next-allowed
    ts), identical to the batch ``throttle_exact`` walk (ops.rs:381-414)."""

    def step(state, pdf: pd.DataFrame):
        next_ok = state if state is not None else -(1 << 62)
        keep = []
        t_arr = pdf[ts].to_numpy()
        for i in range(len(pdf)):
            t = int(t_arr[i])
            if t >= next_ok:
                keep.append(i)
                next_ok = t + interval_ns
        return next_ok, pdf.iloc[keep]

    return step


def drop_small_change_step(col: str, tol: float, keys: list[str]) -> StepFn:
    """drop_small_change as a resumable step (state = last emitted value),
    identical to the batch kernel (ops.rs:227-262)."""

    def step(state, pdf: pd.DataFrame):
        ref = state
        keep = []
        v = pdf[col].to_numpy(dtype=np.float64)
        for i in range(len(pdf)):
            x = float(v[i])
            if ref is None or abs(x - ref) > tol:
                keep.append(i)
                ref = x
        return ref, pdf.iloc[keep]

    return step


def delay_step(
    delay_ns: int, ts: str, vals: list[str], keys: list[str]
) -> StepFn:
    """Timer-based delay as a resumable step (reference delay timers,
    ops.rs:3090-3155): every tick schedules (t+delay, values); pending
    deliveries fire once the key's event time passes their fire time
    (checked per micro-batch against the batch's max event time). TimeQueue
    dedup: identical (fire_at, values) schedules collapse
    (runtime/time_queue.rs:136)."""

    def step(state, pdf: pd.DataFrame):
        pending: list[tuple] = list(state) if state else []
        pdf = pdf.sort_values([ts], kind="mergesort")
        keyvals = tuple(pdf.iloc[0][k] for k in keys) if len(pdf) else ()
        t_arr = pdf[ts].to_numpy()
        val_arrs = [pdf[c].to_numpy() for c in vals]
        for i in range(len(pdf)):
            item = (int(t_arr[i]) + delay_ns, tuple(a[i] for a in val_arrs))
            if item not in pending:
                pending.append(item)
        max_t = int(t_arr[-1]) if len(t_arr) else None
        fired, keep = [], []
        for item in pending:
            (fired if max_t is not None and item[0] <= max_t else keep).append(item)
        fired.sort(key=lambda p: p[0])
        out = pd.DataFrame(
            [(*keyvals, t, *v) for t, v in fired], columns=[*keys, ts, *vals]
        )
        return keep, out

    return step
