"""The statistics matrix: {rolling, cumulative, time-windowed} ×
{sum, mean, min, max, var, std, median} × {tick, time} weighting.

Reference: ``StatisticsOps`` (crates/wingfoil/src/stats.rs:18-185; op impls
ops.rs:821-2669). The Python binding exposes the same surface as one
parameterized ``moment(stream, Moment, Window, Weighting)`` call
(crates/wingfoil-python/src/statistics.rs:320-414) — mirrored here by
:func:`window_stat`.

Frame spec:
    ("rows", n)    — last n ticks        (reference rolling_*,  stats.rs:32)
    ("range", ns)  — trailing duration   (reference time_windowed_*, stats.rs:90)
    ("cum",)       — since start         (reference cumulative_*, stats.rs:59)

Weighting:
    "tick" — every tick weighs 1. Var/std are sample-style (ddof=1) and seed
             to 0.0 (not SQL NULL) with a single sample, and a rows-window
             of 0 clamps to 1 — both pinned by the reference's goldens
             (statistics_rolling.rs:9-15,175-196; replayed in
             tests/test_reference_stats_goldens.py).
    "time" — each sample weighted by the time it was *in effect* (left-
             continuous step signal: a sample contributes nothing until the
             next tick; the newest sample has weight 0). Var/std are
             population-style. Semantics pinned by the reference's
             tests/statistics_time_weighted.rs:1-30: the mean seeds to the
             current sample while no weight has accumulated.

Everything is expressed as built-in window aggregates (JVM-side, codegen) —
no Python in the hot path. Exact median uses sort_array(collect_list) over
the frame (exact, unlike percentile_approx; O(frame) memory per row, which
is fine for bounded frames — for unbounded frames at scale prefer
``approx_median`` below).
"""

from __future__ import annotations

from pyspark.sql import Column, Window
from pyspark.sql import functions as F

from wingfoil_spark.stream import Stream

_TICK_AGGS = {
    "sum": F.sum,
    "mean": F.avg,
    "min": F.min,
    "max": F.max,
    "var": F.var_samp,
    "std": F.stddev_samp,
    "count": F.count,
}


def _normalize_stat_args(stat: str, frame, weighting: str):
    """The Python binding's argument shorthands (wingfoil-python
    tests/test_statistics.py — the pyo3 marshaling contract): no window /
    ``None`` is the cumulative (unbounded) window, a bare ``int`` is the
    count window of that many samples, ``"count"`` is the tick weighting's
    other name, and ``average`` aliases ``mean``."""
    if frame is None or frame == "cum":
        frame = ("cum",)
    elif isinstance(frame, int):
        frame = ("rows", frame)
    else:
        frame = tuple(frame)
    weighting = {"count": "tick"}.get(weighting, weighting)
    stat = {"average": "mean", "variance": "var"}.get(stat, stat)
    return stat, frame, weighting


def _frame_window(s: Stream, frame) -> tuple:
    kind = frame[0]
    if kind == "rows":
        # a zero window clamps to one (the reference's window.max(1) —
        # statistics_rolling.rs:175-196)
        n = max(frame[1], 1)
        return s.w_rows(-(n - 1), 0), s.w_rows(-(n - 1), -1)
    if kind == "range":
        return s.w_range(-frame[1], 0), None  # excl-current variant unused
    if kind == "cum":
        return s.w_cum(), s.w_rows(Window.unboundedPreceding, -1)
    raise ValueError(f"unknown frame {frame!r}")


def _exact_median(col: str, w) -> Column:
    arr = F.sort_array(F.collect_list(F.col(col)).over(w))
    n = F.size(arr)
    lo = F.element_at(arr, ((n + 1) / 2).cast("int"))
    hi = F.element_at(arr, (n / 2 + 1).cast("int"))
    return (lo + hi) / 2


def window_stat(
    s: Stream,
    col: str,
    stat: str,
    frame,
    weighting: str = "tick",
    out: str | None = None,
) -> Stream:
    """One cell of the statistics matrix, as a new column ``out``.

    On a STREAMING DataFrame the window-function form is rejected by
    Structured Streaming; the call transparently rebinds to the equivalent
    KeyedStateOp twin (:mod:`wingfoil_spark.streaming.twins`) — same
    semantics, pinned by test_streaming_duality. EVERY (frame × weighting
    × stat) cell binds on streams as of r4. Duality contract: the twins
    accumulate in exact integer cents, bitwise-equal to the decimal-staged
    batch windows for 2-DECIMAL inputs; >2-decimal values switch the
    affected key to float accumulation (approximate duality — documented,
    guarded per batch). Range-frame time-weighted mean/var additionally
    diverge from the batch rangeBetween window on same-timestamp bursts
    only: the batch frame sees the whole instant's committed weight
    (look-ahead), a causal stream cannot — pinned by the burst duality
    test.

    Argument shorthands (the binding's marshaling contract,
    wingfoil-python tests/test_statistics.py): ``frame=None``/``"cum"`` →
    cumulative, a bare int → that many samples, ``weighting="count"`` ≡
    ``"tick"``, ``stat="average"`` ≡ ``"mean"``, ``"variance"`` ≡
    ``"var"``."""
    stat, frame, weighting = _normalize_stat_args(stat, frame, weighting)
    out = out or f"{stat}_{frame[0]}"
    if s.df.isStreaming:
        return _streaming_stat(s, col, stat, frame, weighting, out)
    w, w_prev = _frame_window(s, frame)

    if weighting == "tick":
        if stat == "median":
            return s.map(**{out: _exact_median(col, w)})
        expr = _TICK_AGGS[stat](F.col(col)).over(w)
        if stat in ("var", "std"):
            # single-sample seed is 0.0, NOT SQL's NULL — the reference
            # convention (statistics_rolling.rs:9-15: "0.0 until at least
            # two samples are present")
            expr = F.coalesce(expr, F.lit(0.0))
        return s.map(**{out: expr})

    if weighting != "time":
        raise ValueError(f"unknown weighting {weighting!r}")
    return _time_weighted(s, col, stat, frame, out)


def _time_weighted(s: Stream, col: str, stat: str, frame, out: str) -> Stream:
    """Time-weighted stats via a precomputed in-effect weight column.

    ``w_i = ts_{i+1} - ts_i`` (per key). At row n the weighted aggregate
    runs over the RETAINED samples minus the newest (which has no weight
    yet) — the reference's committed-interval semantics
    (statistics_time_weighted.rs:8-23). Seeds to the current sample (mean)
    / 0 (var) while no weight has accumulated. Frames:

    - ("rows", n): the last n samples → rows window ending at -1;
    - ("cum",): unbounded → rows window ending at -1;
    - ("range", ns): samples whose tick time is within the trailing span
      (a sample aged strictly past the span is evicted with its WHOLE
      interval — statistics_time_windowed.rs retention, NOT a clipped
      integral; the exact clipped-integral form remains available as
      :func:`wingfoil_spark.operators.stateful.time_windowed_time_weighted`)
      → range window including the current row, minus the current row's
      own terms. All three are pure JVM window expressions.
    """
    # null value = non-tick BEFORE weights: the in-effect interval of the
    # preceding sample must run to the next REAL tick, not split at a
    # null row (matches the recursive ops' null contract)
    s = Stream(s.df.where(F.col(col).isNotNull()), s.ts, s.seq, s.keys)
    wname = f"__w_{col}"
    base = s.map(**{wname: F.lead(s.ts).over(s._w_plain()) - F.col(s.ts)})
    v, wt = F.col(col).cast("double"), F.col(wname).cast("double")

    if frame[0] == "range":
        if stat == "median":
            from wingfoil_spark.operators.stateful import weighted_median
            return weighted_median(base, col, wname, frame, out)
        wa = base.w_range(-frame[1], 0)
        w0 = F.coalesce(wt, F.lit(0.0))
        sw = F.sum(wt).over(wa) - w0
        swv = F.sum(wt * v).over(wa) - w0 * v
        swv2 = F.sum(wt * v * v).over(wa) - w0 * v * v
    else:
        if frame[0] == "rows":
            wa = base.w_rows(-(frame[1] - 1), -1)
        else:
            wa = base.w_rows(Window.unboundedPreceding, -1)
        sw = F.sum(wt).over(wa)
        swv = F.sum(wt * v).over(wa)
        swv2 = F.sum(wt * v * v).over(wa)

    mean = F.when(sw.isNull() | (sw == 0), v).otherwise(swv / sw)
    if stat == "mean":
        res = base.map(**{out: mean})
        return Stream(res.df.drop(wname), res.ts, res.seq, res.keys)
    if stat in ("var", "std"):
        var = F.when(sw.isNull() | (sw == 0), F.lit(0.0)).otherwise(
            swv2 / sw - (swv / sw) * (swv / sw)
        )
        # numerical floor: E[x²]-E[x]² can go epsilon-negative
        var = F.greatest(var, F.lit(0.0))
        expr = var if stat == "var" else F.sqrt(var)
        res = base.map(**{out: expr})
        return Stream(res.df.drop(wname), res.ts, res.seq, res.keys)
    if stat == "median":
        from wingfoil_spark.operators.stateful import weighted_median
        return weighted_median(base, col, wname, frame, out)
    raise ValueError(f"time weighting undefined for stat {stat!r}")


def _streaming_stat(s: Stream, col: str, stat: str, frame, weighting: str,
                    out: str) -> Stream:
    """Bind one stats-matrix cell on a streaming frame via the KeyedStateOp
    twins (r2 gap: ``stat(..., ("range", ns))`` on readStream raised
    AnalysisException). Output carries (keys, ts[, seq], col, out) — other
    payload columns don't pass through the stateful stage."""
    from pyspark.sql import types as T

    from wingfoil_spark.streaming.stateful import KeyedStateOp
    from wingfoil_spark.streaming import twins

    keys = list(s.keys)
    if not keys:
        raise ValueError("streaming stats need a keyed stream")
    key_fields = [s.df.schema[k] for k in keys]
    base_fields = key_fields + [T.StructField(s.ts, T.LongType())]
    seq_fields = [T.StructField(s.seq, s.df.schema[s.seq].dataType)] if s.seq else []

    if weighting == "tick":
        names = {"sum": "st_sum", "mean": "st_mean", "min": "st_min",
                 "max": "st_max", "var": "st_var", "std": "st_std",
                 "median": "st_median"}
        if stat not in names:
            raise ValueError(f"unsupported streaming stat {stat!r}")
        if frame[0] == "rows":
            # rows-0 clamps to 1, mirroring batch _frame_window (the
            # reference window.max(1) — statistics_rolling.rs:175-196)
            step = twins.rolling_stats_step(col, max(frame[1], 1), s.ts,
                                            s.seq, keys)
        elif frame[0] == "range":
            step = twins.range_stats_step(col, frame[1], s.ts, s.seq, keys)
        else:  # ("cum",) — running matrix with exact median (r3 gap closed)
            step = twins.cum_stats_step(col, s.ts, s.seq, keys)
        schema = T.StructType(
            base_fields + seq_fields + [T.StructField(col, T.DoubleType())]
            + [T.StructField(n, T.DoubleType()) for n in
               ("st_sum", "st_mean", "st_min", "st_max", "st_var", "st_std",
                "st_median")]
        )
        op = KeyedStateOp(step, out_schema=schema, init_state=None,
                          ts=s.ts, seq=s.seq, keys=tuple(keys))
        res = op.run_stream(s.df)
        keep = [*keys, s.ts, *([s.seq] if s.seq else []), col]
        res = res.select(*keep, F.col(names[stat]).alias(out))
        return Stream(res, ts=s.ts, seq=s.seq, keys=s.keys)

    if weighting != "time":
        raise ValueError(f"unknown weighting {weighting!r}")
    if stat not in ("mean", "var", "std", "median"):
        raise ValueError(f"time weighting undefined for stat {stat!r}")
    # every (frame × stat) cell of the time-weighted matrix now binds on
    # streams (r3 gap closed); pick the cheapest-state step that covers it
    if frame[0] == "range" and stat != "median":
        # sample-retention semantics, matching the batch ("range", ns)
        # time default (statistics_time_weighted.rs eviction)
        step = twins.tw_range_step(col, frame[1], s.ts, keys)
        stat_cols = ("tw_mean", "tw_var", "tw_std")
    elif frame[0] == "cum":
        if stat == "median":
            # cumulative weighted median needs full history: the fused
            # profile twin (its tw_median IS the cumulative frame)
            step = twins.tw_profile_step(col, 1, s.ts, keys)
            stat_cols = ("tw_mean", "tw_var", "tw_median")
        else:
            step = twins.tw_cum_step(col, s.ts, keys)
            stat_cols = ("tw_mean", "tw_var", "tw_std")
    else:  # rows frame (all stats) or range median: the causal walk
        step = twins.tw_window_step(col, frame, s.ts, keys)
        stat_cols = ("tw_mean", "tw_var", "tw_std", "tw_median")
    schema = T.StructType(
        base_fields + [T.StructField(col, T.DoubleType())]
        + [T.StructField(n, T.DoubleType()) for n in stat_cols]
    )
    op = KeyedStateOp(step, out_schema=schema, init_state=None,
                      ts=s.ts, seq=None, keys=tuple(keys))
    res = op.run_stream(s.df)
    res = res.select(*keys, s.ts, col, F.col(f"tw_{stat}").alias(out))
    return Stream(res, ts=s.ts, seq=None, keys=s.keys)


def approx_median(s: Stream, col: str, frame, out: str = "median_approx",
                  accuracy: int = 10000) -> Stream:
    """Sketch-based median for unbounded/huge frames (100 TB path): constant
    memory per row vs collect_list's O(frame)."""
    w, _ = _frame_window(s, frame)
    return s.map(**{out: F.percentile_approx(F.col(col), 0.5, accuracy).over(w)})
