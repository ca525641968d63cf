"""Property-based tests for the KeyedStateOp step kernels (hypothesis).

The step functions are the single source of operator semantics for both
run modes, so they get adversarial inputs here: random tick streams,
random micro-batch splits — a step must produce identical output whether
it sees the whole history at once or any chunking of it (the resumability
law that makes run-mode duality hold), and must agree with a naive
reference model. Pure python/pandas — no SparkSession needed.
"""

import numpy as np
import warnings

import pandas as pd
from hypothesis import given, settings, strategies as st

from wingfoil_spark.operators.market import order_book_step
from wingfoil_spark.streaming.twins import combine_step, delay_step, rolling_stats_step


def _chunks(pdf, cuts):
    bounds = [0] + sorted(set(cuts)) + [len(pdf)]
    return [pdf.iloc[a:b] for a, b in zip(bounds, bounds[1:]) if b > a]


def _run_chunked(step, init, pdf, cuts):
    st_, outs = init, []
    for chunk in _chunks(pdf, cuts):
        st_, out = step(st_, chunk)
        if len(out):
            outs.append(out)
    if not outs:
        return pd.DataFrame()
    with warnings.catch_warnings():
        # all-NA columns in SOME chunks are legitimate here (a key can be
        # silent in a chunk); the tests compare values after an explicit
        # sort + reset, so the future dtype-determination change cannot
        # alter the comparison — suppress like operators.stateful._concat
        warnings.simplefilter("ignore", FutureWarning)
        return pd.concat(outs, ignore_index=True)


events = st.lists(
    st.tuples(
        st.integers(0, 50),             # ts (duplicates allowed)
        st.integers(0, 1),              # side / flag
        st.floats(-100, 100, allow_nan=False, width=32),
    ),
    min_size=1, max_size=40,
)


@settings(max_examples=60, deadline=None)
@given(events, st.lists(st.integers(1, 39), max_size=3))
def test_combine_step_chunking_invariant(rows, cuts):
    rows = sorted(rows)
    pdf = pd.DataFrame(
        [(1, t, side, i, v if side else None, None if side else v)
         for i, (t, side, v) in enumerate(rows)],
        columns=["k", "ts", "__side", "__seq", "l", "r"],
    )
    step = combine_step("ts", ["l"], ["r"], ["k"], emit="left")
    _, whole = step(None, pdf)
    # chunk at instant boundaries only (the documented burst-atomicity
    # contract: an instant's rows arrive within one micro-batch)
    ts_sorted = pdf["ts"].to_numpy()
    cuts = [c for c in cuts if c < len(pdf) and ts_sorted[c - 1] != ts_sorted[c]]
    chunked = _run_chunked(step, None, pdf, cuts)
    assert len(whole) == len(chunked)
    if len(whole):
        for c in ("ts", "l", "r"):
            a = whole[c].to_numpy(dtype=float)
            b = chunked[c].to_numpy(dtype=float)
            assert ((a == b) | (np.isnan(a) & np.isnan(b))).all()


@settings(max_examples=60, deadline=None)
@given(events, st.lists(st.integers(1, 39), max_size=3))
def test_rolling_stats_step_matches_naive_model(rows, cuts):
    rows = sorted(rows)
    pdf = pd.DataFrame(
        [(1, t, i, round(v, 2)) for i, (t, _, v) in enumerate(rows)],
        columns=["k", "ts", "seq", "v"],
    )
    step = rolling_stats_step("v", 5, "ts", "seq", ["k"])
    cuts = [c for c in cuts if c < len(pdf)]
    out = _run_chunked(step, None, pdf, cuts)
    vals = pdf["v"].to_numpy()
    for i in range(len(pdf)):
        w = vals[max(0, i - 4): i + 1]
        assert out["st_min"].iloc[i] == w.min()
        assert out["st_max"].iloc[i] == w.max()
        assert abs(out["st_sum"].iloc[i] - round(w.sum(), 2)) < 1e-9
        sw = np.sort(w)
        n = len(sw)
        med = (sw[(n + 1) // 2 - 1] + sw[n // 2]) / 2
        assert out["st_median"].iloc[i] == med


@settings(max_examples=60, deadline=None)
@given(events)
def test_delay_step_fires_everything_once_time_passes(rows):
    rows = sorted(rows)
    pdf = pd.DataFrame(
        [(1, t, float(i)) for i, (t, _, _) in enumerate(rows)],
        columns=["k", "ts", "v"],
    )
    DELAY = 7
    step = delay_step(DELAY, "ts", ["v"], ["k"])
    sentinel = pd.DataFrame([(1, pdf["ts"].max() + 2 * DELAY, -1.0)],
                            columns=["k", "ts", "v"])
    out = _run_chunked(step, None, pd.concat([pdf, sentinel], ignore_index=True),
                       [len(pdf) // 2, len(pdf)])
    fired = out[out["v"] >= 0]
    # every original tick delivered exactly once, restamped by +DELAY,
    # deduped on identical (fire_at, value) schedules
    expect = pdf.assign(ts=pdf["ts"] + DELAY)[["k", "ts", "v"]].drop_duplicates()
    got = fired[["k", "ts", "v"]].reset_index(drop=True)
    assert len(got) == len(expect)
    assert set(map(tuple, got.values)) == set(map(tuple, expect.values))


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 1),          # snapshot?
            st.integers(0, 1),          # bid side?
            st.integers(0, 5),          # level
            st.integers(-2, 7),         # qty delta
        ),
        min_size=1, max_size=50,
    ),
    st.lists(st.integers(1, 49), max_size=3),
)
def test_order_book_step_matches_naive_model(updates, cuts):
    pdf = pd.DataFrame(
        [(i, i, "snapshot" if snap else "delta", "bid" if bid else "ask", lvl, qd)
         for i, (snap, bid, lvl, qd) in enumerate(updates)],
        columns=["ts", "upd_seq", "kind", "side", "level", "qty_delta"],
    )
    cuts = [c for c in cuts if c < len(pdf)]
    out_chunks = []
    state = None
    for chunk in _chunks(pdf, cuts):
        state, out = order_book_step(state, chunk)
        out_chunks.append(out)
    out = pd.concat(out_chunks, ignore_index=True)

    bids, asks = {}, {}
    for i, (snap, bid, lvl, qd) in enumerate(updates):
        if snap:
            bids, asks = {}, {}
            if qd > 0:
                (bids if bid else asks)[lvl] = qd
        else:
            book = bids if bid else asks
            q = book.get(lvl, 0) + qd
            if q <= 0:
                book.pop(lvl, None)
            else:
                book[lvl] = q
        bb = max(bids) if bids else None
        ba = min(asks) if asks else None
        r = out.iloc[i]
        assert (pd.isna(r["best_bid"]) and bb is None) or r["best_bid"] == bb
        assert (pd.isna(r["best_ask"]) and ba is None) or r["best_ask"] == ba
        assert r["n_bid_levels"] == len(bids)
        assert r["n_ask_levels"] == len(asks)
        if bb is not None:
            assert r["bid_qty"] == bids[bb]


@settings(max_examples=50, deadline=None)
@given(events, st.lists(st.integers(1, 39), max_size=3))
def test_range_stats_step_chunking_and_model(rows, cuts):
    """range_stats_step: chunking-invariant (instant-boundary splits) and
    equal to a naive per-row window model over ts in [t-W, t]."""
    from wingfoil_spark.streaming.twins import range_stats_step

    W = 10
    rows = sorted(rows)
    pdf = pd.DataFrame(
        [(1, t, i, round(v, 2)) for i, (t, _, v) in enumerate(rows)],
        columns=["k", "ts", "seq", "v"],
    )
    step = range_stats_step("v", W, "ts", "seq", ["k"])
    _, whole = step(None, pdf)
    ts_sorted = pdf["ts"].to_numpy()
    cuts = [c for c in cuts if c < len(pdf) and ts_sorted[c - 1] != ts_sorted[c]]
    chunked = _run_chunked(step, None, pdf, cuts)
    assert len(whole) == len(chunked) == len(pdf)
    for c in ("st_sum", "st_mean", "st_min", "st_max", "st_median"):
        a = whole[c].to_numpy(dtype=float)
        b = chunked[c].to_numpy(dtype=float)
        assert ((a == b) | (np.isnan(a) & np.isnan(b))).all(), c
    # naive model
    for i in range(len(pdf)):
        t = pdf["ts"].iloc[i]
        frame = pdf[(pdf["ts"] >= t - W) & (pdf["ts"] <= t)]["v"]
        assert abs(whole["st_sum"].iloc[i] - frame.sum()) < 1e-6
        assert whole["st_min"].iloc[i] == frame.min()
        assert whole["st_max"].iloc[i] == frame.max()


@settings(max_examples=50, deadline=None)
@given(events, st.lists(st.integers(1, 39), max_size=3))
def test_buffer_step_chunking_and_model(rows, cuts):
    """buffer_step: complete groups are chunking-invariant and match the
    naive capacity-grouped model; the pending partial carries in state."""
    from wingfoil_spark.streaming.twins import buffer_step

    CAP = 4
    rows = sorted(rows)
    pdf = pd.DataFrame(
        [(1, t, i, round(v, 2)) for i, (t, _, v) in enumerate(rows)],
        columns=["k", "ts", "seq", "v"],
    )
    step = buffer_step(CAP, "v", "ts", "seq", ["k"])
    st1, whole = step(None, pdf)
    chunked = _run_chunked(step, None, pdf, cuts)
    n_groups = len(pdf) // CAP
    assert len(whole) == n_groups
    assert len(chunked) == n_groups
    if n_groups:
        for c in ("b_sum", "b_mean", "b_min", "b_max", "b_count"):
            assert (whole[c].to_numpy() == chunked[c].to_numpy()).all(), c
        # naive model on the first group
        g = pdf.sort_values(["ts", "seq"]).iloc[:CAP]["v"]
        assert abs(whole["b_sum"].iloc[0] - g.sum()) < 1e-6
        assert whole["b_count"].iloc[0] == CAP
    assert len(st1) == len(pdf) % CAP  # pending partial


@settings(max_examples=30, deadline=None)
@given(events, st.lists(st.integers(1, 39), max_size=3))
def test_tw_profile_step_chunking_invariant(rows, cuts):
    """tw_profile_step re-runs the shared kernel on accumulated history —
    output must be identical under any chunking (exact, not approximate)."""
    from wingfoil_spark.streaming.twins import tw_profile_step

    rows = sorted(rows)
    # distinct ts per key (the kernel's documented precondition for the
    # batch/stream tie: ties resolved by seq are not modeled ts-only)
    seen, uniq = set(), []
    for t, _, v in rows:
        if t not in seen:
            seen.add(t)
            uniq.append((t, v))
    pdf = pd.DataFrame(
        [(1, t, round(v, 2)) for t, v in uniq], columns=["k", "ts", "v"]
    )
    step = tw_profile_step("v", 10, "ts", ["k"])
    _, whole = step(None, pdf)
    chunked = _run_chunked(step, None, pdf, cuts)
    assert len(whole) == len(chunked) == len(pdf)
    for c in ("tw_mean", "tw_var", "tw_median"):
        a = whole[c].to_numpy(dtype=float)
        b = chunked[c].to_numpy(dtype=float)
        assert (a == b).all(), c


@settings(max_examples=50, deadline=None)
@given(events, st.lists(st.integers(1, 39), max_size=3))
def test_cum_stats_step_chunking_and_model(rows, cuts):
    """cum_stats_step (r4): chunking-invariant and equal to a naive
    expanding-window model, exact median included."""
    from wingfoil_spark.streaming.twins import cum_stats_step

    rows = sorted(rows)
    pdf = pd.DataFrame(
        [(1, t, i, round(v, 2)) for i, (t, _, v) in enumerate(rows)],
        columns=["k", "ts", "seq", "v"],
    )
    step = cum_stats_step("v", "ts", "seq", ["k"])
    _, whole = step(None, pdf)
    chunked = _run_chunked(step, None, pdf, [c for c in cuts if c < len(pdf)])
    assert len(whole) == len(chunked) == len(pdf)
    for c in ("st_sum", "st_mean", "st_min", "st_max", "st_var", "st_std",
              "st_median"):
        a = whole[c].to_numpy(dtype=float)
        b = chunked[c].to_numpy(dtype=float)
        assert (a == b).all(), c
    vals = pdf["v"].to_numpy()
    for i in range(len(pdf)):
        w = vals[: i + 1]
        assert whole["st_min"].iloc[i] == w.min()
        assert whole["st_max"].iloc[i] == w.max()
        assert abs(whole["st_sum"].iloc[i] - round(w.sum(), 2)) < 1e-9
        sw = np.sort(w)
        n = len(sw)
        assert whole["st_median"].iloc[i] == (sw[(n + 1) // 2 - 1] + sw[n // 2]) / 2


@settings(max_examples=50, deadline=None)
@given(events, st.lists(st.integers(1, 39), max_size=3))
def test_tw_cum_step_chunking_and_model(rows, cuts):
    """tw_cum_step (r4): chunking-invariant; mean equals the naive
    committed-weight model (newest sample uncredited)."""
    from wingfoil_spark.streaming.twins import tw_cum_step

    rows = sorted(rows)
    seen, uniq = set(), []
    for t, _, v in rows:
        if t not in seen:
            seen.add(t)
            uniq.append((t, v))
    pdf = pd.DataFrame(
        [(1, t, round(v, 2)) for t, v in uniq], columns=["k", "ts", "v"]
    )
    step = tw_cum_step("v", "ts", ["k"])
    _, whole = step(None, pdf)
    chunked = _run_chunked(step, None, pdf, [c for c in cuts if c < len(pdf)])
    assert len(whole) == len(chunked) == len(pdf)
    for c in ("tw_mean", "tw_var", "tw_std"):
        a = whole[c].to_numpy(dtype=float)
        b = chunked[c].to_numpy(dtype=float)
        assert (a == b).all(), c
    ts = pdf["ts"].to_numpy()
    vals = pdf["v"].to_numpy()
    for i in range(len(pdf)):
        ws = np.diff(ts[: i + 1]).astype(float)
        if ws.sum() == 0:
            assert whole["tw_mean"].iloc[i] == vals[i]
        else:
            m = (vals[:i] * ws).sum() / ws.sum()
            assert abs(whole["tw_mean"].iloc[i] - m) < 1e-9


@settings(max_examples=50, deadline=None)
@given(events, st.lists(st.integers(1, 39), max_size=3),
       st.sampled_from([("rows", 4), ("range", 10)]))
def test_tw_window_step_chunking_and_model(rows, cuts, frame):
    """tw_window_step (r4): chunking-invariant across rows AND range
    frames; median matches the reference crossing-rule select over the
    strictly-prior candidate set."""
    from wingfoil_spark.operators.stateful import _weighted_median_select
    from wingfoil_spark.streaming.twins import tw_window_step

    rows = sorted(rows)
    seen, uniq = set(), []
    for t, _, v in rows:
        if t not in seen:
            seen.add(t)
            uniq.append((t, v))
    pdf = pd.DataFrame(
        [(1, t, round(v, 2)) for t, v in uniq], columns=["k", "ts", "v"]
    )
    step = tw_window_step("v", frame, "ts", ["k"])
    _, whole = step(None, pdf)
    chunked = _run_chunked(step, None, pdf, [c for c in cuts if c < len(pdf)])
    assert len(whole) == len(chunked) == len(pdf)
    for c in ("tw_mean", "tw_var", "tw_std", "tw_median"):
        a = whole[c].to_numpy(dtype=float)
        b = chunked[c].to_numpy(dtype=float)
        assert (a == b).all(), c
    ts = pdf["ts"].to_numpy()
    vals = pdf["v"].to_numpy()
    wdiff = np.append(np.diff(ts).astype(float), np.nan)
    for i in range(len(pdf)):
        if frame[0] == "rows":
            lo = max(0, i - (frame[1] - 1))
        else:
            lo = int(np.searchsorted(ts, ts[i] - frame[1], side="left"))
        vv, ww = vals[lo:i], wdiff[lo:i]
        mask = ww > 0
        exp = _weighted_median_select(vv[mask], ww[mask], vals[i])
        assert whole["tw_median"].iloc[i] == exp, i
