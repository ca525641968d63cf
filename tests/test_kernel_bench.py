"""Kernel micro-benchmarks: vectorized kernels must match the naive
per-row walk BITWISE (the semantics are pinned by recursive-CTE oracles)
and beat it by a wide margin on a large key.

No Spark involved — these pin the pure numpy kernels that run inside the
Arrow stages, on the 1M-row-per-key shape a 100 TB stream implies.
"""

import time

import numpy as np

from wingfoil_spark.operators.stateful import _ewma_hl_kernel


def _ewma_hl_naive(ts: np.ndarray, x: np.ndarray, hl: float) -> np.ndarray:
    """The original per-row numpy-scalar walk (r2 implementation), kept as
    the executable spec the vectorized kernel must reproduce bitwise."""
    res = np.empty_like(x)
    acc = x[0] if len(x) else 0.0
    prev_t = ts[0] if len(ts) else 0.0
    for i in range(len(x)):
        d = 0.5 ** ((ts[i] - prev_t) / hl)
        acc = d * acc + (1.0 - d) * x[i]
        res[i] = acc
        prev_t = ts[i]
    return res


def test_ewma_hl_kernel_bitwise_vs_naive():
    rng = np.random.default_rng(7)
    n = 50_000
    ts = np.cumsum(rng.integers(1, 5_000_000, n)).astype(np.float64)
    # inject zero-gap bursts (d=1 edge) and large gaps (d→0 edge)
    ts[100:110] = ts[100]
    x = rng.normal(100.0, 15.0, n)
    hl = 3_600_000_000.0
    fast = _ewma_hl_kernel(ts, x, hl)
    slow = _ewma_hl_naive(ts, x, hl)
    assert fast.dtype == slow.dtype == np.float64
    assert np.array_equal(fast, slow), "vectorized ewma-hl diverged bitwise"


def test_ewma_hl_kernel_empty_and_single():
    empty = _ewma_hl_kernel(np.array([]), np.array([]), 10.0)
    assert len(empty) == 0
    one = _ewma_hl_kernel(np.array([5.0]), np.array([42.5]), 10.0)
    assert one.tolist() == [42.5]


def _random_book_updates(n, n_levels=250, seed=7):
    import pandas as pd

    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "ts": np.arange(n, dtype=np.int64),
        "upd_seq": np.arange(n, dtype=np.int64),
        "kind": np.where(rng.integers(0, 50, n) == 0, "snapshot", "delta"),
        "side": np.where(rng.integers(0, 2, n) == 0, "bid", "ask"),
        "level": rng.integers(0, n_levels, n),
        "qty_delta": rng.integers(-3, 8, n).astype(np.int64),
    })


def _book_fold_py(state, pdf):
    """The pure-Python walk, by forcing the C path off (span guard)."""
    from wingfoil_spark.operators import _ckernels, market

    saved = _ckernels._BOOK_MAX_SPAN
    _ckernels._BOOK_MAX_SPAN = -1
    try:
        return market.order_book_step(state, pdf)
    finally:
        _ckernels._BOOK_MAX_SPAN = saved


def test_book_fold_c_matches_python():
    """The C book kernel and the Python dict walk are integer-exact
    identical — per-row outputs AND carried state, including across an
    arbitrary batch split (the KeyedStateOp resumability contract)."""
    import pandas as pd

    from wingfoil_spark.operators.market import order_book_step

    pdf = _random_book_updates(20_000)
    st_c, out_c = order_book_step(None, pdf)
    st_p, out_p = _book_fold_py(None, pdf)
    assert len(out_c) == len(out_p)
    for c in out_c.columns:
        a = pd.Series(out_c[c]).astype("Float64")
        b = pd.Series(out_p[c]).astype("Float64")
        assert ((a == b) | (a.isna() & b.isna())).all(), c
    assert st_c[0] == st_p[0] and st_c[1] == st_p[1], "carried state diverged"

    # split at an arbitrary point: state carries, concatenated output equal
    cut = 7_331
    st1, o1 = order_book_step(None, pdf.iloc[:cut])
    st2, o2 = order_book_step(st1, pdf.iloc[cut:])
    merged = pd.concat([o1, o2], ignore_index=True)
    for c in out_c.columns:
        a = pd.Series(merged[c]).astype("Float64")
        b = pd.Series(out_c[c]).astype("Float64")
        assert ((a == b) | (a.isna() & b.isna())).all(), f"split: {c}"
    assert st2[0] == st_c[0] and st2[1] == st_c[1]


def test_book_fold_c_throughput():
    """The C fold must clear the reference's ~0.9M msg/s single-core replay
    figure (BASELINE.md) with room to spare."""
    from wingfoil_spark.operators import _ckernels
    from wingfoil_spark.operators.market import order_book_step

    if _ckernels._load() is None:
        import pytest

        pytest.skip("no C compiler in this environment")
    n = 600_000
    pdf = _random_book_updates(n)
    best = min(
        (lambda t0=time.perf_counter(): (order_book_step(None, pdf), time.perf_counter() - t0)[1])()
        for _ in range(3)
    )
    rate = n / best
    print(f"\nbook_fold C kernel: {rate/1e6:.1f}M msg/s single-core")
    assert rate > 2_000_000, f"expected >2M msg/s, got {rate:,.0f}"


def _tw_median_naive(ts, v):
    """The per-row argsort walk — executable spec with the reference
    crossing rule (statistics_time_weighted_median.rs:60-96: exact-half
    crossings average the straddling values)."""
    n = len(v)
    med = np.empty(n)
    wdiff = np.diff(np.asarray(ts, dtype=np.int64)).astype(np.float64)
    for i in range(n):
        vv, ww = v[:i], wdiff[:i]
        mask = ww > 0
        vv, ww = vv[mask], ww[mask]
        if len(vv) == 0:
            med[i] = v[i]
        else:
            order = np.argsort(vv, kind="mergesort")
            vv, ww = vv[order], ww[order]
            c = np.cumsum(ww)
            half = c[-1] / 2.0
            k = min(int(np.searchsorted(c, half)), len(vv) - 1)
            if c[k] == half and k + 1 < len(vv):
                med[i] = (vv[k] + vv[k + 1]) / 2.0
            else:
                med[i] = vv[k]
    return med


def test_tw_median_fenwick_bitwise_vs_naive():
    """The Fenwick C kernel must reproduce the argsort walk bitwise —
    including zero-gap bursts (w=0 exclusions) and duplicate values."""
    from wingfoil_spark.operators import _ckernels

    if _ckernels._load() is None:
        import pytest

        pytest.skip("no C compiler in this environment")
    rng = np.random.default_rng(3)
    n = 4_000
    ts = np.cumsum(rng.integers(0, 3, n) * 1_000_000).astype(np.int64)  # ~1/3 zero gaps
    v = np.round(rng.normal(100, 10, n), 2)
    v[50:60] = v[50]  # duplicate-value run
    fast = _ckernels.tw_median_cum(ts, v)
    slow = _tw_median_naive(ts, v)
    assert np.array_equal(fast, slow), "Fenwick median diverged from argsort walk"
    # tiny edges
    for k in (0, 1, 2):
        f = _ckernels.tw_median_cum(ts[:k], v[:k])
        s = _tw_median_naive(ts[:k], v[:k])
        assert np.array_equal(f, s), f"edge n={k}"
    # evenly-spaced ticks: every even prefix hits EXACTLY half — the
    # averaging branch (statistics_time_weighted_median.rs:86-92) fires
    ts_even = np.arange(200, dtype=np.int64) * 100
    v_even = rng.normal(0, 1, 200).round(2)
    f = _ckernels.tw_median_cum(ts_even, v_even)
    s = _tw_median_naive(ts_even, v_even)
    assert np.array_equal(f, s), "averaging branch diverged"
    # golden: cumulative tw median of 1..5 at 100ns ticks = 1,1,1.5,2,2.5
    # (statistics_time_weighted_median.rs:106-113)
    cnt = np.arange(1, 6, dtype=np.float64)
    got = _ckernels.tw_median_cum(np.arange(5, dtype=np.int64) * 100, cnt)
    assert got.tolist() == [1.0, 1.0, 1.5, 2.0, 2.5]


def test_tw_median_fenwick_speedup_deep_key():
    """The scale motivation: a 50k-row key. The argsort walk is
    O(n^2 log n); the Fenwick kernel must be >=20x faster there."""
    from wingfoil_spark.operators import _ckernels

    if _ckernels._load() is None:
        import pytest

        pytest.skip("no C compiler in this environment")
    rng = np.random.default_rng(5)
    n = 50_000
    ts = np.cumsum(rng.integers(1, 4_000_000, n)).astype(np.int64)
    v = np.round(rng.normal(100, 10, n), 2)
    t0 = time.perf_counter()
    fast = _ckernels.tw_median_cum(ts, v)
    t_fast = time.perf_counter() - t0
    m = 3_000  # naive on a prefix, extrapolate quadratically
    t0 = time.perf_counter()
    slow_prefix = _tw_median_naive(ts[:m], v[:m])
    t_slow_prefix = time.perf_counter() - t0
    assert np.array_equal(fast[:m], slow_prefix)
    est_slow = t_slow_prefix * (n / m) ** 2
    print(f"\ntw-median 50k-row key: fenwick {t_fast:.3f}s, "
          f"argsort-walk est {est_slow:.1f}s ({est_slow / t_fast:.0f}x)")
    assert est_slow / t_fast >= 20


def _tw_median_win_naive(ts, v, w, rows_n=None, range_ns=None):
    """The per-row argsort walk over a sliding frame — the executable spec
    from operators/stateful.py:weighted_median (pre-r4 implementation)."""
    from wingfoil_spark.operators.stateful import _weighted_median_select

    n = len(v)
    res = np.empty(n)
    for i in range(n):
        if rows_n is not None:
            lo = max(0, i - (rows_n - 1))
        elif range_ns is not None:
            lo = int(np.searchsorted(ts, ts[i] - range_ns, side="left"))
        else:
            lo = 0
        vv, ww = v[lo:i], w[lo:i]
        mask = ww > 0
        vv, ww = vv[mask], ww[mask]
        res[i] = _weighted_median_select(vv, ww, v[i])
    return res


def test_tw_median_win_bitwise_vs_naive():
    """The windowed Fenwick kernel (VERDICT r3 #2) must reproduce the
    argsort walk bitwise across all three frames — zero-gap bursts,
    duplicate values, NaN trailing weight, exact-half crossings."""
    from wingfoil_spark.operators import _ckernels

    if _ckernels._load() is None:
        import pytest

        pytest.skip("no C compiler in this environment")
    rng = np.random.default_rng(17)
    n = 3_000
    ts = np.cumsum(rng.integers(0, 3, n) * 1_000_000).astype(np.int64)
    v = np.round(rng.normal(100, 10, n), 2)
    v[70:85] = v[70]  # duplicate-value run
    w = np.diff(ts).astype(np.float64)
    w = np.append(w, np.nan)  # trailing NULL lead, as weighted_median sees it
    for frame in [
        {"rows_n": 25}, {"rows_n": 1}, {"rows_n": 0},
        {"range_ns": 10_000_000}, {"range_ns": 0}, {},
    ]:
        fast = _ckernels.tw_median_win(ts, v, w, **frame)
        slow = _tw_median_win_naive(ts, v, w, **frame)
        assert np.array_equal(fast, slow), f"frame {frame} diverged"
    # evenly-spaced ticks: every even window hits EXACTLY half — the
    # averaging branch fires constantly, across eviction epochs
    ts_even = np.arange(400, dtype=np.int64) * 100
    v_even = rng.normal(0, 1, 400).round(2)
    w_even = np.append(np.diff(ts_even).astype(np.float64), np.nan)
    for frame in [{"rows_n": 10}, {"range_ns": 1_000}]:
        fast = _ckernels.tw_median_win(ts_even, v_even, w_even, **frame)
        slow = _tw_median_win_naive(ts_even, v_even, w_even, **frame)
        assert np.array_equal(fast, slow), f"even-ticks frame {frame}"
    # guard: float / negative weights must refuse the C path
    assert _ckernels.tw_median_win(ts, v, w + 0.5, rows_n=5) is None
    assert _ckernels.tw_median_win(ts, v, -w, rows_n=5) is None
    # tiny edges
    for k in (0, 1, 2):
        f = _ckernels.tw_median_win(ts[:k], v[:k], w[:k], rows_n=3)
        s = _tw_median_win_naive(ts[:k], v[:k], w[:k], rows_n=3)
        assert np.array_equal(f, s), f"edge n={k}"


def test_tw_median_win_speedup_deep_key():
    """VERDICT r3 #2 done-bar: >=10x on a 100k-row key with a wide window
    (the argsort walk is O(n·w log w); Fenwick is O(n log n))."""
    from wingfoil_spark.operators import _ckernels

    if _ckernels._load() is None:
        import pytest

        pytest.skip("no C compiler in this environment")
    rng = np.random.default_rng(23)
    n = 100_000
    win = 2_000
    ts = np.cumsum(rng.integers(1, 4_000_000, n)).astype(np.int64)
    v = np.round(rng.normal(100, 10, n), 2)
    w = np.append(np.diff(ts).astype(np.float64), np.nan)
    t0 = time.perf_counter()
    fast = _ckernels.tw_median_win(ts, v, w, rows_n=win)
    t_fast = time.perf_counter() - t0
    m = 10_000  # naive on a prefix (already windowed-steady-state), scale linearly
    t0 = time.perf_counter()
    slow_prefix = _tw_median_win_naive(ts[:m], v[:m], w[:m], rows_n=win)
    t_slow_prefix = time.perf_counter() - t0
    assert np.array_equal(fast[:m], slow_prefix)
    est_slow = t_slow_prefix * (n / m)
    print(f"\ntw-median-win 100k-row key (w={win}): fenwick {t_fast:.3f}s, "
          f"argsort-walk est {est_slow:.1f}s ({est_slow / t_fast:.0f}x)")
    assert est_slow / t_fast >= 10


def _tw_mean_var_naive(ts, v, window_ns):
    """The Python big-int prefix walk (executable spec)."""
    vc = np.rint(v * 100).astype(np.int64)
    n = len(ts)
    mean = np.empty(n)
    var = np.empty(n)
    tsl, vcl = ts.tolist(), vc.tolist()
    P1 = [0] * (n + 1)
    P2 = [0] * (n + 1)
    for k in range(n - 1):
        w = tsl[k + 1] - tsl[k]
        P1[k + 1] = P1[k] + vcl[k] * w
        P2[k + 1] = P2[k] + vcl[k] * vcl[k] * w
    for i in range(n):
        t0 = max(tsl[0], tsl[i] - window_ns)
        j = int(np.searchsorted(ts, t0, side="right")) - 1
        span = tsl[i] - t0
        if span <= 0:
            mean[i], var[i] = v[i], 0.0
        else:
            i1 = P1[i] - (P1[j] + vcl[j] * (t0 - tsl[j]))
            m = float(i1) / float(span * 100)
            i2 = P2[i] - (P2[j] + vcl[j] * vcl[j] * (t0 - tsl[j]))
            mean[i] = m
            var[i] = max(float(i2) / float(span * 10000) - m * m, 0.0)
    return mean, var


def test_tw_mean_var_c_bitwise_vs_bigint():
    """The C two-pointer sliding-integral kernel == the Python big-int
    prefix walk, bitwise — including huge inter-sample gaps (whose single
    boundary interval overflows int64: the mod-2^64 unsigned arithmetic
    must still recover the exact windowed integral) and zero-gap bursts."""
    from wingfoil_spark.operators import _ckernels

    if _ckernels._load() is None:
        import pytest

        pytest.skip("no C compiler in this environment")
    rng = np.random.default_rng(13)
    n = 20_000
    gaps = rng.integers(0, 5_000_000, n)
    gaps[::997] = 3_000_000_000_000  # ~35-day gaps: boundary-term overflow
    ts = np.cumsum(gaps).astype(np.int64)
    v = np.round(rng.normal(120, 40, n), 2)
    W = 3600 * 1_000_000
    vc = np.rint(v * 100).astype(np.int64)
    fast = _ckernels.tw_mean_var(ts, vc, v, W)
    assert fast is not None
    slow = _tw_mean_var_naive(ts, v, W)
    assert np.array_equal(fast[0], slow[0]), "tw mean diverged"
    assert np.array_equal(fast[1], slow[1]), "tw var diverged"
    # guard: absurd magnitudes must refuse the C path (int64 unsafe)
    big_v = v * 1e7
    big_vc = np.rint(big_v * 100).astype(np.int64)
    assert _ckernels.tw_mean_var(ts, big_vc, big_v, int(4e15)) is None


def test_ewma_kernel_bench():
    """VERDICT r2 item 4: >=10x on a 1M-row key (median of 3 runs each)."""
    rng = np.random.default_rng(11)
    n = 1_000_000
    ts = np.cumsum(rng.integers(1, 5_000_000, n)).astype(np.float64)
    x = rng.normal(100.0, 15.0, n)
    hl = 3_600_000_000.0

    def best_of(f, k=3):
        times = []
        for _ in range(k):
            t0 = time.perf_counter()
            f()
            times.append(time.perf_counter() - t0)
        return min(times)

    t_fast = best_of(lambda: _ewma_hl_kernel(ts, x, hl))
    t_slow = best_of(lambda: _ewma_hl_naive(ts, x, hl), k=1)
    ratio = t_slow / t_fast
    print(f"\newma-hl 1M-row kernel: naive {t_slow:.3f}s, "
          f"vectorized {t_fast:.3f}s, speedup {ratio:.1f}x")
    # loose floor (CI noise); typical observed ~30x
    assert ratio >= 10.0, f"expected >=10x, got {ratio:.1f}x"


def test_kernel_cache_dir_is_private(monkeypatch, tmp_path):
    """ADVICE r3: the compiled .so must never load from a predictable
    world-writable path. The cache dir is per-user 0700; a pre-existing
    dir with loose perms owned by us is tightened; a dir we don't own
    falls back to a fresh private mkdtemp."""
    import os
    import stat

    from wingfoil_spark.operators import _ckernels

    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path))
    d = _ckernels._cache_dir()
    st_ = os.stat(d)
    assert st_.st_uid == os.getuid()
    assert not (st_.st_mode & 0o077), oct(st_.st_mode)
    assert d.startswith(str(tmp_path))

    # loose perms on our own dir are tightened on next resolve
    os.chmod(d, 0o755)
    d2 = _ckernels._cache_dir()
    assert d2 == d
    assert not (os.stat(d2).st_mode & 0o077)


def test_order_book_multi_matches_per_key():
    """The whole-body multi-key C path equals the per-key step fold on a
    key-clustered random batch — and is the big win for many small keys
    (the per-group pandas construction cost)."""
    import pandas as pd

    from wingfoil_spark.operators import _ckernels
    from wingfoil_spark.operators.market import order_book_multi, order_book_step

    if _ckernels._load() is None:
        import pytest

        pytest.skip("no C compiler in this environment")
    rng = np.random.default_rng(29)
    frames = []
    for key in range(40):
        n = int(rng.integers(1, 120))
        frames.append(pd.DataFrame({
            "user_id": key,
            "ts": np.arange(n, dtype=np.int64),
            "upd_seq": np.arange(n, dtype=np.int64),
            "kind": np.where(rng.integers(0, 20, n) == 0, "snapshot", "delta"),
            "side": np.where(rng.integers(0, 2, n) == 0, "bid", "ask"),
            "level": rng.integers(0, 60, n),
            "qty_delta": rng.integers(-3, 8, n).astype(np.int64),
        }))
    body = pd.concat(frames, ignore_index=True)
    multi = order_book_multi(body, ("user_id",))
    assert multi is not None
    per_key = []
    for key, g in body.groupby("user_id", sort=False):
        _, out = order_book_step(None, g.reset_index(drop=True))
        out.insert(0, "user_id", key)
        per_key.append(out)
    ref = pd.concat(per_key, ignore_index=True)
    assert len(multi) == len(ref)
    for c in ref.columns:
        a = pd.Series(multi[c]).astype("Float64")
        b = pd.Series(ref[c]).astype("Float64")
        assert ((a == b) | (a.isna() & b.isna())).all(), c
