"""Optional C kernels for the sequential-recursion hot loops.

The half-life EWMA recursion (s_n = d·s_{n-1} + (1-d)·x_n,
d = 0.5^(Δt/hl)) is pinned BITWISE by a recursive-CTE DuckDB oracle, so the
only legal vectorization preserves scalar libm ``pow`` and the exact FP
op-order. numpy's vectorized ``np.power`` uses SIMD (SVML) transcendentals
that differ from scalar ``pow`` in final ULPs — verified in this env — so
the fast path is a ~10-line C loop, compiled once per host with
``-ffp-contract=off`` (FMA contraction would also change bits) and loaded
via ctypes. Falls back to a pure-Python ``math.pow`` walk when no C
compiler is available (same bits, ~10× slower, still ~3× the naive
numpy-scalar loop).

Cluster note: local mode shares /tmp so one compile serves all worker
threads. On a multi-node cluster each executor compiles on first use (cc
in PATH) or silently uses the Python fallback — semantics identical either
way.
"""

from __future__ import annotations

import ctypes
import hashlib
import math
import os
import subprocess
import tempfile

import numpy as np

_SRC = r"""
#include <math.h>

/* new_grp (nullable): per-row reset flags for multi-key batches — a set
   flag restarts the recursion at that row (bitwise identical to a fresh
   per-key run: the reset row sees d = pow(0.5, 0) = 1). */
void ewma_hl(const double* ts, const double* x, double hl,
             long long n, double* out, const signed char* new_grp) {
    if (n <= 0) return;
    double acc = x[0];
    double prev = ts[0];
    for (long long i = 0; i < n; i++) {
        if (new_grp != 0 && new_grp[i]) {
            acc = x[i];
            prev = ts[i];
        }
        double d = pow(0.5, (ts[i] - prev) / hl);
        acc = d * acc + (1.0 - d) * x[i];
        out[i] = acc;
        prev = ts[i];
    }
}

/* Per-tick EWMA: the oracle's plain recursion (1-a)*acc + a*x, seeded on
   the first sample of each group. Same op order as the streaming
   ewma_step twin and the recursive-CTE oracle. */
void ewma_alpha(const double* x, double alpha, long long n, double* out,
                const signed char* new_grp) {
    double one_m = 1.0 - alpha;
    double acc = 0.0;
    int init = 0;
    for (long long i = 0; i < n; i++) {
        if ((new_grp != 0 && new_grp[i]) || !init) {
            acc = x[i];
            init = 1;
        } else {
            acc = one_m * acc + alpha * x[i];
        }
        out[i] = acc;
    }
}

/* Cumulative time-weighted median (reference *_median_time_weighted,
   stats.rs:177-185; crossing rule pinned by
   statistics_time_weighted_median.rs:60-96): med[i] = weighted median of
   v[0..i-1] with in-effect weights w[j] = ts[j+1]-ts[j] (w>0 only),
   seeded to v[i] while weightless. The crossing element is the first
   value-rank whose cumulative weight reaches half the total; an EXACT
   half crossing averages with the next positive-weight value (so
   unit-weight intervals reproduce the even-count average). Fenwick tree
   over value-ranks: O(n log n) per key instead of the per-row argsort's
   O(n^2 log n).

   BITWISE-faithful: weights are integer microseconds, so every Fenwick
   partial sum is an exact integer in float64 (< 2^53) and half = total/2
   is exact; the first rank with prefix >= half is always a
   positive-weight element, and the ==half test is an exact comparison.

   rank[i]: position of element i in the stable value-sort of v[0..m-1];
   v_at_rank: values in that sorted order; m = n-1 insertable elements.

   Returns 1 on success, 0 on allocation failure (ADVICE r3: the caller
   must fall back to the exact argsort walk, never receive seed values). */
#include <stdlib.h>

int tw_median_cum(const long long* rank, const double* w,
                  const double* v_at_rank, const double* v,
                  long long n, long long m, double* out) {
    double* tree = (double*)calloc((size_t)(m + 1), sizeof(double));
    double* w_at_rank = (double*)calloc((size_t)(m > 0 ? m : 1), sizeof(double));
    if (tree == NULL || w_at_rank == NULL) {
        free(tree); free(w_at_rank);
        return 0;
    }
    long long LOG = 1;
    while ((LOG << 1) <= m) LOG <<= 1;
    double total = 0.0;
    long long cnt = 0;
    for (long long i = 0; i < n; i++) {
        if (cnt == 0) {
            out[i] = v[i];
        } else {
            double half = total / 2.0;
            long long pos = 0;
            double rem = half;
            double below = 0.0; /* prefix over ranks < pos+1 path */
            for (long long bit = LOG; bit > 0; bit >>= 1) {
                long long nxt = pos + bit;
                if (nxt <= m && tree[nxt] < rem) {
                    pos = nxt;
                    rem -= tree[nxt];
                    below += tree[nxt];
                }
            }
            long long p = (pos < m) ? pos : m - 1;
            double cum_p = below + w_at_rank[p]; /* inclusive prefix at p */
            if (cum_p == half) {
                /* exact boundary: average with the NEXT positive-weight
                   value (statistics_time_weighted_median.rs:86-92) */
                long long q = p + 1;
                while (q < m && w_at_rank[q] <= 0.0) q++;
                out[i] = (q < m) ? (v_at_rank[p] + v_at_rank[q]) / 2.0
                                 : v_at_rank[p];
            } else {
                out[i] = v_at_rank[p];
            }
        }
        if (i < n - 1 && w[i] > 0.0) {
            total += w[i];
            cnt++;
            w_at_rank[rank[i]] += w[i];
            for (long long k = rank[i] + 1; k <= m; k += k & (-k))
                tree[k] += w[i];
        }
    }
    free(tree);
    free(w_at_rank);
    return 1;
}

/* WINDOWED weighted median (reference rolling/time_windowed
   *_median_time_weighted, stats.rs:177-185): same crossing rule as
   tw_median_cum but the candidate set at row i is v[lo_i .. i-1] —
   rows frame: lo_i = max(0, i-(rows_n-1));
   range frame: lo_i = first j with ts[j] >= ts[i] - range_ns
                (sample-retention, searchsorted-left);
   cum (both sentinels < 0): lo_i = 0.
   Eviction is a Fenwick SUBTRACT of the departing element's weight —
   exact because the wrapper guards that weights are non-negative
   integers with total < 2^53, so every partial sum (and half = total/2,
   an integer or integer+0.5) stays exactly representable through any
   add/remove order. The generic weight array w[] is caller-supplied
   (need not be ts diffs); NaN/zero weights are skipped on both insert
   and evict, mirroring the walk's w>0 mask. O((log m) per row) with a
   two-pointer evictor. Returns 1 on success, 0 on allocation failure. */
int tw_median_win(const long long* rank, const double* w,
                  const double* v_at_rank, const double* v,
                  const long long* ts,
                  long long n, long long m,
                  long long rows_n, long long range_ns,
                  double* out) {
    double* tree = (double*)calloc((size_t)(m + 1), sizeof(double));
    double* w_at_rank = (double*)calloc((size_t)(m > 0 ? m : 1), sizeof(double));
    if (tree == NULL || w_at_rank == NULL) {
        free(tree); free(w_at_rank);
        return 0;
    }
    long long LOG = 1;
    while ((LOG << 1) <= m) LOG <<= 1;
    double total = 0.0;
    long long cnt = 0;
    long long j = 0; /* eviction pointer: tree holds w>0 elements of [j, i) */
    for (long long i = 0; i < n; i++) {
        if (i > 0) { /* element i-1 commits its weight at tick i */
            long long e = i - 1;
            if (w[e] > 0.0) {
                total += w[e];
                cnt++;
                w_at_rank[rank[e]] += w[e];
                for (long long k = rank[e] + 1; k <= m; k += k & (-k))
                    tree[k] += w[e];
            }
        }
        long long lo = 0;
        if (rows_n >= 0) {
            lo = i - (rows_n - 1);
            if (lo < 0) lo = 0;
        } else if (range_ns >= 0) {
            lo = j;
            while (lo < i && ts[lo] < ts[i] - range_ns) lo++;
        }
        if (lo > i) lo = i;
        while (j < lo) {
            if (w[j] > 0.0) {
                total -= w[j];
                cnt--;
                w_at_rank[rank[j]] -= w[j];
                for (long long k = rank[j] + 1; k <= m; k += k & (-k))
                    tree[k] -= w[j];
            }
            j++;
        }
        if (cnt == 0) {
            out[i] = v[i];
        } else {
            double half = total / 2.0;
            long long pos = 0;
            double rem = half;
            double below = 0.0;
            for (long long bit = LOG; bit > 0; bit >>= 1) {
                long long nxt = pos + bit;
                if (nxt <= m && tree[nxt] < rem) {
                    pos = nxt;
                    rem -= tree[nxt];
                    below += tree[nxt];
                }
            }
            long long p = (pos < m) ? pos : m - 1;
            double cum_p = below + w_at_rank[p];
            if (cum_p == half) {
                /* exact boundary: average with the next rank that holds
                   positive IN-WINDOW weight */
                long long q = p + 1;
                while (q < m && w_at_rank[q] <= 0.0) q++;
                out[i] = (q < m) ? (v_at_rank[p] + v_at_rank[q]) / 2.0
                                 : v_at_rank[p];
            } else {
                out[i] = v_at_rank[p];
            }
        }
    }
    free(tree);
    free(w_at_rank);
    return 1;
}

/* Trailing-duration time-weighted mean/var (stats.rs:154-162): exact
   integer integrals (value-cents x in-effect microseconds) over the
   clipped window [ts_i - W, ts_i], converted to double only at the final
   division — identical bits to the Python big-int prefix walk because the
   WINDOWED sums fit int64 (vc<=~1e6 cents, window span <=~4e9 us -> i1 <=
   ~4e15, i2 <= ~4e17 < 2^63) and (double)(long long) rounds nearest-even
   exactly like Python float(int). Two-pointer sliding sums, O(n) total. */
void tw_mean_var(const long long* ts, const long long* vc, const double* v,
                 long long n, long long window,
                 double* o_mean, double* o_var) {
    /* Sliding sums run in UNSIGNED 64-bit: a single boundary interval can
       span the whole history (vc^2 * gap may exceed 2^63), but modular
       arithmetic is exact as long as the FINAL windowed integrals fit
       int64 — the Python wrapper guards vc_max^2 * window < 2^62 and
       falls back to the big-int walk otherwise. */
    long long j = 0;
    unsigned long long S1 = 0, S2 = 0; /* sums over k in [j, i-1], mod 2^64 */
    for (long long i = 0; i < n; i++) {
        if (i > 0) {
            unsigned long long w = (unsigned long long)(ts[i] - ts[i - 1]);
            unsigned long long c = (unsigned long long)vc[i - 1];
            S1 += c * w;
            S2 += c * c * w;
        }
        long long t0 = ts[i] - window;
        if (t0 < ts[0]) t0 = ts[0];
        /* advance j to the last index with ts[j] <= t0 (searchsorted
           'right' minus 1); evict whole intervals left of j */
        while (j + 1 < n && ts[j + 1] <= t0) {
            unsigned long long w = (unsigned long long)(ts[j + 1] - ts[j]);
            unsigned long long c = (unsigned long long)vc[j];
            S1 -= c * w;
            S2 -= c * c * w;
            j++;
        }
        long long span = ts[i] - t0;
        if (span <= 0) {
            o_mean[i] = v[i];
            o_var[i] = 0.0;
        } else {
            unsigned long long clip = (unsigned long long)(t0 - ts[j]);
            unsigned long long c = (unsigned long long)vc[j];
            long long i1 = (long long)(S1 - c * clip);
            long long i2 = (long long)(S2 - c * c * clip);
            double m = (double)i1 / (double)(span * 100);
            double var = (double)i2 / (double)(span * 10000) - m * m;
            o_mean[i] = m;
            /* (var >= 0.0) ? var : 0.0 == Python max(var, 0.0) including
               the -0.0 case (max returns its FIRST arg on ties) */
            o_var[i] = (var >= 0.0) ? var : 0.0;
        }
    }
}

/* Order-book fold over one batch (semantics identical to the Python walk
   in operators/market.py:order_book_step — integer-exact, so the two
   paths are differentially testable bit-for-bit).

   Book sides are level-indexed arrays over [lo, hi] with EPOCH validity
   (snapshot = epoch bump, O(1) clear); best bid/ask tracked
   incrementally, scanning only when the current best level empties.

   io_state: [epoch, bb, ba, nb, na]  (NONE = LLONG_MIN for bb/ba).
   Outputs use NONE where the side is empty.

   new_grp (nullable): per-row flag for MULTI-KEY batches — a set flag
   resets the book (epoch bump, O(1)) before the row applies, so one call
   folds a whole key-clustered sorted partition instead of paying Python
   per-key overhead (~0.7 ms/key measured: pandas frame construction per
   group dominated small-key workloads 60x over the fold itself). */
#define BOOK_NONE (-9223372036854775807LL - 1)

void book_fold(const signed char* is_snap, const signed char* is_bid,
               const long long* lvl, const long long* qd, long long n,
               long long lo, long long span,
               long long* bq, long long* bep,
               long long* aq, long long* aep,
               long long* io_state,
               long long* o_bb, long long* o_bq,
               long long* o_ba, long long* o_aq,
               long long* o_nb, long long* o_na,
               const signed char* new_grp) {
    long long epoch = io_state[0];
    long long bb = io_state[1], ba = io_state[2];
    long long nb = io_state[3], na = io_state[4];
    for (long long i = 0; i < n; i++) {
        long long l = lvl[i], q = qd[i], idx = l - lo;
        if (new_grp != 0 && new_grp[i]) {
            epoch++;
            nb = 0; na = 0; bb = BOOK_NONE; ba = BOOK_NONE;
        }
        if (is_snap[i]) {
            epoch++;
            nb = 0; na = 0; bb = BOOK_NONE; ba = BOOK_NONE;
            if (q > 0) {
                if (is_bid[i]) { bq[idx] = q; bep[idx] = epoch; bb = l; nb = 1; }
                else           { aq[idx] = q; aep[idx] = epoch; ba = l; na = 1; }
            }
        } else if (is_bid[i]) {
            long long cur = (bep[idx] == epoch) ? bq[idx] : 0;
            long long nq = cur + q;
            if (nq <= 0) {
                if (bep[idx] == epoch) {
                    bep[idx] = epoch - 1; nb--;
                    if (l == bb) {
                        bb = BOOK_NONE;
                        for (long long j = idx - 1; j >= 0; j--)
                            if (bep[j] == epoch) { bb = j + lo; break; }
                    }
                }
            } else {
                if (bep[idx] != epoch) nb++;
                bq[idx] = nq; bep[idx] = epoch;
                if (bb == BOOK_NONE || l > bb) bb = l;
            }
        } else {
            long long cur = (aep[idx] == epoch) ? aq[idx] : 0;
            long long nq = cur + q;
            if (nq <= 0) {
                if (aep[idx] == epoch) {
                    aep[idx] = epoch - 1; na--;
                    if (l == ba) {
                        ba = BOOK_NONE;
                        for (long long j = idx + 1; j < span; j++)
                            if (aep[j] == epoch) { ba = j + lo; break; }
                    }
                }
            } else {
                if (aep[idx] != epoch) na++;
                aq[idx] = nq; aep[idx] = epoch;
                if (ba == BOOK_NONE || l < ba) ba = l;
            }
        }
        o_bb[i] = bb;
        o_bq[i] = (bb != BOOK_NONE) ? bq[bb - lo] : BOOK_NONE;
        o_ba[i] = ba;
        o_aq[i] = (ba != BOOK_NONE) ? aq[ba - lo] : BOOK_NONE;
        o_nb[i] = nb;
        o_na[i] = na;
    }
    io_state[0] = epoch; io_state[1] = bb; io_state[2] = ba;
    io_state[3] = nb; io_state[4] = na;
}
"""

_lib: ctypes.CDLL | None = None
_tried = False
_fallback_dir: str | None = None


def _cache_dir() -> str:
    """Per-user 0700 cache dir for compiled kernels (ADVICE r3: a
    world-writable /tmp path lets another local user pre-plant a malicious
    .so at the predictable name). The dir must be owned by us and not
    group/other-accessible; if it exists with looser perms but is ours we
    tighten it, otherwise fall back to a fresh process-lifetime mkdtemp."""
    global _fallback_dir
    base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache"
    )
    d = os.path.join(base, "wingfoil_spark")
    try:
        os.makedirs(d, mode=0o700, exist_ok=True)
        st = os.stat(d)
        if st.st_uid == os.getuid():
            if st.st_mode & 0o077:
                os.chmod(d, 0o700)
            return d
    except OSError:
        pass
    if _fallback_dir is None:
        _fallback_dir = tempfile.mkdtemp(prefix="wingfoil_ck_")
    return _fallback_dir


def _load() -> ctypes.CDLL | None:
    """Compile (once per host, content-addressed per-user cache) and load."""
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    tag = hashlib.md5(_SRC.encode()).hexdigest()[:12]
    so_path = os.path.join(_cache_dir(), f"wingfoil_ck_{tag}.so")
    try:
        if not os.path.exists(so_path):
            with tempfile.NamedTemporaryFile(
                "w", suffix=".c", delete=False
            ) as f:
                f.write(_SRC)
                c_path = f.name
            tmp_so = so_path + f".{os.getpid()}"
            subprocess.run(
                ["cc", "-O2", "-ffp-contract=off", "-shared", "-fPIC",
                 c_path, "-o", tmp_so, "-lm"],
                check=True, capture_output=True, timeout=60,
            )
            os.replace(tmp_so, so_path)  # atomic vs concurrent compiles
            os.unlink(c_path)
        lib = ctypes.CDLL(so_path)
        pi = ctypes.POINTER(ctypes.c_longlong)
        pc = ctypes.POINTER(ctypes.c_byte)
        lib.ewma_hl.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.c_double, ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_double), pc,
        ]
        lib.ewma_hl.restype = None
        lib.ewma_alpha.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_double,
            ctypes.c_longlong, ctypes.POINTER(ctypes.c_double), pc,
        ]
        lib.ewma_alpha.restype = None
        lib.book_fold.argtypes = (
            [pc, pc, pi, pi, ctypes.c_longlong, ctypes.c_longlong,
             ctypes.c_longlong] + [pi] * 11 + [pc]
        )
        lib.book_fold.restype = None
        pdbl = ctypes.POINTER(ctypes.c_double)
        lib.tw_median_cum.argtypes = [
            pi, pdbl, pdbl, pdbl,
            ctypes.c_longlong, ctypes.c_longlong, pdbl,
        ]
        lib.tw_median_cum.restype = ctypes.c_int
        lib.tw_median_win.argtypes = [
            pi, pdbl, pdbl, pdbl, pi,
            ctypes.c_longlong, ctypes.c_longlong,
            ctypes.c_longlong, ctypes.c_longlong, pdbl,
        ]
        lib.tw_median_win.restype = ctypes.c_int
        lib.tw_mean_var.argtypes = [
            pi, pi, pdbl,
            ctypes.c_longlong, ctypes.c_longlong, pdbl, pdbl,
        ]
        lib.tw_mean_var.restype = None
        _lib = lib
    except Exception:
        _lib = None  # no compiler / sandboxed exec: Python fallback
    return _lib


BOOK_NONE = -(2**63)
_BOOK_MAX_SPAN = 1 << 20  # 1M price levels; beyond this use the dict walk


def book_fold(is_snap: np.ndarray, is_bid: np.ndarray, lvl: np.ndarray,
              qd: np.ndarray, bids: dict, asks: dict,
              new_grp: np.ndarray | None = None):
    """C fast path of the order-book fold. Returns
    (o_bb, o_bq, o_ba, o_aq, o_nb, o_na, bids', asks') with BOOK_NONE
    sentinels, or None when no compiler is available or the level span
    exceeds the bounded-array budget (caller falls back to the dict walk).
    Semantics are the Python walk's, integer-exact (differential test:
    test_kernel_bench.py::test_book_fold_c_matches_python).

    ``new_grp``: optional per-row reset flags for folding a key-clustered
    MULTI-key batch in one call (each flagged row starts a fresh book);
    the returned bids'/asks' belong to the last group."""
    lib = _load()
    if lib is None:
        return None
    n = len(lvl)
    if n == 0:
        return None
    lvl = np.ascontiguousarray(lvl, dtype=np.int64)
    qd = np.ascontiguousarray(qd, dtype=np.int64)
    keys = list(bids) + list(asks)
    lo = int(lvl.min())
    hi = int(lvl.max())
    if keys:
        lo = min(lo, min(keys))
        hi = max(hi, max(keys))
    span = hi - lo + 1
    if span > _BOOK_MAX_SPAN:
        return None
    bq = np.zeros(span, dtype=np.int64)
    bep = np.zeros(span, dtype=np.int64)
    aq = np.zeros(span, dtype=np.int64)
    aep = np.zeros(span, dtype=np.int64)
    for l, q in bids.items():
        bq[l - lo] = q
        bep[l - lo] = 1
    for l, q in asks.items():
        aq[l - lo] = q
        aep[l - lo] = 1
    st = np.array([
        1,  # epoch (zeroed ep arrays are invalid at epoch 1)
        max(bids) if bids else BOOK_NONE,
        min(asks) if asks else BOOK_NONE,
        len(bids), len(asks),
    ], dtype=np.int64)
    outs = [np.empty(n, dtype=np.int64) for _ in range(6)]
    snap8 = np.ascontiguousarray(is_snap, dtype=np.int8)
    bid8 = np.ascontiguousarray(is_bid, dtype=np.int8)
    pi = ctypes.POINTER(ctypes.c_longlong)
    pc = ctypes.POINTER(ctypes.c_byte)
    grp8 = (np.ascontiguousarray(new_grp, dtype=np.int8)
            if new_grp is not None else None)
    lib.book_fold(
        snap8.ctypes.data_as(pc), bid8.ctypes.data_as(pc),
        lvl.ctypes.data_as(pi), qd.ctypes.data_as(pi),
        ctypes.c_longlong(n), ctypes.c_longlong(lo), ctypes.c_longlong(span),
        bq.ctypes.data_as(pi), bep.ctypes.data_as(pi),
        aq.ctypes.data_as(pi), aep.ctypes.data_as(pi),
        st.ctypes.data_as(pi),
        *[o.ctypes.data_as(pi) for o in outs],
        grp8.ctypes.data_as(pc) if grp8 is not None else None,
    )
    epoch = int(st[0])
    bidx = np.flatnonzero(bep == epoch)
    aidx = np.flatnonzero(aep == epoch)
    bids2 = dict(zip((bidx + lo).tolist(), bq[bidx].tolist()))
    asks2 = dict(zip((aidx + lo).tolist(), aq[aidx].tolist()))
    return (*outs, bids2, asks2)


def tw_mean_var(ts: np.ndarray, vc: np.ndarray, v: np.ndarray,
                window: int):
    """Clipped trailing-window time-weighted mean/var via the C two-pointer
    kernel. Returns (mean, var) or None when no compiler is available OR
    the exact windowed integral could exceed int64 (vc_max^2 * window >=
    2^62) — caller falls back to the Python big-int walk, same bits."""
    lib = _load()
    if lib is None:
        return None
    n = len(v)
    if n == 0:
        return np.empty(0), np.empty(0)
    vc_max = int(np.abs(vc).max())
    if vc_max * vc_max * int(window) >= (1 << 62):
        return None
    ts = np.ascontiguousarray(ts, dtype=np.int64)
    vc = np.ascontiguousarray(vc, dtype=np.int64)
    v = np.ascontiguousarray(v, dtype=np.float64)
    o_mean = np.empty(n, dtype=np.float64)
    o_var = np.empty(n, dtype=np.float64)
    pi = ctypes.POINTER(ctypes.c_longlong)
    pdbl = ctypes.POINTER(ctypes.c_double)
    lib.tw_mean_var(
        ts.ctypes.data_as(pi), vc.ctypes.data_as(pi), v.ctypes.data_as(pdbl),
        ctypes.c_longlong(n), ctypes.c_longlong(int(window)),
        o_mean.ctypes.data_as(pdbl), o_var.ctypes.data_as(pdbl),
    )
    return o_mean, o_var


def tw_median_cum(ts: np.ndarray, v: np.ndarray):
    """Cumulative time-weighted median per row via the C Fenwick kernel.
    Returns the med array, or None when no compiler is available (caller
    falls back to the per-row argsort walk — same bits, O(n^2 log n))."""
    lib = _load()
    if lib is None:
        return None
    n = len(v)
    out = np.empty(n, dtype=np.float64)
    if n == 0:
        return out
    m = n - 1
    v = np.ascontiguousarray(v, dtype=np.float64)
    w = np.diff(np.asarray(ts, dtype=np.int64)).astype(np.float64)
    order = np.argsort(v[:m], kind="mergesort")
    rank = np.empty(m, dtype=np.int64)
    rank[order] = np.arange(m, dtype=np.int64)
    v_at_rank = np.ascontiguousarray(v[:m][order])
    w = np.ascontiguousarray(w)
    rank = np.ascontiguousarray(rank)
    pi = ctypes.POINTER(ctypes.c_longlong)
    pdbl = ctypes.POINTER(ctypes.c_double)
    ok = lib.tw_median_cum(
        rank.ctypes.data_as(pi), w.ctypes.data_as(pdbl),
        v_at_rank.ctypes.data_as(pdbl), v.ctypes.data_as(pdbl),
        ctypes.c_longlong(n), ctypes.c_longlong(m),
        out.ctypes.data_as(pdbl),
    )
    if not ok:  # allocation failure: exact fallback, never seed values
        return None
    return out


def tw_median_win(ts: np.ndarray, v: np.ndarray, w: np.ndarray,
                  rows_n: int | None = None, range_ns: int | None = None):
    """Windowed weighted median per row via the Fenwick add/remove kernel:
    candidates are v[lo:i] with caller-supplied weights w (w>0 mask), frame
    ("rows", rows_n) / ("range", range_ns) / cumulative when both are None.
    Returns the med array, or None when no compiler is available, weights
    are not non-negative integers, the weight total could break float64
    exactness (>= 2^53), or allocation fails — caller falls back to the
    per-row argsort walk, same bits."""
    lib = _load()
    if lib is None:
        return None
    n = len(v)
    out = np.empty(n, dtype=np.float64)
    if n == 0:
        return out
    m = n - 1
    v = np.ascontiguousarray(v, dtype=np.float64)
    ts = np.ascontiguousarray(ts, dtype=np.int64)
    w = np.ascontiguousarray(np.asarray(w, dtype=np.float64)[:m])
    wf = w[np.isfinite(w)]
    if len(wf) and (
        wf.min() < 0
        or not np.array_equal(wf, np.rint(wf))
        or wf[wf > 0].sum() >= float(1 << 53)
    ):
        return None
    order = np.argsort(v[:m], kind="mergesort")
    rank = np.empty(m, dtype=np.int64)
    rank[order] = np.arange(m, dtype=np.int64)
    v_at_rank = np.ascontiguousarray(v[:m][order])
    rank = np.ascontiguousarray(rank)
    pi = ctypes.POINTER(ctypes.c_longlong)
    pdbl = ctypes.POINTER(ctypes.c_double)
    ok = lib.tw_median_win(
        rank.ctypes.data_as(pi), w.ctypes.data_as(pdbl),
        v_at_rank.ctypes.data_as(pdbl), v.ctypes.data_as(pdbl),
        ts.ctypes.data_as(pi),
        ctypes.c_longlong(n), ctypes.c_longlong(m),
        ctypes.c_longlong(-1 if rows_n is None else rows_n),
        ctypes.c_longlong(-1 if range_ns is None else range_ns),
        out.ctypes.data_as(pdbl),
    )
    if not ok:
        return None
    return out


def ewma_hl(ts: np.ndarray, x: np.ndarray, hl: float,
            new_grp: np.ndarray | None = None) -> np.ndarray:
    """Half-life EWMA over float64 arrays, bitwise == the scalar walk.
    ``new_grp``: per-row reset flags for multi-key batches."""
    n = len(x)
    out = np.empty(n, dtype=np.float64)
    if n == 0:
        return out
    lib = _load()
    if lib is not None:
        ts = np.ascontiguousarray(ts, dtype=np.float64)
        x = np.ascontiguousarray(x, dtype=np.float64)
        grp8 = (np.ascontiguousarray(new_grp, dtype=np.int8)
                if new_grp is not None else None)
        pd_ = ctypes.POINTER(ctypes.c_double)
        pc = ctypes.POINTER(ctypes.c_byte)
        lib.ewma_hl(
            ts.ctypes.data_as(pd_), x.ctypes.data_as(pd_),
            ctypes.c_double(hl), ctypes.c_longlong(n),
            out.ctypes.data_as(pd_),
            grp8.ctypes.data_as(pc) if grp8 is not None else None,
        )
        return out
    # Python fallback: same bits (math.pow == scalar libm pow), one fused loop
    res = out.tolist()
    ts_l = ts.tolist()
    x_l = x.tolist()
    grp = new_grp.tolist() if new_grp is not None else None
    acc = x_l[0]
    prev = ts_l[0]
    for i in range(n):
        if grp is not None and grp[i]:
            acc = x_l[i]
            prev = ts_l[i]
        d = math.pow(0.5, (ts_l[i] - prev) / hl)
        acc = d * acc + (1.0 - d) * x_l[i]
        res[i] = acc
        prev = ts_l[i]
    return np.asarray(res, dtype=np.float64)


def ewma_alpha(x: np.ndarray, alpha: float,
               new_grp: np.ndarray | None = None) -> np.ndarray:
    """Per-tick EWMA — the plain (1-α)·acc + α·x recursion, seeded on the
    first sample of each group (identical op order to the streaming
    ewma_step twin and the recursive-CTE oracle). Python fallback walks
    the same loop, same bits."""
    n = len(x)
    out = np.empty(n, dtype=np.float64)
    if n == 0:
        return out
    lib = _load()
    if lib is not None:
        x = np.ascontiguousarray(x, dtype=np.float64)
        grp8 = (np.ascontiguousarray(new_grp, dtype=np.int8)
                if new_grp is not None else None)
        pd_ = ctypes.POINTER(ctypes.c_double)
        pc = ctypes.POINTER(ctypes.c_byte)
        lib.ewma_alpha(
            x.ctypes.data_as(pd_), ctypes.c_double(alpha),
            ctypes.c_longlong(n), out.ctypes.data_as(pd_),
            grp8.ctypes.data_as(pc) if grp8 is not None else None,
        )
        return out
    res = out.tolist()
    x_l = x.tolist()
    grp = new_grp.tolist() if new_grp is not None else None
    one_m = 1.0 - alpha
    acc = 0.0
    init = False
    for i in range(n):
        if (grp is not None and grp[i]) or not init:
            acc = x_l[i]
            init = True
        else:
            acc = one_m * acc + alpha * x_l[i]
        res[i] = acc
    return np.asarray(res, dtype=np.float64)
