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

void ewma_hl(const double* ts, const double* x, double hl,
             long long n, double* out) {
    if (n <= 0) return;
    double acc = x[0];
    double prev = ts[0];
    for (long long i = 0; i < n; i++) {
        double d = pow(0.5, (ts[i] - prev) / hl);
        acc = d * acc + (1.0 - d) * x[i];
        out[i] = acc;
        prev = ts[i];
    }
}
"""

_lib: ctypes.CDLL | None = None
_tried = False


def _load() -> ctypes.CDLL | None:
    """Compile (once per host, content-addressed cache in /tmp) and load."""
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    tag = hashlib.md5(_SRC.encode()).hexdigest()[:12]
    so_path = os.path.join(tempfile.gettempdir(), f"wingfoil_ck_{tag}.so")
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
        lib.ewma_hl.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.c_double, ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.ewma_hl.restype = None
        _lib = lib
    except Exception:
        _lib = None  # no compiler / sandboxed exec: Python fallback
    return _lib


def ewma_hl(ts: np.ndarray, x: np.ndarray, hl: float) -> np.ndarray:
    """Half-life EWMA over float64 arrays, bitwise == the scalar walk."""
    n = len(x)
    out = np.empty(n, dtype=np.float64)
    if n == 0:
        return out
    lib = _load()
    if lib is not None:
        ts = np.ascontiguousarray(ts, dtype=np.float64)
        x = np.ascontiguousarray(x, dtype=np.float64)
        pd_ = ctypes.POINTER(ctypes.c_double)
        lib.ewma_hl(
            ts.ctypes.data_as(pd_), x.ctypes.data_as(pd_),
            ctypes.c_double(hl), ctypes.c_longlong(n),
            out.ctypes.data_as(pd_),
        )
        return out
    # Python fallback: same bits (math.pow == scalar libm pow), one fused loop
    res = out.tolist()
    ts_l = ts.tolist()
    x_l = x.tolist()
    acc = x_l[0]
    prev = ts_l[0]
    for i in range(n):
        d = math.pow(0.5, (ts_l[i] - prev) / hl)
        acc = d * acc + (1.0 - d) * x_l[i]
        res[i] = acc
        prev = ts_l[i]
    return np.asarray(res, dtype=np.float64)
