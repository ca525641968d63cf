#!/usr/bin/env python
"""Warm per-query phase split: run each headline query N times in one
session and report the MINIMUM build (fn call — Python assembly +
Catalyst analysis + any eager checkpoint/fit actions) and exec (noop
sink) walls, plus per-run steal jiffies so stolen windows are visible.
This is the measurement behind the 'where does the bench second go'
decisions in OPTIMIZATION_r14.md."""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from bench import HEADLINE, _steal_jiffies  # noqa: E402
from wingfoil_spark.session import get_spark  # noqa: E402


def main() -> None:
    only = sys.argv[1].split(",") if len(sys.argv) > 1 else None
    n = int(os.environ.get("WARM_N", "3"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("wingfoil_warm_split")
    queries = entry.queries()
    names = [q for q in HEADLINE if only is None or q in only]
    out: dict[str, dict] = {}
    for name in names:
        fn = queries[name]
        # warm-up run: codegen + class load for this query shape
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        builds, execs, steals = [], [], []
        for _ in range(n):
            s0 = _steal_jiffies()
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            builds.append(t1 - t0)
            execs.append(t2 - t1)
            steals.append(_steal_jiffies() - s0)
        out[name] = {
            "build_min": round(min(builds), 3),
            "exec_min": round(min(execs), 3),
            "steal": steals,
        }
        print(f"# {name}: build {min(builds):.3f}s exec {min(execs):.3f}s "
              f"steal={steals}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
