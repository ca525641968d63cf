#!/usr/bin/env python
"""Capture `.explain("formatted")` for headline queries into plans/<tag>/,
plus a per-query phase split: `build` (the fn(spark, sf_dir) call — includes
any eager localCheckpoint / fit actions the query materializes) vs `exec`
(the noop sink run of the returned frame). The split tells us whether a
wall lives in serialized driver-side actions (overlap candidates, guide
§2.6) or in the final job (plan-shape candidates, guide §2-4).

Usage:
  python plans/capture_plans.py <tag> [query,query,...]

Writes plans/<tag>/<query>_<suffix>.txt and prints one JSON line with the
phase timings. The suffix is `before`/`after` via $PLAN_SUFFIX (default
`before`).
"""
from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from bench import HEADLINE  # noqa: E402
from wingfoil_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r14"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    suffix = os.environ.get("PLAN_SUFFIX", "before")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("wingfoil_plan_capture")
    queries = entry.queries()
    names = [q for q in HEADLINE if only is None or q in only]
    phases: dict[str, dict] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"capture:{name}")
        t0 = time.perf_counter()
        df = queries[name](spark, sf_dir)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        # strip volatile ids so before/after diffs are readable
        stable = re.sub(r"#\d+L?", "#x", plan)
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(stable)
        ex_nodes = len(re.findall(r"\bExchange\b", stable))
        py_nodes = len(
            re.findall(r"BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow|FlatMapGroupsInPandas", stable)
        )
        phases[name] = {
            "build_s": round(t1 - t0, 3),
            "exec_s": round(t2 - t1, 3),
            "exchanges": ex_nodes,
            "python_nodes": py_nodes,
        }
        print(f"# {name}: build {t1-t0:.3f}s exec {t2-t1:.3f}s "
              f"exchanges={ex_nodes} python={py_nodes}", file=sys.stderr)
    print(json.dumps({"tag": tag, "suffix": suffix, "phases": phases}))


if __name__ == "__main__":
    main()
