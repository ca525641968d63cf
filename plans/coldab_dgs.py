#!/usr/bin/env python
"""Cold-JVM interleaved A/B for dynamic_group_sum (VERDICT r14 Next #2):
one bench.py invocation per (mode, rep) with a FRESH JVM each time,
alternating WINGFOIL_SCALE_MATERIALIZE=local / none, recording per-run
steal jiffies so stolen windows are attributable. The r14 warm A/B said
the localCheckpoint shape wins; the driver's cold number said otherwise —
this is the protocol that settles it.

Usage: python plans/coldab_dgs.py [reps=4] [query=dynamic_group_sum]
Prints one JSON line: {"mode": [secs...], ...} plus steal per attempt.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def steal() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    query = sys.argv[2] if len(sys.argv) > 2 else "dynamic_group_sum"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out: dict[str, list] = {"local": [], "none": []}
    for r in range(reps):
        for mode in ("local", "none"):
            env = dict(os.environ)
            env["WINGFOIL_SCALE_MATERIALIZE"] = mode
            env["SPARK_GRAFT_ONLY"] = query
            env["SPARK_GRAFT_BEST_OF"] = "3"
            # no heal: we want the raw best-of-3 with steal attribution
            env["SPARK_GRAFT_HEAL_ATTEMPTS"] = "0"
            s0 = steal()
            t0 = time.time()
            p = subprocess.run(
                [sys.executable, os.path.join(repo, "bench.py")],
                capture_output=True, text=True, env=env, cwd=repo,
                timeout=600,
            )
            line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
            sec = None
            if line:
                doc = json.loads(line[-1])
                sec = doc["queries"].get(query)
            out[mode].append({
                "rep": r, "sec": sec, "steal": steal() - s0,
                "wall": round(time.time() - t0, 1),
            })
            print(f"# rep{r} {mode}: {sec}s steal={out[mode][-1]['steal']}",
                  file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
