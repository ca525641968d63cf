"""Standalone decon_stream wall probe (r14 optimization round).

Runs q_decon_stream once at the given SF dir, forces the returned frame
(noop-equivalent: count after localCheckpoint regions), and prints:
  - PART_WALLS (stage walls; overlapping regions per the r14 OPT notes)
  - total wall
  - the file-union streaming query's per-trigger durationMs breakdown
    (captured via a StreamingQueryListener so the probe needs no access
    to the query handle inside the entry function)
  - per-run /proc/stat steal attribution so a stolen window is visible

Usage: python plans/r14/decon_walls_probe.py [sf_dir] [reps]
"""
import json
import os
import sys
import time

# import the tree the probe is launched FROM (A/B runs launch it from a
# worktree cwd), never a hardcoded path
sys.path.insert(0, os.getcwd())


def steal():
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    import __spark_entry__ as e
    from wingfoil_spark.session import get_spark

    spark = get_spark("decon_walls_probe")
    progress = []
    try:
        from pyspark.sql.streaming import StreamingQueryListener

        class L(StreamingQueryListener):
            def onQueryStarted(self, event):
                pass

            def onQueryProgress(self, event):
                p = event.progress
                progress.append(
                    {
                        "name": p.name,
                        "batchId": p.batchId,
                        "durationMs": dict(p.durationMs),
                        "numInputRows": p.numInputRows,
                    }
                )

            def onQueryIdle(self, event):
                pass

            def onQueryTerminated(self, event):
                pass

        spark.streams.addListener(L())
    except Exception as ex:  # listener is best-effort
        print("listener unavailable:", ex)

    for i in range(reps):
        s0, t0 = steal(), time.perf_counter()
        df = e.queries()["decon_stream"](spark, sf_dir)
        n = df.count()
        wall = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "rep": i,
                    "rows": n,
                    "wall_s": round(wall, 3),
                    "steal_jiffies": steal() - s0,
                    "part_walls": dict(e.PART_WALLS),
                }
            )
        )
    for p in progress:
        print(json.dumps(p))
    spark.stop()


if __name__ == "__main__":
    main()
