#!/usr/bin/env python3
"""Quick start — build a small wingfoil_spark graph and run it.

The Spark-first twin of the binding's quick_start (wingfoil-python
examples/quick_start.py): sources (`ticker`, `constant`, `replay_rows`)
and combinators (`map`, `filter_value`, `distinct_until_changed`, ...)
build Streams; a batch run IS the deterministic historical replay, and
`collect_ordered()` / `last_values()` read values back.

    python examples/quick_start.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F

import wingfoil_spark as wf
from wingfoil_spark.sources.tables import ticker

spark = wf.get_spark("quick_start", cpus=4)

greetings = (
    ticker(spark, 100, 3)          # ticks 1, 2, 3 ... every 100ns
    .count()
    .map(msg=F.concat(F.lit("hello world "), F.col("n")))
    .inspect(print)                # side-effect tap: rows print as they flow
)

rows = greetings.collect_ordered() # the historical run (deterministic)
print("final value:", rows[-1].msg)
assert rows[-1].msg == "hello world 3"
