#!/usr/bin/env python3
"""Plugin SDK — compose registered components from Python.

Twin of wingfoil-python examples/plugin_sdk.py: the reference authors
ops/sub-graphs/adapters in Rust and wires them from Python; here the
same seam is `register_op` — any `fn(stream, ...) -> Stream` becomes a
fluent Stream method (ops AND whole sub-graphs alike; the JVM/Catalyst
interior is the compiled tier), plus `for_each` as the draining sink.

    python examples/plugin_sdk.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F

import wingfoil_spark as wf
from wingfoil_spark.operators.registry import register_op
from wingfoil_spark.sources.tables import ticker
from wingfoil_spark.stream import Stream

spark = wf.get_spark("plugin_sdk", cpus=4)


def ramp_source(spark, start, step, n):
    """A registered SOURCE component: start, start+step, ... (the
    #[pyadapter] analog)."""
    c = ticker(spark, 100, n).count()
    return Stream(
        c.df.select("ts", "seq",
                    (F.lit(start) + (F.col("n") - 1) * F.lit(step)).alias("v")),
        "ts", "seq",
    )


@register_op()
def square(s):
    """A registered OP (#[pyop] analog)."""
    return s.map(v=F.col("v") * F.col("v"))


@register_op()
def doubled_running_total(s):
    """A registered SUB-GRAPH (#[pygraph] analog): double, then
    cumulative-sum — two nodes behind one name."""
    return s.map(v=F.col("v") * 2).fold("v", "sum", out="v")


ramp = ramp_source(spark, 10.0, 2.0, 3)      # 10, 12, 14

squared = ramp.square()                      # 100, 144, 196
totals = ramp.doubled_running_total()        # 20, 44, 72

# the draining sink (list_sink analog). The binding's engine is
# in-process, so its Rust sink appends to a Python list directly; here
# executors are remote by design — for_each(fn) runs ON the executors —
# so a driver-side list drain is collect() on the bounded stream.
collected = [v for _, v in squared.collect()]

print("squared (via sink)    :", collected)
print("doubled running total :", [v for _, v in totals.collect()])
assert collected == [100.0, 144.0, 196.0]
assert [v for _, v in totals.collect()] == [20.0, 44.0, 72.0]
