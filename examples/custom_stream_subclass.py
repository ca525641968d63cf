#!/usr/bin/env python3
"""Custom stream — the subclass form, the binding's legacy idiom.

Twin of wingfoil-python examples/custom_stream_subclass.py: subclass
`CustomStream`, implement `cycle()`, read the upstreams off `self`; the
constructor returns the wired `Stream`, so it chains like any other.

    python examples/custom_stream_subclass.py
"""

import math

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F

import wingfoil_spark as wf
from wingfoil_spark import CustomStream, Stream
from wingfoil_spark.sources.tables import ticker


class MyStream(CustomStream):
    """Combines its upstreams as digits of a base-10 number."""

    def cycle(self):
        value = 0.0
        for i, src in enumerate(self.upstreams()):
            value += src.peek_value() * math.pow(10, i)
        self.set_value(value)
        return True


spark = wf.get_spark("custom_stream_subclass", cpus=4)

c = ticker(spark, 100, 5).count()
source = Stream(
    c.df.select("ts", "seq", F.col("n").cast("double").alias("v")), "ts", "seq"
)

# The same source wired three times: n + 10n + 100n == 111n, scaled to 1.11n.
out = MyStream([source] * 3).map(scaled=F.col("value") * 0.01)
rows = out.collect_ordered()
for r in rows:
    print("out:", r.scaled)
print("final:", rows[-1].scaled)
assert rows[-1].scaled == 5.55
