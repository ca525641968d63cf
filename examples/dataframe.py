#!/usr/bin/env python3
"""DataFrame — join several streams on engine time into one pandas frame.

Twin of wingfoil-python examples/dataframe.py: `build_dataframe({name:
stream, ...})` outer-joins streams on their engine time, one column per
key, slower streams showing NaN where they were quiet.

    python examples/dataframe.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F

import wingfoil_spark as wf
from wingfoil_spark import build_dataframe
from wingfoil_spark.sources.tables import ticker

spark = wf.get_spark("dataframe_example", cpus=4)

print("~~~ Multiple streams (build_dataframe) ~~~")
source = ticker(spark, 100, 5).count()
price = source.map(price=(F.col("n") + 100).cast("double"))
qty = source.map(qty=F.lit(10.0))
both = build_dataframe({"price": (price, "price"), "qty": (qty, "qty")})
both.show()

print("\n~~~ Streams at different rates (outer join fills null) ~~~")
fast = ticker(spark, 100, 4).count().map(fast=F.col("n") * 10.0)
slow = ticker(spark, 200, 2).count().map(slow=F.col("n") * 100.0)
frame = build_dataframe({"fast": (fast, "fast"), "slow": (slow, "slow")})
frame.orderBy("ts").show()
assert frame.where(F.col("slow").isNull()).count() > 0, \
    "quiet cycles show as null"
