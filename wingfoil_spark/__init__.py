"""wingfoil_spark — a PySpark-native stream analytics engine.

A from-scratch re-expression of the capability surface of
wingfoil-io/wingfoil (a Rust graph-based stream processor, studied at
/root/reference) in idiomatic PySpark:

- ``Stream`` — a time-ordered, optionally keyed dataflow handle backed by a
  DataFrame lineage node (the reference's ``Stream<T>``,
  ``crates/wingfoil/src/fluent.rs:628``). The DataFrame DAG *is* the operator
  graph; Catalyst is the scheduler/compiler tier (the reference's ``nitro!``
  compiled tier, ``crates/wingfoil-derive/src/lib.rs:36``).
- Historical replay = deterministic batch over event-time-ordered data;
  RealTime = the same transform bound to ``readStream``
  (``crates/wingfoil/src/runtime/run.rs:16-29`` run-mode duality).
- Engine time is an int64 LongType in a caller-defined unit (the reference
  is nanoseconds throughout — ``NanoTime``,
  ``crates/wingfoil/src/runtime/time.rs:38``; ``events_stream`` uses
  microseconds to match DuckDB's ``epoch_us`` exactly — see
  ``stream.py``'s unit contract).

Everything here derives from public knowledge only: the Apache Spark API and
the reference repo's observable behavior.
"""

from wingfoil_spark.session import get_spark, configure_session
from wingfoil_spark.stream import Stream
from wingfoil_spark.sources.tables import (
    load_table,
    load_tables,
    events_stream,
    replay_rows,
    ticker,
)
from wingfoil_spark.streaming.stateful import KeyedStateOp, with_close
from wingfoil_spark.custom import CustomStream, UpstreamValue
from wingfoil_spark.streaming.twins import EventTimeTimerOp
from wingfoil_spark.frames import build_dataframe

__all__ = [
    "Stream",
    "CustomStream",
    "UpstreamValue",
    "get_spark",
    "configure_session",
    "load_table",
    "load_tables",
    "events_stream",
    "replay_rows",
    "ticker",
    "KeyedStateOp",
    "with_close",
    "EventTimeTimerOp",
    "build_dataframe",
]

__version__ = "0.1.0"
