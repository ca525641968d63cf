"""The reference's ``poll`` source family as a Spark 4 Python DataSource.

Reference contract (fluent.rs:344; op ops.rs:2899-2929): ``poll(f:
Fn() -> Option<T>) -> Stream<T>`` — the engine calls ``f`` once per
cycle on the realtime run loop; ``Some(v)`` emits one value, ``None``
is a quiet cycle; realtime only (historical runs reject external/poll
sources, interp.rs:2715-2727). SURVEY §2.1 mapped this "continuous
trigger / short-interval micro-batch" — this module makes the mapping
REAL instead of prose, via the public ``pyspark.sql.datasource`` API
(new in Spark 4): a registered streaming source whose micro-batches
advance a tick counter and call the user function once per tick.

Cycle → tick translation (the run-mode duality discipline):

- the reference busy-spins its cycle loop; Spark's cadence knob is the
  TRIGGER — ``trigger(processingTime="1 second")`` polls
  ``ticks_per_batch`` times per second, ``availableNow``/``once``
  drains one admission. One ``f()`` call per tick either way.
- ``f`` returning ``None`` is a quiet tick: no row, the tick still
  advances (exactly the reference's quiet cycle — downstream sees
  nothing).
- realtime-only carries over: this is a ``readStream`` format; a batch
  ``spark.read`` of it raises, mirroring interp.rs:2715-2727.

Shipping the function: executors run the poll, so ``f`` is named by an
IMPORT PATH (``"package.module:attr"``) rather than a closure — the
same contract every distributed scheduler uses for user callables (a
pickled lambda would silently break on version skew; an import path
fails loudly). The callable takes the tick number (``f(tick) ->
None | sequence``) — the reference's ``f()`` takes nothing, but Spark
replays ranges on recovery, and a tick argument is what makes a
deterministic ``f`` exactly-replayable (a nondeterministic ``f`` gets
at-least-once semantics on restart, the same caveat as any
non-replayable source; document, don't hide).

Usage::

    from wingfoil_spark.sources.poll import register_poll_source
    register_poll_source(spark)
    df = (spark.readStream.format("wingfoil_poll")
          .option("fn", "myjob.sources:read_sensor")
          .option("schema", "tick bigint, value double")
          .option("ticks_per_batch", 16)
          .load())

Scale shape: the reader is a ``SimpleDataSourceStreamReader`` — the
poll runs DRIVER-SIDE, one serial tick range per micro-batch, exactly
the reference's one-external-callback-per-cycle contract (an
executor-parallel poll would reorder it); fan out AFTER the source
with repartition if downstream work is heavy. State is one integer
tick offset in the checkpoint; on restart ``read(start)`` receives the
restored offset and the poll resumes at the next tick — deterministic
``f`` replays exactly-once (pinned by tests), nondeterministic ``f``
degrades to at-least-once like any non-replayable source.
"""

from __future__ import annotations

import importlib

from pyspark.sql.datasource import (
    DataSource,
    SimpleDataSourceStreamReader,
)

FORMAT_NAME = "wingfoil_poll"


def _resolve(path: str):
    mod, sep, attr = path.partition(":")
    if not sep or not mod or not attr:
        raise ValueError(
            f"poll source: fn={path!r} is not an import path — pass "
            "'package.module:attr' naming a callable(tick) -> "
            "None | sequence"
        )
    fn = getattr(importlib.import_module(mod), attr)
    if not callable(fn):
        # keep the plan-time contract: a resolvable-but-uncallable
        # attribute must fail at .load(), not as an opaque TypeError in
        # the first micro-batch (review r12)
        raise ValueError(
            f"poll source: fn={path!r} resolves to a non-callable "
            f"{type(fn).__name__}"
        )
    return fn


def _validate_options(options) -> tuple:
    """Shared by schema() (runs at .load() — wiring errors fail at PLAN
    time, not first batch) and the reader constructor."""
    try:
        fn_path = options["fn"]
    except KeyError:
        raise ValueError(
            "poll source requires .option('fn', 'package.module:attr') "
            "naming the callable(tick) -> None | sequence"
        )
    _resolve(fn_path)
    ticks = int(options.get("ticks_per_batch", 1))
    if ticks < 1:
        raise ValueError("poll source: ticks_per_batch must be >= 1")
    return fn_path, ticks


class _PollStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        # DataSourceOptions lower-cases keys
        self._fn_path, self._ticks = _validate_options(options)

    def initialOffset(self):
        return {"tick": 0}

    def _rows(self, start: int, end: int) -> list:
        fn = _resolve(self._fn_path)
        out = []
        for t in range(start, end):
            v = fn(t)
            if v is not None:  # None == the reference's quiet cycle
                out.append(tuple(v))
        return out

    def read(self, start):
        # ``start`` is the LAST COMMITTED offset (checkpoint-restored on
        # restart) — the poll resumes at exactly the next tick
        s = int(start["tick"])
        e = s + self._ticks
        return self._rows(s, e), {"tick": e}

    def readBetweenOffsets(self, start, end):
        # replay of a planned-but-uncommitted batch after a crash:
        # deterministic f re-produces the identical rows (exactly-once);
        # a nondeterministic f is at-least-once by nature — documented
        return self._rows(int(start["tick"]), int(end["tick"]))

    def commit(self, end):
        pass


class PollDataSource(DataSource):
    """``format("wingfoil_poll")`` — see the module docstring."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> str:
        _validate_options(self.options)  # .load()-time wiring check
        try:
            return self.options["schema"]
        except KeyError:
            raise ValueError(
                "poll source requires .option('schema', '<ddl>') — the "
                "engine cannot infer what the callable emits"
            )

    def simpleStreamReader(self, schema):
        return _PollStreamReader(self.options)

    def reader(self, schema):
        raise ValueError(
            "wingfoil_poll is realtime-only (the reference rejects "
            "external/poll sources under historical runs, "
            "interp.rs:2715-2727) — use spark.readStream"
        )


def register_poll_source(spark) -> None:
    """Register :class:`PollDataSource` on this session (idempotent)."""
    spark.dataSource.register(PollDataSource)


def demo_poll(tick: int):
    """The deterministic demo/test callable: value = tick * 0.5 + 0.25;
    every 5th tick (tick % 5 == 4) is a quiet cycle (returns None)."""
    if tick % 5 == 4:
        return None
    return (tick, tick * 0.5 + 0.25)


def at_start(tick: int):
    """The reference's ``source_at_start`` shape (fluent.rs:358 —
    deferred-connection source: I/O opens at ``start()``, nothing before)
    as a poll recipe: emit exactly once, at tick 0, quiet forever after.
    The DataSource machinery already defers everything to query start
    (schema() is the only pre-start call), so "connect at start, emit
    the initial value, then hand over" is one callable. For a connect-
    then-keep-producing source, make your own callable hold the opened
    handle in a closure-free module global keyed by config — or use the
    file/kafka readStream connectors, which own that lifecycle."""
    return (0, 1.0) if tick == 0 else None
