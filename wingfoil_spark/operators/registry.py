"""User-op registry: declare an operator once, get the fluent method.

The reference's ``#[op]`` macro (wingfoil-derive/src/lib.rs:1244) turns one
operator declaration into the builder method, the fluent method and the
compiled/nested forwarders — user ops are first-class (within 2.4% of
built-ins, benches/README.md "custom_op"). The Spark analog: a registered
function becomes a :class:`~wingfoil_spark.stream.Stream` method; because
every op is just plan construction, user ops compile through Catalyst
exactly like built-ins (zero overhead — same codegen).

    @register_op()
    def double(stream, col, out="doubled"):
        return stream.map(**{out: F.col(col) * 2})

    events.double("value").df   # fluent, like any built-in

Stateful user ops follow the same path by delegating to
``operators.stateful.fold_pandas`` / ``streaming.stateful.KeyedStateOp``
(the ``CustomStream`` analog, wingfoil-python/python/wingfoil/stream.py:90).
"""

from __future__ import annotations

from collections.abc import Callable

from wingfoil_spark.stream import Stream

_REGISTRY: dict[str, Callable] = {}


def register_op(name: str | None = None) -> Callable:
    """Decorator: attach ``fn(stream, *args, **kwargs) -> Stream`` as a
    fluent Stream method. Re-registering a name overwrites (interactive
    workflows); colliding with a built-in method raises."""

    def deco(fn: Callable) -> Callable:
        op_name = name or fn.__name__
        if hasattr(Stream, op_name) and op_name not in _REGISTRY:
            raise ValueError(f"Stream.{op_name} already exists (built-in)")

        def method(self: Stream, *args, **kwargs):
            return fn(self, *args, **kwargs)

        method.__name__ = op_name
        method.__doc__ = fn.__doc__
        setattr(Stream, op_name, method)
        _REGISTRY[op_name] = fn
        return fn

    return deco


def registered_ops() -> dict[str, Callable]:
    return dict(_REGISTRY)
