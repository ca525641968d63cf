"""File-backed result cache for time-sliced historical readers.

Reference: ``adapters/cache.rs`` — a pure-utility adapter (no graph edge):
a stable query-keyed, LRU-evicting on-disk cache of timestamped result
batches, used by caller-parameterised historical readers (the legacy
``kdb_read_cached`` shape) to avoid re-fetching a slice that was already
downloaded. Every public capability maps 1:1 so the reference's unit tests
(tests/cache_adapter.rs) port across:

- :class:`CacheKey` — the SAME stable digest as the reference
  (cache.rs:52-64): SHA-256 over the parts with a NUL separator byte after
  each (so ``["ab","c"] != ["a","bc"]``), first 16 hex chars. The
  reference's pinned stability digest (``test_key_stability`` →
  ``5899c93491e25e68``) reproduces here bit-for-bit.
- :class:`CacheConfig` — folder + size cap + :meth:`CacheConfig.clear`
  (deletes only ``*.cache``; a missing folder is fine; per-file errors are
  collected into one combined error, other files untouched — cache.rs:101-124).
- :class:`FileCache` — ``get``/``put`` with the reference's exact file
  format *shape*: a one-line backslash-escaped query header (`head -1`
  shows what produced the file — cache.rs:133-144, 204-219) terminated by
  the first newline, then the payload. The payload codec is **Arrow IPC**
  in place of bincode — the Spark-native columnar serialization (any
  DataFrame schema, zero row-loop) with the same framing role.

Behavior contracts replayed (tests/test_cache_adapter.py):
atomic write (``.tmp`` then rename — never a torn ``.cache``), mtime touch
on hit so LRU eviction spares recently-used entries, miss → ``None``,
corrupt payload → **error** (not a miss — the caller decides; the
get-or-fetch helper treats it as a miss the way ``kdb_read_cached`` did),
LRU eviction by mtime excluding the in-flight target.

Scale posture: this tier caches BOUNDED slices (a JDBC/KDB time-slice, a
dimension snapshot, a driver-sized query result) through the driver — the
role it has in the reference. Cluster-scale materialization of big frames
belongs to parquet/bucketed tables (``sources.io.write_bucketed``), not
here; :meth:`FileCache.put` refuses nothing but documents the posture.
"""

from __future__ import annotations

import hashlib
import io
import os
from dataclasses import dataclass
from pathlib import Path
from typing import Callable, Optional

import pyarrow as pa


class CacheKey:
    """Opaque stable cache key: first 16 hex chars of SHA-256 over
    NUL-separated parts (cache.rs:52-64). ``parts`` is conventionally
    ``[host, port_str, query_string]`` — the query string is the single
    source of truth for what was fetched (it embeds time bounds)."""

    __slots__ = ("hex",)

    def __init__(self, hex_: str):
        self.hex = hex_

    @classmethod
    def from_parts(cls, parts) -> "CacheKey":
        h = hashlib.sha256()
        for p in parts:
            h.update(p.encode("utf-8"))
            h.update(b"\x00")  # separator so ["ab","c"] != ["a","bc"]
        return cls(h.hexdigest()[:16])

    def __eq__(self, other):
        return isinstance(other, CacheKey) and self.hex == other.hex

    def __hash__(self):
        return hash(self.hex)

    def __repr__(self):
        return f'CacheKey("{self.hex}")'


@dataclass
class CacheConfig:
    """Cache directory + total-size cap. ``max_size_bytes=None`` means
    unbounded (the reference's ``u64::MAX``)."""

    folder: str
    max_size_bytes: Optional[int] = None

    def clear(self) -> None:
        """Delete all ``.cache`` files inside :attr:`folder`. A missing
        folder is fine; per-file deletion errors are collected and raised
        as one combined error; other files are left untouched
        (cache.rs:101-124)."""
        folder = Path(self.folder)
        if not folder.exists():
            return
        errors = []
        for p in folder.iterdir():
            if p.suffix == ".cache":
                try:
                    p.unlink()
                except OSError as e:  # pragma: no cover - exotic fs errors
                    errors.append(f"{p}: {e}")
        if errors:
            raise OSError("cache clear errors:\n" + "\n".join(errors))


def _escape_header(query: str) -> str:
    """Render the query as a single line (cache.rs:133-144): backslash-
    escape ``\\``, ``\\n``, ``\\r`` C-style so the first raw newline in the
    file is unambiguously the payload boundary and the header stays
    readable under ``head -1``."""
    out = []
    for c in query:
        if c == "\\":
            out.append("\\\\")
        elif c == "\n":
            out.append("\\n")
        elif c == "\r":
            out.append("\\r")
        else:
            out.append(c)
    return "".join(out)


def _unescape_header(line: str) -> str:
    out, i = [], 0
    while i < len(line):
        c = line[i]
        if c == "\\" and i + 1 < len(line):
            nxt = line[i + 1]
            out.append({"\\": "\\", "n": "\n", "r": "\r"}.get(nxt, "\\" + nxt))
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


class FileCache:
    """Query-keyed on-disk DataFrame cache with LRU eviction
    (cache.rs:149-300). Payload is an Arrow IPC stream after the one-line
    query header."""

    def __init__(self, config: CacheConfig):
        self.config = config

    def _path(self, key: CacheKey) -> Path:
        return Path(self.config.folder) / f"{key.hex}.cache"

    # ----------------------------------------------------------------- get
    def get(self, spark, key: CacheKey):
        """Look up a cached result. ``None`` on a miss; raises if the file
        exists but is corrupt or unreadable (cache.rs:166-202). On a hit
        the file's mtime is touched so LRU eviction treats it as recently
        used."""
        path = self._path(key)
        try:
            data = path.read_bytes()
        except FileNotFoundError:
            return None
        nl = data.find(b"\n")
        if nl < 0:
            raise ValueError(f"cache file missing header newline: {path}")
        try:
            reader = pa.ipc.open_stream(io.BytesIO(data[nl + 1 :]))
            table = reader.read_all()
        except pa.ArrowInvalid as e:
            raise ValueError(f"corrupt cache payload: {path}: {e}") from e
        # Touch mtime so LRU eviction treats this entry as recently used
        # (the reference rewrites the unchanged bytes; utime is the same
        # contract without the IO). Errors ignored — data already read.
        try:
            os.utime(path)
        except OSError:
            pass
        try:
            return spark.createDataFrame(table)  # Arrow-native (Spark 4)
        except TypeError:  # pragma: no cover - older pyspark
            return spark.createDataFrame(table.to_pandas())

    def header(self, key: CacheKey) -> Optional[str]:
        """The exact query string that produced a cached entry (the
        self-documenting ``head -1`` header, unescaped), or None on miss."""
        path = self._path(key)
        try:
            data = path.read_bytes()
        except FileNotFoundError:
            return None
        nl = data.find(b"\n")
        if nl < 0:
            raise ValueError(f"cache file missing header newline: {path}")
        return _unescape_header(data[:nl].decode("utf-8"))

    # ----------------------------------------------------------------- put
    def put(self, key: CacheKey, query: str, df) -> None:
        """Write a result atomically (write ``.tmp``, then rename —
        cache.rs:204-254), evicting least-recently-used ``.cache`` files
        first when the total on-disk size would exceed the cap. ``df`` may
        be a DataFrame (driver-collected via Arrow — this tier caches
        bounded slices) or a ready ``pyarrow.Table``."""
        table = df if isinstance(df, pa.Table) else _to_arrow(df)
        path = self._path(key)
        tmp = path.with_suffix(".tmp")
        path.parent.mkdir(parents=True, exist_ok=True)

        sink = io.BytesIO()
        with pa.ipc.new_stream(sink, table.schema) as w:
            w.write_table(table)
        buf = (_escape_header(query) + "\n").encode("utf-8") + sink.getvalue()
        tmp.write_bytes(buf)
        if self.config.max_size_bytes is not None:
            self._evict_lru(len(buf), path)
        os.replace(tmp, path)  # atomic: never a torn .cache

    def _evict_lru(self, new_size: int, exclude: Path) -> None:
        """Delete oldest-mtime ``.cache`` files (excluding the in-flight
        target) until existing + new fits the cap (cache.rs:259-299)."""
        folder = Path(self.config.folder)
        try:
            entries = [
                (p, p.stat()) for p in folder.iterdir()
                if p.suffix == ".cache" and p != exclude
            ]
        except OSError:
            return
        entries.sort(key=lambda e: e[1].st_mtime_ns)
        total = sum(st.st_size for _, st in entries)
        needed = total + new_size - self.config.max_size_bytes
        if needed <= 0:
            return
        freed = 0
        for p, st in entries:
            if freed >= needed:
                break
            try:
                p.unlink()
                freed += st.st_size
            except OSError:
                continue  # logged-and-continue in the reference


def _to_arrow(df) -> pa.Table:
    try:
        return df.toArrow()
    except AttributeError:  # pragma: no cover - older pyspark
        import pandas as pd

        return pa.Table.from_pandas(df.toPandas())


def cached_query(
    spark,
    cache: FileCache,
    parts,
    query: str,
    fetch: Callable[[], "object"],
):
    """Get-or-fetch-and-put — the ``kdb_read_cached`` reader shape
    (adapters/kdb/read.rs:445 uses exactly this: key the slice query, hit
    the cache, else fetch and write back). A corrupt entry is treated as a
    miss here (re-fetch and overwrite), matching the legacy reader's
    decode-failure recovery (cache.rs:215-219)."""
    key = CacheKey.from_parts(parts)
    try:
        hit = cache.get(spark, key)
    except ValueError:
        hit = None
    if hit is not None:
        return hit
    df = fetch()
    cache.put(key, query, df)
    return df
