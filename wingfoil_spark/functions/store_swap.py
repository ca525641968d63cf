"""Atomic-ish directory swap for compaction maintenance jobs.

Both persisted-store compactors (:func:`~wingfoil_spark.functions.
similarity.compact_cell_store` for the vector cell layouts and
:func:`~wingfoil_spark.streaming.ingest.compact_fingerprint_store` for
the crawl dedup history) share the same commit shape: rewrite the store
into a temporary sibling, then swap it into place with two renames
(current -> .old, compacted -> current). This module factors the swap
behind a strategy switch so the maintenance loop is legal beyond the
driver's local filesystem (VERDICT r12 Next #3):

- ``strategy='local'`` — ``shutil.move``: the original driver-local
  path. Only valid where Spark's write target and the driver's posix
  view are the same tree (``local[..]`` or a shared mount).
- ``strategy='fs'`` — the Hadoop FileSystem API reached through the
  live JVM (``Path.getFileSystem(hadoopConf)`` + ``fs.rename``): the
  same two-rename shape executed by the storage layer itself, so it is
  correct on ``file://``, HDFS, and any connector whose ``rename`` is a
  metadata move. On S3A, ``rename`` is copy+delete — the swap still
  COMMITS correctly (readers see old-or-new, never half), but it is not
  O(1); prefer a table format's commit protocol there.
- ``strategy='auto'`` — ``fs`` when the path carries ANY explicit
  scheme (hdfs://, s3a://, and file:// too — ``shutil`` cannot take a
  URI); a scheme-less path is resolved through the Hadoop layer
  (Spark resolves such paths against ``fs.defaultFS``, which need not
  be local) and uses ``local`` only when it lands on the local
  filesystem.

Either strategy keeps the compactors' rollback contract: a failure
before the first rename leaves the store untouched and removes the
temporary copy; a failure between the renames moves the old store back
so the path stays readable. The concurrent-appender caveat is
UNCHANGED by the strategy — an append landing between the compactor's
read and this swap is silently discarded by the swap on every storage
backend; serialize appends and compaction on one maintenance schedule.
"""
from __future__ import annotations

import shutil

__all__ = [
    "ConcurrentAppendError",
    "guard_no_new_files",
    "swap_store_dirs",
    "validate_swap_strategy",
]


class ConcurrentAppendError(RuntimeError):
    """An append landed in the store between the compactor's read and
    its swap — swapping now would silently discard those rows."""


def guard_no_new_files(spark, base: str, files_at_read: set, tmp: str) -> None:
    """Best-effort concurrent-appender guard for the compactors: re-list
    the live store just before the swap and ABORT (removing the
    compacted copy) if files appeared since the compaction read them —
    a late append that the old code silently discarded (lost corpus
    rows / lost dedup history) is now a loud, retryable failure.

    Best-effort means the race window narrows from the WHOLE rewrite
    (seconds-to-hours at 100 TB) to the instant between this re-list
    and the rename — the serialize-appends-and-compaction-on-one-
    maintenance-schedule contract still stands; this guard converts a
    schedule violation from silent data loss into an error. The listing
    is ``inputFiles()`` on a fresh read, so it is storage-portable like
    the ``fs`` swap strategy."""
    try:
        now = set(spark.read.parquet(base).inputFiles())
    except Exception:
        # the live store itself is unreadable (moved/permissions) — the
        # swap cannot proceed, so honor the rollback contract of every
        # other failure path and remove the compacted copy before
        # re-raising instead of orphaning it on disk
        fs, jvm = _hadoop_fs(spark, tmp)
        fs.delete(jvm.org.apache.hadoop.fs.Path(tmp), True)
        raise
    new = now - files_at_read
    if new:
        fs, jvm = _hadoop_fs(spark, tmp)
        fs.delete(jvm.org.apache.hadoop.fs.Path(tmp), True)
        raise ConcurrentAppendError(
            f"compaction aborted: {len(new)} file(s) were appended to "
            f"{base!r} during the rewrite (e.g. {sorted(new)[0]!r}); "
            "swapping would discard them — re-run compaction from the "
            "maintenance schedule with appends quiesced"
        )


def _hadoop_fs(spark, path: str):
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(conf), jvm


def _fs_rename(fs, jvm, src: str, dst: str) -> None:
    # Hadoop renames report failure inconsistently across FileSystem
    # implementations — False from HDFS-style metadata moves, a raised
    # IOException from RawLocalFileSystem's copy fallback. Normalize
    # both to IOError so the caller's rollback logic engages the same
    # way everywhere.
    src_p = jvm.org.apache.hadoop.fs.Path(src)
    dst_p = jvm.org.apache.hadoop.fs.Path(dst)
    try:
        ok = fs.rename(src_p, dst_p)
    except Exception as e:
        raise IOError(
            f"hadoop fs rename failed: {src!r} -> {dst!r}"
        ) from e
    if not ok:
        raise IOError(f"hadoop fs rename failed: {src!r} -> {dst!r}")


def validate_swap_strategy(strategy: str) -> None:
    """Reject an unknown strategy BEFORE any work happens — the
    compactors call this first so a typo ('hdfs' for 'fs') fails before
    the full-store rewrite, not after it (review r13: the late
    ValueError wasted the rewrite and orphaned the compacted copy)."""
    if strategy not in ("auto", "local", "fs"):
        raise ValueError(
            f"unknown strategy {strategy!r} "
            "(expected 'auto', 'local' or 'fs')"
        )


def swap_store_dirs(
    spark, base: str, tmp: str, old: str, strategy: str = "auto"
) -> None:
    """Swap the compacted copy at ``tmp`` into place at ``base`` via
    ``old``, with rollback. ``base``/``tmp``/``old`` must live on the
    same filesystem (they are siblings by construction in the
    compactors). See the module docstring for the strategy contract."""
    validate_swap_strategy(strategy)
    if strategy == "auto":
        # ANY explicit scheme — including file:// — goes through the
        # Hadoop API (shutil.move cannot take a URI). A SCHEME-LESS
        # path is NOT automatically driver-local: Spark resolves it
        # against fs.defaultFS (review r13 — on a cluster with an HDFS
        # defaultFS the rewrite landed remote while shutil ran on the
        # driver's posix tree), so ask the Hadoop layer which
        # filesystem the path actually resolves to and use shutil only
        # for genuinely local stores.
        if "://" in base:
            strategy = "fs"
        else:
            fs, _jvm = _hadoop_fs(spark, base)
            scheme = fs.getUri().getScheme()
            strategy = "local" if scheme == "file" else "fs"
    if strategy == "local":
        try:
            shutil.move(base, old)
        except Exception:
            # the swap never started — the store is untouched; don't
            # leave the compacted copy orphaned on disk
            shutil.rmtree(tmp, ignore_errors=True)
            raise
        try:
            shutil.move(tmp, base)
        except Exception:
            shutil.move(old, base)  # roll back: leave the store readable
            shutil.rmtree(tmp, ignore_errors=True)
            raise
        shutil.rmtree(old, ignore_errors=True)
        return
    fs, jvm = _hadoop_fs(spark, base)
    try:
        _fs_rename(fs, jvm, base, old)
    except Exception:
        fs.delete(jvm.org.apache.hadoop.fs.Path(tmp), True)
        raise
    try:
        _fs_rename(fs, jvm, tmp, base)
    except Exception:
        _fs_rename(fs, jvm, old, base)  # roll back: keep base readable
        fs.delete(jvm.org.apache.hadoop.fs.Path(tmp), True)
        raise
    fs.delete(jvm.org.apache.hadoop.fs.Path(old), True)
