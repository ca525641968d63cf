"""Key-prefix snapshot + live watch over a revisioned KV event log — the
Spark home for the reference's etcd adapter (adapters/etcd.rs).

The reference's ``etcd_sub`` (etcd.rs:231) emits a consistent key-prefix
SNAPSHOT (all current keys as Put events) and then streams live watch
events (puts and deletes), with the handoff contract: *the watch is
opened before the GET so no write is missed, and any event already
covered by the snapshot (mod_revision <= snapshot_rev) is filtered as a
duplicate* (etcd.rs:84-95). ``EtcdSinkOps::etcd_pub`` (etcd.rs:371) PUTs
entries, with ``force=False`` making the write conditional — a conflict
aborts the run.

The cluster-native carrier for the same facts is a REVISIONED EVENT LOG
on shared storage: one row per change, ``(key, value, revision, kind)``,
append-only files under a directory (the "cluster"). etcd's cluster
revision maps to the log's monotone ``revision``; the GET maps to a
batch read; the watch maps to ``readStream`` over the same directory.
The snapshot→watch handoff then replays EXACTLY: the stream source sees
every file (the watch "opened first"), and the ``revision >
snapshot_rev`` filter is the reference's duplicate suppression.

Live etcd itself is a driver-side config store — bridging it means a
relay that appends watch events to this log (or Kafka; sources/io.py).
Like the reference, the source is realtime-only: a historical run is
rejected at wiring (etcd.rs:88-95 — the watch never closes, so a
block-collecting historical receiver would deadlock).

Event schema (mirrors EtcdEvent, etcd.rs:172-208): ``key string,
value string, revision long, kind string('put'|'delete')`` — a delete
carries the key with a NULL value (the reference's empty-value
contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

KV_SCHEMA = "key string, value string, revision long, kind string"


def kv_snapshot(spark: SparkSession, log_dir: str,
                prefix: str = "") -> tuple[DataFrame, int]:
    """The consistent prefix snapshot (the reference's initial GET):
    current state = per key, the highest-revision event; keys whose
    latest event is a delete are absent; every emitted row is kind='put'
    (etcd.rs:198-201 — snapshot events are always Put). Returns
    ``(snapshot_df, snapshot_rev)`` where ``snapshot_rev`` is the log's
    cluster revision at read time (max revision, 0 for an empty log)."""
    log = spark.read.schema(KV_SCHEMA).json(log_dir)
    if prefix:
        log = log.where(F.col("key").startswith(prefix))
    rev_row = log.agg(F.max("revision").alias("r")).collect()[0]
    snapshot_rev = int(rev_row["r"]) if rev_row["r"] is not None else 0
    w = Window.partitionBy("key").orderBy(F.col("revision").desc())
    latest = (
        log.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    snap = latest.where(F.col("kind") == "put").select(
        "key", "value", "revision", F.lit("put").alias("kind")
    )
    return snap, snapshot_rev


def kv_watch(spark: SparkSession, log_dir: str, prefix: str = "",
             snapshot_rev: int = 0, run_mode: str = "RealTime") -> DataFrame:
    """The live watch half: a streaming frame of every event STRICTLY
    AFTER ``snapshot_rev`` (the handoff duplicate filter,
    etcd.rs:84-87) under the prefix. Pair with :func:`kv_snapshot`::

        snap, rev = kv_snapshot(spark, log, prefix="cfg/")
        updates = kv_watch(spark, log, prefix="cfg/", snapshot_rev=rev)

    The file-stream source reads every log file (the watch is "opened
    before the GET" by construction — nothing in the handoff window can
    be missed), and the revision filter drops what the snapshot already
    covered. Historical runs are rejected at wiring, matching
    etcd.rs:88-95 (the watch never closes; a block-collecting historical
    receiver would deadlock)."""
    if run_mode != "RealTime":
        raise ValueError(
            "kv_watch (etcd_sub) is RealTime-only: a live watch has no "
            f"historical timeline to replay (got run mode '{run_mode}'); "
            "replay the event log with kv_snapshot / a batch read instead"
        )
    stream = spark.readStream.schema(KV_SCHEMA).json(log_dir)
    if prefix:
        stream = stream.where(F.col("key").startswith(prefix))
    return stream.where(F.col("revision") > int(snapshot_rev))


def kv_put(spark: SparkSession, log_dir: str, entries, revision: int,
           kind: str = "put", force: bool = True) -> int:
    """Append entries to the log at ``revision`` (the ``etcd_pub`` PUT,
    etcd.rs:371). ``entries`` is a list of ``(key, value)`` pairs (value
    None for deletes). With ``force=False`` the write is CONDITIONAL on
    key ABSENCE — it errors whenever any key already EXISTS in the
    snapshot, regardless of revision (the reference's
    ``create_revision == 0`` transaction compare, etcd.rs:103-105: "aborts
    the run, naming the key, if it already exists"). A deleted key does
    not exist (the snapshot drops tombstoned keys), so recreate-after-
    delete succeeds, matching etcd. ``force=True`` last-writer-wins, like
    etcd's unconditional PUT. Returns the revision written."""
    import json
    import os
    import uuid

    from pyspark.errors import AnalysisException

    revision = int(revision)
    if not force:
        try:
            snap, _ = kv_snapshot(spark, log_dir)
            conflict = [
                r.key for r in snap.where(
                    F.col("key").isin([k for k, _ in entries])
                ).collect()
            ]
        except AnalysisException:
            # absent log path: nothing exists yet. Any OTHER failure (a
            # corrupt log, a real read error) must propagate — swallowing
            # it would turn the conditional write unconditional.
            conflict = []
        if conflict:
            raise ValueError(
                f"conditional write conflict (force=False): keys "
                f"{sorted(conflict)} already exist "
                "(use force=true to overwrite)"
            )
    os.makedirs(log_dir, exist_ok=True)
    path = os.path.join(log_dir, f"rev-{revision:016d}-{uuid.uuid4().hex[:8]}.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        for k, v in entries:
            f.write(json.dumps({
                "key": k,
                "value": None if (kind == "delete" or v is None) else str(v),
                "revision": revision,
                "kind": "delete" if (kind == "delete" or v is None) else "put",
            }) + "\n")
    os.replace(tmp, path)
    return revision


def redis_stream_id_parts(col):
    """Split a Redis stream entry ID (``"<ms>-<seq>"``, the
    `XRANGE`/`XREAD` cursor format) into a sortable
    ``struct(ms long, seq long)`` — the reference's
    ``redis_stream_read`` snapshot→tail handoff keys on exactly this
    ordering (adapters/redis.rs:85-89: tail = entries with ID STRICTLY
    greater than the snapshot's last ID, which this struct's natural
    order reproduces). Pure Catalyst; pair with :func:`kv_watch`'s
    revision filter by using ``ms * 2^20 + seq`` (or the struct
    comparison) as the revision."""
    c = F.col(col) if isinstance(col, str) else col
    return F.struct(
        F.split(c, "-")[0].cast("long").alias("ms"),
        F.split(c, "-")[1].cast("long").alias("seq"),
    )


def redis_stream_tail(events: DataFrame, last_id: str,
                      id_col: str = "id") -> DataFrame:
    """The `XREAD STREAMS key <last_id>` contract over an event frame:
    only entries with an ID STRICTLY greater than ``last_id`` (redis.rs:
    382-389 — the snapshot's last entry is never re-delivered, nothing
    after it is missed). Works on batch or streaming frames."""
    ms, seq = (last_id.split("-") + ["0"])[:2]
    parts = redis_stream_id_parts(id_col)
    return events.where(
        (parts.ms > int(ms))
        | ((parts.ms == int(ms)) & (parts.seq > int(seq)))
    )
