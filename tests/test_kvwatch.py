"""etcd-adapter semantics over the revisioned KV event log
(sources/kvwatch.py): the snapshot→watch handoff contract, latest-per-key
snapshot state, the delete/empty-value contract, prefix filtering, the
realtime-only wiring guard, and the force=False conditional write —
replayed from adapters/etcd.rs:84-95,172-208,231,371 and
tests/etcd_adapter.rs:44-66."""

import pytest

from wingfoil_spark.sources import kvwatch as kv


def _seed(spark, d):
    kv.kv_put(spark, d, [("cfg/a", "1"), ("cfg/b", "2")], revision=1)
    kv.kv_put(spark, d, [("cfg/a", "3")], revision=2)          # update a
    kv.kv_put(spark, d, [("cfg/b", None)], revision=3)         # delete b
    kv.kv_put(spark, d, [("other/x", "9")], revision=4)        # off-prefix


def test_snapshot_latest_per_key_deletes_absent(spark, tmp_path):
    d = str(tmp_path / "log")
    _seed(spark, d)
    snap, rev = kv.kv_snapshot(spark, d, prefix="cfg/")
    rows = {r.key: (r.value, r.revision, r.kind) for r in snap.collect()}
    # b's latest event is a delete -> absent; a at its latest revision;
    # every snapshot row is kind='put' (etcd.rs:198-201)
    assert rows == {"cfg/a": ("3", 2, "put")}
    assert rev == 3, "snapshot_rev is the prefix log's max revision"


def test_watch_handoff_filters_snapshot_covered_events(spark, tmp_path):
    """etcd.rs:84-87: the watch sees every file, but events with
    revision <= snapshot_rev are filtered as duplicates; a write landing
    AFTER the snapshot flows through."""
    d = str(tmp_path / "log")
    _seed(spark, d)
    snap, rev = kv.kv_snapshot(spark, d, prefix="cfg/")
    # post-snapshot writes: an update and a delete
    kv.kv_put(spark, d, [("cfg/c", "7")], revision=5)
    kv.kv_put(spark, d, [("cfg/a", None)], revision=6)
    q = (
        kv.kv_watch(spark, d, prefix="cfg/", snapshot_rev=rev)
        .writeStream.format("memory").queryName("kvw")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        r.key: (r.value, r.revision, r.kind)
        for r in spark.sql("SELECT * FROM kvw").collect()
    }
    assert got == {
        "cfg/c": ("7", 5, "put"),
        "cfg/a": (None, 6, "delete"),  # delete carries key, empty value
    }


def test_watch_rejects_historical_mode(spark, tmp_path):
    """tests/etcd_adapter.rs:44-66: a historical run is rejected at
    wiring — the watch never closes."""
    with pytest.raises(ValueError, match="RealTime-only"):
        kv.kv_watch(spark, str(tmp_path / "log"), run_mode="HistoricalFrom")


def test_conditional_write_conflict(spark, tmp_path):
    """etcd.rs:103-105,371 force=False: the conditional PUT is a
    create_revision == 0 transaction — it aborts whenever the key already
    EXISTS, regardless of revision; a deleted key does not exist (recreate
    succeeds); force=True is last-writer-wins."""
    d = str(tmp_path / "log")
    kv.kv_put(spark, d, [("k", "v1")], revision=5)
    with pytest.raises(ValueError, match="already exist"):
        kv.kv_put(spark, d, [("k", "v2")], revision=5, force=False)
    # a HIGHER revision still conflicts: existence, not recency, is the
    # etcd compare (the round-5 divergence, now pinned)
    with pytest.raises(ValueError, match="already exist"):
        kv.kv_put(spark, d, [("k", "v2")], revision=6, force=False)
    kv.kv_put(spark, d, [("k2", "w")], revision=6, force=False)  # new key: fine
    kv.kv_put(spark, d, [("k", "v3")], revision=7, force=True)   # force wins
    snap, _ = kv.kv_snapshot(spark, d)
    assert {r.key: r.value for r in snap.collect()} == {"k": "v3", "k2": "w"}
    # delete tombstones the key -> conditional recreate succeeds
    kv.kv_put(spark, d, [("k", None)], revision=8, kind="delete")
    kv.kv_put(spark, d, [("k", "v4")], revision=9, force=False)
    snap, _ = kv.kv_snapshot(spark, d)
    assert {r.key: r.value for r in snap.collect()} == {"k": "v4", "k2": "w"}


def test_conditional_write_absent_log_ok(spark, tmp_path):
    """An absent log path is 'nothing exists yet', not a conflict."""
    d = str(tmp_path / "fresh")
    assert kv.kv_put(spark, d, [("a", "1")], revision=1, force=False) == 1


def test_redis_stream_id_handoff(spark):
    """adapters/redis.rs:85-89: the tail returns entries with an ID
    strictly greater than the snapshot's last ID - the ms-seq order,
    where seq breaks ties within a millisecond."""
    rows = [("1526919030474-0", "a"), ("1526919030474-55", "b"),
            ("1526919030474-56", "c"), ("1526919030475-0", "d")]
    df = spark.createDataFrame(rows, "id string, v string")
    got = sorted(
        r.v for r in kv.redis_stream_tail(df, "1526919030474-55").collect()
    )
    assert got == ["c", "d"], "strictly-greater: b itself never re-delivers"
    parts = df.select(kv.redis_stream_id_parts("id").alias("p")).collect()
    assert (parts[1].p.ms, parts[1].p.seq) == (1526919030474, 55)
