"""Broker-tier Kafka integration (the reference's third adapter test tier,
SURVEY §5.5: construct → embedded → live-broker).

This environment has no Kafka broker and no network for the
spark-sql-kafka connector jar, so the tier is GATED: set
``KAFKA_BOOTSTRAP`` (e.g. ``localhost:9092``) against a live broker and a
Spark session whose classpath carries
``org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>`` and the
round-trip below runs; otherwise it skips with the reason recorded. The
manual workflow is documented in COVERAGE.md §2.8.
"""

import os
import uuid

import pytest

BOOTSTRAP = os.environ.get("KAFKA_BOOTSTRAP")

pytestmark = pytest.mark.skipif(
    not BOOTSTRAP,
    reason="no Kafka broker in this environment: set KAFKA_BOOTSTRAP and add "
    "spark-sql-kafka-0-10 to spark.jars.packages to run the broker tier",
)


def test_kafka_round_trip(spark, sf_dir):
    """events → kafka_sink → kafka_source (batch read) → same rows."""
    import pyspark.sql.functions as F

    from wingfoil_spark.sources.io import kafka_sink, kafka_source
    from wingfoil_spark.sources.tables import load_table, ts_us_expr
    from wingfoil_spark.stream import Stream

    topic = f"wingfoil_it_{uuid.uuid4().hex[:8]}"
    ev = load_table(spark, sf_dir, "events")
    s = Stream(
        ev.select(
            ts_us_expr(ev).alias("ts"),
            F.col("event_id").alias("seq"),
            F.col("user_id").cast("string").alias("key"),
            F.to_json(F.struct("event_id", "user_id", "value")).alias("value"),
        ).limit(1000),
        ts="ts", seq="seq",
    )
    kafka_sink(s, BOOTSTRAP, topic, key_col="key", value_col="value")

    back = kafka_source(spark, BOOTSTRAP, topic, streaming=False)
    rows = back.df.select("key", "value").collect()
    assert len(rows) == 1000
    sent = {r["value"] for r in s.df.select("value").collect()}
    got = {r["value"] for r in rows}
    assert got == sent, "kafka round-trip lost or altered records"


def test_kafka_streaming_offsets_bounded(spark):
    """channel_bounded analog: maxOffsetsPerTrigger caps each micro-batch."""
    from wingfoil_spark.sources.io import kafka_source

    src = kafka_source(
        spark, BOOTSTRAP, "wingfoil_it_bounded", streaming=True,
        max_offsets_per_trigger=100,
    )
    assert src.df.isStreaming
