"""Multimodal column plumbing: binary payloads + typed metadata + Arrow-
batched decode stages. The decode kernel is a deterministic fake (no codec
libs here); these tests pin the Spark-side contracts — schema, batch shape,
payload pruning, determinism."""

import pyspark.sql.functions as F
import pytest

from wingfoil_spark.functions import multimodal as mm


@pytest.fixture(scope="module")
def media_df(spark):
    df = spark.createDataFrame(
        [(1, "hello world " * 10), (2, "tiny"), (3, "")],
        "doc_id long, text string",
    )
    return mm.as_media(df, F.encode(F.col("text"), "utf-8"), kind="image")


def test_media_struct_schema(media_df):
    assert media_df.schema["media"].dataType.names == ["payload", "meta"]
    meta = media_df.schema["media"].dataType["meta"].dataType
    assert meta.names == [
        "kind", "n_bytes", "content_hash", "width", "height", "sample_rate", "n_frames",
    ]


def test_media_meta_facts(media_df):
    rows = {r.doc_id: r for r in mm.media_meta(media_df).collect()}
    assert rows[1].n_bytes == 120 and rows[1].kind == "image"
    assert rows[3].n_bytes == 0
    # content_hash is the md5 of the payload bytes
    import hashlib

    assert rows[2].content_hash == hashlib.md5(b"tiny").hexdigest()


def test_frame_sample_jvm_side(spark):
    df = spark.createDataFrame([(1, "a" * 200)], "doc_id long, text string")
    m = mm.as_media(df, F.encode(F.col("text"), "utf-8"), kind="video")
    frames = mm.frame_sample(m.drop("text"), every=2, frame_bytes=32)
    got = sorted((r.frame_idx) for r in frames.collect())
    # 200 bytes → 7 frames (idx 0..6), every 2nd → 0, 2, 4, 6
    assert got == [0, 2, 4, 6]
    # no Python stage in the plan: frame hashing is pure codegen
    plan = frames._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Arrow" not in plan


def test_extract_features_batch_contract(media_df):
    out = mm.extract_features(media_df)
    rows = {r.doc_id: r.features for r in out.collect()}
    assert len(rows[1]) == 16
    assert abs(sum(rows[1]) - 1.0) < 1e-6          # normalized histogram
    assert rows[3] == [0.0] * 16                   # empty payload → zero vec
    assert "media" not in out.columns              # payload projected away


def test_extract_features_deterministic(media_df):
    a = mm.extract_features(media_df).collect()
    b = mm.extract_features(media_df).collect()
    assert sorted(map(str, a)) == sorted(map(str, b))


def test_resize_rewrites_payload_and_metadata(media_df):
    import hashlib

    out = mm.resize(media_df, 224, 224)
    r = out.where(F.col("doc_id") == 1).select(
        "media.meta.width", "media.meta.height", "media.meta.n_bytes",
        "media.meta.content_hash", "media.payload",
    ).first()
    assert (r[0], r[1]) == (224, 224)
    payload = bytes(r[4])
    assert len(payload) == 224 * 224 == r[2]       # payload rewritten to W×H
    assert r[3] == hashlib.md5(payload).hexdigest()  # hash recomputed
    # deterministic: same input → same resampled bytes
    again = bytes(
        mm.resize(media_df, 224, 224).where(F.col("doc_id") == 1)
        .select("media.payload").first()[0]
    )
    assert again == payload


def test_media_pipeline_binds_on_streams(spark, tmp_path):
    """as_media → media_meta → extract_features is row-local (projection +
    Arrow kernel, no state): legal on a readStream as-is — the multimodal
    ingest path. Stream output == batch output, f32-exact."""
    import os
    import time

    src = str(tmp_path / "src")
    os.makedirs(src)
    import pandas as pd

    pdf = pd.DataFrame({"doc_id": [1, 2, 3, 4], "text": ["a b c" * 8, "dd", "", "xyz " * 5]})
    for i in (0, 1):
        p = os.path.join(src, f"c{i}.parquet")
        pdf.iloc[i * 2 : i * 2 + 2].to_parquet(p, index=False)
        os.utime(p, (time.time() + i, time.time() + i))

    def pipeline(df):
        m = mm.as_media(df, F.encode(F.col("text"), "utf-8"), kind="image")
        out = mm.extract_features(mm.media_meta(m.drop("text"), keep_media=True))
        return out.select("doc_id", "n_bytes", "content_hash", "features")

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        pipeline(stream)
        .writeStream.format("memory")
        .queryName("mm_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM mm_stream").toPandas().sort_values("doc_id")
    batch = pipeline(spark.createDataFrame(pdf)).toPandas().sort_values("doc_id")
    assert got["content_hash"].tolist() == batch["content_hash"].tolist()
    assert [list(f) for f in got["features"]] == [list(f) for f in batch["features"]]


def test_media_from_files_binaryfile_ingest(spark, tmp_path):
    """binaryFile-source ingest: files land as standard media rows with
    deterministic md5-path ids, true byte counts, and the same
    payload+meta struct the rest of the tier consumes; the glob filter
    excludes non-matching files at the source."""
    from wingfoil_spark.functions import multimodal as mm

    (tmp_path / "a.img").write_bytes(b"\x01\x02\x03\x04" * 10)
    (tmp_path / "b.img").write_bytes(b"\xff" * 7)
    (tmp_path / "skip.txt").write_bytes(b"not media")

    got = mm.media_from_files(
        spark, str(tmp_path), kind="image", glob="*.img"
    )
    rows = {r.path.rsplit("/", 1)[-1]: r for r in got.collect()}
    assert set(rows) == {"a.img", "b.img"}
    assert rows["a.img"].length == 40 and rows["b.img"].length == 7
    for r in rows.values():
        assert r.media.meta.kind == "image"
        assert r.media.meta.n_bytes == r.length
        assert len(r.media.payload) == r.length
        assert r.doc_id is not None and r.doc_id >= 0
    # ids deterministic across reads
    again = {r.path.rsplit("/", 1)[-1]: r.doc_id for r in mm.media_from_files(
        spark, str(tmp_path), kind="image", glob="*.img").collect()}
    assert again == {k: v.doc_id for k, v in rows.items()}
    # downstream tier consumes it unchanged
    feats = mm.extract_features(mm.media_meta(got, keep_media=True))
    assert feats.count() == 2


def test_media_from_files_stream_matches_batch(spark, tmp_path):
    """Continuous file ingest == batch ingest for the same directory:
    row-local projection, so the streamed rows (availableNow over the
    binaryFile source) equal the batch read exactly."""
    from wingfoil_spark.functions import multimodal as mm

    (tmp_path / "x.img").write_bytes(b"\x10\x20" * 8)
    (tmp_path / "y.img").write_bytes(b"\x30" * 5)

    batch = {
        r.doc_id: (r.length, r.media.meta.content_hash)
        for r in mm.media_from_files(
            spark, str(tmp_path), glob="*.img"
        ).collect()
    }
    out = mm.media_from_files_stream(spark, str(tmp_path), glob="*.img")
    name = "media_stream_test"
    q = (
        out.select("doc_id", "length", F.col("media.meta.content_hash").alias("h"))
        .writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {r.doc_id: (r.length, r.h) for r in spark.sql(f"SELECT * FROM {name}").collect()}
    assert got == batch and len(got) == 2
