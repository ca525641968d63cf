"""Multimodal columns: opaque binary payloads + typed metadata.

Design for the 100 TB training-data path: image/audio/video payloads are
``BinaryType`` columns carried alongside a typed metadata struct; decode /
feature-extract / resize / frame-sample run as Arrow-batched ``mapInPandas``
stages so payload bytes never pass through the driver and flow executor→
executor as Arrow buffers. Analogous to the reference's pattern of opaque
payload values flowing on stream edges with compute adapters operating on
them in place (e.g. the augurs window-analysis adapters,
/root/reference/crates/wingfoil/src/adapters/augurs.rs:441-1177).

The actual codec layer (PIL / libav / soundfile) is NOT available in this
environment, so the decode kernels are stubbed: ``_HAS_CODECS`` gates the
real import; the fallback is a clearly-marked deterministic fake that
preserves every Spark-side contract (schema, batch shape, partitioning,
null handling). Swap ``_fake_decode_*`` for real codecs in production.

Scale notes: payload columns dominate row size — ``frame_sample`` and
``extract_features`` project the payload away as early as possible, and the
metadata-only queries never touch payload bytes (column pruning keeps them
out of the parquet scan entirely).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # pragma: no cover - codec libs absent in this environment
    import PIL.Image  # noqa: F401

    _HAS_CODECS = True
except Exception:  # ImportError and any binary-dep failure
    _HAS_CODECS = False

#: metadata struct carried next to every payload column
MEDIA_META = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_hash", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)

#: fixed frame size (bytes) for the fake video framing
FRAME_BYTES = 32


def as_media(
    df: DataFrame,
    payload: "F.Column",
    kind: str = "image",
    out: str = "media",
) -> DataFrame:
    """Attach a payload as an opaque media column with typed metadata.

    ``payload`` must be BinaryType (use ``F.encode(col, 'utf-8')`` to derive
    a deterministic payload from text in tests). Metadata is computed
    JVM-side — no Python, no payload movement:
    - ``n_bytes``/``content_hash``: true payload facts;
    - ``width × height`` (image) / ``sample_rate`` (audio) / ``n_frames``
      (video): synthesized deterministically from payload length, standing
      in for header parsing that needs real codecs.
    """
    p = payload
    n = F.octet_length(p).cast("long")
    null_i = F.lit(None).cast("int")
    meta = F.struct(
        F.lit(kind).alias("kind"),
        n.alias("n_bytes"),
        F.md5(p).alias("content_hash"),
        ((n % 640 + 16).cast("int") if kind == "image" else null_i).alias("width"),
        ((n % 480 + 16).cast("int") if kind == "image" else null_i).alias("height"),
        (F.lit(16000).cast("int") if kind == "audio" else null_i).alias("sample_rate"),
        (F.ceil(n / FRAME_BYTES).cast("int") if kind == "video" else null_i).alias("n_frames"),
    )
    return df.withColumn(out, F.struct(p.alias("payload"), meta.alias("meta")))


def media_meta(df: DataFrame, media_col: str = "media", keep_media: bool = False) -> DataFrame:
    """Metadata-only projection. Catalyst prunes the payload field from the
    scan (nested-schema pruning) — at 100 TB this reads kilobytes/row less.
    ``keep_media=True`` keeps the payload column for a downstream decode
    stage (meta columns then ride along the same single pass)."""
    m = f"{media_col}.meta"
    out = df.select(
        "*",
        F.col(f"{m}.kind").alias("kind"),
        F.col(f"{m}.n_bytes").alias("n_bytes"),
        F.col(f"{m}.content_hash").alias("content_hash"),
    )
    return out if keep_media else out.drop(media_col)


def frame_sample(
    df: DataFrame,
    media_col: str = "media",
    every: int = 4,
    frame_bytes: int = FRAME_BYTES,
) -> DataFrame:
    """Sample every ``every``-th fixed-size frame from a video payload.

    Pure JVM path: ``sequence`` + ``transform`` + ``posexplode`` over binary
    ``substring`` — whole-stage codegen, no Python. Emits
    (frame_idx, frame_hash); the payload column is dropped before the
    explode so only frame slices shuffle.
    """
    p = F.col(f"{media_col}.payload")
    n_frames = F.ceil(F.octet_length(p) / frame_bytes).cast("int")
    idxs = F.sequence(F.lit(0), n_frames - 1, F.lit(every))
    frames = F.transform(
        idxs,
        lambda i: F.struct(
            i.alias("frame_idx"),
            F.md5(F.substring(p, i * frame_bytes + 1, frame_bytes)).alias("frame_hash"),
        ),
    )
    return (
        df.withColumn("__frames", frames)
        .drop(media_col)
        .select("*", F.explode("__frames").alias("__f"))
        .select(
            *[c for c in df.columns if c != media_col],
            F.col("__f.frame_idx").alias("frame_idx"),
            F.col("__f.frame_hash").alias("frame_hash"),
        )
    )


# ----------------------------------------------------------- decode kernels


def _fake_decode_features(buf: bytes, bins: int = 16) -> np.ndarray:
    """DETERMINISTIC FAKE of an image-decode + feature-extract kernel: a
    normalized ``bins``-bucket byte histogram. Real implementation would
    decode with PIL and pool CNN/patch features; the Spark-side contract
    (float32 vector per payload) is identical."""
    if not buf:
        return np.zeros(bins, dtype=np.float32)
    a = np.frombuffer(buf, dtype=np.uint8)
    hist = np.bincount(a >> 4, minlength=bins).astype(np.float32)
    return hist / len(a)


def extract_features(
    df: DataFrame,
    media_col: str = "media",
    bins: int = 16,
    out: str = "features",
) -> DataFrame:
    """Decode + feature-extract as an Arrow-batched ``mapInPandas`` stage.

    The iterator-of-batches signature is the real 100 TB shape: one Python
    worker per partition, payloads stream through in Arrow batches, output
    drops the payload immediately (features are ~100× smaller). With codecs
    installed, replace the fake kernel only — the plumbing stands.
    """
    if _HAS_CODECS:  # pragma: no cover - not in this environment
        raise NotImplementedError(
            "real codec path intentionally unimplemented here; "
            "plug PIL decode into the kernel below"
        )

    keep = [c for c in df.columns if c != media_col]
    schema = T.StructType(
        [df.schema[c] for c in keep]
        + [T.StructField(out, T.ArrayType(T.FloatType()))]
    )
    mcol = media_col

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [m["payload"] if m is not None else b"" for m in pdf[mcol]]
            feats = [_fake_decode_features(b, bins).tolist() for b in payloads]
            out_pdf = pdf[keep].copy()
            out_pdf[out] = feats
            yield out_pdf

    from wingfoil_spark.functions.dedup import ensure_parallelism

    return ensure_parallelism(df).mapInPandas(kernel, schema=schema)


def _fake_resize(buf: bytes, src_w: int, src_h: int, width: int, height: int) -> bytes:
    """DETERMINISTIC FAKE of decode→resize→re-encode: the payload is
    treated as a row-major src_w×src_h grayscale raster (zero-padded) and
    nearest-neighbor resampled to width×height. A real kernel swaps this
    for PIL decode/resize/encode; every Spark-side contract is identical."""
    need = src_w * src_h
    a = np.frombuffer(buf, dtype=np.uint8)
    if len(a) < need:
        a = np.concatenate([a, np.zeros(need - len(a), dtype=np.uint8)])
    img = a[:need].reshape(src_h, src_w)
    ys = (np.arange(height) * src_h // height).clip(0, src_h - 1)
    xs = (np.arange(width) * src_w // width).clip(0, src_w - 1)
    return img[np.ix_(ys, xs)].tobytes()


def resize(
    df: DataFrame,
    width: int,
    height: int,
    media_col: str = "media",
) -> DataFrame:
    """Resize stage: decode → resample → re-encode as an Arrow-batched
    ``mapInPandas`` pass, same shape as :func:`extract_features`. The
    payload is REWRITTEN (width×height bytes) and the metadata updated
    (n_bytes, content_hash recomputed, new dimensions). The resample
    kernel is the documented codec stand-in (:func:`_fake_resize`); with
    codecs installed only that kernel changes."""
    if _HAS_CODECS:  # pragma: no cover
        raise NotImplementedError("plug PIL resize into the kernel below")
    import hashlib

    keep = [c for c in df.columns if c != media_col]
    schema = T.StructType([df.schema[c] for c in keep] + [
        T.StructField(media_col, df.schema[media_col].dataType)
    ])
    mcol, w_out, h_out = media_col, int(width), int(height)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            medias = []
            for m in pdf[mcol]:
                if m is None:
                    medias.append(None)
                    continue
                meta = dict(m["meta"])
                src_w = meta.get("width") or w_out
                src_h = meta.get("height") or h_out
                payload = _fake_resize(
                    bytes(m["payload"] or b""), int(src_w), int(src_h), w_out, h_out
                )
                meta.update(
                    n_bytes=len(payload),
                    content_hash=hashlib.md5(payload).hexdigest(),
                    width=w_out,
                    height=h_out,
                )
                medias.append({"payload": bytearray(payload), "meta": meta})
            out = pdf[keep].copy()
            out[mcol] = medias
            yield out

    from wingfoil_spark.functions.dedup import ensure_parallelism

    return ensure_parallelism(df).mapInPandas(kernel, schema=schema)


def media_from_files(
    spark,
    path: str,
    kind: str = "image",
    glob: str | None = None,
    recursive: bool = False,
    id_col: str = "doc_id",
) -> "DataFrame":
    """Load raw media FILES (image/audio/video blobs on any Hadoop-visible
    filesystem) as media rows via Spark's built-in ``binaryFile`` source —
    the ingest step in front of :func:`media_meta` / :func:`extract_features`
    / :func:`frame_sample` when the corpus is a directory of files rather
    than a parquet binary column.

    Output: ``(id_col, path, length, media)`` where ``id_col`` is the
    60-bit md5 of the file path (the repo-wide deterministic id idiom —
    stable across runs and engines) and ``media`` is the standard
    payload+meta struct. The binaryFile source is listing-parallel and
    predicate-pushes ``pathGlobFilter``; payloads stay opaque binary
    end to end (no Python, no decode here). See
    :func:`media_from_files_stream` for the continuous-ingest twin."""
    return _media_from_files_impl(spark, path, kind, glob, recursive, id_col, False)


def media_from_files_stream(
    spark,
    path: str,
    kind: str = "image",
    glob: str | None = None,
    recursive: bool = False,
    id_col: str = "doc_id",
) -> "DataFrame":
    """Streaming twin of :func:`media_from_files`: watch a directory and
    ingest newly-arriving media files as micro-batches (the crawl-drop
    shape). Row-local projection — no state, no watermark needed."""
    return _media_from_files_impl(spark, path, kind, glob, recursive, id_col, True)


def _media_from_files_impl(
    spark, path, kind, glob, recursive, id_col, streaming
):
    reader = (spark.readStream if streaming else spark.read).format("binaryFile")
    if streaming:
        # streaming sources demand an explicit schema; binaryFile's is fixed
        reader = reader.schema(
            "path string, modificationTime timestamp, length long, content binary"
        )
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    raw = reader.load(path)
    ided = raw.select(
        F.conv(F.substring(F.md5(F.col("path")), 1, 15), 16, 10)
        .cast("long")
        .alias(id_col),
        "path",
        "length",
        F.col("content").alias("__payload"),
    )
    return as_media(ided, F.col("__payload"), kind=kind).drop("__payload")
