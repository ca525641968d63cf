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

    return df.mapInPandas(kernel, schema=schema)


def resize(
    df: DataFrame,
    width: int,
    height: int,
    media_col: str = "media",
) -> DataFrame:
    """Resize stage. With codecs: decode → resize → re-encode in the same
    mapInPandas shape as :func:`extract_features`. Without codecs this is a
    metadata-only rewrite (payload untouched) — a deliberate stub that keeps
    the pipeline runnable end-to-end."""
    if _HAS_CODECS:  # pragma: no cover
        raise NotImplementedError("plug PIL resize into a mapInPandas kernel")
    meta = f"{media_col}.meta"
    new_meta = F.struct(
        F.col(f"{meta}.kind").alias("kind"),
        F.col(f"{meta}.n_bytes").alias("n_bytes"),
        F.col(f"{meta}.content_hash").alias("content_hash"),
        F.lit(width).cast("int").alias("width"),
        F.lit(height).cast("int").alias("height"),
        F.col(f"{meta}.sample_rate").alias("sample_rate"),
        F.col(f"{meta}.n_frames").alias("n_frames"),
    )
    return df.withColumn(
        media_col,
        F.struct(F.col(f"{media_col}.payload").alias("payload"), new_meta.alias("meta")),
    )
