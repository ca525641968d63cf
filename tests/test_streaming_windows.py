"""Streaming windowed aggregation: batch tumbling vs watermarked streaming
tumbling produce identical finalized windows (run-mode duality for the
window family); late-but-within-watermark rows land in their window."""

import os
import shutil
import tempfile
import time

import pyspark.sql.functions as F

from wingfoil_spark import Stream
from wingfoil_spark.streaming.windows import tumbling_stream, session_stream

# 10 rows, two keys, ns timestamps spanning ~5 "seconds"
ROWS = [
    ("a", int(0.5e9), 1.0), ("a", int(1.2e9), 2.0), ("a", int(2.7e9), 3.0),
    ("a", int(3.1e9), 4.0), ("b", int(0.1e9), 10.0), ("b", int(2.2e9), 20.0),
    ("b", int(2.9e9), 30.0), ("a", int(4.4e9), 5.0), ("b", int(4.6e9), 40.0),
    ("a", int(4.9e9), 6.0),
]
SCHEMA = "k string, ts long, v double"


def aggs():
    return {"n": F.count(F.lit(1)), "total": F.sum("v")}


def _write_chunks(pdf, src_dir, n_chunks=3):
    bounds = [int(len(pdf) * i / n_chunks) for i in range(n_chunks + 1)]
    for i in range(n_chunks):
        path = os.path.join(src_dir, f"c{i:02d}.parquet")
        pdf.iloc[bounds[i]:bounds[i + 1]].to_parquet(path, index=False)
        os.utime(path, (time.time() + i, time.time() + i))


def test_tumbling_batch_vs_stream(spark):
    batch_df = spark.createDataFrame(ROWS, SCHEMA)
    batch = Stream(batch_df, ts="ts", keys=("k",)).tumbling(int(2e9), aggs())
    b = {(r.k, r.ts): (r.n, r.total) for r in batch.df.collect()}

    src = tempfile.mkdtemp(prefix="wf_win_src_")
    try:
        pdf = batch_df.toPandas().sort_values("ts")
        _write_chunks(pdf, src, 2)
        # sentinel chunks: watermark computed at the end of batch N applies
        # in batch N+1 — two trailing far-future rows guarantee every real
        # window is finalized before the availableNow query drains
        import pandas as pd

        for i, t in ((7, int(1000e9)), (8, int(2000e9))):
            p = os.path.join(src, f"c{i:02d}.parquet")
            pd.DataFrame([("zz", t, 0.0)], columns=["k", "ts", "v"]).to_parquet(p, index=False)
            os.utime(p, (time.time() + i, time.time() + i))
        sdf = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
        out = tumbling_stream(
            Stream(sdf, ts="ts", keys=("k",)), int(2e9), aggs(), allowed_lateness_s=0
        )
        q = (
            out.writeStream.format("memory").queryName("win_duality")
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        got = spark.sql("SELECT * FROM win_duality WHERE k != 'zz'").toPandas()
    finally:
        shutil.rmtree(src, ignore_errors=True)

    s = {(r.k, r.ts): (r.n, r.total) for r in got.itertuples()}
    # every real window must be finalized and match its batch twin exactly
    assert s == b, f"batch {b} vs stream {s}"


def test_session_stream_runs(spark):
    src = tempfile.mkdtemp(prefix="wf_sess_src_")
    try:
        import pandas as pd

        pd.DataFrame(ROWS, columns=["k", "ts", "v"]).sort_values("ts").pipe(
            _write_chunks, src, 1
        )
        sdf = spark.readStream.schema(SCHEMA).parquet(src)
        out = session_stream(Stream(sdf, ts="ts", keys=("k",)), gap_s=2, aggs=aggs())
        q = (
            out.writeStream.format("memory").queryName("sess_stream")
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        got = spark.sql("SELECT * FROM sess_stream").toPandas()
    finally:
        shutil.rmtree(src, ignore_errors=True)
    # schema contract: keys + aggs + session bounds in engine time
    assert set(got.columns) == {"k", "n", "total", "start_ts", "end_ts"}
    assert (got["end_ts"] > got["start_ts"]).all()
