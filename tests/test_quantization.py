"""int8 embedding quantization (functions/similarity.py): the storage
tier for data-scale embedding tables. Pins the error bound, determinism,
edge cases, and — the property that matters — ANN recall preservation
over the real embeddings parquet."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from wingfoil_spark.functions import similarity as sim
from wingfoil_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def test_roundtrip_error_bounded_by_half_scale(spark, emb):
    q = sim.quantize_embeddings(emb)
    back = sim.dequantize_embeddings(q, out="emb2")
    pdf = back.select("vec_id", "embedding", "emb2", "q_scale").toPandas()
    for _, r in pdf.head(50).iterrows():
        a = np.asarray(r["embedding"], dtype=np.float64)
        b = np.asarray(r["emb2"], dtype=np.float64)
        assert np.max(np.abs(a - b)) <= r["q_scale"] / 2 + 1e-7


def test_quantized_values_in_int8_range_and_deterministic(spark, emb):
    q = sim.quantize_embeddings(emb).select("vec_id", "q_embedding")
    pdf = q.toPandas()
    allv = np.concatenate([np.asarray(v) for v in pdf["q_embedding"]])
    assert allv.min() >= -127 and allv.max() <= 127
    # the max|x| component quantizes to exactly ±127
    assert (np.abs(np.array([np.abs(np.asarray(v)).max() for v in pdf["q_embedding"]])) == 127).all()
    pdf2 = sim.quantize_embeddings(emb).select("vec_id", "q_embedding").toPandas()
    assert pdf.sort_values("vec_id")["q_embedding"].map(list).tolist() == \
        pdf2.sort_values("vec_id")["q_embedding"].map(list).tolist()


def test_zero_vector_quantizes_to_zeros(spark):
    df = spark.createDataFrame([(1, [0.0, 0.0, 0.0])], "vec_id long, embedding array<float>")
    r = sim.dequantize_embeddings(sim.quantize_embeddings(df), out="emb2").collect()[0]
    assert list(r.q_embedding) == [0, 0, 0]
    assert r.q_scale == 0.0
    assert list(r.emb2) == [0.0, 0.0, 0.0]


def test_ann_recall_survives_quantization(spark, emb):
    """Exact top-5 over dequantized int8 vectors overlaps ≥80% with
    top-5 over the originals (cosine is scale-invariant; 8 bits keep
    direction) — the property that justifies the 4x-smaller scan."""
    probes = emb.where(F.col("vec_id") % 100 == 0)
    exact = sim.cosine_topk(emb, probes, k=5).toPandas()

    deq = sim.dequantize_embeddings(
        sim.quantize_embeddings(emb), out="embedding"
    ).select("vec_id", "embedding")
    deq_probes = deq.where(F.col("vec_id") % 100 == 0)
    quant = sim.cosine_topk(deq, deq_probes, k=5).toPandas()

    def topsets(pdf):
        return {
            p: set(g["neighbor_id"]) for p, g in pdf.groupby("probe_id")
        }
    e, qn = topsets(exact), topsets(quant)
    agree = [len(e[p] & qn[p]) / len(e[p]) for p in e if p in qn]
    assert agree and sum(agree) / len(agree) >= 0.8


def test_degenerate_embeddings_never_abort_the_tier(spark):
    """ANSI-mode survival contract: null, empty, zero-norm, and off-dim
    vectors are EXCLUDED from every cosine path (no direction), never a
    job-aborting DIVIDE_BY_ZERO / kernel IndexError. One degenerate row
    in a 100 TB corpus must not kill the query."""
    import pyspark.sql.functions as F

    from wingfoil_spark.functions import dedup as dd
    from wingfoil_spark.streaming import ingest

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, None), (3, []), (4, [0.0, 0.0]), (5, [0.5, 0.5])],
        "vec_id long, embedding array<float>",
    )
    probes = df.where(F.col("vec_id").isin(1, 2, 4))
    out = sim.cosine_topk(df, probes, k=2).collect()
    assert [(r.probe_id, r.neighbor_id) for r in out] == [(1, 5)]
    sim.lsh_bucketed_topk(df, probes, k=2).count()      # must not raise
    sim.ivf_topk(df, probes, k=2, n_centroids=2, nprobe=2, fit="take").count()
    dd.cosine_near_dups(df, threshold=0.5).count()
    assert ingest.build_ann_index(df).count() == 2      # ids 1 and 5
