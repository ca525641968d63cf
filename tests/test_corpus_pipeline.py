"""End-to-end corpus pipeline: the full LLM training-data path composed
from the tiers this engine ships — quality filter (text) → exact dedup
(dedup) → near-dup removal via LSH (dedup) → domain mixing (curation) →
token-budget shards (curation) — over the real documents parquet.

Not a new operator: a composition gate. It pins that the tiers feed each
other (column contracts line up), that every stage is monotone (never
resurrects a dropped doc), and that the final shard assignment covers
exactly the surviving corpus. The same chain with the streaming-ingest
front end (exact_dedup_stream) is covered in test_streaming_ingest."""

import pyspark.sql.functions as F
import pytest

from wingfoil_spark.functions import curation as cu
from wingfoil_spark.functions import dedup as dd
from wingfoil_spark.functions import text as tx
from wingfoil_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def test_full_pipeline_composes(spark, docs):
    # 1. quality gate: row-local filter on the battery
    t = F.col("text")
    quality = docs.where(
        (tx.token_count(t) >= 3) & (tx.quality_score(t) > 0.2)
    )
    n_quality = quality.count()
    assert 0 < n_quality <= docs.count()

    # 2. exact dedup: keep min doc_id per fingerprint
    keep = dd.exact_dedup(quality).select(F.col("keep_id").alias("doc_id"))
    deduped = quality.join(keep, "doc_id")
    n_dedup = deduped.count()
    assert 0 < n_dedup <= n_quality

    # 3. near-dup removal: drop the higher id of every verified pair
    pairs = dd.ngram_jaccard(
        deduped, dd.lsh_candidate_pairs(dd.minhash_sig_array(deduped))
    ).where(F.col("jaccard") >= 0.8)
    losers = pairs.select(F.greatest("a", "b").alias("doc_id")).distinct()
    survivors = deduped.join(losers, "doc_id", "left_anti")
    n_surv = survivors.count()
    assert 0 < n_surv <= n_dedup

    # 4. domain mixing: dial down half the sources, keep the rest whole
    sources = sorted(s for (s,) in survivors.select("source").distinct().collect())
    rates = {s: (0.5 if i % 2 else 1.0) for i, s in enumerate(sources)}
    mixed = cu.weighted_mix(survivors, rates, tag="pipe")
    n_mixed = mixed.count()
    assert 0 < n_mixed <= n_surv

    # 5. shard: every surviving doc lands in exactly one shard, shards
    # cover a contiguous 0..N range, budgets respected at shard starts
    budget = 4000
    shards = cu.token_budget_shards(mixed, budget)
    assert shards.count() == n_mixed
    pdf = shards.toPandas().sort_values("doc_id")
    sh = pdf["shard"].unique().tolist()
    assert sh == list(range(len(sh)))
    # shard of each doc's START offset: (cum - n) // budget, so no doc
    # STARTS beyond its shard's token range
    assert (
        ((pdf["cum_tokens"] - pdf["n_tokens"]) // budget) == pdf["shard"]
    ).all()

    # monotone end-to-end: the final corpus is a subset of the original
    orig = {r.doc_id for r in docs.select("doc_id").collect()}
    final = set(pdf["doc_id"])
    assert final <= orig


def test_pipeline_deterministic_rerun(spark, docs):
    """The whole chain re-runs to the identical doc set (md5-keyed
    sampling + deterministic dedup — the reproducibility contract that
    makes training corpora lineage-stable)."""
    def run():
        q = docs.where(tx.token_count(F.col("text")) >= 3)
        keep = dd.exact_dedup(q).select(F.col("keep_id").alias("doc_id"))
        d = q.join(keep, "doc_id")
        m = cu.hash_sample(d, 0.6, tag="rerun")
        return {r.doc_id for r in m.select("doc_id").collect()}

    assert run() == run()
