"""Recall gate for the production-shape MinHash/LSH (k=128, 16 bands x 8
rows): seeded near-duplicates at token-Jaccard ~0.9+ must be caught as
candidate pairs; banding theory gives catch prob 1-(1-s^8)^16 ≈ 1 there.

Reference behavior modeled: dedup candidate generation for an LLM training
corpus (SURVEY.md LLM-pipeline ops; no direct reference op — Spark-first
extension)."""

import random

import pytest
from pyspark.sql import functions as F

from wingfoil_spark.functions import dedup as dd

WORDS = [f"tok{i}" for i in range(500)]


@pytest.fixture(scope="module")
def corpus(spark):
    rng = random.Random(7)
    rows = []
    expected_pairs = []
    doc_id = 0
    for base in range(30):
        toks = [rng.choice(WORDS) for _ in range(80)]
        rows.append((doc_id, " ".join(toks)))
        base_id = doc_id
        doc_id += 1
        if base < 15:
            # near-dup: swap 1 of 80 tokens → bigram-shingle Jaccard ≈ 0.95,
            # where the 16x8 banding curve catches with prob ≈ 1-4e-5
            mutated = list(toks)
            mutated[rng.randrange(80)] = rng.choice(WORDS)
            rows.append((doc_id, " ".join(mutated)))
            expected_pairs.append((base_id, doc_id))
            doc_id += 1
    return spark.createDataFrame(rows, "doc_id long, text string"), expected_pairs


def test_lsh_recall_on_near_dups(corpus):
    docs, expected = corpus
    sigs = dd.minhash_signatures(docs)
    pairs = {(r.a, r.b) for r in dd.lsh_candidate_pairs(sigs).collect()}
    verified = dd.ngram_jaccard(docs, docs.sparkSession.createDataFrame(
        list(expected), "a long, b long"))
    strong = {(r.a, r.b) for r in verified.where(F.col("jaccard") >= 0.85).collect()}
    assert strong, "seeded near-dups should have high token Jaccard"
    missed = strong - pairs
    assert not missed, f"LSH missed high-similarity pairs: {missed}"


def test_cosine_near_dup_pairs(spark):
    """Embedding-cosine near-dup tier: seeded near-identical vectors are
    found; unrelated random vectors are not."""
    import numpy as np

    rng = np.random.default_rng(11)
    rows, expected = [], set()
    vid = 0
    for i in range(40):
        v = rng.normal(size=64).astype(np.float32)
        rows.append((vid, [float(x) for x in v]))
        base_id = vid
        vid += 1
        if i < 12:  # near-dup: tiny perturbation, cosine ≈ 0.999
            w = v + rng.normal(scale=0.02, size=64).astype(np.float32)
            rows.append((vid, [float(x) for x in w]))
            expected.add((base_id, vid))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = dd.cosine_near_dups(df, threshold=0.98)
    got = {(r.a, r.b) for r in pairs.collect()}
    missed = expected - got
    assert not missed, f"missed near-identical pairs: {missed}"
    false_pos = got - expected
    assert not false_pos, f"random vectors scored >=0.98: {false_pos}"


def test_lsh_no_candidate_explosion(corpus):
    docs, _ = corpus
    n = docs.count()
    pairs = dd.lsh_candidate_pairs(dd.minhash_signatures(docs)).count()
    # unrelated random-word docs should almost never collide in a band
    assert pairs < n * 3, f"{pairs} candidate pairs for {n} docs"
