#!/usr/bin/env python3
"""LLM training-data pipeline — filter, dedup, decontaminate, mix, shard.

The training-corpus path unique to this engine (no binding twin): every
step is deterministic (md5-keyed), so a re-run yields byte-identical
shards. Runs on a small inline corpus; at scale the same code runs over
parquet on a cluster.

    python examples/llm_pipeline.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F

import wingfoil_spark as wf
from wingfoil_spark.functions import curation as cu
from wingfoil_spark.functions import dedup as dd
from wingfoil_spark.functions import text as tx

spark = wf.get_spark("llm_pipeline", cpus=4)

docs = spark.createDataFrame(
    [
        (1, "the quick brown fox jumps over the lazy dog", "web"),
        (2, "the quick brown fox jumps over the lazy dog!", "web"),  # near-dup
        (3, "an entirely different document about spark plans", "wiki"),
        (4, "held-out benchmark sentence to scrub from training", "web"),
        (5, "training doc embedding the held-out benchmark sentence to scrub from training data", "web"),
        (6, "short", "web"),
    ],
    "doc_id long, text string, source string",
)

# 1. near-dup dedup: pairs -> components -> one survivor per group
pairs = dd.lsh_candidate_pairs(dd.minhash_sig_array(docs))
verified = dd.ngram_jaccard(docs, pairs).where("jaccard >= 0.7").select("a", "b")
docs = dd.dedup_keep(docs, verified)
print("after dedup:", sorted(r.doc_id for r in docs.select("doc_id").collect()))

# 2. benchmark decontamination: drop docs leaking the eval set
bench = spark.createDataFrame(
    [(0, "held-out benchmark sentence to scrub from training")],
    "doc_id long, text string",
)
flagged = dd.decontaminate(docs, bench, n=5)
docs = docs.join(flagged.select("doc_id"), "doc_id", "left_anti")
print("after decon:", sorted(r.doc_id for r in docs.select("doc_id").collect()))

# 3. Gopher quality gate (row-local struct of per-rule booleans): with
# the paper's 50-word minimum (and 2-stopword floor) these toy docs all
# fail; relax both and the degenerate one-word doc still fails while
# real ones pass
quality = docs.select(
    "doc_id", tx.gopher_quality_flags(F.col("text"), min_words=5,
                            min_stop_hits=0).alias("g")
)
kept_ids = sorted(r.doc_id for r in quality.where("g.keep").collect())
print("gopher keep:", kept_ids)
assert 6 not in kept_ids, "the degenerate one-word doc fails the gate"
docs = docs.join(quality.where("g.keep").select("doc_id"), "doc_id")

# 4. substring-level dedup (ExactSubstr): scrub passages repeated
# anywhere in the corpus — here nothing survives duplicated ≥6-token
# spans after the doc-level dedup above, so text passes through verbatim
docs = dd.scrub_duplicate_spans(docs, min_len=6)
print("after span scrub:", docs.count(), "docs")

# 5. LM perplexity gate (CCNet shape): fit on the surviving corpus, keep
# head+middle buckets
from wingfoil_spark.functions import lm

model = lm.fit_bigram_lm(docs, k=0.5)
scored = lm.ppl_buckets(lm.lm_perplexity(docs, model))
print("ppl buckets:", sorted((r.doc_id, r.ppl_bucket) for r in scored.collect()))
docs = docs.join(
    scored.where(F.col("ppl_bucket") != "tail").select("doc_id"), "doc_id"
)

# 5b. data selection: DSIR importance weights against a wiki-flavored
# target distribution (hashed-n-gram log-ratios, fully row-local), plus
# BM25 retrieval over the corpus — both from functions.selection
from wingfoil_spark.functions import selection as sel

target = docs.where(F.col("source") == "wiki")
wgt = sel.dsir_weights(
    docs,
    sel.dsir_profile(target, n_buckets=256),
    sel.dsir_profile(docs, n_buckets=256),
    n_buckets=256,
)
print("dsir:", sorted((r.doc_id, round(r.log_w, 3)) for r in wgt.collect()))
best = wgt.orderBy(F.col("log_w").desc()).limit(1).collect()[0].doc_id
assert best == 3, "the wiki doc carries the top importance weight"
top = sel.bm25_topk(docs, ["spark", "plans"], k=1).collect()
print("bm25 top:", top[0].doc_id)
assert top[0].doc_id == 3, "the spark-plans doc wins the retrieval query"

# 5c. trained quality classifier (fasttext-style): fit on the ORIGINAL
# labeled corpus (wiki = positive), score the survivors row-locally
labeled = spark.createDataFrame(
    [
        (0, "spark plans and data engines compose cleanly", 1),
        (1, "catalyst optimizes the logical plan well", 1),
        (2, "buy buy buy click click spam spam now", 0),
        (3, "zzz win free click now buy spam zzz", 0),
    ],
    "doc_id long, text string, lbl int",
)
clf = sel.fit_quality_classifier(labeled, F.col("lbl") == 1,
                                 n_features=1 << 12, max_iter=20)
qrows = {r.doc_id: r for r in sel.quality_scores(docs, clf).collect()}
print("quality:", {k: round(r.quality, 3) for k, r in sorted(qrows.items())})
assert qrows[3].quality > 0.5, "the spark-plans doc scores as high quality"

# 5d. or score EVERYTHING in one corpus scan: selection_scores emits the
# DSIR log-weight, the BM25 score and the classifier logit together
# (shared tokenize, one md5 per gram) — the production shape when a
# pipeline keeps several signals per document. Values are bitwise-equal
# to the single-signal calls above.
battery = sel.selection_scores(
    docs, F.col("source") == "wiki", ["spark", "plans"], clf, n_buckets=256
)
b = {r.doc_id: r for r in battery.collect()}
assert max(b, key=lambda i: b[i].log_w) == 3
assert max(b, key=lambda i: b[i].score) == 3
assert b[3].logit == qrows[3].logit, "one-pass logit == single-signal logit"

# 6. deterministic domain mixing + token-budget sharding + packing
mixed = cu.weighted_mix(docs, {"web": 1.0, "wiki": 1.0})
shards = cu.token_budget_shards(mixed, budget=16)
shards.select("doc_id", "shard", "cum_tokens").show()
packed = cu.pack_sequences(mixed, seq_len=16)
packed.show()
assert sorted(r.doc_id for r in docs.select("doc_id").collect()) == [1, 3], \
    "dup (2), leaks (4, 5) and the degenerate doc (6) removed"

# 7. leakage-safe splits: group_col keys the md5 draw on the domain, so
# every doc of a source lands in ONE split — near-dup families can never
# straddle train/test. Deterministic: a re-run yields identical splits.
split = cu.train_val_test_split(
    mixed, {"train": 0.8, "val": 0.2}, group_col="source"
)
per_src = split.groupBy("source").agg(
    F.countDistinct("split").alias("n")).collect()
assert all(r.n == 1 for r in per_src), "one split per source group"
split.select("doc_id", "source", "split").show()

# 8. incremental-crawl gate (r10/r11): a persisted fingerprint store is
# the "have we EVER ingested this?" history — anti-join arrivals, append
# the survivors' fingerprints, and compact on a schedule so recurring
# content cannot grow the store. Zero standing state: the disk IS the
# history.
import shutil as _shutil
import tempfile as _tempfile

from wingfoil_spark.streaming import ingest as ing

_crawl_dir = _tempfile.mkdtemp(prefix="wf_llm_crawl_")
try:
    fp_path = _crawl_dir + "/fp_store"
    ing.build_fingerprint_store(docs, fp_path)           # snapshot = corpus
    arrivals = spark.createDataFrame(
        [(100, "An Entirely Different document about spark plans"),  # re-crawl
         #      (case-mangled: the fingerprint normalizes before hashing)
         (101, "a genuinely new document about stream graphs")],
        "doc_id long, text string",
    )
    fresh = ing.dedup_against_store(arrivals, spark.read.parquet(fp_path))
    assert [r.doc_id for r in fresh.collect()] == [101], "re-crawl dropped"
    # append the survivor's fp; a later window re-appends it (recurring
    # content) -> compact restores one-row-per-distinct
    ing.build_fingerprint_store(fresh, fp_path, mode="append")
    ing.build_fingerprint_store(fresh, fp_path, mode="append")
    n = ing.compact_fingerprint_store(spark, fp_path)
    assert n == spark.read.parquet(fp_path).count()
    print(f"crawl gate: re-crawl dropped, store compacted to {n} distinct fps")
finally:
    _shutil.rmtree(_crawl_dir, ignore_errors=True)

print("llm_pipeline example OK")
