"""Streaming-ingest tier for the LLM training-data pipeline operators.

A 100 TB training corpus is not built in one batch — it accretes from a
continuous crawl. This module gives the batch dedup/text operators
(`functions.dedup`, `functions.text`) their Structured-Streaming shape:

- :func:`exact_dedup_stream` — first-seen-wins exact dedup over the
  arrival stream (`dropDuplicates` on the content fingerprint; bounded
  state via `dropDuplicatesWithinWatermark` when an event-time column is
  available). The batch analog keeps min-id per fingerprint
  (`dedup.exact_dedup`); on an id-ordered replay the two agree — pinned
  by tests/test_streaming_ingest.py.
- :func:`build_lsh_index` / :func:`lsh_pairs_stream` — near-dup
  detection of ARRIVING docs against the existing corpus: a persisted
  (id, band, bk) LSH band index (built once per corpus snapshot, batch)
  stream-static-joined on the band key. Stateless per micro-batch — no
  stream-stream state, no watermark coupling; the index is the only
  history needed, exactly the "frozen index + delta" shape a production
  crawl dedup runs. The same banding math as the batch pair expansion
  (`dedup.band_explode` is shared), so stream results == batch results
  restricted to (new x corpus) pairs — differentially tested.
- Row-local text analysis / MinHash / SimHash need no twin at all: they
  are stateless Catalyst projections (or Arrow-batched kernels), legal on
  a streaming frame as-is. tests/test_streaming_ingest.py pins
  batch == stream for the full battery.

Scale posture: everything here shuffles at most once per micro-batch on
the band key (the join); signatures and fingerprints are row-local. The
stream side never re-reads the corpus — the index is a static frame
Spark can broadcast (small corpus) or shuffle-hash-join (large corpus,
AQE's call per micro-batch).

Reference basis: the reference engine has no crawl-ingest tier (this is
part of the north-star extension surface, BASELINE.json); the run-mode
duality discipline applied here is its HistoricalFrom/RealTime contract
(runtime/run.rs:16-29).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from wingfoil_spark.functions.dedup import (
    LSH_BANDS,
    MINHASH_K,
    band_explode,
    minhash_sig_array,
    ngram_jaccard,
)
from wingfoil_spark.functions.text import fingerprint


def exact_dedup_stream(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """First-seen-wins exact dedup on a document stream.

    Emits each arriving row whose normalized-text fingerprint has not been
    seen before (state = one entry per distinct fingerprint). With
    ``ts_col`` + ``watermark`` (e.g. ``"1 hour"``), state is BOUNDED:
    `dropDuplicatesWithinWatermark` evicts fingerprints older than the
    watermark — the right call when re-crawled dups arrive close together
    and unbounded state would grow with the corpus. Without a watermark,
    state is exact and unbounded (RocksDB-backed on a real cluster).

    Works identically on a batch frame (dropDuplicates is mode-agnostic),
    so the duality test replays one input through both paths.
    """
    if watermark is not None and ts_col is None:
        raise ValueError("watermark requires ts_col")
    out = docs.withColumn("fp", fingerprint(F.col(text_col)))
    if watermark is not None:
        return out.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(["fp"])
    return out.dropDuplicates(["fp"])


def build_lsh_index(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
) -> DataFrame:
    """The corpus-side LSH band index: (id, band, bk), one row per band
    per doc. Batch; persist it (parquet bucketed by ``bk`` at scale) and
    hand it to :func:`lsh_pairs_stream`. Rebuilt per corpus snapshot —
    the index IS the dedup history, so the stream job itself stays
    stateless."""
    return band_explode(
        minhash_sig_array(docs, text_col, id_col, k), id_col, k, bands
    )


def lsh_pairs_stream(
    new_docs: DataFrame,
    index: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    verify: bool = True,
) -> DataFrame:
    """Near-dup candidates of arriving docs vs the indexed corpus.

    ``new_docs`` may be a streaming frame; ``index``/``corpus`` are static
    (the persisted snapshot). Plan per micro-batch: row-local signatures →
    band explode → equi-join on (band, bk) against the index → per-pair
    dedup across bands → (optionally) exact n-gram Jaccard verify against
    the corpus text. Self-matches (a doc joining its own index rows on a
    re-crawl replay) are dropped.

    Output: (a, b[, jaccard]) with a = corpus id, b = arriving id.
    `dropDuplicates` on (a, b) collapses multi-band hits; on a stream
    that is exact-keyed state — bounded by the arriving-doc key space,
    not the corpus.
    """
    sigs = minhash_sig_array(new_docs, text_col, id_col, k)
    stream_bands = band_explode(sigs, id_col, k, bands).withColumnRenamed(id_col, "b")
    idx = index.withColumnRenamed(id_col, "a")
    pairs = (
        stream_bands.join(idx, ["band", "bk"])
        .where(F.col("a") != F.col("b"))
        .select("a", "b")
        .dropDuplicates(["a", "b"])
    )
    if not verify:
        return pairs
    return ngram_jaccard(corpus, pairs, text_col, id_col)
