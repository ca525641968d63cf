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
    _md5_int,
    band_explode,
    minhash_sig_array,
    word_ngrams_expr,
)
from wingfoil_spark.functions.text import tokens
from wingfoil_spark.functions.text import fingerprint
from wingfoil_spark.functions.similarity import (
    _check_probe_hamming,
    _dot,
    hamming1_explode,
    hyperplane_signature,
    with_norm,
)


def exact_dedup_stream(
    docs: DataFrame,
    text_col: str = "text",
    *,
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

    The output carries the computed ``fp`` column (documented API — the
    survivor's fingerprint, e.g. for appending into a fingerprint
    store); an input that ALREADY has an ``fp`` column is rejected
    rather than silently clobbered (review r12 — the
    :func:`dedup_against_store` collision rule). r12 also dropped the
    never-used ``id_col`` parameter: which duplicate survives is
    arrival order by contract (first seen), not min-id — and r13 made
    ``ts_col``/``watermark`` keyword-only (ADVICE r12): a pre-r12
    caller passing the old positional ``id_col`` now gets a loud
    ``TypeError`` instead of silently binding an id column to
    ``ts_col``.
    """
    if watermark is not None and ts_col is None:
        raise ValueError("watermark requires ts_col")
    if "fp" in docs.columns:
        raise ValueError(
            "exact_dedup_stream: input already has an 'fp' column (the "
            "op's documented output fingerprint) — rename it before "
            "calling"
        )
    out = docs.withColumn("fp", fingerprint(F.col(text_col)))
    if watermark is not None:
        return out.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(["fp"])
    return out.dropDuplicates(["fp"])


def build_fingerprint_store(
    corpus: DataFrame,
    path: str,
    text_col: str = "text",
    mode: str = "overwrite",
) -> None:
    """Persist the exact-dedup fingerprint SET of a corpus snapshot: one
    distinct md5 fingerprint per row, nothing else. This is the
    incremental-crawl complement to :func:`exact_dedup_stream`: that op
    dedups WITHIN the arrival stream (standing state); this store dedups
    arrivals AGAINST EVERYTHING ALREADY INGESTED with zero standing
    state — the history lives on disk, refreshed per snapshot.

    Scale shape: the store is one narrow column of fixed-width hashes
    (~32 bytes/doc — a 10 B-doc corpus is ~300 GB, trivially
    shuffle-joinable); the write is one map-side-combined distinct.
    Growing the store incrementally: appending each window's survivor
    fingerprints (mode='append') keeps the anti-join CORRECT but only
    dedups within the window — recurring content re-appends its fp, so
    periodically run :func:`compact_fingerprint_store` (or rebuild from
    the corpus snapshot) to restore the one-row-per-distinct-doc
    shape."""
    (
        corpus.select(fingerprint(F.col(text_col)).alias("fp"))
        .dropDuplicates(["fp"])
        .write.mode(mode).parquet(path)
    )


def dedup_against_store(
    docs: DataFrame,
    store: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Drop arriving docs whose content fingerprint already exists in a
    persisted :func:`build_fingerprint_store` snapshot — the
    "have we EVER ingested this?" gate a continuous crawl runs before
    anything else touches a document.

    Stream-static LEFT ANTI join on the fingerprint: stateless per
    micro-batch (the store is the only history), works identically on a
    batch frame. Spark broadcasts a small store or shuffle-hash-joins a
    large one per AQE's call; either way the stream side shuffles at
    most once on the hash key. Compose with :func:`exact_dedup_stream`
    downstream to also catch duplicates WITHIN the arrival window:
    store-anti-join first (cheap, stateless), stateful first-seen second
    (state now bounded by genuinely-new content only).

    The caller's schema is returned UNCHANGED — the join key lives in a
    private helper column that is dropped on the way out (a
    pre-existing ``fp`` column on the input passes through untouched;
    an input that already carries the private key name itself is
    rejected rather than silently clobbered-then-dropped)."""
    key = "__store_fp"
    if key in docs.columns:
        raise ValueError(
            f"dedup_against_store: input already has a {key!r} column "
            "(the op's private join key) — rename it before calling"
        )
    keyed = docs.withColumn(key, fingerprint(F.col(text_col)))
    return keyed.join(
        store.select(F.col("fp").alias(key)), key, "left_anti"
    ).drop(key)


def compact_fingerprint_store(
    spark, path: str, swap_strategy: str = "auto"
) -> int:
    """Restore an append-grown :func:`build_fingerprint_store` directory
    to one-row-per-distinct-fingerprint shape: read → dropDuplicates →
    write to a temporary sibling → swap into place. This makes the
    incremental-crawl recipe executable instead of prose: append each
    window's survivor fingerprints cheaply (mode='append'), then compact
    on a schedule to stop recurring content from growing the store.

    The swap is two renames on the same filesystem (current → ``.old``,
    compacted → current) — the window where no directory exists is one
    rename, not a full rewrite; a reader holding the OLD frame keeps a
    deleted-inode-style hazard either way, which is why the contract is
    "compact from the maintenance job, not under a live reader OR a
    concurrent appender" (same discipline as any parquet-rewrite
    compaction): fingerprints appended between this function's read and
    the swap are NOT in the compacted copy. Since r13 that schedule
    violation is a LOUD failure, not silent loss of dedup history: the
    live store is re-listed just before the swap and any new file
    aborts with ``ConcurrentAppendError`` (tmp removed, store
    untouched; best-effort — the re-list→rename instant remains racy).
    Serialize appends and compaction on one maintenance schedule.
    Returns the number of distinct fingerprints in the compacted
    store.

    Plan: one map-side-combined distinct of a single fixed-width hash
    column — the cheapest possible shuffle shape; output files follow
    spark.sql.shuffle.partitions (coalesced by AQE), so a 300 GB store
    compacts without any single-task funnel.

    The swap commits through
    :func:`~wingfoil_spark.functions.store_swap.swap_store_dirs`
    (``swap_strategy='auto'``: Hadoop FileSystem renames for
    hdfs://-style schemes, ``shutil`` renames for driver-local paths —
    see that module for the S3A caveat), and the returned count is
    observed on the rewrite job itself, so the compacted copy is never
    re-read just to count it (VERDICT r12)."""
    import uuid

    from pyspark.sql import Observation

    from wingfoil_spark.functions.store_swap import (
        guard_no_new_files,
        swap_store_dirs,
        validate_swap_strategy,
    )

    validate_swap_strategy(swap_strategy)  # before the full rewrite
    base = path.rstrip("/")
    tmp = f"{base}.compact-{uuid.uuid4().hex[:12]}"
    old = f"{base}.old-{uuid.uuid4().hex[:12]}"
    src = spark.read.parquet(path)
    files_at_read = set(src.inputFiles())
    obs = Observation()
    compacted = src.dropDuplicates(["fp"]).observe(
        obs, F.count(F.lit(1)).alias("n")
    )
    compacted.write.mode("overwrite").parquet(tmp)
    n = obs.get["n"]
    guard_no_new_files(spark, base, files_at_read, tmp)
    swap_store_dirs(spark, base, tmp, old, strategy=swap_strategy)
    return n


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
    dedup across bands → (optionally) exact n-gram Jaccard verify. Self-
    matches (a doc joining its own index rows on a re-crawl replay) are
    dropped.

    The verify stage reads the B side (the ARRIVING doc) from the STREAM
    itself: its token set is computed row-locally up front and carried
    through banding/pairing, so only the A side (the existing corpus doc)
    joins against ``corpus``. ADVICE r4: the old path looked BOTH sides
    up in ``corpus`` — under the documented deployment (corpus = the
    persisted snapshot, which excludes arrivals) the b-side join found no
    row and every candidate silently vanished at verify. ``corpus`` now
    only needs the snapshot the index was built from — by construction
    the same thing.

    Output: (a, b[, jaccard]) with a = corpus id, b = arriving id.
    Multi-band hits collapse through a BATCH-LOCAL first-seen dedup on
    (a, b): an arriving doc's band rows live in exactly one micro-batch
    (its pairs are batch-local by construction), so the old streaming
    ``dropDuplicates`` kept one state-store entry per (corpus doc,
    arriving doc) pair FOREVER — with ``verify`` each entry also
    carried the arriving doc's full token set — unbounded growth over a
    continuous crawl for a dedup that never needed cross-batch state
    (review r12; the decontaminate_stream pattern). Now: one
    pair-bounded shuffle colocates each (a, b), a per-partition
    seen-set keeps the first, state is ZERO. A RE-ARRIVED doc id pairs
    again in its later batch — cross-arrival dedup is the upstream
    ingest gate's job. NULL-id rows are dropped (a pair needs both ids;
    and a NULL would force the int64→float64 pandas coercion).
    """
    import pandas as pd

    keep = ("__tb",) if verify else ()
    src = new_docs.where(F.col(id_col).isNotNull())
    if verify:
        src = src.withColumn(
            "__tb", F.array_distinct(tokens(F.col(text_col)))
        )
    sigs = minhash_sig_array(src, text_col, id_col, k, keep=keep)
    stream_bands = band_explode(sigs, id_col, k, bands, keep=keep) \
        .withColumnRenamed(id_col, "b")
    idx = index.where(F.col(id_col).isNotNull()) \
        .withColumnRenamed(id_col, "a")
    joined = (
        stream_bands.join(idx, ["band", "bk"])
        .where(F.col("a") != F.col("b"))
        .select("a", "b", *keep)
    )
    a_t = index.schema[id_col].dataType.simpleString()
    b_t = new_docs.schema[id_col].dataType.simpleString()
    pair_schema = f"a {a_t}, b {b_t}" + (
        ", __tb array<string>" if verify else ""
    )

    def first_seen(batches):
        seen: set = set()  # one partition's pairs — candidate-bounded
        for pdf in batches:
            if not len(pdf):
                continue
            pdf = pdf.drop_duplicates(subset=["a", "b"])
            keys = list(zip(pdf["a"], pdf["b"]))
            mask = [kk not in seen for kk in keys]
            seen.update(kk for kk, m in zip(keys, mask) if m)
            out = pdf[mask]
            if len(out):
                yield out

    pairs = joined.repartition("a", "b").mapInPandas(
        first_seen, pair_schema
    )
    if not verify:
        return pairs
    a_side = corpus.select(
        F.col(id_col).alias("a"),
        F.array_distinct(tokens(F.col(text_col))).alias("__ta"),
    )
    return (
        pairs.join(a_side, "a")
        .select(
            "a",
            "b",
            # try_divide for the 0/0 empty-token pair — same rationale
            # and NULL convention as the batch ngram_jaccard (review r12)
            F.try_divide(
                F.size(F.array_intersect("__ta", "__tb")).cast("double"),
                F.size(F.array_union("__ta", "__tb")).cast("double"),
            ).alias("jaccard"),
        )
    )


def build_decon_index(
    benchmark: DataFrame,
    n: int = 13,
    text_col: str = "text",
) -> DataFrame:
    """The eval-set n-gram hash index for streaming decontamination: one
    distinct 60-bit md5 gram hash per row (column ``gh``). Benchmarks are
    tiny against a crawl, so the persisted index broadcasts per
    micro-batch. Same gram/hash math as the batch scrub
    (`dedup.decontaminate`) — shared expressions, so stream == batch is a
    structural fact, then differentially tested anyway."""
    gram_h = F.explode(
        F.array_distinct(
            F.transform(word_ngrams_expr("__toks", n), lambda g: _md5_int(g))
        )
    )
    return (
        benchmark.where(F.col(text_col).isNotNull())
        .select(tokens(F.col(text_col)).alias("__toks"))
        .select(gram_h.alias("gh"))
        .distinct()
    )


def decontaminate_stream(
    new_docs: DataFrame,
    index: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Flag ARRIVING docs that share any word ``n``-gram with the indexed
    eval set — the streaming half of `dedup.decontaminate`'s flagged-only
    emission (min_hits=1; graded hit-count audits are a batch/foreachBatch
    concern — a cross-batch per-doc count would be unbounded keyed state
    for a number the flag already decides).

    ``new_docs`` may be a streaming frame; ``index`` is the static
    persisted benchmark gram set. Plan per micro-batch: row-local token →
    gram → hash explode, LEFT SEMI join against the (broadcast) index —
    a doc row survives iff some gram matched — then a BATCH-LOCAL
    first-seen dedup collapses multi-gram hits: one tiny shuffle of the
    MATCHED doc ids (hit-bounded, a single id column — never the gram
    rows, never the corpus) colocates each id, and a per-partition
    seen-set keeps the first. ZERO standing state. (r12: the previous
    `dropDuplicates` ran the keyed state store for cross-batch dedup
    that can never fire — a doc row lives in exactly one micro-batch —
    and its state machinery was ~half the part's wall time at 1×
    arrivals in the SCALE_r11 streaming tier.) Emits exactly one
    ``(doc_id, contaminated=true)`` row per DISTINCT flagged doc id per
    micro-batch; an id that genuinely RE-ARRIVES in a later batch flags
    again — cross-arrival dedup of re-crawls is the upstream ingest
    gate's job (:func:`dedup_against_store` / :func:`exact_dedup_stream`
    run first in the documented pipeline order), the same discipline as
    the vector-store appends. NULL-id rows are dropped (review r12: a
    doc with no id has no flag to attach — and a NULL in the id column
    would force Arrow's int64→float64 pandas coercion, silently
    corrupting ids above 2^53 in the dedup pass)."""
    import pandas as pd

    grams = (
        new_docs.where(
            F.col(text_col).isNotNull() & F.col(id_col).isNotNull()
        )
        .select(F.col(id_col), tokens(F.col(text_col)).alias("__toks"))
        .select(
            id_col,
            F.explode(
                F.array_distinct(
                    F.transform(word_ngrams_expr("__toks", n), lambda g: _md5_int(g))
                )
            ).alias("gh"),
        )
    )
    hits = grams.join(F.broadcast(index), "gh", "left_semi").select(id_col)
    id_type = new_docs.schema[id_col].dataType.simpleString()

    def first_seen(batches):
        seen: set = set()  # one partition's flagged keys — hit-bounded
        for pdf in batches:
            if not len(pdf):
                continue
            fresh = [v for v in pdf[id_col].unique() if v not in seen]
            if fresh:
                seen.update(fresh)
                yield pd.DataFrame({id_col: fresh})

    # the repartition makes the dedup DETERMINISTIC (review r12: without
    # it, duplicate ids WITHIN one batch collapse or not depending on
    # which partitions their rows land in); it shuffles only the matched
    # ids — a few thousand longs per batch, not the gram explosion
    return (
        hits.repartition(id_col)
        .mapInPandas(first_seen, f"{id_col} {id_type}")
        .withColumn("contaminated", F.lit(True))
    )


def build_dsir_index(
    target_docs: DataFrame,
    raw_docs: DataFrame,
    text_col: str = "text",
    n_buckets: int = 10_000,
) -> DataFrame:
    """The DSIR model for streaming selection: ONE row
    ``(lam array<double> dense-by-bucket, lam_oov double)`` — the add-1-smoothed
    per-bucket importance log-ratios of a target corpus vs the raw
    corpus (`functions.selection._log_ratio_row`). Batch; persist it and
    hand it to :func:`dsir_score_stream`. Like the decon index, the
    model is a frozen snapshot — retrain per corpus refresh, not per
    micro-batch."""
    from wingfoil_spark.functions.selection import _log_ratio_row, dsir_profile

    return _log_ratio_row(
        dsir_profile(target_docs, text_col, n_buckets),
        dsir_profile(raw_docs, text_col, n_buckets),
        n_buckets,
    )


def dsir_score_stream(
    new_docs: DataFrame,
    index: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 10_000,
) -> DataFrame:
    """DSIR importance log-weights for ARRIVING docs — the streaming half
    of `functions.selection.dsir_weights` (the selection a continuous
    crawl actually needs: score each arriving doc against the frozen
    target/raw profile snapshot, keep the high-weight ones).

    ``new_docs`` may be a streaming frame; ``index`` is the static
    one-row :func:`build_dsir_index` frame. Plan per micro-batch, fully
    stateless: stream-static broadcast cross join of the single λ row,
    then the row-local JVM weight fold — zero shuffles, zero Python, no
    standing state. The fold expression is SHARED with the batch scorer
    (`selection._fold_weight`), so stream == batch is a structural fact
    — and differentially tested anyway."""
    from wingfoil_spark.functions.selection import _fold_weight, _grams

    d = (
        new_docs.where(F.col(text_col).isNotNull())
        .withColumn("__tk", tokens(F.col(text_col)))
        .withColumn("__g", _grams(F.col("__tk")))
        .crossJoin(F.broadcast(index))
    )
    return d.select(F.col(id_col), _fold_weight(n_buckets).alias("log_w"))


def build_bm25_index(
    corpus: DataFrame,
    terms: list,
    text_col: str = "text",
) -> DataFrame:
    """Frozen BM25 corpus statistics for streaming retrieval scoring: the
    ONE-row ``(N, avgdl, dfs map<string,bigint>)`` frame the batch scorer
    folds (`functions.selection.bm25_score`). Batch; persist per corpus
    snapshot."""
    from wingfoil_spark.functions.selection import _bm25_stats

    terms = [t.lower() for t in terms]
    d = (
        corpus.where(F.col(text_col).isNotNull())
        .withColumn("__t", tokens(F.col(text_col)))
        .withColumn("__dl", F.size("__t"))
    )
    return _bm25_stats(d, terms)


def bm25_score_stream(
    new_docs: DataFrame,
    index: DataFrame,
    terms: list,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 scores for ARRIVING docs against the frozen corpus
    statistics — the serving shape of `selection.bm25_score` (e.g.
    routing crawl docs by topical relevance as they land).

    ``new_docs`` may be a streaming frame; ``index`` is the static
    one-row :func:`build_bm25_index` frame. Per micro-batch: broadcast
    cross join of the single stats row + a row-local JVM projection —
    zero shuffles, zero Python, no standing state. Scoring arithmetic is
    IDENTICAL to the batch scorer (same expression shapes), so
    stream == batch for docs whose stats snapshot matches — pinned by
    the differential in tests/test_streaming_ingest.py."""
    from wingfoil_spark.functions.selection import _bm25_score_expr

    terms = [t.lower() for t in terms]
    d = (
        new_docs.where(F.col(text_col).isNotNull())
        .withColumn("__t", tokens(F.col(text_col)))
        .withColumn("__dl", F.size("__t"))
        .crossJoin(F.broadcast(index))
    )
    return d.select(
        F.col(id_col), _bm25_score_expr(terms, k1, b).alias("score")
    )


def clf_score_stream(
    new_docs: DataFrame,
    model: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Quality-classifier logits for ARRIVING docs under a FROZEN
    coefficient row — the streamed twin of
    `selection.quality_scores`, completing the frozen-model serving
    matrix (r13: DSIR λ, BM25 stats and the bigram LM all had streamed
    scorers; the trained classifier — the CCNet/GPT-3 fasttext-style
    quality gate a continuous crawl actually filters with — was
    batch-named only).

    ``new_docs`` may be a streaming frame; ``model`` is the static
    one-row :func:`~wingfoil_spark.functions.selection.
    fit_quality_classifier` frame (persist the fitted coefs as data;
    refit per corpus refresh, never per micro-batch). Plan per
    micro-batch: broadcast cross join of the single coefs row + the
    row-local JVM gram fold + sigmoid — zero shuffles, zero Python, no
    standing state. The implementation IS the batch scorer applied to
    the streaming frame (quality_scores is stateless row-local by
    construction — its docstring's "legal on a streaming frame as-is"
    made executable and differential-pinned rather than left as
    prose)."""
    from wingfoil_spark.functions.selection import quality_scores

    return quality_scores(new_docs, model, text_col, id_col)


def lm_score_stream(
    new_docs: DataFrame,
    model: dict,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet-shape LM perplexity for ARRIVING docs against a frozen
    add-k model (`functions.lm.fit_bigram_lm` — persist the model frames
    per corpus refresh, like every index here).

    Per micro-batch: the row-local bigram explode (`lm._bigram_pos`,
    shared with the batch scorer), stream-static left joins against the
    model frames (AQE broadcast-decides), then per-doc (count, mean) via
    repartition(id) + mapInPandas with a RUNNING merge across Arrow
    batches — a doc's rows colocate in one partition but may span
    batches (the pq_topk batch-invariance lesson); (n, Σlp) merging is
    associative, so the emission at iterator exhaustion is exact and the
    state is O(docs-in-partition). Zero standing state across batches —
    a doc lives in exactly one micro-batch.

    Determinism (ADVICE r8): per-bigram logprobs are quantized JVM-side
    to 1e-9 integers (round(lp·1e9) as long) BEFORE the per-doc sum, so
    Σlp is exact integer arithmetic — identical under ANY summation
    order, Arrow batching, arrival order, or engine. The reported
    logprob_per_token = Σ/1e9/n differs from the unquantized mean by
    < 5e-10 (the batch scorer's double `avg` is engine-order-dependent
    at ~1e-13 anyway); the stream-vs-batch differential pin holds at
    1e-9.

    Emits only docs with ≥ 1 bigram (the flagged-only convention: token-
    poor docs carry no LM evidence; the batch scorer reports them as
    NULL). Output: (id, n_bigrams, logprob_per_token, perplexity)."""
    import pandas as pd

    from wingfoil_spark.functions.lm import _bigram_pos

    pos = _bigram_pos(
        new_docs.where(F.col(text_col).isNotNull()), text_col, id_col
    )
    scored = (
        pos.join(model["bigrams"], ["w1", "w2"], "left")
        .join(model["histories"], ["w1"], "left")
        .crossJoin(F.broadcast(model["consts"]))
        .select(
            id_col,
            F.round(
                F.coalesce(
                    F.col("logp"), F.col("logp_unseen"), F.col("logp_oov")
                )
                * F.lit(1e9)
            )
            .cast("long")
            .alias("__lpq"),
        )
    )
    id_type = new_docs.schema[id_col].dataType.simpleString()
    schema = (
        f"{id_col} {id_type}, n_bigrams long, "
        "logprob_per_token double, perplexity double"
    )

    def per_doc(batches):
        acc: dict = {}  # id -> [n, lp_quantized_int_sum]
        for pdf in batches:
            if not len(pdf):
                continue
            g = pdf.groupby(id_col, sort=False)["__lpq"].agg(["count", "sum"])
            for i, row in g.iterrows():
                st = acc.setdefault(i, [0, 0])
                st[0] += int(row["count"])
                st[1] += int(row["sum"])
        if acc:
            import math

            out = pd.DataFrame(
                [
                    (i, n, s / 1e9 / n, math.exp(-(s / 1e9 / n)))
                    for i, (n, s) in acc.items()
                ],
                columns=[
                    id_col, "n_bigrams", "logprob_per_token", "perplexity"
                ],
            )
            yield out

    return scored.repartition(id_col).mapInPandas(per_doc, schema)


def build_ann_index(
    corpus,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    bits: int = 8,
):
    """The corpus-side ANN index: (neighbor_id, e_c, n_c, bucket) — the
    hyperplane-LSH bucketed, norm-annotated corpus. Batch; persist it
    (parquet bucketed by ``bucket`` at scale) and hand it to
    :func:`ann_topk_stream`. Same signature math as the batch
    ``lsh_bucketed_topk``, so stream results == batch results."""
    c = hyperplane_signature(corpus, emb_col, bits).select(
        F.col(id_col).alias("neighbor_id"), F.col(emb_col).alias("e_c"), "bucket"
    )
    return with_norm(c, "e_c", "n_c").where(F.col("n_c") > 0)


def ann_topk_stream(
    probes,
    index,
    k: int = 5,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    bits: int = 8,
    probe_hamming: int = 0,
):
    """Online retrieval: top-k cosine neighbors of ARRIVING probe vectors
    against the indexed corpus — the serving shape of the batch
    ``lsh_bucketed_topk``.

    ``probes`` may be a streaming frame; ``index`` is the static
    :func:`build_ann_index` output. Plan per micro-batch, fully stateless:
    row-local probe signatures → stream-static equi-join on the bucket →
    repartition by probe (all of one probe's candidates colocate — a probe
    lives in exactly one micro-batch) → per-partition pandas top-k.

    Window functions are illegal on streams, and a groupBy would drag in
    watermark/output-mode state for what is per-batch-local work — the
    repartition + mapInPandas pair gets exact per-probe top-k with one
    intra-batch shuffle and zero standing state. Ranking matches the
    batch tier: cosine rounded to 6dp desc, neighbor id asc.

    The pandas iterator keeps a RUNNING top-k per probe across Arrow
    batches: mapInPandas splits a partition into ~10k-row batches, so a
    per-batch groupby head(k) would emit up to k rows PER BATCH with
    ranks restarting at 1 whenever one probe's candidate set spans
    batches (same class as the round-5 ADC finding —
    :func:`wingfoil_spark.functions.similarity._adc_topk_iter`).
    Selecting the k best under the (-cosine, neighbor_id) total order is
    associative, so batch-wise merge + one emission at exhaustion is
    exact and O(probes_in_partition × k) memory.
    """
    _check_probe_hamming("ann_topk_stream", probe_hamming)
    p = hyperplane_signature(probes, emb_col, bits).select(
        F.col(id_col).alias("probe_id"), F.col(emb_col).alias("e_p"), "bucket"
    )
    p = with_norm(p, "e_p", "n_p").where(F.col("n_p") > 0)
    if probe_hamming == 1:
        # r13: the multi-probe serving dial — the streamed twin of
        # lsh_bucketed_topk(probe_hamming=1); the shared explode keeps
        # the candidate restriction on the broadcast equi-join below;
        # row-local, still zero state (stream == batch,
        # differential-pinned).
        p = hamming1_explode(p, bits)
    dot = _dot("e_p", "e_c")
    scored = (
        # the PROBE micro-batch is broadcast explicitly (review r12):
        # AQE does not run inside streaming micro-batch plans and the
        # static planner sizes the stream side at defaultSizeInBytes,
        # so without the hint a large static index gets sort-merge
        # SHUFFLED in its entirety every trigger for a handful of
        # probes — the batch twin broadcasts the probe side for the
        # same reason. A serving micro-batch is small by definition;
        # batch-mode callers with huge probe sets should use the batch
        # tier (lsh_bucketed_topk), which lets AQE pick the strategy.
        index.join(F.broadcast(p), "bucket")
        .where(F.col("probe_id") != F.col("neighbor_id"))
        .select(
            "probe_id",
            "neighbor_id",
            F.round(dot / (F.col("n_p") * F.col("n_c")), 6).alias("cosine"),
        )
    )
    # no (probe, neighbor) duplicates to dedup under multi-probe: a
    # corpus row carries exactly ONE bucket and the probed values
    # (bucket ⊕ 9 distinct masks incl. 0) are pairwise distinct, so
    # each pair matches at most one exploded probe row — crucially, no
    # streaming dropDuplicates (keyed standing state) is ever needed
    # id field types DERIVED from the inputs (string/UUID ids must not
    # fail on a hardcoded long — the _adc_out_schema rule; review r12)
    schema = (
        f"probe_id {probes.schema[id_col].dataType.simpleString()}, "
        f"neighbor_id {index.schema['neighbor_id'].dataType.simpleString()}, "
        "cosine double, rank long"
    )
    return scored.repartition("probe_id").mapInPandas(
        _running_cosine_topk_iter(int(k)), schema
    )


def build_ann_index_multi(
    corpus,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    bits: int = 8,
    n_tables: int = 4,
):
    """The multi-TABLE corpus index (r13): (neighbor_id, e_c, n_c, tbl,
    bucket) — one row per (vector, table), every table's bucket from ONE
    corpus signature pass (`similarity.hyperplane_signatures_multi`).
    Batch; persist it (parquet bucketed by (tbl, bucket) at scale) and
    hand it to :func:`ann_tables_topk_stream`. Table 0 is bit-identical
    to :func:`build_ann_index`'s buckets."""
    from wingfoil_spark.functions.similarity import hyperplane_signatures_multi

    c = hyperplane_signatures_multi(corpus, emb_col, bits, n_tables).select(
        F.col(id_col).alias("neighbor_id"), F.col(emb_col).alias("e_c"),
        "tbl", "bucket",
    )
    return with_norm(c, "e_c", "n_c").where(F.col("n_c") > 0)


def ann_tables_topk_stream(
    probes,
    index,
    k: int = 5,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    bits: int = 8,
    n_tables: int = 4,
    probe_hamming: int = 0,
):
    """Online serving for the FULL LSH recall dial (r13): arriving
    probes against the :func:`build_ann_index_multi` tables — the
    streamed twin of `similarity.lsh_tables_topk`, composable with the
    per-table Hamming-1 multiprobe. Plan per micro-batch: one probe
    signature kernel emits every table's bucket, the (tbl, bucket)
    broadcast equi-join restricts candidates, and the shared running
    top-k iterator collapses pairs that co-bucket in several tables
    (its keep-each-pair-once contract — identical cosine per duplicate,
    so the merge is exact); zero standing state, no streaming
    dropDuplicates. Stream == batch differential-pinned."""
    from wingfoil_spark.functions.similarity import hyperplane_signatures_multi

    _check_probe_hamming("ann_tables_topk_stream", probe_hamming)
    p = hyperplane_signatures_multi(probes, emb_col, bits, n_tables).select(
        F.col(id_col).alias("probe_id"), F.col(emb_col).alias("e_p"),
        "tbl", "bucket",
    )
    p = with_norm(p, "e_p", "n_p").where(F.col("n_p") > 0)
    if probe_hamming == 1:
        p = hamming1_explode(p, bits)
    dot = _dot("e_p", "e_c")
    scored = (
        # probe micro-batch broadcast for the same reason as
        # ann_topk_stream (AQE absent in micro-batch plans)
        index.join(F.broadcast(p), ["tbl", "bucket"])
        .where(F.col("probe_id") != F.col("neighbor_id"))
        .select(
            "probe_id",
            "neighbor_id",
            F.round(dot / (F.col("n_p") * F.col("n_c")), 6).alias("cosine"),
        )
    )
    schema = (
        f"probe_id {probes.schema[id_col].dataType.simpleString()}, "
        f"neighbor_id {index.schema['neighbor_id'].dataType.simpleString()}, "
        "cosine double, rank long"
    )
    return scored.repartition("probe_id").mapInPandas(
        _running_cosine_topk_iter(int(k)), schema
    )


def _running_cosine_topk_iter(kk: int):
    """mapInPandas iterator: RUNNING per-probe top-k over
    (probe_id, neighbor_id, cosine) rows, merged across Arrow batches
    under the (-cosine, neighbor_id) total order and flushed as ONE
    frame per partition (a per-probe yield would make one Arrow batch
    per probe — thousands of ≤k-row batches whose serialization
    dominates the flush). Shared by :func:`ann_topk_stream` and
    :func:`ivf_topk_stream` — the batching-invariance contract is
    pinned once in tests/test_streaming_ingest.py.

    Each (probe, neighbor) pair is kept ONCE (best cosine): the batch
    IVF twin runs dropDuplicates on the pair before ranking, and a
    store grown by ``append_ivf_store`` may legitimately carry a
    duplicate id (dedup is the caller's crawl-gate job there) — without
    this, a duplicated neighbor would occupy two ranks in the stream
    result and push a real neighbor out of the k (review r11)."""
    import numpy as np
    import pandas as pd

    def topk(batches):
        best: dict = {}  # probe_id -> (cosines, neighbor_ids) top-k so far
        for pdf in batches:
            if not len(pdf):
                continue
            for probe_id, grp in pdf.groupby("probe_id", sort=False):
                cos = grp["cosine"].to_numpy(dtype=np.float64)
                ids = grp["neighbor_id"].to_numpy()
                if probe_id in best:
                    pcos, pids = best[probe_id]
                    cos = np.concatenate([pcos, cos])
                    ids = np.concatenate([pids, ids])
                order = np.lexsort((ids, -cos))
                cos, ids = cos[order], ids[order]
                # first occurrence per neighbor under the rank order ==
                # best cosine per pair (associative across batch merges)
                keep = np.sort(np.unique(ids, return_index=True)[1])[:kk]
                best[probe_id] = (cos[keep], ids[keep])
        if best:
            yield pd.concat(
                [
                    pd.DataFrame({
                        "probe_id": probe_id,
                        "neighbor_id": ids,
                        "cosine": cos,
                        "rank": np.arange(1, len(ids) + 1),
                    })
                    for probe_id, (cos, ids) in best.items()
                ],
                ignore_index=True,
            )

    return topk


def ivf_topk_stream(
    probes,
    store,
    centroids,
    k: int = 5,
    nprobe: int = 4,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Online IVF serving from the PERSISTED store: top-k cosine
    neighbors of ARRIVING probe vectors against a
    :func:`~wingfoil_spark.functions.similarity.write_ivf_store` layout
    — the streaming twin of ``ivf_topk_from_store`` (that op's probe
    assignment uses a row_number window, illegal on a stream).

    ``probes`` may be a streaming frame; ``store`` is the static
    ``spark.read.parquet(path)`` frame and ``centroids`` the metadata
    frame persisted beside it (this op takes frames, not a path, so it
    cannot verify the store's metadata sidecar itself — call
    ``similarity.check_store_meta(spark, path, centroids)`` once at
    stream construction, as the batch twin does). Plan per micro-batch,
    fully stateless:
    ROW-LOCAL nprobe assignment (``ivf_assign_rowlocal`` — the centroid
    metadata inlined as a literal array, top-nprobe via array_sort: no
    window, no shuffle, streaming-legal) → stream-static equi-join on
    ``cid`` → repartition by probe → running per-probe top-k across
    Arrow batches (shared iterator with :func:`ann_topk_stream`).
    Ranking matches the batch tier: cosine rounded to 6dp desc,
    neighbor id asc. Batch == stream row-for-row against
    ``ivf_topk_from_store`` on the same store (test-pinned).

    At scale the static side is the cell-partitioned parquet; each
    micro-batch's join touches candidate rows only (AQE decides
    broadcast vs shuffle per batch), and state is zero — a probe lives
    in exactly one micro-batch."""
    from wingfoil_spark.functions.similarity import ivf_assign_rowlocal

    p = ivf_assign_rowlocal(probes, centroids, nprobe, emb_col, id_col)
    p = p.select(
        F.col(id_col).alias("probe_id"), F.col(emb_col).alias("e_p"), "cid"
    )
    p = with_norm(p, "e_p", "n_p").where(F.col("n_p") > 0)
    c = store.select(
        F.col(id_col).alias("neighbor_id"), F.col(emb_col).alias("e_c"), "cid"
    )
    c = with_norm(c, "e_c", "n_c").where(F.col("n_c") > 0)
    dot = _dot("e_p", "e_c")
    scored = (
        # probe micro-batch broadcast — same rationale as
        # ann_topk_stream (no AQE in micro-batch plans; the static cell
        # store must never be shuffled per trigger; review r12)
        c.join(F.broadcast(p), "cid")
        .where(F.col("probe_id") != F.col("neighbor_id"))
        .select(
            "probe_id",
            "neighbor_id",
            F.round(dot / (F.col("n_p") * F.col("n_c")), 6).alias("cosine"),
        )
        # a probe assigned to nprobe cells can meet the same neighbor
        # only once (the store assigns each vector to ONE cell), so no
        # pair dedup is needed before the top-k
    )
    # id field types DERIVED from the inputs, like _adc_out_schema
    schema = (
        f"probe_id {probes.schema[id_col].dataType.simpleString()}, "
        f"neighbor_id {store.schema[id_col].dataType.simpleString()}, "
        "cosine double, rank long"
    )
    return scored.repartition("probe_id").mapInPandas(
        _running_cosine_topk_iter(int(k)), schema
    )


def ivfpq_topk_stream(
    probes,
    store,
    centroids,
    codebooks: list,
    k: int = 5,
    nprobe: int = 4,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Online ADC serving from the CODES-ONLY store: top-k neighbors of
    ARRIVING probe vectors against a
    :func:`~wingfoil_spark.functions.similarity.write_ivfpq_store`
    layout — the streaming twin of ``ivfpq_topk_from_store`` and the
    third leg of the serving matrix (LSH index → :func:`ann_topk_stream`,
    IVF cells → :func:`ivf_topk_stream`, PQ codes → here). This is the
    billion-vector serving shape: the static side holds m smallints per
    vector — no float corpus column exists anywhere in the join.

    ``probes`` may be a streaming frame; ``store`` is the static
    ``spark.read.parquet(path)`` codes frame (``id, pq_code, cid``) and
    ``centroids``/``codebooks`` the metadata persisted beside it
    (frames, not a path — verify the sidecar once at stream
    construction via ``similarity.check_store_meta(spark, path,
    centroids, codebooks)``, as the batch twin does). Plan
    per micro-batch, fully stateless: row-local nprobe assignment
    (``ivf_assign_rowlocal`` — window-free, streaming-legal) →
    stream-static equi-join on ``cid`` → per-probe running ADC top-k
    across Arrow batches (the shared ``_adc_topk_iter`` — its
    batching-invariance is pinned with the batch tiers). Results are
    identical to ``ivfpq_topk_from_store`` under the same metadata
    (test-pinned)."""
    import numpy as np

    from wingfoil_spark.functions.similarity import (
        _adc_out_schema,
        _adc_topk_iter,
        ivf_assign_rowlocal,
    )

    p = ivf_assign_rowlocal(probes, centroids, nprobe, emb_col, id_col).select(
        F.col(id_col).alias("probe_id"), F.col(emb_col).alias("e_p"), "cid"
    )
    cand = (
        # probe micro-batch broadcast — same rationale as
        # ann_topk_stream (no AQE in micro-batch plans; the codes store
        # must never be shuffled per trigger; review r12). The batch
        # twin ivfpq_topk_from_store broadcasts the probe side too.
        store.join(F.broadcast(p), "cid")
        .where(F.col("probe_id") != F.col(id_col))
        .select(
            "probe_id",
            F.col(id_col).alias("neighbor_id"),
            F.col("pq_code").alias("code"),
            "e_p",
        )
    )
    books = np.asarray([np.asarray(b, dtype=np.float64) for b in codebooks])
    schema = _adc_out_schema(
        probes.schema[id_col].dataType, store.schema[id_col].dataType
    )
    return cand.repartition("probe_id").mapInPandas(
        _adc_topk_iter(books, int(k)), schema
    )


def _adc_shortlist_iter(books, shortlist: int):
    """mapInPandas iterator for the STREAMED rerank's stage 1: the same
    running ADC top-``shortlist`` merge as
    :func:`~wingfoil_spark.functions.similarity._adc_topk_iter` (same
    (dist, neighbor_id) total order, same duplicate-id first-occurrence
    rule), but the flush emits ``(probe_id, neighbor_id, e_p)`` — the
    probe VECTOR rides along so the exact re-scoring stage needs no
    second look at the probe stream (a shortlist↔probes join would be a
    stream-stream self-join, which Spark either rejects or turns into
    unbounded state; carrying ~shortlist copies of one 64-float array
    per probe is the cheap alternative)."""
    import numpy as np
    import pandas as pd

    m, kk_cent, d_sub = books.shape

    def adc(batches):
        tables: dict = {}
        eps: dict = {}      # probe_id -> the probe's raw vector
        best: dict = {}
        for pdf in batches:
            if not len(pdf):
                continue
            for probe_id, grp in pdf.groupby("probe_id", sort=False):
                table = tables.get(probe_id)
                if table is None:
                    raw = grp["e_p"].iloc[0]
                    eps[probe_id] = raw
                    x = np.asarray(raw, dtype=np.float64)
                    n = np.linalg.norm(x)
                    if n > 0:
                        x = x / n
                    table = np.empty((m, kk_cent), dtype=np.float64)
                    for j in range(m):
                        sub = x[j * d_sub:(j + 1) * d_sub]
                        table[j] = ((books[j] - sub[None, :]) ** 2).sum(axis=1)
                    tables[probe_id] = table
                codes = np.asarray(
                    [np.asarray(c, dtype=np.int64) for c in grp["code"]]
                )
                dists = table[np.arange(m)[None, :], codes].sum(axis=1)
                ids = grp["neighbor_id"].to_numpy()
                if probe_id in best:
                    pdists, pids = best[probe_id]
                    dists = np.concatenate([pdists, dists])
                    ids = np.concatenate([pids, ids])
                order = np.lexsort((ids, dists))
                dists, ids = dists[order], ids[order]
                keep = np.sort(np.unique(ids, return_index=True)[1])[:shortlist]
                best[probe_id] = (dists[keep], ids[keep])
        if best:
            yield pd.concat(
                [
                    pd.DataFrame({
                        "probe_id": probe_id,
                        "neighbor_id": ids,
                        "e_p": [eps[probe_id]] * len(ids),
                    })
                    for probe_id, (dists, ids) in best.items()
                ],
                ignore_index=True,
            )

    return adc


def ivfpq_rerank_stream(
    probes,
    store,
    centroids,
    codebooks: list,
    float_corpus,
    k: int = 5,
    shortlist: int = 50,
    nprobe: int = 4,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Streamed twin of :func:`~wingfoil_spark.functions.similarity.
    ivfpq_rerank_topk` — online candidate generation from the CODES-ONLY
    store plus an exact cosine re-rank of the ADC shortlist (r14; the
    production serving composition the planted-cluster recall arm
    motivates: the quantizer finds the right neighborhood, the exact
    pass ranks within it).

    ``probes`` may be a streaming frame; ``store`` is the static codes
    frame (``id, pq_code, cid``), ``centroids``/``codebooks`` its
    metadata, and ``float_corpus`` the static ``(id, embedding)`` float
    source for the shortlist lookup (at scale: the id-partitioned float
    store — only ``probes × shortlist`` rows of it are ever read per
    micro-batch, through the id equi-join). Plan per micro-batch, fully
    stateless: row-local nprobe assignment → stream-static cid join →
    running ADC top-``shortlist`` per probe (``_adc_shortlist_iter``,
    which carries the probe vector through so no second probe join is
    needed) → stream-static id join to the float side (shortlist
    micro-batch broadcast — the codes/float stores must never be
    shuffled per trigger) → exact 6dp-rounded cosine → the shared
    running top-k. Matches the batch tier row-for-row under the same
    store + metadata (test-pinned)."""
    import numpy as np

    from wingfoil_spark.functions.similarity import ivf_assign_rowlocal

    p = ivf_assign_rowlocal(probes, centroids, nprobe, emb_col, id_col).select(
        F.col(id_col).alias("probe_id"), F.col(emb_col).alias("e_p"), "cid"
    )
    cand = (
        store.join(F.broadcast(p), "cid")
        .where(F.col("probe_id") != F.col(id_col))
        .select(
            "probe_id",
            F.col(id_col).alias("neighbor_id"),
            F.col("pq_code").alias("code"),
            "e_p",
        )
    )
    books = np.asarray([np.asarray(b, dtype=np.float64) for b in codebooks])
    pt = probes.schema[emb_col].dataType.simpleString()
    short_schema = (
        f"probe_id {probes.schema[id_col].dataType.simpleString()}, "
        f"neighbor_id {store.schema[id_col].dataType.simpleString()}, "
        f"e_p {pt}"
    )
    short = cand.repartition("probe_id").mapInPandas(
        _adc_shortlist_iter(books, int(shortlist)), short_schema
    )
    c = with_norm(
        float_corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(emb_col).alias("e_c")
        ),
        "e_c", "n_c",
    ).where(F.col("n_c") > 0)
    scored = (
        c.join(F.broadcast(short), "neighbor_id")
        .withColumn("n_p", F.sqrt(_dot("e_p", "e_p")))
        .where(F.col("n_p") > 0)
        .select(
            "probe_id",
            "neighbor_id",
            F.round(
                _dot("e_p", "e_c") / (F.col("n_p") * F.col("n_c")), 6
            ).alias("cosine"),
        )
    )
    schema = (
        f"probe_id {probes.schema[id_col].dataType.simpleString()}, "
        f"neighbor_id {store.schema[id_col].dataType.simpleString()}, "
        "cosine double, rank int"
    )
    return scored.repartition("probe_id").mapInPandas(
        _running_cosine_topk_iter(int(k)), schema
    )


def ivf_topk_stream_from_store(
    spark,
    probes,
    path: str,
    k: int = 5,
    nprobe: int = 4,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Path-only construction of :func:`ivf_topk_stream` (r14): the
    store frame and its sidecar-persisted centroids are loaded HERE,
    once, at stream construction — an online server needs spark + the
    store path + the probe stream, nothing else (self-describing
    stores; raises the standard clear error for a pre-sidecar store).
    The running plan is exactly the frame-based twin's."""
    from wingfoil_spark.functions.similarity import (
        _require_store_centroids,
    )

    cents = _require_store_centroids(
        spark, path, "ivf_topk_stream_from_store"
    )
    return ivf_topk_stream(
        probes, spark.read.parquet(path), cents,
        k=k, nprobe=nprobe, emb_col=emb_col, id_col=id_col,
    )


def ivfpq_topk_stream_from_store(
    spark,
    probes,
    path: str,
    k: int = 5,
    nprobe: int = 4,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Path-only construction of :func:`ivfpq_topk_stream` (r14):
    codes frame, centroids AND codebooks all load from the store —
    streamed ADC serving from nothing but the path."""
    from wingfoil_spark.functions.similarity import (
        _require_store_centroids,
        _require_store_codebooks,
    )

    cents = _require_store_centroids(
        spark, path, "ivfpq_topk_stream_from_store"
    )
    books = _require_store_codebooks(
        spark, path, "ivfpq_topk_stream_from_store"
    )
    return ivfpq_topk_stream(
        probes, spark.read.parquet(path), cents, books,
        k=k, nprobe=nprobe, emb_col=emb_col, id_col=id_col,
    )


def ivfpq_rerank_stream_from_store(
    spark,
    probes,
    path: str,
    float_corpus,
    k: int = 5,
    shortlist: int = 50,
    nprobe: int = 4,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Path-only construction of :func:`ivfpq_rerank_stream` (r14) —
    the production serving composition from the codes path plus the
    float table (``float_corpus``: the id-partitioned float source the
    shortlist lookup reads, probes × shortlist rows per micro-batch)."""
    from wingfoil_spark.functions.similarity import (
        _require_store_centroids,
        _require_store_codebooks,
    )

    cents = _require_store_centroids(
        spark, path, "ivfpq_rerank_stream_from_store"
    )
    books = _require_store_codebooks(
        spark, path, "ivfpq_rerank_stream_from_store"
    )
    return ivfpq_rerank_stream(
        probes, spark.read.parquet(path), cents, books, float_corpus,
        k=k, shortlist=shortlist, nprobe=nprobe,
        emb_col=emb_col, id_col=id_col,
    )
