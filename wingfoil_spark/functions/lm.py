"""N-gram language-model quality filtering — the CCNet perplexity recipe
(Wenzek et al. 2020: score every document with an LM, bucket the corpus
into head/middle/tail by per-language perplexity quantiles) re-expressed
Spark-first with a corpus-fit add-k bigram model instead of an external
KenLM binary (no model files in this environment; the pipeline shape —
fit table, score join, quantile bucketing — is identical, and a real
KenLM would slot in as a scoring UDF over the same frames).

Model: ``p(w2 | w1) = (c(w1 w2) + k) / (c(w1) + k·V)`` with add-k
smoothing over the reference corpus vocabulary (V distinct tokens).
Unseen-history and unseen-word positions fall back to the same formula
with zero counts, so every bigram position has a finite log-prob and
scoring is total. All math is deterministic double-precision log-space —
an exact ANSI-SQL twin exists (same joins, same ln()).

100 TB shape: the fit is ONE shuffle (bigram groupBy with map-side
partial aggregation) plus a unigram groupBy folded into the bigram table
at fit time; scoring is a row-local bigram explode joined against the fit
table on (w1, w2) — a plain shuffle join that AQE broadcast-decides when
the model is small, plus one (w1)-keyed join for unseen-bigram backoff.
No driver-side model, no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from wingfoil_spark.functions.text import tokens


def fit_bigram_lm(
    ref_docs: DataFrame,
    text_col: str = "text",
    k: float = 0.1,
) -> dict[str, DataFrame]:
    """Fit the add-k bigram model on a reference corpus.

    Returns three frames (the "model"):

    - ``bigrams``:  (w1, w2, logp) for every OBSERVED bigram;
    - ``histories``: (w1, logp_unseen) — the smoothed log-prob of any
      UNOBSERVED continuation of an observed history w1;
    - ``consts``: a 1-row frame (v, logp_oov) — vocabulary size and the
      log-prob used when the history itself is unseen
      (= log(k/(0 + k·V)) = -log(V), the uniform fallback).

    Deterministic given (ref corpus, k); every value reproducible in SQL.
    """
    if k <= 0:
        raise ValueError(f"smoothing k must be > 0, got {k}")
    toks = ref_docs.select(tokens(F.col(text_col)).alias("__t"))
    uni = (
        toks.select(F.explode("__t").alias("w1"))
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    big = (
        toks.select(
            F.explode(
                F.expr(
                    "if(size(__t) < 2, array(), transform(sequence(1, size(__t) - 1), "
                    "i -> struct(__t[i-1] AS w1, __t[i] AS w2)))"
                )
            ).alias("bg")
        )
        .select("bg.w1", "bg.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
    )
    # V is one scalar; computing it inline would put a scalar subquery in
    # every row's expression — take it once (an aggregate collect of ONE
    # row, not a data collect)
    v = uni.count()
    if v == 0:
        # An empty-vocabulary model is undefined (log(1/0) would abort the
        # whole scoring job under ANSI mode with DIVIDE_BY_ZERO). Fail
        # loudly at wiring time — the module convention for degenerate
        # inputs.
        raise ValueError(
            "fit_bigram_lm: reference corpus has empty vocabulary "
            "(no tokens after tokenization)"
        )
    denom = F.col("c1") + F.lit(k) * F.lit(float(v))
    bigrams = (
        big.join(uni, "w1")
        .select(
            "w1",
            "w2",
            F.log((F.col("c12") + F.lit(k)) / denom).alias("logp"),
        )
    )
    histories = uni.select(
        "w1", F.log(F.lit(k) / denom).alias("logp_unseen")
    )
    consts = ref_docs.sparkSession.range(1).select(
        F.lit(v).alias("v"),
        F.log(F.lit(1.0) / F.lit(float(v))).alias("logp_oov"),
    )
    return {"bigrams": bigrams, "histories": histories, "consts": consts}


def lm_perplexity(
    docs: DataFrame,
    lm: dict[str, DataFrame],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score each document under the fitted model: mean bigram log-prob
    and perplexity ``exp(-mean)``. Docs with fewer than 2 tokens carry no
    bigram evidence and are emitted with NULL score (the caller decides —
    CCNet drops them).

    Returns ``(id_col, n_bigrams, logprob_per_token, perplexity)``.
    """
    pos = docs.select(
        F.col(id_col), tokens(F.col(text_col)).alias("__t")
    ).select(
        F.col(id_col),
        F.explode(
            F.expr(
                "if(size(__t) < 2, array(), transform(sequence(1, size(__t) - 1), "
                "i -> struct(__t[i-1] AS w1, __t[i] AS w2)))"
            )
        ).alias("bg"),
    ).select(id_col, "bg.w1", "bg.w2")
    scored = (
        pos.join(lm["bigrams"], ["w1", "w2"], "left")
        .join(lm["histories"], ["w1"], "left")
        .crossJoin(F.broadcast(lm["consts"]))
        .select(
            id_col,
            F.coalesce(
                F.col("logp"), F.col("logp_unseen"), F.col("logp_oov")
            ).alias("__lp"),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.avg("__lp").alias("logprob_per_token"),
    )
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
            "logprob_per_token",
            F.exp(-F.col("logprob_per_token")).alias("perplexity"),
        )
    )


def ppl_buckets(
    scored: DataFrame,
    group_col: str | None = None,
    id_col: str = "doc_id",
    cuts: tuple[float, float] = (1.0 / 3.0, 2.0 / 3.0),
) -> DataFrame:
    """CCNet's head/middle/tail split: bucket docs by perplexity quantiles,
    per ``group_col`` (CCNet: per language) or globally. Lower perplexity
    = "head" (most LM-like). NULL-scored docs (< 2 tokens) get NULL bucket.

    Quantiles via ``percentile_approx`` (one aggregate over the group, a
    few-KB sketch per group — no sort of the corpus, scale-safe). Returns
    the input plus a ``ppl_bucket`` column.
    """
    lo, hi = cuts
    if not (0.0 < lo < hi < 1.0):
        raise ValueError(f"cuts must satisfy 0 < lo < hi < 1, got {cuts}")
    gcols = [group_col] if group_col else []
    q = scored.where(F.col("perplexity").isNotNull()).groupBy(*gcols).agg(
        F.percentile_approx("perplexity", lo).alias("__q_lo"),
        F.percentile_approx("perplexity", hi).alias("__q_hi"),
    )
    joined = (
        scored.join(F.broadcast(q), gcols, "left")
        if gcols
        else scored.crossJoin(F.broadcast(q))
    )
    return joined.select(
        *scored.columns,
        F.when(F.col("perplexity").isNull(), F.lit(None).cast("string"))
        .when(F.col("perplexity") <= F.col("__q_lo"), F.lit("head"))
        .when(F.col("perplexity") <= F.col("__q_hi"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("ppl_bucket"),
    )
