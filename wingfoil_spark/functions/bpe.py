"""Byte-pair-encoding tokenizer: train a merge vocabulary on a corpus and
encode documents with it (Sennrich et al. 2016, the public BPE recipe every
modern LLM tokenizer descends from).

Distributed shape — the one that actually works at 100 TB:

- the only corpus-scale operation is the WORD-FREQUENCY aggregation (one
  shuffle with map-side partial aggregation, exactly the word-count plan);
- BPE training then runs on the word-frequency table, which is
  vocabulary-sized (≤ a few million rows for a 100 TB corpus — Heaps'
  law), not corpus-sized. The classic sequential merge loop is inherently
  serial in the merge rank (merge i+1's pair counts depend on merge i),
  so it runs driver-side over the compact table — the same division of
  labor as every production tokenizer trainer (corpus pass distributed,
  merge loop on the aggregate);
- encoding is row-local: the learned merge ranks broadcast to executors
  (a dict of ≤ vocab_size entries) and each document encodes
  independently in an Arrow-batched kernel. No shuffle, no state.

Word model: whitespace tokens (functions.text.tokens — lowercased), each
word a character sequence terminated by the word-end marker ``</w>`` so
merges never cross word boundaries. Determinism: pair ties break
lexicographically (count DESC, pair ASC) — retrains are byte-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from wingfoil_spark.functions.text import tokens

END = "</w>"


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The corpus-scale pass: (word, count). One shuffle, map-side combine."""
    return (
        docs.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _merge_word(symbols: tuple, pair: tuple[str, str]) -> tuple:
    a, b = pair
    out, i, n = [], 0, len(symbols)
    while i < n:
        if i < n - 1 and symbols[i] == a and symbols[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return tuple(out)


def train_bpe(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    max_words: int = 1_000_000,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges. The corpus contributes one
    word-frequency aggregation; the merge loop runs on that compact table
    (``max_words`` guards the driver — the TOP words by count are kept,
    ties on count broken by word for determinism; beyond ~1M distinct
    words the tail is hapax noise that never wins a merge anyway).

    Returns the ordered merge list [(left, right), ...] — rank = index.
    """
    if n_merges < 0:
        raise ValueError(f"n_merges must be >= 0, got {n_merges}")
    wc = (
        word_counts(docs, text_col)
        .orderBy(F.col("n").desc(), F.col("word").asc())
        .limit(max_words)
        .collect()
    )
    vocab: dict[tuple, int] = {
        tuple(list(r["word"]) + [END]): int(r["n"]) for r in wc
    }
    return _train_merges(vocab, n_merges)


def _train_merges_naive(
    vocab: dict[tuple, int], n_merges: int
) -> list[tuple[str, str]]:
    """The textbook recount-everything loop — O(n_merges × vocab ×
    word_len). Kept as the differential REFERENCE for the incremental
    trainer below (tests pin bitwise-equal merge lists); not used in the
    production path."""
    vocab = dict(vocab)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        vocab = {_merge_word(s, best): n for s, n in vocab.items()}
    return merges


def _train_merges(
    vocab: dict[tuple, int], n_merges: int
) -> list[tuple[str, str]]:
    """Incremental merge loop — the production trainer structure: pair
    counts are maintained as DELTAS over only the words containing the
    merged pair (a pair→words inverted index), with a max-heap on
    (count DESC, pair ASC) under lazy invalidation (stale heap entries
    are skipped when their count no longer matches). Per merge this
    costs O(words containing the pair), not O(whole vocabulary) — 32k
    merges over a ~1M-word table stays minutes, not hours. Selection
    order (and therefore the merge list) is bitwise-identical to
    :func:`_train_merges_naive`, including the rare resurrected-pair
    case (a later merge re-creating adjacency of an already-merged
    pair re-enters the heap, exactly as a full recount would see it)."""
    import heapq
    from collections import Counter

    words: list[tuple[tuple, int]] = list(vocab.items())
    pair_counts: Counter = Counter()
    pair_words: dict[tuple[str, str], set[int]] = {}
    for wid, (syms, n) in enumerate(words):
        for p in zip(syms, syms[1:]):
            pair_counts[p] += n
            pair_words.setdefault(p, set()).add(wid)
    heap = [(-c, p) for p, c in pair_counts.items()]
    heapq.heapify(heap)
    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges and heap:
        negc, pair = heapq.heappop(heap)
        c = pair_counts.get(pair, 0)
        if c <= 0 or c != -negc:
            continue  # stale entry — a fresher one is (or was) in the heap
        merges.append(pair)
        for wid in list(pair_words.get(pair, ())):
            syms, n = words[wid]
            old = Counter(zip(syms, syms[1:]))
            new_syms = _merge_word(syms, pair)
            new = Counter(zip(new_syms, new_syms[1:]))
            words[wid] = (new_syms, n)
            for p in old.keys() | new.keys():
                d = new.get(p, 0) - old.get(p, 0)
                if new.get(p, 0) == 0:
                    pair_words.get(p, set()).discard(wid)
                elif old.get(p, 0) == 0:
                    pair_words.setdefault(p, set()).add(wid)
                if d:
                    pair_counts[p] += d * n
                    if pair_counts[p] > 0:
                        heapq.heappush(heap, (-pair_counts[p], p))
    return merges


def merges_table(spark, merges: list[tuple[str, str]]) -> DataFrame:
    """The learned vocabulary as a frame (rank, left, right, token) — the
    persistable artifact (write it next to the corpus; `bpe_encode`
    accepts either this frame or the raw list)."""
    rows = [(i, a, b, a + b) for i, (a, b) in enumerate(merges)]
    return spark.createDataFrame(
        rows, "rank long, left string, right string, token string"
    )


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    syms = list(word) + [END]
    while len(syms) > 1:
        best_rank, best_i = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]] | DataFrame,
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Encode each document with the learned merges: lowest-rank pair
    first (the canonical BPE encode order — reproduces the training
    segmentation exactly on training words). Adds ``out_col``
    (array<string> of subword units, ``</w>``-terminated per word).

    Row-local: the ranks dict ships to executors inside the Arrow-batched
    kernel closure (≤ vocab_size entries — broadcast-sized by
    construction); per-word results are memoized per batch (Zipf makes
    the cache hit rate ~the corpus's type/token ratio). Zero shuffle.

    Tokenization parity: the word array is computed by the SAME Catalyst
    :func:`~wingfoil_spark.functions.text.tokens` expression used by
    :func:`word_counts`/:func:`train_bpe` — a Python ``.lower().split()``
    here would diverge on Unicode whitespace (NBSP, U+0085, ideographic
    space) and locale case edges, drifting encode-time words away from
    the trained segmentation (the round-5 ADVICE finding).
    """
    if isinstance(merges, DataFrame):
        merges = [
            (r["left"], r["right"])
            for r in merges.orderBy("rank").select("left", "right").collect()
        ]
    ranks = {p: i for i, p in enumerate(merges)}

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def enc(col):
        cache: dict[str, list[str]] = {}

        def one(words):
            if words is None:
                return []
            out = []
            for w in words:
                got = cache.get(w)
                if got is None:
                    got = cache[w] = _encode_word(w, ranks)
                out.extend(got)
            return out

        return col.map(one)

    return docs.withColumn(out_col, enc(tokens(F.col(text_col))))


def bpe_token_count(
    docs: DataFrame,
    merges: list[tuple[str, str]] | DataFrame,
    text_col: str = "text",
    out_col: str = "n_bpe_tokens",
) -> DataFrame:
    """Per-doc subword count under the learned vocabulary — the token
    budgeting number that actually matches a trained tokenizer (the
    whitespace count under-estimates rare/agglutinated words)."""
    tmp = "__bpe_for_count"
    enc = bpe_encode(docs, merges, text_col=text_col, out_col=tmp)
    return enc.withColumn(out_col, F.size(F.col(tmp))).drop(tmp)
