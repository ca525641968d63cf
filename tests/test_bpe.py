"""BPE tokenizer (functions/bpe.py): training differential vs an
independent brute-force trainer (merge-ALL-occurrences formulation, vs the
library's vocab-rewrite formulation), encode parity with the training
segmentation, determinism, and the Sennrich-paper example."""

from collections import Counter

import pytest
from hypothesis import given, settings, strategies as st

from wingfoil_spark.functions import bpe


# ----------------------------------------------------- independent reference


def ref_train(texts: list[str], n_merges: int):
    """Classic formulation: words as symbol tuples; each round counts all
    adjacent pairs and merges EVERY occurrence of the (count desc, pair
    asc) winner."""
    words = Counter()
    for t in texts:
        for w in t.lower().split():
            words[tuple(list(w) + [bpe.END])] += 1
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for syms, n in words.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        new = Counter()
        for syms, n in words.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and (syms[i], syms[i + 1]) == best:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new[tuple(out)] += n
        words = new
    return merges, words


def ref_encode(word: str, merges) -> list[str]:
    """Merge-all-occurrences by rank priority (the standard encoder)."""
    ranks = {p: i for i, p in enumerate(merges)}
    syms = list(word) + [bpe.END]
    while len(syms) > 1:
        cand = [(ranks[p], p) for p in zip(syms, syms[1:]) if p in ranks]
        if not cand:
            break
        _, best = min(cand)
        out, i = [], 0
        while i < len(syms):
            if i < len(syms) - 1 and (syms[i], syms[i + 1]) == best:
                out.append(syms[i] + syms[i + 1])
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


# ----------------------------------------------------------------- contracts


def test_sennrich_style_example(spark):
    # the canonical toy: 'low'x5 'lower'x2 'newest'x6 'widest'x3 —
    # first merges are (e,s) 9, then (es,t) 9, then (est,</w>) 9
    corpus = ["low " * 5 + "lower " * 2 + "newest " * 6 + "widest " * 3]
    docs = spark.createDataFrame([(t,) for t in corpus], "text string")
    merges = bpe.train_bpe(docs, n_merges=5)
    assert merges[:3] == [("e", "s"), ("es", "t"), ("est", bpe.END)]
    want, _ = ref_train(corpus, 5)
    assert merges == want


def test_train_differential_and_encode_parity(spark):
    corpus = [
        "the cat sat on the mat",
        "the cats sat on the mats",
        "a catalog of cats and mats",
    ]
    docs = spark.createDataFrame([(t,) for t in corpus], "text string")
    merges = bpe.train_bpe(docs, n_merges=20)
    want_merges, want_vocab = ref_train(corpus, 20)
    assert merges == want_merges
    # encode reproduces the trained segmentation on every training word
    enc = bpe.bpe_encode(docs, merges)
    segs = {}
    for r in enc.collect():
        toks = list(r.bpe_tokens)
        for w in r.text.lower().split():
            k = ref_encode(w, merges)
            got = toks[: len(k)]
            toks = toks[len(k):]
            segs[w] = got
            assert got == k, (w, got, k)
    # the trained vocab's own segmentation agrees
    for syms, _ in want_vocab.items():
        word = "".join(syms).replace(bpe.END, "")
        assert segs.get(word, ref_encode(word, merges)) == list(syms)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.lists(
            st.text(alphabet="abc", min_size=1, max_size=6),
            min_size=1,
            max_size=10,
        ).map(" ".join),
        min_size=1,
        max_size=5,
    ),
    st.integers(min_value=0, max_value=12),
)
def test_hypothesis_differential(spark, texts, n_merges):
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    merges = bpe.train_bpe(docs, n_merges=n_merges)
    want, _ = ref_train(texts, n_merges)
    assert merges == want
    rows = bpe.bpe_encode(docs, merges).collect()
    for r in rows:
        want_toks = [s for w in r.text.lower().split() for s in ref_encode(w, merges)]
        assert list(r.bpe_tokens) == want_toks


def test_merges_table_roundtrip(spark):
    corpus = ["ab ab ab ac"]
    docs = spark.createDataFrame([(t,) for t in corpus], "text string")
    merges = bpe.train_bpe(docs, n_merges=3)
    tbl = bpe.merges_table(spark, merges)
    a = bpe.bpe_encode(docs, merges).collect()[0].bpe_tokens
    b = bpe.bpe_encode(docs, tbl).collect()[0].bpe_tokens
    assert list(a) == list(b)
    assert tbl.columns == ["rank", "left", "right", "token"]


def test_token_count_and_nulls(spark):
    docs = spark.createDataFrame(
        [(1, "aa aa bb"), (2, None), (3, "")],
        "doc_id long, text string",
    )
    merges = bpe.train_bpe(docs, n_merges=2)
    got = {
        r.doc_id: r.n_bpe_tokens
        for r in bpe.bpe_token_count(docs, merges).collect()
    }
    assert got[2] == 0 and got[3] == 0 and got[1] > 0


def test_guard(spark):
    docs = spark.createDataFrame([("x",)], "text string")
    with pytest.raises(ValueError):
        bpe.train_bpe(docs, n_merges=-1)
