"""Substring-level (passage) dedup — the ExactSubstr recipe (Lee et al.
2022) via the duplicated-n-gram formulation (functions/dedup.py
duplicate_spans / scrub_duplicate_spans).

Differential model: a brute-force Python reference (dict of L-gram counts
over all docs → duplicated start positions → interval merge) run over the
same corpus. Hypothesis drives small-vocab corpora where collisions are
dense; fixed cases pin the planted-passage, internal-repetition,
adjacency-merge, and clean-corpus contracts.
"""

from collections import Counter

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from wingfoil_spark.functions import dedup as dd


# ---------------------------------------------------------- python reference


def ref_spans(texts: dict[int, str], L: int) -> dict[int, list[tuple[int, int]]]:
    """Brute-force: count every L-gram across the corpus (all occurrences,
    including repeats inside one doc), then merge duplicated start
    positions into maximal [start, end) spans per doc (gap > L breaks)."""
    toks = {i: t.lower().split() for i, t in texts.items()}
    counts: Counter = Counter()
    for tk in toks.values():
        for p in range(len(tk) - L + 1):
            counts[" ".join(tk[p : p + L])] += 1
    out: dict[int, list[tuple[int, int]]] = {}
    for i, tk in toks.items():
        pos = [
            p
            for p in range(len(tk) - L + 1)
            if counts[" ".join(tk[p : p + L])] > 1
        ]
        spans = []
        for p in pos:
            if spans and p - (spans[-1][1] - L) <= L:
                spans[-1] = (spans[-1][0], max(spans[-1][1], p + L))
            else:
                spans.append((p, p + L))
        if spans:
            out[i] = spans
    return out


def ref_scrub(texts: dict[int, str], L: int) -> dict[int, str]:
    spans = ref_spans(texts, L)
    out = {}
    for i, t in texts.items():
        if i not in spans:
            out[i] = t
            continue
        tk = t.lower().split()
        keep = [
            w
            for p, w in enumerate(tk)
            if not any(s <= p < e for s, e in spans[i])
        ]
        out[i] = " ".join(keep)
    return out


def spark_spans(spark, texts: dict[int, str], L: int):
    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    rows = dd.duplicate_spans(df, min_len=L).collect()
    got: dict[int, list[tuple[int, int]]] = {}
    for r in sorted(rows, key=lambda r: (r.doc_id, r.span_start)):
        got.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
        assert r.span_tokens == r.span_end - r.span_start
    return got


# ----------------------------------------------------------------- contracts


def test_planted_cross_doc_passage(spark):
    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    texts = {
        1: f"u1 u2 u3 {shared} v1 v2 v3",
        2: f"w1 {shared} x1 x2 x3 x4 x5",
        3: "y1 y2 y3 y4 y5 y6 y7 y8 y9 y10 y11 y12 y13",
    }
    got = spark_spans(spark, texts, 8)
    # the 10-token shared passage starts at token 3 in doc 1, token 1 in doc 2
    assert got == {1: [(3, 13)], 2: [(1, 11)]}


def test_internal_repetition_counts(spark):
    body = "p q r s t u v w"
    texts = {7: f"a1 {body} b1 b2 b3 {body} c1"}
    got = spark_spans(spark, texts, 8)
    assert got == {7: [(1, 9), (12, 20)]}


def test_unique_corpus_empty(spark):
    texts = {i: " ".join(f"t{i}_{j}" for j in range(30)) for i in range(5)}
    assert spark_spans(spark, texts, 5) == {}


def test_adjacent_windows_merge(spark):
    # two independent duplicated 4-gram windows, starts L apart → one span
    texts = {
        1: "a b c d w x y z junk1 junk2 junk3",
        2: "a b c d junk4 junk5 junk6 junk7 junk8",
        3: "w x y z junk9 junkA junkB junkC junkD",
    }
    got = spark_spans(spark, texts, 4)
    assert got[1] == [(0, 8)]  # [0,4) ∪ [4,8) coalesced
    assert got[2] == [(0, 4)] and got[3] == [(0, 4)]


def test_min_len_guard(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        dd.duplicate_spans(df, min_len=0)


def test_short_docs_no_grams(spark):
    # docs shorter than min_len yield nothing (and don't abort under ANSI)
    texts = {1: "a b", 2: "a b", 3: ""}
    assert spark_spans(spark, texts, 5) == {}


# -------------------------------------------------------------- differential


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from("abcde"), min_size=0, max_size=40).map(" ".join),
        min_size=1,
        max_size=12,
    ),
    st.integers(min_value=2, max_value=6),
)
def test_differential_vs_reference(spark, docs, L):
    texts = dict(enumerate(docs))
    assert spark_spans(spark, texts, L) == ref_spans(texts, L)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from("abcd"), min_size=0, max_size=30).map(" ".join),
        min_size=1,
        max_size=8,
    ),
    st.integers(min_value=2, max_value=5),
)
def test_scrub_differential(spark, docs, L):
    texts = dict(enumerate(docs))
    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    got = {
        r.doc_id: r.text
        for r in dd.scrub_duplicate_spans(df, min_len=L).collect()
    }
    assert got == ref_scrub(texts, L)


def test_scrub_clean_doc_verbatim(spark):
    # doc with no duplicated span keeps text bit-for-bit (case/whitespace)
    texts = {1: "  Mixed CASE   spacing preserved  ", 2: "q r s t u v"}
    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    got = {
        r.doc_id: r.text
        for r in dd.scrub_duplicate_spans(df, min_len=3).collect()
    }
    assert got == texts


def test_scrub_out_col_keeps_original(spark):
    shared = "m n o p q"
    df = spark.createDataFrame(
        [(1, f"a {shared}"), (2, f"b {shared}")], "doc_id long, text string"
    )
    rows = dd.scrub_duplicate_spans(df, min_len=5, out_col="clean").collect()
    got = {r.doc_id: (r.text, r.clean) for r in rows}
    assert got == {1: (f"a {shared}", "a"), 2: (f"b {shared}", "b")}


# ------------------------------------------------------------------ the plan


def test_plan_no_cartesian_no_collect(spark):
    df = spark.range(0, 50).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ", *[F.concat(F.lit("w"), (F.col("id") * 31 + i) % 7) for i in range(20)]
        ).alias("text"),
    )
    plan = dd.duplicate_spans(df, min_len=4)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_hot_gram_planted(spark):
    # Skew posture (VERDICT r5 #2): one 8-token boilerplate span repeated
    # 10^4 times across the corpus must dedup correctly — and must go
    # through the two-level groupBy election, never an unsplittable
    # count-window over the gram hash.
    boiler = "lorem ipsum dolor sit amet consectetur adipiscing elit"
    df = spark.range(0, 10_000).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit(boiler + " "),
            F.concat_ws(
                " ",
                *[
                    F.concat(F.lit("u"), F.col("id") * 97 + i)
                    for i in range(6)
                ],
            ),
        ).alias("text"),
    )
    spans = dd.duplicate_spans(df, min_len=8)
    rows = spans.collect()
    # every doc flags exactly the boilerplate prefix [0, 8)
    assert len(rows) == 10_000
    assert all(
        (r.span_start, r.span_end, r.span_tokens) == (0, 8, 8) for r in rows
    )


def test_gram_count_partial_aggregation_plan(spark):
    # The election must partial-aggregate map-side (HashAggregate with
    # partial_count before the exchange) and must NOT plan a window over
    # the gram hash — a window partition cannot be split by AQE, so a hot
    # gram would become a single multi-GB task at 100 TB.
    df = spark.range(0, 50).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ", *[F.concat(F.lit("w"), (F.col("id") * 31 + i) % 7) for i in range(20)]
        ).alias("text"),
    )
    plan = dd.duplicate_spans(df, min_len=4)._jdf.queryExecution().executedPlan().toString()
    assert "partial_count" in plan, plan
    # exactly one Window remains: the per-doc gaps-and-islands merge
    import re

    wins = re.findall(r"Window \[[^\]]*\], \[([^\]]*)\]", plan)
    assert all("gh" not in w for w in wins), plan


def test_dedup_lines_partial_aggregation_plan(spark):
    df = spark.createDataFrame(
        [(1, "a\nb\nc"), (2, "b\nd")], "doc_id long, text string"
    )
    plan = (
        dd.dedup_lines(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "partial_" in plan, plan
    import re

    wins = re.findall(r"Window \[[^\]]*\], \[([^\]]*)\]", plan)
    assert all("__lh" not in w for w in wins), plan
