"""C4-style line-level dedup (functions/dedup.py dedup_lines):
first-occurrence ownership, blank-line immunity, doc rebuild order,
differential vs a brute-force Python reference."""

import pytest
from hypothesis import given, settings, strategies as st

from wingfoil_spark.functions import dedup as dd


def ref_dedup_lines(texts: dict[int, str], min_chars: int = 1):
    seen = set()
    out, removed = {}, {}
    for i in sorted(texts):
        t = texts[i]
        if t is None:
            out[i], removed[i] = "", 0
            continue
        kept = []
        rm = 0
        for ln in t.split("\n"):
            key = ln.strip()
            if len(key) < min_chars:
                kept.append(ln)
                continue
            if key in seen:
                rm += 1
            else:
                seen.add(key)
                kept.append(ln)
        out[i] = "\n".join(kept)
        removed[i] = rm
    return out, removed


def run(spark, texts, min_chars=1):
    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    rows = dd.dedup_lines(df, min_chars=min_chars).collect()
    return (
        {r.doc_id: r.text for r in rows},
        {r.doc_id: r.n_lines_removed for r in rows},
    )


def test_first_occurrence_wins(spark):
    texts = {
        1: "alpha line\nshared boilerplate\nbeta line",
        2: "shared boilerplate\ngamma line",
        3: "delta line\nshared boilerplate",
    }
    got, rm = run(spark, texts)
    assert got[1] == texts[1]  # owner keeps its copy
    assert got[2] == "gamma line" and rm[2] == 1
    assert got[3] == "delta line" and rm[3] == 1


def test_within_doc_repeats(spark):
    texts = {5: "x\nsame\nsame\ny\nsame"}
    got, rm = run(spark, texts)
    assert got[5] == "x\nsame\ny" and rm[5] == 2


def test_blank_lines_survive(spark):
    texts = {1: "a\n\nb\n\n", 2: "c\n\nd\n\n"}
    got, rm = run(spark, texts)
    assert got == texts and rm == {1: 0, 2: 0}


def test_trim_keyed_but_original_preserved(spark):
    texts = {1: "  padded line  ", 2: "padded line"}
    got, rm = run(spark, texts)
    assert got[1] == "  padded line  "  # original bytes, not the trim key
    assert got[2] == "" and rm[2] == 1


def test_min_chars_guard(spark):
    # 1-char lines below the threshold are structure, not dedup keys
    texts = {1: "a\nreal content line", 2: "a\nother content"}
    got, _ = run(spark, texts, min_chars=2)
    assert got[1] == texts[1] and got[2] == texts[2]


@settings(max_examples=10, deadline=None)
@given(
    st.dictionaries(
        st.integers(min_value=0, max_value=20),
        st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd", "", " ", "ee ff"]),
            min_size=0,
            max_size=8,
        ).map("\n".join),
        min_size=1,
        max_size=8,
    )
)
def test_differential(spark, texts):
    got, grm = run(spark, texts)
    want, wrm = ref_dedup_lines(texts)
    assert got == want
    assert grm == wrm
