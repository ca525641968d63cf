"""Text-analysis unit pins (functions/text.py) on real multilingual
samples — the graded text_stats query exercises exactness on the
synthetic corpus (whose text is English-like under every lang label);
this pins that the heuristics DISCRIMINATE on genuinely distinct text."""

import pyspark.sql.functions as F

from wingfoil_spark.functions import text as tx


def _guess(spark, s):
    df = spark.createDataFrame([(s,)], "text string")
    return df.select(tx.lang_id(F.col("text")).alias("g")).collect()[0].g


def test_lang_id_discriminates_four_languages(spark):
    assert _guess(spark, "the cat sat on the mat and it is a test for the app") == "en"
    assert _guess(spark, "der hund ist ein tier und die katze ist mit dem kind") == "de"
    assert _guess(spark, "le chat est dans la maison et les enfants sont pour une fête du jour") == "fr"
    assert _guess(spark, "los gatos y las casas que son para una fiesta es por el día con amigos") == "es"


def test_lang_id_tie_precedence_en_first(spark):
    # zero stopwords anywhere → all counts tie at 0 → 'en' wins the
    # documented en > de > fr > es precedence
    assert _guess(spark, "zzz qqq xxx") == "en"


def test_quality_score_orders_good_above_junk(spark):
    good = "the quick brown fox jumps over the lazy dog and it is a fine day in the park " * 3
    junk = "@@@ ### !!! $$$ %%% ^^^ &&&"
    df = spark.createDataFrame([(1, good), (2, junk)], "id long, text string")
    rows = {r.id: r.q for r in df.select("id", tx.quality_score(F.col("text")).alias("q")).collect()}
    assert rows[1] > rows[2]
    assert 0.0 <= rows[2] < rows[1] <= 1.0


def test_token_count_and_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(1, "  Hello   World "), (2, "hello world")], "id long, text string"
    )
    out = {
        r.id: (r.n, r.fp)
        for r in df.select(
            "id",
            tx.token_count(F.col("text")).alias("n"),
            tx.fingerprint(F.col("text")).alias("fp"),
        ).collect()
    }
    assert out[1][0] == out[2][0] == 2
    # whitespace + case normalize to the same fingerprint
    assert out[1][1] == out[2][1]
