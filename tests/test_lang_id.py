"""Language-ID: the script rung (functions.text.script_lang) and the
operator composition (text_analysis.lang_id_table script_rung=True) —
the q299 audit's unit-level counterpart."""

from __future__ import annotations

from pyspark.sql import functions as F

from occupation_wage_etl_spark.functions import text as T
from occupation_wage_etl_spark.operators import text_analysis


def test_script_lang(spark):
    cases = [
        (0, "的是不了在人有我他这", "zh"),
        (1, "これは日本語のテキストです", "ja"),      # kana beats kanji
        (2, "日本語テスト", "ja"),                    # mixed kanji+kana
        (3, "안녕하세요 세계", "ko"),
        (4, "привет мир это текст", "ru"),
        (5, "مرحبا بالعالم", "ar"),
        (6, "Γειά σου Κόσμε", "el"),
        (7, "שלום עולם", "he"),
        (8, "नमस्ते दुनिया", "hi"),
        (9, "สวัสดีชาวโลก", "th"),
        (10, "plain latin text only", None),          # falls through
        (11, "mostly latin текст here today ok", None),  # <30% block
        (12, "", None),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t, _ in cases], "i long, t string"
    )
    got = {
        r.i: r.s
        for r in df.select(
            "i", T.script_lang(F.col("t")).alias("s")
        ).collect()
    }
    for i, t, want in cases:
        assert got[i] == want, (t, got[i], want)


def test_lang_id_table_script_rung(spark):
    rows = [
        (0, "the cat and the dog is in the house"),  # en via stopwords
        (1, "的是不了在人 中文"),                      # zh via script
        (2, "le monde"),                              # tie -> und
        (3, "de la"),                                 # short-text es pick
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.pred_lang
        for r in text_analysis.lang_id_table(
            df, script_rung=True
        ).collect()
    }
    assert got == {0: "en", 1: "zh", 2: "und", 3: "es"}
    # default (script_rung=False) keeps the q18-compatible semantics:
    # non-Latin text has zero stopword hits -> 'und'
    got2 = {
        r.doc_id: r.pred_lang
        for r in text_analysis.lang_id_table(df).collect()
    }
    assert got2[1] == "und" and got2[0] == "en"
