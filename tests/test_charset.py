"""Charset sniff + transcode (operators/charset.py): BOM ladder,
strict-UTF-8 rule, BOM-less UTF-16 zero-byte heuristic, Latin-1
fallback, and the Spark operator."""

from __future__ import annotations

import codecs

from occupation_wage_etl_spark.operators import charset


def test_bom_ladder():
    s = "café ünïcode — text"
    cases = [
        (codecs.BOM_UTF8 + s.encode("utf-8"), "utf-8", True),
        (codecs.BOM_UTF16_LE + s.encode("utf-16-le"), "utf-16-le", True),
        (codecs.BOM_UTF16_BE + s.encode("utf-16-be"), "utf-16-be", True),
        (codecs.BOM_UTF32_LE + s.encode("utf-32-le"), "utf-32-le", True),
        (codecs.BOM_UTF32_BE + s.encode("utf-32-be"), "utf-32-be", True),
    ]
    for raw, enc, bom in cases:
        assert charset.detect_charset(raw) == (enc, bom), enc
        text, got_enc, got_bom = charset.transcode(raw)
        assert (text, got_enc, got_bom) == (s, enc, bom), enc


def test_utf32le_bom_not_mistaken_for_utf16le():
    # FF FE 00 00: the UTF-32-LE BOM starts with the UTF-16-LE BOM
    raw = codecs.BOM_UTF32_LE + "A".encode("utf-32-le")
    assert charset.detect_charset(raw) == ("utf-32-le", True)


def test_strict_utf8_and_ascii():
    assert charset.detect_charset(b"plain ascii") == ("utf-8", False)
    raw = "héllo 世界".encode("utf-8")
    assert charset.detect_charset(raw) == ("utf-8", False)
    assert charset.transcode(raw)[0] == "héllo 世界"


def test_bomless_utf16_heuristic():
    le = "doc wide text".encode("utf-16-le")
    be = "doc wide text".encode("utf-16-be")
    assert charset.detect_charset(le) == ("utf-16-le", False)
    assert charset.detect_charset(be) == ("utf-16-be", False)
    assert charset.transcode(le)[0] == "doc wide text"
    assert charset.transcode(be)[0] == "doc wide text"


def test_latin1_fallback():
    raw = "café à la carte".encode("latin-1")
    assert charset.detect_charset(raw) == ("latin-1", False)
    assert charset.transcode(raw)[0] == "café à la carte"
    # arbitrary binary junk still lands somewhere deterministic
    assert charset.detect_charset(b"\xff\x00\x01\x02\xfe\x00\x03\x04")[0] in (
        "latin-1", "utf-16-le", "utf-16-be",
    )


def test_empty_payload():
    assert charset.detect_charset(b"") == ("utf-8", False)
    assert charset.transcode(b"") == ("", "utf-8", False)


def test_spark_operator(spark):
    rows = [
        (0, "plain doc".encode("utf-8")),
        (1, codecs.BOM_UTF8 + "bom doc é".encode("utf-8")),
        (2, codecs.BOM_UTF16_LE + "wide é".encode("utf-16-le")),
        (3, "latiné".encode("latin-1")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    got = {r["doc_id"]: r for r in charset.sniff_transcode(df).collect()}
    assert got[0]["encoding"] == "utf-8" and not got[0]["had_bom"]
    assert got[1]["encoding"] == "utf-8" and got[1]["had_bom"]
    assert got[1]["text"] == "bom doc é"
    assert got[1]["n_bytes"] == 3 + len("bom doc é".encode("utf-8"))
    assert got[2]["encoding"] == "utf-16-le" and got[2]["text"] == "wide é"
    assert got[3]["encoding"] == "latin-1" and got[3]["text"] == "latiné"
    assert got[3]["n_chars"] == 6


def test_windows_1252_rung():
    raw = "doc “smart” price €9 — naïve™".encode("cp1252")
    assert charset.detect_charset(raw) == ("windows-1252", False)
    text, enc, bom = charset.transcode(raw)
    assert text == "doc “smart” price €9 — naïve™"
    # the five undefined cp1252 slots keep Latin-1/C1 identity
    text2, enc2, _ = charset.transcode(b"x \x81 y \xe9")
    assert enc2 == "windows-1252" and text2 == "x \x81 y é"
    # high-byte latin-1 WITHOUT the 0x80-0x9F block stays latin-1
    assert charset.detect_charset("café à".encode("latin-1")) == (
        "latin-1", False,
    )


def test_nfc_normalize_table(spark):
    rows = [
        (1, "café composed?"),     # decomposed -> composes
        (2, "café composed?"),            # already NFC
        (3, "plain ascii"),
        (4, "å ring"),              # a + combining ring -> å
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r
        for r in charset.nfc_normalize_table(df).collect()
    }
    assert got[1].text == got[2].text == "café composed?"
    assert got[1].changed and not got[2].changed
    assert (got[1].n_chars_before, got[1].n_chars_after) == (15, 14)
    assert not got[3].changed
    assert got[4].text == "å ring" and got[4].changed
