"""DOCX text extraction (sources/docx.py)."""

from __future__ import annotations

import io
import zipfile

import pytest

from occupation_wage_etl_spark.sources import docx


def test_round_trip_single_and_multi_run():
    paras = [
        "Hello & <World>",
        "tab\there",
        "line\nbreak",
        "",
        "a longer paragraph body that splits across several runs",
    ]
    for runs in (1, 2, 5):
        data = docx.encode_docx_fixture(paras, runs_per_paragraph=runs)
        assert docx.extract_docx_text(data) == paras, runs


def test_xml_escaping_and_whitespace_preserve():
    paras = ["a & b", "c < d > e", "  leading and trailing  "]
    data = docx.encode_docx_fixture(paras)
    assert docx.extract_docx_text(data) == paras


def test_table_paragraphs_included():
    # hand-build a document with a w:tbl containing cell paragraphs
    w = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
    document = (
        f'<w:document xmlns:w="{w}"><w:body>'
        "<w:p><w:r><w:t>before</w:t></w:r></w:p>"
        "<w:tbl><w:tr><w:tc>"
        "<w:p><w:r><w:t>cell one</w:t></w:r></w:p>"
        "</w:tc><w:tc>"
        "<w:p><w:r><w:t>cell two</w:t></w:r></w:p>"
        "</w:tc></w:tr></w:tbl>"
        "<w:p><w:r><w:t>after</w:t></w:r></w:p>"
        "</w:body></w:document>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("word/document.xml", document)
    got = docx.extract_docx_text(buf.getvalue())
    assert got == ["before", "cell one", "cell two", "after"]


def test_deltext_excluded():
    # tracked-change deletions use w:delText — must NOT be extracted
    w = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
    document = (
        f'<w:document xmlns:w="{w}"><w:body>'
        "<w:p><w:r><w:t>kept</w:t></w:r>"
        "<w:r><w:delText>deleted</w:delText></w:r></w:p>"
        "</w:body></w:document>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("word/document.xml", document)
    assert docx.extract_docx_text(buf.getvalue()) == ["kept"]


def test_scope_errors():
    with pytest.raises(ValueError, match="not a zip"):
        docx.extract_docx_text(b"PK garbage that is not a zip")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("other.xml", "<x/>")
    with pytest.raises(ValueError, match="document.xml"):
        docx.extract_docx_text(buf.getvalue())
    buf2 = io.BytesIO()
    with zipfile.ZipFile(buf2, "w") as zf:
        zf.writestr("word/document.xml", "<w:document not closed")
    with pytest.raises(ValueError, match="bad XML"):
        docx.extract_docx_text(buf2.getvalue())


def test_max_paragraphs_cap():
    data = docx.encode_docx_fixture([f"p{i}" for i in range(50)])
    assert len(docx.extract_docx_text(data, max_paragraphs=7)) == 7


def test_spark_operator(spark):
    rows = [
        (did, docx.encode_docx_fixture(
            [f"doc {did} para {k}" for k in range(1 + did % 3)],
            runs_per_paragraph=1 + did % 3,
        ))
        for did in range(6)
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    got = docx.docx_text(df).orderBy("doc_id", "para").collect()
    assert len(got) == sum(1 + d % 3 for d in range(6))
    assert got[0].text == "doc 0 para 0" and got[0].n_chars == 12


def test_parts_walk_headers_footers_notes():
    data = docx.encode_docx_fixture(
        ["body one", "body two"],
        runs_per_paragraph=2,
        headers=[["head A"], ["head B line", "head B two"]],
        footers=[["foot 1"]],
        footnotes=[["note one"], ["note two\twith tab"]],
        endnotes=[["end one"]],
    )
    parts = docx.extract_docx_parts(data)
    assert parts == [
        ("document", 0, 1, "body one"),
        ("document", 0, 2, "body two"),
        ("header", 1, 1, "head A"),
        ("header", 2, 1, "head B line"),
        ("header", 2, 2, "head B two"),
        ("footer", 1, 1, "foot 1"),
        ("footnote", 1, 1, "note one"),
        ("footnote", 2, 1, "note two\twith tab"),
        ("endnote", 1, 1, "end one"),
    ]
    # separator/continuation pseudo-notes carry a <w:p> but no text —
    # they must be skipped by w:type, not by emptiness
    assert not any(p[0] == "footnote" and p[1] <= 0 for p in parts)
    # body-only extraction unchanged
    assert docx.extract_docx_text(data) == ["body one", "body two"]


def test_parts_walk_body_only_document():
    data = docx.encode_docx_fixture(["just body"])
    assert docx.extract_docx_parts(data) == [
        ("document", 0, 1, "just body")
    ]


def test_parts_spark_operator(spark):
    rows = [
        (did, docx.encode_docx_fixture(
            [f"doc {did} body"],
            headers=[[f"doc {did} header"]],
            footnotes=[[f"doc {did} note {k}"] for k in range(1 + did % 2)],
        ))
        for did in range(4)
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    got = docx.docx_parts_text(df).collect()
    by_key = {(r.doc_id, r.part, r.part_idx): r.text for r in got}
    assert by_key[(3, "document", 0)] == "doc 3 body"
    assert by_key[(3, "header", 1)] == "doc 3 header"
    assert by_key[(1, "footnote", 2)] == "doc 1 note 1"
    assert len(got) == sum(1 + 1 + 1 + d % 2 for d in range(4))
