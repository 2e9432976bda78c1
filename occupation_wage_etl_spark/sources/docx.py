"""DOCX text extraction — WordprocessingML as an edge-ingestion tier.

The second-most-common office format in scraped corpora after PDF.
A .docx is a ZIP around ``word/document.xml`` (ECMA-376 / ISO 29500
WordprocessingML); the text lives in ``<w:p>`` paragraphs of
``<w:r>`` runs holding ``<w:t>`` elements, with ``<w:tab/>`` and
``<w:br/>`` as explicit whitespace.  Pure stdlib (``zipfile`` +
``xml.etree``), the ``sources/excel.py`` posture.

- :func:`extract_docx_text` — one string per paragraph, in document
  order; runs joined (formatting splits one visual string across many
  runs — extraction must reassemble), tabs/breaks mapped, table-cell
  paragraphs included naturally (``w:tbl`` nests ``w:p``).
- :func:`docx_text` — the Spark operator: one row per PARAGRAPH,
  scan-side ``mapInPandas``, zero shuffles (the q257 shape).
- :func:`encode_docx_fixture` — a valid minimal .docx writer
  ([Content_Types].xml, package rels, document.xml), the oracle
  fixture generator: planted paragraphs round-trip through the real
  zip + XML parse, including XML-escaped characters and multi-run
  splits.

Scope bounds: ``word/document.xml`` body only — headers, footers,
footnotes, comments and embedded objects are separate parts and out
of the text tier's scope (documented); tracked-changes deletions
(``w:delText``) are excluded by construction (only ``w:t`` is read).

Reference analogue: none (the reference ingests XLSX/HTML —
``pipeline/load_data.py``); extends the edge-ingestion surface next
to ``sources/excel.py`` / ``sources/pdf.py``.
"""

from __future__ import annotations

import io
import xml.etree.ElementTree as ET
import zipfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

_W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"


def extract_docx_text(data: bytes, max_paragraphs: int = 4096) -> list[str]:
    """Paragraph texts of ``word/document.xml``, document order."""
    try:
        zf = zipfile.ZipFile(io.BytesIO(data))
    except zipfile.BadZipFile as exc:
        raise ValueError(f"corrupt DOCX: not a zip ({exc})")
    try:
        xml_bytes = zf.read("word/document.xml")
    except KeyError:
        raise ValueError("corrupt DOCX: no word/document.xml part")
    try:
        root = ET.fromstring(xml_bytes)
    except ET.ParseError as exc:
        raise ValueError(f"corrupt DOCX: bad XML ({exc})")
    out: list[str] = []
    for p in root.iter(f"{_W}p"):
        parts: list[str] = []
        for el in p.iter():
            if el.tag == f"{_W}t":
                parts.append(el.text or "")
            elif el.tag == f"{_W}tab":
                parts.append("\t")
            elif el.tag == f"{_W}br":
                parts.append("\n")
        out.append("".join(parts))
        if len(out) >= max_paragraphs:
            break
    return out


def docx_text(
    df: DataFrame,
    bin_col: str = "content",
    id_col: str = "doc_id",
    max_paragraphs: int = 4096,
) -> DataFrame:
    """(id, para [1-based], n_chars, text) per paragraph — scan-side
    ``mapInPandas``, zero shuffles; fan-out bounded by
    ``max_paragraphs``."""
    schema = f"{id_col} long, para int, n_chars int, text string"
    cols = [id_col, "para", "n_chars", "text"]

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for rid, payload in zip(batch[id_col], batch[bin_col]):
                texts = extract_docx_text(
                    bytes(payload or b""), max_paragraphs=max_paragraphs
                )
                for k, t in enumerate(texts, start=1):
                    rows.append((int(rid), k, len(t), t))
            yield pd.DataFrame(rows, columns=cols)

    return df.select(id_col, bin_col).mapInPandas(_extract, schema=schema)


# ------------------------------------------------------ fixture writer

_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
    'content-types">'
    '<Default Extension="rels" ContentType="application/vnd.'
    'openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/word/document.xml" ContentType="application/'
    'vnd.openxmlformats-officedocument.wordprocessingml.document.main'
    '+xml"/></Types>'
)

_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
    '2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/officeDocument" '
    'Target="word/document.xml"/></Relationships>'
)


def _xml_escape(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )


def encode_docx_fixture(
    paragraphs: list[str],
    runs_per_paragraph: int = 1,
) -> bytes:
    """A valid minimal .docx: planted paragraph texts, each split
    across ``runs_per_paragraph`` ``<w:r>`` runs (extraction must
    reassemble), with ``\\t`` → ``<w:tab/>`` and ``\\n`` → ``<w:br/>``
    and XML specials escaped."""
    body_parts: list[str] = []
    for text in paragraphs:
        runs: list[str] = []
        n = max(1, runs_per_paragraph)
        step = max(1, (len(text) + n - 1) // n) if text else 1
        chunks = [text[i : i + step] for i in range(0, len(text), step)] or [""]
        for chunk in chunks:
            # run content: literal spans in xml:space-preserving w:t
            # elements, alternating with explicit tab/br elements
            content = ""
            span = ""
            for ch in chunk:
                if ch in ("\t", "\n"):
                    if span:
                        content += (
                            '<w:t xml:space="preserve">'
                            + _xml_escape(span)
                            + "</w:t>"
                        )
                        span = ""
                    content += "<w:tab/>" if ch == "\t" else "<w:br/>"
                else:
                    span += ch
            if span or not content:
                content += (
                    '<w:t xml:space="preserve">'
                    + _xml_escape(span)
                    + "</w:t>"
                )
            runs.append("<w:r>" + content + "</w:r>")
        body_parts.append("<w:p>" + "".join(runs) + "</w:p>")
    document = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        "<w:document xmlns:w=\"http://schemas.openxmlformats.org/"
        'wordprocessingml/2006/main"><w:body>'
        + "".join(body_parts)
        + "</w:body></w:document>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", _CONTENT_TYPES)
        zf.writestr("_rels/.rels", _RELS)
        zf.writestr("word/document.xml", document)
    return buf.getvalue()
