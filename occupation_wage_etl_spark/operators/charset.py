"""Charset detection + transcoding for the binary-document path — real
corpora are not all UTF-8, and the bytes→text step must pick the right
decode before any text operator runs.

Deterministic detection ladder (every rule exact and replayable —
no confidence scores, no trained models):

1. **BOM**: UTF-8 (EF BB BF), UTF-32 LE/BE (FF FE 00 00 / 00 00 FE FF
   — checked before UTF-16, whose LE BOM is a prefix), UTF-16 LE/BE
   (FF FE / FE FF).
2. **Strict UTF-8 validation**: decodes cleanly AND contains no NUL
   byte → ``utf-8`` (ASCII is a subset; the NUL guard keeps BOM-less
   UTF-16 of ASCII — all NULs, yet "valid" UTF-8 — out of this rule).
3. **Zero-byte pattern**: BOM-less UTF-16 of mostly-ASCII text shows
   NUL at every other position — >= 30% NULs on odd offsets →
   ``utf-16-le``, on even offsets → ``utf-16-be`` (even length only).
4. **Windows-1252 / Latin-1 fallback**: every byte sequence decodes.
   Per the HTML5 rule, ``latin-1``-labeled content IS windows-1252:
   when any byte falls in 0x80–0x9F (the cp1252 smart-quote/euro
   range, C1 controls in true Latin-1 — never intentional text) the
   payload is decoded as ``windows-1252`` (undefined slots 0x81/0x8D/
   0x8F/0x90/0x9D keep their Latin-1 identity, HTML5's behavior);
   otherwise plain ``latin-1``.

Reference analogue: none (the reference reads one UTF-8 page);
LLM-training-data extension surface (SURVEY.md §2 extensions).

Scale shape: scan-side ``mapInPandas`` over the binary column, zero
shuffles — same layout as the PDF/WARC/multimodal tiers.
"""

from __future__ import annotations

import codecs
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

_BOMS: tuple[tuple[bytes, str], ...] = (
    (codecs.BOM_UTF8, "utf-8"),
    (codecs.BOM_UTF32_LE, "utf-32-le"),
    (codecs.BOM_UTF32_BE, "utf-32-be"),
    (codecs.BOM_UTF16_LE, "utf-16-le"),
    (codecs.BOM_UTF16_BE, "utf-16-be"),
)


def detect_charset(data: bytes) -> tuple[str, bool]:
    """(encoding, had_bom) for a byte payload, by the module ladder."""
    for bom, enc in _BOMS:
        if data.startswith(bom):
            return enc, True
    has_nul = b"\x00" in data
    if not has_nul:
        # NUL never appears in text; a payload full of NULs that still
        # "validates" as UTF-8 is BOM-less UTF-16/32, not UTF-8
        try:
            data.decode("utf-8", "strict")
            return "utf-8", False
        except UnicodeDecodeError:
            pass
    n = len(data)
    if n >= 2 and n % 2 == 0:
        odd_nul = sum(1 for i in range(1, n, 2) if data[i] == 0)
        even_nul = sum(1 for i in range(0, n, 2) if data[i] == 0)
        half = n // 2
        if odd_nul * 10 >= half * 3 and odd_nul > even_nul:
            return "utf-16-le", False
        if even_nul * 10 >= half * 3 and even_nul > odd_nul:
            return "utf-16-be", False
    if any(0x80 <= b <= 0x9F for b in data):
        return "windows-1252", False
    return "latin-1", False


# HTML5 windows-1252: the 0x80-0x9F block (undefined slots keep their
# Latin-1/C1 identity, so the translate map only lists defined ones)
_CP1252_MAP = {
    0x80: "€", 0x82: "‚", 0x83: "ƒ", 0x84: "„",
    0x85: "…", 0x86: "†", 0x87: "‡", 0x88: "ˆ",
    0x89: "‰", 0x8a: "Š", 0x8b: "‹", 0x8c: "Œ",
    0x8e: "Ž", 0x91: "‘", 0x92: "’", 0x93: "“",
    0x94: "”", 0x95: "•", 0x96: "–", 0x97: "—",
    0x98: "˜", 0x99: "™", 0x9a: "š", 0x9b: "›",
    0x9c: "œ", 0x9e: "ž", 0x9f: "Ÿ",
}


def transcode(data: bytes) -> tuple[str, str, bool]:
    """(text, encoding, had_bom) — decode by the detected charset, BOM
    stripped; undecodable bytes in the detected non-fallback encodings
    are replaced, never raising on a single bad payload."""
    enc, had_bom = detect_charset(data)
    if had_bom:
        for bom, benc in _BOMS:
            if benc == enc and data.startswith(bom):
                data = data[len(bom) :]
                break
    if enc == "windows-1252":
        # latin-1 decode + the cp1252 0x80-0x9F overlay (HTML5 rule;
        # stdlib cp1252 raises on the five undefined slots)
        return (
            data.decode("latin-1").translate(_CP1252_MAP),
            enc,
            had_bom,
        )
    return data.decode(enc, "replace"), enc, had_bom


def sniff_transcode(
    df: DataFrame,
    bin_col: str = "content",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, encoding, had_bom, n_bytes, n_chars, text) per binary
    payload — the bytes→text entry step of the curation funnel."""
    schema = (
        f"{id_col} long, encoding string, had_bom boolean, "
        "n_bytes long, n_chars int, text string"
    )
    cols = [id_col, "encoding", "had_bom", "n_bytes", "n_chars", "text"]

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for rid, payload in zip(batch[id_col], batch[bin_col]):
                raw = bytes(payload or b"")
                text, enc, had_bom = transcode(raw)
                rows.append(
                    (int(rid), enc, had_bom, len(raw), len(text), text)
                )
            yield pd.DataFrame(rows, columns=cols)

    return df.select(id_col, bin_col).mapInPandas(_run, schema=schema)


def nfc_normalize_table(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Unicode NFC canonical composition — the normalization step that
    makes canonically-EQUIVALENT text (composed é vs e+U+0301, the
    classic copy-paste/OCR divergence) byte-identical before any
    hash-keyed dedup; without it, exact dedup silently splits
    equivalent documents.

    No JVM builtin exists for Unicode normalization in Spark SQL, so
    this is an Arrow-batched Python pass (``unicodedata.normalize`` —
    stdlib, deterministic, the same table DuckDB's nfc_normalize
    implements); it belongs at the bytes→text edge next to
    :func:`sniff_transcode`, ONCE per document, not in any hot
    aggregate.  Returns (id, n_chars_before, n_chars_after, changed,
    text) with ``text`` in NFC."""
    import unicodedata

    schema = (
        f"{id_col} long, n_chars_before int, n_chars_after int, "
        "changed boolean, text string"
    )
    cols = [id_col, "n_chars_before", "n_chars_after", "changed", "text"]

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for rid, t in zip(batch[id_col], batch[text_col]):
                s = str(t or "")
                n = unicodedata.normalize("NFC", s)
                rows.append((int(rid), len(s), len(n), n != s, n))
            yield pd.DataFrame(rows, columns=cols)

    return df.select(id_col, text_col).mapInPandas(_run, schema=schema)
