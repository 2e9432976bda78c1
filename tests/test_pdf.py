"""PDF text extraction (sources/pdf.py): object grammar, string
escapes, Flate streams, Pages-tree order, content-stream operators,
and the documented scope bounds."""

from __future__ import annotations

import zlib

import pytest

from occupation_wage_etl_spark.sources import pdf


def test_round_trip_plain_and_compressed():
    pages = [
        ["Hello (World)", "back\\slash", "third line"],
        ["page two", "x" * 40],
        ["last"],
    ]
    data = pdf.encode_pdf_fixture(pages, compress_page=lambda p: p % 2 == 1)
    texts = pdf.extract_pdf_text(data)
    assert texts == ["\n".join(p) for p in pages]


def test_hex_strings_and_tj_arrays():
    pages = [["alpha", "beta", "gamma", "delta"]]
    d_hex = pdf.encode_pdf_fixture(pages, hex_lines=True)
    assert pdf.extract_pdf_text(d_hex) == ["alpha\nbeta\ngamma\ndelta"]
    d_tj = pdf.encode_pdf_fixture(pages, use_tj_array_every=2)
    # kern numbers in TJ arrays must not alter the text
    assert pdf.extract_pdf_text(d_tj) == ["alpha\nbeta\ngamma\ndelta"]


def test_escape_grammar():
    # octal escapes, nested parens via escapes, high Latin-1, tabs
    pages = [["caf\xe9 \t (nested (deep)) \\ end"]]
    data = pdf.encode_pdf_fixture(pages)
    assert pdf.extract_pdf_text(data) == pages[0]


def test_literal_string_parser_directly():
    s, i = pdf._parse_literal_string(b"(a\\(b\\)c\\\\d\\101\\n)", 0)
    assert s == b"a(b)c\\dA\n"
    # nested unescaped parens are legal
    s, _ = pdf._parse_literal_string(b"(a(b(c))d)", 0)
    assert s == b"a(b(c))d"
    # line continuation
    s, _ = pdf._parse_literal_string(b"(ab\\\ncd)", 0)
    assert s == b"abcd"
    with pytest.raises(ValueError, match="unterminated"):
        pdf._parse_literal_string(b"(abc", 0)


def test_hex_string_odd_digit_padded():
    s, _ = pdf._parse_hex_string(b"<41424>", 0)
    assert s == b"AB@"  # trailing 4 -> 40 hex


def test_pages_tree_order_vs_scan_order():
    # builder emits page objects in order; extractor must follow the
    # /Kids list of the Pages tree, not numeric scan order — verify by
    # checking each page's text lands at its tree position.
    pages = [[f"page {i}"] for i in range(5)]
    data = pdf.encode_pdf_fixture(pages)
    assert pdf.extract_pdf_text(data) == [f"page {i}" for i in range(5)]


def test_multiple_content_lines_newlines():
    data = pdf.encode_pdf_fixture([["a", "b", "c"]])
    assert pdf.extract_pdf_text(data) == ["a\nb\nc"]


def test_indirect_stream_length_resolved_two_pass():
    # writers that stream data of unknown size put the /Length object
    # AFTER the stream — extraction must resolve it, not guess extents
    pages = [["indirect one", "line two"], ["page 2"]]
    data = pdf.encode_pdf_fixture(
        pages, compress_page=lambda p: True, indirect_length=True
    )
    assert b"/Length 5 0 R" in data or b" 0 R /Filter" in data
    assert pdf.extract_pdf_text(data) == ["\n".join(p) for p in pages]


def test_indirect_length_stream_containing_endstream_token():
    # the endstream-scan fallback would truncate this stream: its body
    # CONTAINS the literal token and ends in newline bytes.  With an
    # indirect /Length (resolved after the full index pass) the exact
    # extent must win over the heuristic.
    body = b"BT /F1 12 Tf 72 720 Td\n(okendstream\\nok) Tj\nET\n\n"
    raw = bytearray(b"%PDF-1.4\n")
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        b"<< /Length 5 0 R >>\nstream\n" + body + b"\nendstream",
        str(len(body)).encode(),
    ]
    offsets = []
    for num, b_ in enumerate(objs, start=1):
        offsets.append(len(raw))
        raw += f"{num} 0 obj\n".encode() + b_ + b"\nendobj\n"
    xref_off = len(raw)
    raw += b"xref\n0 6\n0000000000 65535 f \n"
    for off in offsets:
        raw += f"{off:010d} 00000 n \n".encode()
    raw += (
        f"trailer\n<< /Size 6 /Root 1 0 R >>\nstartxref\n{xref_off}\n%%EOF\n"
    ).encode()
    texts = pdf.extract_pdf_text(bytes(raw))
    assert texts == ["okendstream\nok"]


def test_cid_font_tounicode_round_trip():
    # composite Type0/Identity-H font: codes are NOT char codes; text
    # is recoverable only through the /ToUnicode CMap (bfchar + bfrange
    # array halves) — across every container layout
    pages = [["Hello (World) fi", "line 2 café"], ["page two"]]
    for opts in (
        dict(cid_font=True),
        dict(cid_font=True, use_tj_array_every=2),
        dict(cid_font=True, compress_page=lambda p: True),
        dict(cid_font=True, use_objstm=True),
        dict(cid_font=True, indirect_length=True, indirect_kids=True),
    ):
        data = pdf.encode_pdf_fixture(pages, **opts)
        assert pdf.extract_pdf_text(data) == [
            "\n".join(p) for p in pages
        ], opts
    # raw codes must not leak: without the CMap the hex shows garbage
    data = pdf.encode_pdf_fixture(pages, cid_font=True)
    assert b"Hello" not in data


def test_tounicode_cmap_forms_directly():
    w, m = pdf._parse_tounicode_cmap(
        b"1 begincodespacerange <0000> <FFFF> endcodespacerange\n"
        b"2 beginbfchar <0100> <00660069> <0101> <0041> endbfchar\n"
        b"1 beginbfrange <0041> <0043> <0061> endbfrange\n"
        b"1 beginbfrange <0200> <0201> [<0058> <0059>] endbfrange"
    )
    assert w == 2
    assert m[0x0100] == "fi"  # multi-char (ligature) dst
    assert m[0x0101] == "A"
    # <lo> <hi> <dstStart>: increments the last UTF-16 unit
    assert (m[0x41], m[0x42], m[0x43]) == ("a", "b", "c")
    assert (m[0x200], m[0x201]) == ("X", "Y")
    # 1-byte codespace
    w1, m1 = pdf._parse_tounicode_cmap(
        b"1 begincodespacerange <00> <FF> endcodespacerange\n"
        b"1 beginbfchar <41> <005A> endbfchar"
    )
    assert w1 == 1 and m1[0x41] == "Z"


def test_resources_inherited_from_pages_node():
    # §7.7.3.4: /Resources (and thus the font table) may live on an
    # ancestor Pages node; the extractor must walk /Parent to find it
    cmap = (
        b"1 begincodespacerange <0000> <FFFF> endcodespacerange\n"
        b"1 beginbfrange <0100> <0102> <0061> endbfrange"
    )
    content = b"BT /F9 12 Tf 72 720 Td\n<010001010102> Tj\nET"
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 "
        b"/Resources << /Font << /F9 6 0 R >> >> >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        b"<< /Length " + str(len(content)).encode()
        + b" >>\nstream\n" + content + b"\nendstream",
        b"<< /Length " + str(len(cmap)).encode()
        + b" >>\nstream\n" + cmap + b"\nendstream",
        b"<< /Type /Font /Subtype /Type0 /BaseFont /S "
        b"/Encoding /Identity-H /ToUnicode 5 0 R >>",
    ]
    raw = bytearray(b"%PDF-1.4\n")
    offsets = []
    for num, b_ in enumerate(objs, start=1):
        offsets.append(len(raw))
        raw += f"{num} 0 obj\n".encode() + b_ + b"\nendobj\n"
    xref_off = len(raw)
    raw += b"xref\n0 7\n0000000000 65535 f \n"
    for off in offsets:
        raw += f"{off:010d} 00000 n \n".encode()
    raw += (
        f"trailer\n<< /Size 7 /Root 1 0 R >>\nstartxref\n{xref_off}"
        "\n%%EOF\n"
    ).encode()
    assert pdf.extract_pdf_text(bytes(raw)) == ["abc"]


def test_indirect_kids_array_resolved():
    # /Kids given as an indirect reference to the array: the tree walk
    # must resolve it — a silent partial order would drop every page
    pages = [[f"page {i}"] for i in range(4)]
    data = pdf.encode_pdf_fixture(pages, indirect_kids=True)
    assert pdf.extract_pdf_text(data) == [f"page {i}" for i in range(4)]
    # combined: indirect kids + indirect stream lengths
    data2 = pdf.encode_pdf_fixture(
        pages, indirect_kids=True, indirect_length=True
    )
    assert pdf.extract_pdf_text(data2) == [f"page {i}" for i in range(4)]


def test_scope_bounds():
    with pytest.raises(ValueError, match="header"):
        pdf.extract_pdf_text(b"GIF89a not a pdf")
    data = pdf.encode_pdf_fixture([["x"]])
    # a stray "/Encrypt" COMMENT no longer false-positives (the trailer
    # dict is parsed now); the document stays readable
    assert pdf.extract_pdf_text(data + b"\n%/Encrypt\n") == ["x"]
    # … but an xref-stream doc mentioning /Encrypt (no classic trailer
    # to prove otherwise) still raises the conservative scope error
    objstm = pdf.encode_pdf_fixture([["x"]], use_objstm=True)
    with pytest.raises(ValueError, match="encrypted"):
        pdf.extract_pdf_text(objstm + b"\n%/Encrypt\n")
    # unsupported filter raises with the filter named
    bad = data.replace(b"<< /Length", b"<< /Filter /DCTDecode /Length")
    with pytest.raises(ValueError, match="DCTDecode"):
        pdf.extract_pdf_text(bad)


def test_corrupt_stream_raises():
    pages = [["hello compressed"]]
    data = pdf.encode_pdf_fixture(pages, compress_page=lambda p: True)
    # truncate the Flate payload: find the stream and cut bytes
    i = data.find(b"stream\n") + 7
    j = data.find(b"\nendstream", i)
    corrupted = data[: i + 3] + data[j:]
    # /Length now overruns into 'endstream' -> either bad Flate or
    # structural error; both must raise ValueError
    with pytest.raises(ValueError):
        pdf.extract_pdf_text(corrupted)


def test_max_pages_cap():
    pages = [[f"p{i}"] for i in range(10)]
    data = pdf.encode_pdf_fixture(pages)
    assert len(pdf.extract_pdf_text(data, max_pages=3)) == 3


def test_external_shape_sanity():
    # xref offsets in the trailer must point at actual object headers
    data = pdf.encode_pdf_fixture([["a"], ["b"]])
    xref_at = int(data.rsplit(b"startxref\n", 1)[1].split(b"\n")[0])
    assert data[xref_at : xref_at + 4] == b"xref"
    # each xref entry points at "N 0 obj"
    body = data[xref_at:].split(b"trailer")[0]
    entries = body.split(b"\n")[3:]  # skip header + free entry
    for num, line in enumerate(e for e in entries if e.strip()):
        off = int(line.split(b" ")[0])
        assert data[off : off + len(f"{num + 1} 0 obj")] == (
            f"{num + 1} 0 obj".encode()
        )


def test_spark_operator(spark):
    import pandas as pd

    rows = []
    for did in range(6):
        pages = [
            [f"doc {did} line {k}" for k in range(1 + did % 3)]
            for _p in range(1 + did % 2)
        ]
        rows.append((did, pdf.encode_pdf_fixture(
            pages, compress_page=lambda p: p % 2 == 0
        )))
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    got = pdf.pdf_text(df).orderBy("doc_id", "page").collect()
    assert len(got) == sum(1 + d % 2 for d in range(6))
    r0 = got[0]
    assert r0.page == 1 and r0.text == "doc 0 line 0"
    assert all(r.n_chars == len(r.text) for r in got)


def test_ascii_filters_and_chain():
    pages = [["hex page"], ["a85 page"], ["chained page"], ["plain"]]
    modes = {0: "ahx", 1: "a85", 2: "a85flate", 3: None}
    data = pdf.encode_pdf_fixture(
        pages, compress_page=lambda p: modes[p]
    )
    assert pdf.extract_pdf_text(data) == [
        "hex page", "a85 page", "chained page", "plain",
    ]


def test_unsupported_filter_names_supported_set():
    data = pdf.encode_pdf_fixture([["x"]])
    bad = data.replace(b"<< /Length", b"<< /Filter /JBIG2Decode /Length")
    with pytest.raises(ValueError, match="JBIG2Decode"):
        pdf.extract_pdf_text(bad)
    # LZW is now supported, but plain data is not a valid LZW stream
    bad2 = data.replace(b"<< /Length", b"<< /Filter /LZWDecode /Length")
    with pytest.raises(ValueError, match="LZW"):
        pdf.extract_pdf_text(bad2)


def test_lzw_filter_and_vector():
    # hand-traced vector: 'AAAA' -> 9-bit codes 256,65,258,65,257
    enc = pdf._lzw_encode(b"AAAA")
    bits = "".join(f"{b:08b}" for b in enc)
    codes = [int(bits[i : i + 9], 2) for i in range(0, 45, 9)]
    assert codes == [256, 65, 258, 65, 257]
    assert pdf._lzw_decode(enc) == b"AAAA"
    # width growth through 10/11/12 bits and table-full Clear restarts
    import random as _r

    rng = _r.Random(7)
    data = bytes(rng.choice(b"abcdefgh") for _ in range(50000))
    assert pdf._lzw_decode(pdf._lzw_encode(data)) == data
    d = pdf.encode_pdf_fixture(
        [["lzw page", "two"]], compress_page=lambda p: "lzw"
    )
    assert pdf.extract_pdf_text(d) == ["lzw page\ntwo"]


def test_objstm_xref_stream_layout():
    pages = [["obj stream page"], ["second"]]
    data = pdf.encode_pdf_fixture(pages, use_objstm=True)
    assert data.startswith(b"%PDF-1.5")
    assert b"/ObjStm" in data and b"/XRef" in data
    # the catalog/page dicts must NOT appear as top-level objects
    assert b"/Type /Catalog" not in data.split(b"/ObjStm")[0]
    assert pdf.extract_pdf_text(data) == ["obj stream page", "second"]
    # mixed with filters
    d2 = pdf.encode_pdf_fixture(
        pages, compress_page=lambda p: ["flate", "lzw"][p], use_objstm=True
    )
    assert pdf.extract_pdf_text(d2) == ["obj stream page", "second"]


def test_simple_font_encodings():
    """/WinAnsiEncoding, /MacRomanEncoding, and /BaseEncoding +
    /Differences dicts decode byte-identically to the planted text
    (the non-ToUnicode half of real PDFs)."""
    pages = [["café — “smart” €9", "naïve résumé"]]
    for enc in ("WinAnsiEncoding", "MacRomanEncoding"):
        d = pdf.encode_pdf_fixture(pages, simple_encoding=enc)
        assert pdf.extract_pdf_text(d) == [
            "café — “smart” €9\nnaïve résumé"
        ], enc
    # Differences remap: AGL names + the algorithmic uniXXXX rule
    d3 = pdf.encode_pdf_fixture(
        [["price €5 café ł"]],
        simple_encoding="WinAnsiEncoding",
        differences={128: "Euro", 129: "eacute", 130: "uni0142"},
    )
    assert pdf.extract_pdf_text(d3) == ["price €5 café ł"]
    # encoding survives hex strings and kerned TJ arrays
    d4 = pdf.encode_pdf_fixture(
        [["über A", "öl B", "çi C"]],
        simple_encoding="WinAnsiEncoding",
        hex_lines=True,
        use_tj_array_every=3,
    )
    assert pdf.extract_pdf_text(d4) == ["über A\nöl B\nçi C"]
    # unknown glyph name -> U+FFFD, never a raise
    d5 = pdf.encode_pdf_fixture(
        [["x�y"]],
        simple_encoding="WinAnsiEncoding",
        differences={1: "notarealglyphname"},
    )
    assert pdf.extract_pdf_text(d5) == ["x�y"]
    # a font with NO /Encoding keeps the documented Latin-1 path
    d6 = pdf.encode_pdf_fixture([["plain élan"]])
    assert pdf.extract_pdf_text(d6) == ["plain élan"]


def test_rc4_encrypted_roundtrip():
    """Standard security handler (RC4 V1/R2 and V2/R3, empty user
    password): real /O//U entries, per-object stream decryption."""
    pages = [["secret line one", "café £5"], ["page two text"]]
    for mode in ("rc4-40", "rc4-128"):
        d = pdf.encode_pdf_fixture(
            pages, compress_page=lambda p: p == 0, encrypt=mode
        )
        assert b"/Encrypt" in d
        assert pdf.extract_pdf_text(d) == [
            "secret line one\ncafé £5", "page two text"
        ], mode
    # composes with filters + simple encodings + CID fonts
    d4 = pdf.encode_pdf_fixture(
        [["ünïcode €t"]], encrypt="rc4-40",
        simple_encoding="WinAnsiEncoding",
        compress_page=lambda p: "a85flate",
    )
    assert pdf.extract_pdf_text(d4) == ["ünïcode €t"]
    d5 = pdf.encode_pdf_fixture([["cid text"]], encrypt="rc4-128",
                                cid_font=True)
    assert pdf.extract_pdf_text(d5) == ["cid text"]


def test_encrypted_out_of_scope_raises():
    import pytest

    pages = [["x"]]
    # a wrong /U (equivalent to a non-empty user password) raises
    d = pdf.encode_pdf_fixture(pages, encrypt="rc4-128")
    bad = d.replace(b"/U <", b"/U <FF", 1)
    with pytest.raises(ValueError, match="user password"):
        pdf.extract_pdf_text(bad)
    # AES /V values raise the distinct scope message
    aes = d.replace(b"/V 2", b"/V 4", 1)
    with pytest.raises(ValueError, match="AES"):
        pdf.extract_pdf_text(aes)
    # unencrypted docs keep working through the trailer parse
    plain = pdf.encode_pdf_fixture(pages)
    assert pdf.extract_pdf_text(plain) == ["x"]


def test_aes128_fips197_known_answer():
    """The AES core is anchored by the FIPS-197 Appendix C.1 vector —
    tables are derived from the GF(2^8) definition, never transcribed."""
    key = bytes(range(16))
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    rk = pdf._aes128_expand(key)
    ct = pdf._aes128_encrypt_block(rk, pt)
    assert ct.hex() == "69c4e0d86a7b0430d8cdb78070b4c55a"
    assert pdf._aes128_decrypt_block(rk, ct) == pt


def test_aesv2_encrypted_roundtrip():
    """/V 4 /StdCF /AESV2: IV-prefixed CBC streams with sAlT per-object
    keys decrypt through the same text path."""
    pages = [["aes secret line", "café £5"], ["page two"]]
    d = pdf.encode_pdf_fixture(
        pages, compress_page=lambda p: p == 0, encrypt="aes-128"
    )
    assert b"/AESV2" in d
    assert pdf.extract_pdf_text(d) == [
        "aes secret line\ncafé £5", "page two"
    ]
    # the ToUnicode CMap stream is AES-encrypted too (CID composition)
    d2 = pdf.encode_pdf_fixture([["cid über aes"]], encrypt="aes-128",
                                cid_font=True)
    assert pdf.extract_pdf_text(d2) == ["cid über aes"]
    # AESV3 stays a distinct documented bound
    import pytest
    bad = d.replace(b"/V 4", b"/V 5", 1).replace(b"/R 4", b"/R 6", 1)
    with pytest.raises(ValueError, match="AESV3"):
        pdf.extract_pdf_text(bad)
