"""WARC / WET web-archive source — the canonical input container of
web-scale text corpora (ISO 28500 / WARC 1.1; the WET "conversion"
flavor is the text-extract sidecar Common Crawl publishes next to every
crawl segment).

Layout contract (the Common Crawl convention): an archive is a
concatenation of records; when gzip-compressed, EACH record is its own
gzip member, so a 1 GiB .warc.gz splits at member boundaries without
parsing — here the whole archive arrives as one binary cell and is
walked record-by-record inside a scan-side ``mapInPandas`` (zero
shuffles; the 100 TB layout is many archive files scanned in parallel,
one task per file split, exactly like the PDF/DOCX/MP4 tiers).

Record grammar (ISO 28500 §4): a version line ``WARC/1.0``, named
header fields (``Name: value``, RFC 5322 continuation-line folding),
a blank line, ``Content-Length`` octets of block, then CRLF CRLF.
``response`` records carry a full HTTP message in the block
(status line + headers + payload); ``conversion`` (WET) records carry
the extracted plain text directly.

Reference parity note: the reference pipeline (pipeline/load_data.py)
has no web-archive tier at all; this module is part of the engine's
LLM-training-data extension surface (SURVEY.md §2 extensions) and
derives only from the public ISO 28500 spec and the Common Crawl file
conventions.  Everything downstream — curation funnel, dedup, lang-ID
— consumes the extracted text like any other document column (q260 /
q261 / the q262 WET→curation bridge).
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

_CRLF = b"\r\n"


# --------------------------------------------------------------- gunzip

_GUNZIP_CHUNK = 1 << 20


def _gunzip_iter(data: bytes) -> Iterator[bytes]:
    """Decompressed chunks of a concatenation of gzip members (the
    member-per-record WARC layout, or a single whole-archive member).

    Feeds the decompressor ``_GUNZIP_CHUNK`` slices of a memoryview so
    the per-member ``unused_data`` copy is bounded by the chunk size —
    O(archive) total, not O(members × archive) — and, because it is a
    generator, the record walk can stop pulling once ``max_records``
    records' worth of bytes have materialized."""
    view = memoryview(data)
    pos, n = 0, len(view)
    d = zlib.decompressobj(31)  # gzip wrapper
    fed = False  # has the CURRENT member seen any input yet?
    carry = b""  # unused_data of a finished member, ≤ one chunk
    while pos < n or carry:
        if carry:
            feed, carry = carry, b""
        else:
            feed = view[pos : pos + _GUNZIP_CHUNK]
            pos += len(feed)
        while feed:
            try:
                out = d.decompress(feed)
            except zlib.error as exc:
                raise ValueError(
                    f"corrupt WARC: bad gzip member ({exc})"
                )
            fed = True
            if out:
                yield out
            if not d.eof:
                break
            # member boundary — restart on the leftover bytes
            feed = d.unused_data
            d = zlib.decompressobj(31)
            fed = False
    if fed and not d.eof:
        raise ValueError("corrupt WARC: truncated gzip member")


def _gunzip_members(data: bytes) -> bytes:
    """Whole-buffer convenience wrapper over `_gunzip_iter`."""
    return b"".join(_gunzip_iter(data))


# ---------------------------------------------------------------- parse


def _read_line(data: bytes, pos: int) -> tuple[bytes, int]:
    e = data.find(b"\n", pos)
    if e < 0:
        return data[pos:], len(data)
    line = data[pos:e]
    if line.endswith(b"\r"):
        line = line[:-1]
    return line, e + 1


def _parse_headers(data: bytes, pos: int) -> tuple[dict[str, str], int]:
    """Named fields up to the blank line; continuation lines (leading
    SP/HT) fold into the previous value (ISO 28500 §4 / RFC 5322).
    Repeated field names accumulate comma-joined — the RFC 9110 §5.3
    list equivalence, so legitimately-repeatable fields (e.g.
    ``WARC-Concurrent-To``) are never silently dropped; singleton
    fields read downstream take the first list element."""
    headers: dict[str, str] = {}
    last: str | None = None
    while pos < len(data):
        line, pos = _read_line(data, pos)
        if not line:
            break
        if line[:1] in (b" ", b"\t") and last is not None:
            headers[last] += " " + line.strip().decode("latin-1")
            continue
        name, sep, value = line.partition(b":")
        if not sep:
            raise ValueError("corrupt WARC: malformed header line")
        key = name.strip().decode("latin-1").lower()
        val = value.strip().decode("latin-1")
        headers[key] = headers[key] + ", " + val if key in headers else val
        last = key
    return headers, pos


def _first_token(value: str) -> str:
    """First element of a comma-joined header value (singleton reads)."""
    return value.split(",", 1)[0].strip()


def _dechunk(body: bytes) -> bytes:
    """RFC 9112 §7.1 chunked transfer decoding: size-line (hex, optional
    extensions) + chunk + CRLF, terminated by a zero chunk; trailer
    fields ignored.  Malformed framing returns the body as-is (crawl
    archives carry plenty of almost-HTTP — never fail the record)."""
    out = bytearray()
    pos = 0
    while pos < len(body):
        line, nxt = _read_line(body, pos)
        size_tok = line.split(b";", 1)[0].strip()
        try:
            size = int(size_tok, 16)
        except ValueError:
            return bytes(body)
        if size == 0:
            break
        if nxt + size > len(body):
            return bytes(body)
        out += body[nxt : nxt + size]
        pos = nxt + size
        # consume the CRLF after the chunk data
        if body[pos : pos + 2] == b"\r\n":
            pos += 2
        elif body[pos : pos + 1] == b"\n":
            pos += 1
    return bytes(out)


def _decode_content(payload: bytes, encoding: str | None) -> bytes:
    """RFC 9110 §8.4 ``Content-Encoding`` decode: ``gzip``/``x-gzip``
    (RFC 1952, multi-member tolerated), ``deflate`` (RFC 1950 zlib
    wrapper, falling back to raw RFC 1951 — the historical server
    quirk), ``identity`` (no-op).  Multiple codings are listed in
    application order, so they undo in reverse.  Unknown codings
    (br/zstd — not stdlib) or corrupt streams return the payload
    unchanged: crawl archives carry plenty of mislabeled content and a
    single bad page must never fail the record (the `_dechunk` rule)."""
    toks = [t.strip().lower() for t in (encoding or "").split(",")]
    for tok in reversed([t for t in toks if t]):
        if tok == "identity":
            continue
        if tok in ("gzip", "x-gzip"):
            try:
                payload = _gunzip_members(payload)
            except ValueError:
                return payload
        elif tok == "deflate":
            try:
                payload = zlib.decompress(payload)
            except zlib.error:
                try:
                    payload = zlib.decompress(payload, -zlib.MAX_WBITS)
                except zlib.error:
                    return payload
        else:
            return payload
    return payload


def _parse_http_block(block: bytes) -> tuple[int | None, str | None, bytes]:
    """(status, content-type, payload) out of an HTTP message block;
    chunked transfer-encoding is decoded first (the wire framing is
    outermost), then Content-Encoding (gzip/deflate) — so the payload
    that reaches the bytes→text tiers is the representation the server
    produced, not compressed garbage."""
    sep = block.find(b"\r\n\r\n")
    if sep < 0:
        sep = block.find(b"\n\n")
        body_at = sep + 2 if sep >= 0 else len(block)
    else:
        body_at = sep + 4
    head = block[: sep if sep >= 0 else len(block)]
    status: int | None = None
    ctype: str | None = None
    line, pos = _read_line(head, 0)
    parts = line.split()
    if len(parts) >= 2 and parts[0].startswith(b"HTTP/"):
        try:
            status = int(parts[1])
        except ValueError:
            status = None
    hdrs, _ = _parse_headers(head + b"\n", pos)
    ctype = hdrs.get("content-type")
    if ctype is not None:
        ctype = _first_token(ctype) or None
    payload = block[body_at:]
    if "chunked" in hdrs.get("transfer-encoding", "").lower():
        payload = _dechunk(payload)
    payload = _decode_content(payload, hdrs.get("content-encoding"))
    return status, ctype, payload


def parse_warc(data: bytes, max_records: int = 4096) -> list[dict]:
    """All records of a WARC/WET archive (plain or gzip-member
    compressed), each a dict of the catalog fields plus the raw block
    and — for ``response`` records — the parsed HTTP payload.
    Fan-out is bounded by ``max_records`` (the 100 TB cap, same rule
    as pdf_text's max_pages); on compressed archives decompression is
    lazy, so hitting the cap stops pulling gzip members — a capped
    catalog scan over a multi-GiB archive never inflates the tail."""
    if data[:2] == b"\x1f\x8b":
        chunks = _gunzip_iter(data)
        buf = bytearray()

        def _fill() -> bool:
            try:
                buf.extend(next(chunks))
                return True
            except StopIteration:
                return False

    else:
        buf = data

        def _fill() -> bool:
            return False

    def _ensure(n: int) -> bool:
        while len(buf) < n:
            if not _fill():
                return False
        return True

    records: list[dict] = []
    pos = 0
    while len(records) < max_records:
        # skip inter-record CRLFs (pulling more input at a boundary)
        while True:
            while pos < len(buf) and buf[pos : pos + 1] in (b"\r", b"\n"):
                pos += 1
            if pos < len(buf) or not _fill():
                break
        if pos >= len(buf):
            break
        # materialize the whole header block (up to the blank line)
        while True:
            hdr_end = buf.find(b"\n\r\n", pos)
            if hdr_end < 0:
                hdr_end = buf.find(b"\n\n", pos)
            if hdr_end >= 0 or not _fill():
                break
        line, hpos = _read_line(buf, pos)
        if not line.startswith(b"WARC/"):
            raise ValueError("corrupt WARC: missing version line")
        headers, pos = _parse_headers(buf, hpos)
        try:
            length = int(_first_token(headers["content-length"]))
        except (KeyError, ValueError):
            raise ValueError("corrupt WARC: missing/bad Content-Length")
        if not _ensure(pos + length):
            raise ValueError("corrupt WARC: truncated record block")
        block = bytes(buf[pos : pos + length])
        pos += length
        rec = {
            "warc_type": headers.get("warc-type"),
            "record_id": headers.get("warc-record-id"),
            "target_uri": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "content_type": headers.get("content-type"),
            "content_length": length,
            "block": block,
            "http_status": None,
            "http_content_type": None,
            "payload": block,
        }
        ctype = (rec["content_type"] or "").lower()
        if ctype.startswith("application/http"):
            status, hct, payload = _parse_http_block(block)
            rec["http_status"] = status
            rec["http_content_type"] = hct
            rec["payload"] = payload
        records.append(rec)
    return records


def extract_wet_text(data: bytes, max_records: int = 4096) -> list[dict]:
    """The WET view: one (uri, date, text) entry per ``conversion``
    record, text decoded as UTF-8 (the WET contract; undecodable bytes
    replaced, never raising on a single bad page)."""
    out = []
    for rec in parse_warc(data, max_records=max_records):
        if rec["warc_type"] != "conversion":
            continue
        out.append(
            {
                "target_uri": rec["target_uri"],
                "warc_date": rec["warc_date"],
                "text": rec["block"].decode("utf-8", "replace"),
            }
        )
    return out


# ------------------------------------------------------------ operators


def warc_records(
    df: DataFrame,
    bin_col: str = "content",
    id_col: str = "doc_id",
    max_records: int = 4096,
) -> DataFrame:
    """One row per record of each archive payload: the catalog fields
    plus HTTP status/content-type and payload size for response
    records.  Scan-side ``mapInPandas``, zero shuffles."""
    schema = (
        f"{id_col} long, rec_idx int, warc_type string, "
        "target_uri string, warc_date string, content_type string, "
        "content_length long, http_status int, "
        "http_content_type string, payload_len long"
    )
    cols = [
        id_col, "rec_idx", "warc_type", "target_uri", "warc_date",
        "content_type", "content_length", "http_status",
        "http_content_type", "payload_len",
    ]

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for rid, payload in zip(batch[id_col], batch[bin_col]):
                recs = parse_warc(
                    bytes(payload or b""), max_records=max_records
                )
                for k, rec in enumerate(recs):
                    rows.append(
                        (
                            int(rid), k, rec["warc_type"],
                            rec["target_uri"], rec["warc_date"],
                            rec["content_type"], rec["content_length"],
                            rec["http_status"], rec["http_content_type"],
                            len(rec["payload"]),
                        )
                    )
            yield pd.DataFrame(rows, columns=cols)

    return df.select(id_col, bin_col).mapInPandas(_extract, schema=schema)


def warc_payloads(
    df: DataFrame,
    bin_col: str = "content",
    id_col: str = "doc_id",
    max_records: int = 4096,
    warc_types: tuple[str, ...] = ("response",),
) -> DataFrame:
    """(id, rec_idx, target_uri, http_status, http_content_type,
    payload) — the raw payload bytes of each matching record, for the
    downstream bytes→text tiers (charset sniff, HTML extraction).
    ``rec_idx`` is the per-archive ordinal among matching records."""
    schema = (
        f"{id_col} long, rec_idx int, target_uri string, "
        "http_status int, http_content_type string, payload binary"
    )
    cols = [
        id_col, "rec_idx", "target_uri", "http_status",
        "http_content_type", "payload",
    ]

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for rid, payload in zip(batch[id_col], batch[bin_col]):
                recs = parse_warc(
                    bytes(payload or b""), max_records=max_records
                )
                k = 0
                for rec in recs:
                    if rec["warc_type"] not in warc_types:
                        continue
                    rows.append(
                        (
                            int(rid), k, rec["target_uri"],
                            rec["http_status"],
                            rec["http_content_type"], rec["payload"],
                        )
                    )
                    k += 1
            yield pd.DataFrame(rows, columns=cols)

    return df.select(id_col, bin_col).mapInPandas(_extract, schema=schema)


def wet_text(
    df: DataFrame,
    bin_col: str = "content",
    id_col: str = "doc_id",
    max_records: int = 4096,
) -> DataFrame:
    """(id, rec_idx [per-archive conversion-record ordinal], uri,
    n_chars, text) — the WET text table, ready for the curation funnel
    (quality → lang-ID → dedup) exactly like the documents table."""
    schema = (
        f"{id_col} long, rec_idx int, target_uri string, "
        "n_chars int, text string"
    )
    cols = [id_col, "rec_idx", "target_uri", "n_chars", "text"]

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for rid, payload in zip(batch[id_col], batch[bin_col]):
                recs = extract_wet_text(
                    bytes(payload or b""), max_records=max_records
                )
                for k, rec in enumerate(recs):
                    rows.append(
                        (
                            int(rid), k, rec["target_uri"],
                            len(rec["text"]), rec["text"],
                        )
                    )
            yield pd.DataFrame(rows, columns=cols)

    return df.select(id_col, bin_col).mapInPandas(_extract, schema=schema)


# ------------------------------------------------------ fixture writer


def _gzip_member(raw: bytes) -> bytes:
    """One deterministic gzip member (mtime 0, no filename)."""
    co = zlib.compressobj(6, zlib.DEFLATED, 31)
    # compressobj(wbits=31) writes a fixed header with mtime 0 — unlike
    # gzip.compress, which stamps wall-clock time
    return co.compress(raw) + co.flush()


def encode_warc_fixture(
    records: list[dict],
    gzip_records: bool = False,
    warcinfo: bool = True,
) -> bytes:
    """A VALID minimal WARC/WET archive.  Each entry of ``records``:

    - ``{"type": "conversion", "uri": ..., "date": ..., "text": str}``
      (a WET record), or
    - ``{"type": "response", "uri": ..., "date": ..., "status": int,
      "http_content_type": str, "payload": bytes}`` (a crawl record
      wrapping a full HTTP/1.1 message), or
    - ``{"type": <other>, "body": bytes}`` for anything else.

    ``gzip_records`` emits the Common Crawl member-per-record layout;
    ``warcinfo`` prepends the customary archive-metadata record."""
    out = bytearray()
    items = list(records)
    if warcinfo:
        items.insert(
            0,
            {
                "type": "warcinfo",
                "content_type": "application/warc-fields",
                "body": b"software: occupation-wage-etl-spark\r\n",
            },
        )
    for idx, spec in enumerate(items):
        rtype = spec["type"]
        if rtype == "response":
            payload = spec["payload"]
            if isinstance(payload, str):
                payload = payload.encode("utf-8")
            enc_hdr = b""
            enc = spec.get("content_encoding")
            if enc in ("gzip", "x-gzip"):
                payload = _gzip_member(payload)
            elif enc == "deflate":
                payload = zlib.compress(payload)
            elif enc == "deflate-raw":  # the historical raw-DEFLATE quirk
                co = zlib.compressobj(6, zlib.DEFLATED, -zlib.MAX_WBITS)
                payload = co.compress(payload) + co.flush()
                enc = "deflate"
            if enc:
                enc_hdr = f"Content-Encoding: {enc}\r\n".encode("latin-1")
            if spec.get("chunked"):
                # RFC 9112 chunked framing: split at 7 bytes to force
                # multiple chunks through the decoder
                chunks = [
                    payload[o : o + 7] for o in range(0, len(payload), 7)
                ] or [b""]
                body = b"".join(
                    b"%x\r\n" % len(c) + c + b"\r\n"
                    for c in chunks
                    if c
                ) + b"0\r\n\r\n"
                framing = b"Transfer-Encoding: chunked\r\n"
            else:
                body = payload
                framing = b"Content-Length: %d\r\n" % len(payload)
            http = (
                (
                    f"HTTP/1.1 {spec.get('status', 200)} OK\r\n"
                    f"Content-Type: "
                    f"{spec.get('http_content_type', 'text/html')}\r\n"
                ).encode("latin-1")
                + enc_hdr
                + framing
                + b"\r\n"
                + body
            )
            block = http
            ctype = "application/http; msgtype=response"
        elif rtype == "conversion":
            block = spec["text"].encode("utf-8")
            ctype = "text/plain"
        else:
            block = spec.get("body", b"")
            if isinstance(block, str):
                block = block.encode("utf-8")
            ctype = spec.get("content_type", "application/octet-stream")
        head = [f"WARC/1.0"]
        head.append(f"WARC-Type: {rtype}")
        head.append(
            f"WARC-Record-ID: <urn:uuid:00000000-0000-0000-0000-"
            f"{idx:012d}>"
        )
        head.append(
            f"WARC-Date: {spec.get('date', '2024-01-01T00:00:00Z')}"
        )
        if spec.get("uri"):
            head.append(f"WARC-Target-URI: {spec['uri']}")
        head.append(f"Content-Type: {ctype}")
        head.append(f"Content-Length: {len(block)}")
        rec = (
            ("\r\n".join(head) + "\r\n\r\n").encode("latin-1")
            + block
            + b"\r\n\r\n"
        )
        out += _gzip_member(rec) if gzip_records else rec
    return bytes(out)
