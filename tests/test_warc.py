"""WARC/WET web-archive source (sources/warc.py): record framing,
gzip member-per-record layout, HTTP response blocks, WET conversion
text, and the Spark operators."""

from __future__ import annotations

import zlib

import pytest

from occupation_wage_etl_spark.sources import warc


def _sample_records():
    return [
        {
            "type": "response",
            "uri": "http://example.com/a",
            "date": "2024-03-01T12:00:00Z",
            "status": 200,
            "http_content_type": "text/html; charset=UTF-8",
            "payload": b"<html><body>hello A</body></html>",
        },
        {
            "type": "conversion",
            "uri": "http://example.com/a",
            "date": "2024-03-01T12:00:00Z",
            "text": "hello A\nsecond line",
        },
        {
            "type": "response",
            "uri": "http://example.com/b",
            "status": 404,
            "http_content_type": "text/plain",
            "payload": b"not found",
        },
    ]


def test_round_trip_plain_and_gzip_members():
    for gz in (False, True):
        data = warc.encode_warc_fixture(_sample_records(), gzip_records=gz)
        recs = warc.parse_warc(data)
        assert [r["warc_type"] for r in recs] == [
            "warcinfo", "response", "conversion", "response",
        ]
        assert recs[1]["target_uri"] == "http://example.com/a"
        assert recs[1]["http_status"] == 200
        assert recs[1]["http_content_type"] == "text/html; charset=UTF-8"
        assert recs[1]["payload"] == b"<html><body>hello A</body></html>"
        assert recs[2]["block"].decode() == "hello A\nsecond line"
        assert recs[3]["http_status"] == 404
        # content_length is the BLOCK length (HTTP message incl headers)
        assert recs[1]["content_length"] > len(recs[1]["payload"])


def test_each_gzip_member_is_one_record():
    # the Common Crawl split contract: the archive splits at member
    # boundaries without parsing — the first member alone is a valid
    # single-record archive
    data = warc.encode_warc_fixture(
        _sample_records(), gzip_records=True, warcinfo=False
    )
    d = zlib.decompressobj(31)
    d.decompress(data)
    d.flush()
    first_member = data[: len(data) - len(d.unused_data)]
    recs = warc.parse_warc(first_member)
    assert len(recs) == 1 and recs[0]["warc_type"] == "response"


def test_wet_text_view():
    data = warc.encode_warc_fixture(_sample_records())
    wet = warc.extract_wet_text(data)
    assert wet == [
        {
            "target_uri": "http://example.com/a",
            "warc_date": "2024-03-01T12:00:00Z",
            "text": "hello A\nsecond line",
        }
    ]


def test_header_folding_and_strictness():
    raw = (
        b"WARC/1.0\r\n"
        b"WARC-Type: metadata\r\n"
        b"WARC-Target-URI: http://example.com/very/long\r\n"
        b"\tcontinued-path\r\n"
        b"Content-Length: 2\r\n"
        b"\r\n"
        b"ok\r\n\r\n"
    )
    recs = warc.parse_warc(raw)
    assert recs[0]["target_uri"] == (
        "http://example.com/very/long continued-path"
    )
    with pytest.raises(ValueError, match="version line"):
        warc.parse_warc(b"NOT-WARC\r\n\r\n")
    with pytest.raises(ValueError, match="Content-Length"):
        warc.parse_warc(b"WARC/1.0\r\nWARC-Type: metadata\r\n\r\n")
    with pytest.raises(ValueError, match="truncated record"):
        warc.parse_warc(
            b"WARC/1.0\r\nWARC-Type: x\r\nContent-Length: 99\r\n\r\nshort"
        )
    with pytest.raises(ValueError, match="gzip"):
        warc.parse_warc(b"\x1f\x8b\x08" + b"\x00" * 20)


def test_max_records_cap():
    recs = [
        {"type": "conversion", "uri": f"http://x/{i}", "text": f"t{i}"}
        for i in range(10)
    ]
    data = warc.encode_warc_fixture(recs, warcinfo=False)
    assert len(warc.parse_warc(data, max_records=4)) == 4


def test_deterministic_gzip_bytes():
    # fixture must be bit-stable (no wall-clock mtime in the member)
    a = warc.encode_warc_fixture(_sample_records(), gzip_records=True)
    b = warc.encode_warc_fixture(_sample_records(), gzip_records=True)
    assert a == b


def test_spark_operators(spark):
    rows = [
        (
            i,
            warc.encode_warc_fixture(
                [
                    {
                        "type": "response",
                        "uri": f"http://host{i}/p",
                        "status": 200,
                        "payload": f"payload {i}".encode(),
                    },
                    {
                        "type": "conversion",
                        "uri": f"http://host{i}/p",
                        "text": f"text {i}\nline two",
                    },
                ],
                gzip_records=(i % 2 == 0),
            ),
        )
        for i in range(4)
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    rec = warc.warc_records(df)
    got = {
        (r["doc_id"], r["rec_idx"]): r for r in rec.collect()
    }
    assert len(got) == 12  # warcinfo + response + conversion per doc
    assert got[(1, 1)]["http_status"] == 200
    assert got[(1, 1)]["payload_len"] == len(b"payload 1")
    wet = warc.wet_text(df).collect()
    assert len(wet) == 4
    by_id = {r["doc_id"]: r for r in wet}
    assert by_id[2]["text"] == "text 2\nline two"
    assert by_id[2]["rec_idx"] == 0
    assert by_id[2]["n_chars"] == len("text 2\nline two")


def test_warc_payloads_operator(spark):
    recs = [
        {
            "type": "response",
            "uri": "http://a.example/1",
            "status": 200,
            "http_content_type": "text/html",
            "payload": b"<p>one</p>",
        },
        {"type": "conversion", "uri": "http://a.example/1", "text": "one"},
        {
            "type": "response",
            "uri": "http://a.example/2",
            "status": 301,
            "payload": b"",
        },
    ]
    df = spark.createDataFrame(
        [(7, warc.encode_warc_fixture(recs, gzip_records=True))],
        "doc_id long, content binary",
    )
    got = sorted(
        warc.warc_payloads(df).collect(), key=lambda r: r.rec_idx
    )
    # conversion + warcinfo records filtered; rec_idx is the ordinal
    # among MATCHING records
    assert [(r.rec_idx, r.target_uri, r.http_status, bytes(r.payload))
            for r in got] == [
        (0, "http://a.example/1", 200, b"<p>one</p>"),
        (1, "http://a.example/2", 301, b""),
    ]
    assert got[0].http_content_type == "text/html"


def test_chunked_transfer_decoding():
    payload = b"0123456789abcdefghij-final"  # > 3 chunks at size 7
    data = warc.encode_warc_fixture(
        [
            {
                "type": "response",
                "uri": "http://c.example/x",
                "status": 200,
                "payload": payload,
                "chunked": True,
            }
        ],
        warcinfo=False,
    )
    # the raw block carries chunk framing, the parsed payload must not
    rec = warc.parse_warc(data)[0]
    assert b"Transfer-Encoding: chunked" in rec["block"]
    assert b"\r\n7\r\n" in rec["block"] or b"7\r\n0123456" in rec["block"]
    assert rec["payload"] == payload
    # malformed size line: body returned as-is, record never fails
    assert warc._dechunk(b"zz\r\nbody") == b"zz\r\nbody"
    # truncated chunk: as-is
    assert warc._dechunk(b"ff\r\nshort") == b"ff\r\nshort"
    # zero-terminated empty body
    assert warc._dechunk(b"0\r\n\r\n") == b""


def test_content_encoding_decoding():
    """RFC 9110 §8.4: gzip / zlib-deflate / raw-deflate payloads reach
    the parsed record fully decoded; unknown or corrupt codings pass
    the bytes through unchanged (never fail the record)."""
    payload = b"the quick brown fox " * 16
    for enc in ("gzip", "deflate", "deflate-raw"):
        data = warc.encode_warc_fixture(
            [
                {
                    "type": "response",
                    "uri": "http://e.example/x",
                    "payload": payload,
                    "content_encoding": enc,
                }
            ],
            warcinfo=False,
        )
        rec = warc.parse_warc(data)[0]
        assert b"Content-Encoding:" in rec["block"]
        assert rec["payload"] == payload, enc
        # the raw block stays compressed (payload != block body)
        assert payload not in rec["block"]
    # chunked + gzip compose: Transfer-Encoding undone first
    data = warc.encode_warc_fixture(
        [
            {
                "type": "response",
                "uri": "http://e.example/c",
                "payload": payload,
                "content_encoding": "gzip",
                "chunked": True,
            }
        ],
        warcinfo=False,
    )
    rec = warc.parse_warc(data)[0]
    assert b"Transfer-Encoding: chunked" in rec["block"]
    assert rec["payload"] == payload
    # unknown coding (br) or corrupt gzip: bytes pass through as-is
    assert warc._decode_content(b"\x00\x01", "br") == b"\x00\x01"
    assert warc._decode_content(b"not-gzip", "gzip") == b"not-gzip"
    assert warc._decode_content(payload, None) == payload
    assert warc._decode_content(payload, "identity") == payload
    # multi-coding list undoes in reverse application order
    twice = warc._gzip_member(zlib.compress(payload))
    assert warc._decode_content(twice, "deflate, gzip") == payload


def test_repeated_headers_accumulate():
    """Repeated WARC header fields comma-join (RFC 9110 §5.3 list
    equivalence) instead of last-wins-dropping earlier values."""
    raw = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Record-ID: <urn:uuid:1>\r\n"
        b"WARC-Concurrent-To: <urn:uuid:2>\r\n"
        b"WARC-Concurrent-To: <urn:uuid:3>\r\n"
        b"Content-Type: application/http; msgtype=response\r\n"
        b"Content-Length: 4\r\n\r\n"
        b"body\r\n\r\n"
    )
    hdrs, _ = warc._parse_headers(raw, raw.find(b"\n") + 1)
    assert hdrs["warc-concurrent-to"] == "<urn:uuid:2>, <urn:uuid:3>"
    assert warc.parse_warc(raw)[0]["content_length"] == 4


def test_gunzip_iter_linear_and_lazy():
    """_gunzip_iter handles many members in O(total) and parse_warc
    stops pulling members once max_records is hit."""
    members = [warc._gzip_member(bytes([65 + i % 26]) * 100)
               for i in range(300)]
    blob = b"".join(members)
    assert warc._gunzip_members(blob) == b"".join(
        bytes([65 + i % 26]) * 100 for i in range(300)
    )
    # truncated final member raises
    import pytest as _pytest
    with _pytest.raises(ValueError):
        warc._gunzip_members(blob[:-5])
    # empty input: no members, no output
    assert warc._gunzip_members(b"") == b""


def test_payload_digest_sha1_vector():
    """Pinned NIST vector: sha1('abc') in the WARC labelled-base32
    form (20 digest bytes -> exactly 32 base32 chars, no padding)."""
    assert (
        warc.payload_digest_sha1(b"abc")
        == "sha1:VGMT4NSHA2AWVOR6EVYXQUGCNSONBWE5"
    )
    assert len(warc.payload_digest_sha1(b"")) == len("sha1:") + 32


def test_digest_check_over_decoded_payload(spark):
    """The digest contract is the DECODED payload: a gzip
    Content-Encoded response with a digest of the original bytes must
    verify; a corrupted digest must not; non-sha1 algos report NULL."""
    payload = b"the decoded body"
    data = warc.encode_warc_fixture(
        [
            {
                "type": "response",
                "uri": "http://a/ok",
                "payload": payload,
                "payload_digest": True,
                "content_encoding": "gzip",
                "chunked": True,
            },
            {
                "type": "response",
                "uri": "http://a/bad",
                "payload": payload,
                "payload_digest": "sha1:" + "A" * 32,
            },
            {
                "type": "response",
                "uri": "http://a/md5",
                "payload": payload,
                "payload_digest": "md5:0123456789abcdef",
            },
        ],
        warcinfo=False,
    )
    df = spark.createDataFrame(
        [(1, bytearray(data))], "doc_id long, content binary"
    )
    got = {
        r.target_uri: (r.digest_algo, r.digest_ok)
        for r in warc.warc_digest_check(df).collect()
    }
    assert got == {
        "http://a/ok": ("sha1", True),
        "http://a/bad": ("sha1", False),
        "http://a/md5": ("md5", None),
    }


def test_redirects_and_chain_chase(spark):
    """3xx Location edges (relative -> resolved against the record's
    own target URI) chase to the chain end; loops cap at max_hops with
    resolved=False."""
    specs = [
        {"type": "response", "uri": "http://h.example/a", "status": 301,
         "location": "/b", "payload": b""},
        {"type": "response", "uri": "http://h.example/b", "status": 302,
         "location": "c", "payload": b""},  # path-relative
        {"type": "response", "uri": "http://h.example/c", "status": 200,
         "payload": b"final"},
        # a 2-cycle loop
        {"type": "response", "uri": "http://h.example/x", "status": 301,
         "location": "/y", "payload": b""},
        {"type": "response", "uri": "http://h.example/y", "status": 301,
         "location": "/x", "payload": b""},
    ]
    df = spark.createDataFrame(
        [(1, bytearray(warc.encode_warc_fixture(specs, warcinfo=False)))],
        "doc_id long, content binary",
    )
    edges = warc.warc_redirects(df)
    got_edges = {
        (r.from_uri, r.location, r.location_abs)
        for r in edges.collect()
    }
    assert ("http://h.example/a", "/b", "http://h.example/b") in got_edges
    assert ("http://h.example/b", "c", "http://h.example/c") in got_edges
    assert len(got_edges) == 4  # the 200 record emits no edge
    final = {
        r.src: (r.final_url, r.n_hops, r.resolved)
        for r in warc.redirect_final_url(
            edges, src_col="from_uri", dst_col="location_abs",
            max_hops=4,
        ).collect()
    }
    assert final["http://h.example/a"] == ("http://h.example/c", 2, True)
    assert final["http://h.example/b"] == ("http://h.example/c", 1, True)
    # the loop never resolves: n_hops caps at max_hops
    assert final["http://h.example/x"][2] is False
    assert final["http://h.example/x"][1] == 4


def test_revisit_resolve(spark):
    digest = "sha1:SHAREDDIGESTVALUE"
    a1 = warc.encode_warc_fixture(
        [
            {"type": "response", "uri": "http://o/1", "payload": b"body",
             "payload_digest": digest},
        ],
        warcinfo=False,
    )
    a2 = warc.encode_warc_fixture(
        [
            {"type": "revisit", "uri": "http://r/2",
             "payload_digest": digest,
             "warc_headers": {"WARC-Refers-To": "<urn:uuid:1>"},
             "body": b""},
            {"type": "revisit", "uri": "http://r/orphan",
             "payload_digest": "sha1:NOSUCHORIGINAL", "body": b""},
        ],
        warcinfo=False,
    )
    df = spark.createDataFrame(
        [(1, bytearray(a1)), (2, bytearray(a2))],
        "doc_id long, content binary",
    )
    rec = warc.warc_records(df)
    got = warc.revisit_resolve(rec).collect()
    # the orphan digest drops out; the shared one resolves cross-archive
    assert len(got) == 1
    r = got[0]
    assert (r.doc_id, r.target_uri, r.orig_id, r.orig_uri) == (
        2, "http://r/2", 1, "http://o/1"
    )


def test_recrawl_schedule(spark):
    """RFC 9111 freshness plan: max-age honored + clamped, no-cache
    floors, Last-Modified heuristic = age/10, revalidation preference
    etag > last-modified > unconditional."""
    from occupation_wage_etl_spark.sources import warc as W

    lm = "Mon, 01 Jan 2024 13:10:45 GMT"
    specs = [
        (0, {"ETag": '"e0"', "Cache-Control": "max-age=7200"}),
        (1, {"Cache-Control": "no-store", "Last-Modified": lm}),
        (2, {"Last-Modified": lm}),
        (3, {}),
        (4, {"Cache-Control": "max-age=99999999", "ETag": '"x"'}),
        (5, {"Cache-Control": "max-age=10"}),          # below floor
        (6, {"Last-Modified": "garbage date"}),        # parse degrades
    ]
    rows = [
        (
            i,
            W.encode_warc_fixture(
                [{
                    "type": "response",
                    "uri": f"http://x/{i}",
                    "status": 200,
                    "date": "2024-01-02T03:04:05Z",
                    "payload": b"b",
                    "http_headers": h,
                }],
                warcinfo=False,
            ),
        )
        for i, h in specs
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    rec = W.warc_records(df)
    # the catalog surfaces the cache headers
    r0 = rec.filter("doc_id = 0").collect()[0]
    assert r0.http_etag == '"e0"'
    assert r0.http_cache_control == "max-age=7200"
    got = {
        r.doc_id: r for r in W.recrawl_schedule(rec).collect()
    }
    cap = got[0].next_fetch_unix - got[0].ttl_s
    assert got[0].ttl_s == 7200 and got[0].revalidate_with == "etag"
    assert got[1].ttl_s == 300                      # no-store floor
    assert got[1].revalidate_with == "last-modified"
    assert got[2].ttl_s == 5000                     # (cap - lm) / 10
    assert got[3].ttl_s == 86400
    assert got[3].revalidate_with == "unconditional"
    assert got[4].ttl_s == 30 * 86400               # clamped
    assert got[5].ttl_s == 300                      # floored
    assert got[6].ttl_s == 86400                    # bad date -> default
    # all captures share one date -> one epoch base
    for r in got.values():
        assert r.next_fetch_unix == cap + r.ttl_s


def test_recrawl_schedule_expires_and_bad_capture_date(spark):
    """Expires is explicit expiration (checked before the heuristic,
    RFC 9111 §4.2.1); an unparseable WARC-Date must fall to the
    DEFAULT rung even when Last-Modified/Expires parse (a NULL
    capture epoch must not collapse the clamp to its max bound)."""
    from occupation_wage_etl_spark.sources import warc as W

    lm = "Mon, 01 Jan 2024 13:10:45 GMT"
    # capture is 2024-01-02T03:04:05Z; Expires 2024-01-02T04:04:05Z
    exp = "Tue, 02 Jan 2024 04:04:05 GMT"
    past = "Mon, 01 Jan 2024 00:00:00 GMT"
    specs = [
        (0, "2024-01-02T03:04:05Z", {"Expires": exp}),
        # Expires beats the Last-Modified heuristic when both present
        (1, "2024-01-02T03:04:05Z", {"Expires": exp,
                                     "Last-Modified": lm}),
        # already expired -> min floor
        (2, "2024-01-02T03:04:05Z", {"Expires": past}),
        # max-age still beats Expires
        (3, "2024-01-02T03:04:05Z", {"Expires": exp,
                                     "Cache-Control": "max-age=9999"}),
        # malformed WARC-Date + parseable Last-Modified -> default,
        # NULL next_fetch (no capture epoch to anchor on)
        (4, "not-a-date", {"Last-Modified": lm}),
        (5, "not-a-date", {"Expires": exp}),
    ]
    rows = [
        (
            i,
            W.encode_warc_fixture(
                [{
                    "type": "response",
                    "uri": f"http://x/{i}",
                    "status": 200,
                    "date": d,
                    "payload": b"b",
                    "http_headers": h,
                }],
                warcinfo=False,
            ),
        )
        for i, d, h in specs
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    got = {
        r.doc_id: r
        for r in W.recrawl_schedule(W.warc_records(df)).collect()
    }
    assert got[0].ttl_s == 3600
    assert got[1].ttl_s == 3600
    assert got[2].ttl_s == 300
    assert got[3].ttl_s == 9999
    assert got[4].ttl_s == 86400 and got[4].next_fetch_unix is None
    assert got[5].ttl_s == 86400 and got[5].next_fetch_unix is None
