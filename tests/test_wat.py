"""WAT metadata-sidecar source (sources/wat.py): envelope encode /
record walk / from_json catalog / outlink explode, plus the
adaptive-recrawl composition operator (warc.adaptive_recrawl)."""

from __future__ import annotations

import json

from occupation_wage_etl_spark.sources import warc as W
from occupation_wage_etl_spark.sources import wat


def _entries():
    return [
        {
            "uri": "http://a.example/",
            "status": 200,
            "title": "Page A",
            "metas": [
                {"name": "description", "content": "about A"},
                {"name": "viewport", "content": "w"},
            ],
            "links": [
                {"path": "A@/href", "url": "http://x.example/1",
                 "text": "one"},
                {"path": "A@/href", "url": "http://x.example/2",
                 "text": "two"},
            ],
        },
        {
            # no title, no description meta, no links
            "uri": "http://b.example/",
            "status": 404,
            "metas": [{"name": "robots", "content": "noindex"}],
            "links": [],
        },
    ]


def test_fixture_is_valid_warc_metadata():
    data = wat.encode_wat_fixture(_entries())
    recs = W.parse_warc(data)
    assert [r["warc_type"] for r in recs] == ["metadata", "metadata"]
    env = json.loads(recs[0]["payload"].decode())
    hm = env["Envelope"]["Payload-Metadata"]["HTTP-Response-Metadata"]
    assert hm["Response-Message"]["Status"] == "200"
    assert hm["HTML-Metadata"]["Head"]["Title"] == "Page A"
    assert len(hm["HTML-Metadata"]["Links"]) == 2
    # deterministic bytes (sort_keys + fixed separators)
    assert data == wat.encode_wat_fixture(_entries())


def test_catalog_and_outlinks(spark):
    plain = wat.encode_wat_fixture(_entries())
    gz = wat.encode_wat_fixture(_entries(), gzip_records=True)
    df = spark.createDataFrame(
        [(1, bytearray(plain)), (2, bytearray(gz))],
        "doc_id long, content binary",
    )
    meta = wat.wat_metadata(wat.wat_payloads(df)).orderBy(
        "doc_id", "rec_idx"
    )
    rows = meta.collect()
    assert len(rows) == 4  # 2 docs x 2 records, gzip layout identical
    a, b = rows[0], rows[1]
    assert (a.target_uri, a.http_status, a.title) == (
        "http://a.example/", 200, "Page A",
    )
    assert a.meta_description == "about A"
    assert a.n_links == 2
    assert (b.http_status, b.title, b.meta_description, b.n_links) == (
        404, None, None, 0,
    )
    edges = wat.wat_outlinks(meta).orderBy("doc_id", "link_idx").collect()
    # only record A has links; B contributes no edge rows
    assert [(e.doc_id, e.link_idx, e.url, e.anchor_text)
            for e in edges if e.doc_id == 1] == [
        (1, 0, "http://x.example/1", "one"),
        (1, 1, "http://x.example/2", "two"),
    ]
    assert all(e.src == "http://a.example/" for e in edges)


def test_malformed_envelope_degrades_to_null(spark):
    specs = [
        {
            "type": "metadata",
            "uri": "http://bad.example/",
            "content_type": "application/json",
            "body": "{not json",
        }
    ]
    data = b"".join(
        W._encode_record_bytes(specs, gzip_records=False, warcinfo=False)
    )
    df = spark.createDataFrame(
        [(1, bytearray(data))], "doc_id long, content binary"
    )
    r = wat.wat_metadata(wat.wat_payloads(df)).collect()
    assert len(r) == 1
    assert r[0].title is None and r[0].http_status is None
    assert r[0].n_links == 0
    assert wat.wat_outlinks(
        wat.wat_metadata(wat.wat_payloads(df))
    ).count() == 0


def test_non_metadata_records_skipped(spark):
    mixed = b"".join(
        W._encode_record_bytes(
            [
                {
                    "type": "response",
                    "uri": "http://a.example/",
                    "payload": b"<html></html>",
                },
            ],
            gzip_records=False,
            warcinfo=True,  # warcinfo record must be skipped too
        )
    ) + wat.encode_wat_fixture(_entries()[:1])
    df = spark.createDataFrame(
        [(1, bytearray(mixed))], "doc_id long, content binary"
    )
    pl = wat.wat_payloads(df).collect()
    assert len(pl) == 1
    assert pl[0].target_uri == "http://a.example/"


def _schedule_df(spark, rows):
    # (doc_id, target_uri, ttl_s, next_fetch_unix=cap+ttl,
    #  cache_control, revalidate_with) shaped like recrawl_schedule
    cap = 1_700_000_000
    return spark.createDataFrame(
        [
            (i, u, ttl, cap + ttl, cc, "unconditional")
            for i, (u, ttl, cc) in enumerate(rows)
        ],
        "doc_id long, target_uri string, ttl_s long, "
        "next_fetch_unix long, cache_control string, "
        "revalidate_with string",
    )


def _history_df(spark, rows):
    return spark.createDataFrame(
        rows,
        "url string, n_captures long, n_changes long, "
        "est_change_interval_s long",
    )


def test_adaptive_recrawl_policy(spark):
    sched = _schedule_df(
        spark,
        [
            ("http://s.ex/explicit-slow", 7200, "max-age=7200"),
            ("http://s.ex/heuristic", 86400, None),
            ("http://s.ex/no-history", 86400, None),
            ("http://s.ex/one-capture", 86400, None),
            ("http://s.ex/nocache", 300, "no-cache"),
        ],
    )
    hist = _history_df(
        spark,
        [
            # faster than the header: tightens the explicit ceiling
            ("http://s.ex/explicit-slow", 4, 3, 3600),
            # slower than the heuristic guess: extends it
            ("http://s.ex/heuristic", 4, 1, 900000),
            # single capture: no usable interval
            ("http://s.ex/one-capture", 1, 0, 0),
            # measurement must NOT override an explicit no-cache
            ("http://s.ex/nocache", 4, 0, 900000),
        ],
    )
    out = {
        r.target_uri: r
        for r in W.adaptive_recrawl(sched, hist).collect()
    }
    assert (out["http://s.ex/explicit-slow"].ttl_s,
            out["http://s.ex/explicit-slow"].schedule_source) == (
        3600, "measured")
    assert (out["http://s.ex/heuristic"].ttl_s,
            out["http://s.ex/heuristic"].schedule_source) == (
        900000, "measured")
    for u in ("http://s.ex/no-history", "http://s.ex/one-capture"):
        assert (out[u].ttl_s, out[u].schedule_source) == (
            86400, "headers")
    assert (out["http://s.ex/nocache"].ttl_s,
            out["http://s.ex/nocache"].schedule_source) == (
        300, "headers")
    # next_fetch anchored at the original capture time, not now()
    r = out["http://s.ex/explicit-slow"]
    assert r.next_fetch_unix == 1_700_000_000 + 3600
    # measured interval above the 30 d cap clamps to the cap
    hist2 = _history_df(
        spark, [("http://s.ex/heuristic", 4, 1, 10**9)]
    )
    out2 = {
        r.target_uri: r
        for r in W.adaptive_recrawl(sched, hist2).collect()
    }
    assert out2["http://s.ex/heuristic"].ttl_s == 30 * 86400
