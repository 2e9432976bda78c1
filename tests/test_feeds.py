"""RSS 2.0 / Atom feed source (sources/feeds.py)."""

from __future__ import annotations

import gzip

from occupation_wage_etl_spark.sources import feeds


_RSS = """<rss version="2.0"><channel>
<title>Chan A</title><link>http://a.example/</link>
<item><title>Post 1</title><link>http://a.example/1</link>
<guid>g1</guid><pubDate>Mon, 01 Jan 2024 00:00:00 GMT</pubDate>
<description>first</description></item>
<item><title>Post 2</title><link>http://a.example/2</link></item>
</channel></rss>"""

_ATOM = """<feed xmlns="http://www.w3.org/2005/Atom">
<title>Feed B</title>
<entry><title>E1</title>
<link rel="self" href="http://b.example/self"/>
<link rel="alternate" href="http://b.example/e1"/>
<id>tag:b,1</id><updated>2024-02-01T00:00:00Z</updated>
<summary>sum1</summary></entry>
<entry><title>E2</title><link href="http://b.example/e2"/></entry>
</feed>"""


def test_parse_feed_rss_and_atom():
    rss = feeds.parse_feed(_RSS)
    assert [e["link"] for e in rss] == [
        "http://a.example/1", "http://a.example/2"
    ]
    assert rss[0]["feed_kind"] == "rss"
    assert rss[0]["feed_title"] == "Chan A"
    assert rss[0]["entry_id"] == "g1"
    assert rss[1]["published"] is None
    atom = feeds.parse_feed(_ATOM)
    # rel="self" skipped: the alternate-or-first rule
    assert [e["link"] for e in atom] == [
        "http://b.example/e1", "http://b.example/e2"
    ]
    assert atom[0]["feed_kind"] == "atom"
    assert atom[0]["entry_id"] == "tag:b,1"
    # non-feed XML yields no entries
    assert feeds.parse_feed("<html><body>x</body></html>") == []


def test_feed_entries_table(spark):
    rows = [
        (0, _RSS.encode("utf-8")),
        (1, gzip.compress(_ATOM.encode("utf-8"))),  # .xml.gz path
        (2, b"not xml at all"),                      # skipped
    ]
    df = spark.createDataFrame(rows, "doc_id long, feed_xml binary")
    got = feeds.feed_entries(df).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc[0]) == 2 and len(by_doc[1]) == 2
    assert 2 not in by_doc
    assert by_doc[1][0].link == "http://b.example/e1"
    assert by_doc[0][0].summary == "first"
