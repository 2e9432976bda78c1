"""robots.txt parse + allow evaluation (operators/robots.py)."""

from __future__ import annotations

from occupation_wage_etl_spark.operators import robots

ROBOTS = """# crawl policy
User-agent: *
Disallow: /private
Allow: /private/ok
Crawl-delay: 5

User-agent: botA
User-agent: botB
Disallow: /

Sitemap: http://h.example/sitemap.xml
"""


def test_rules_parse(spark):
    df = spark.createDataFrame(
        [(1, ROBOTS)], "doc_id long, robots_txt string"
    )
    got = {
        (r.agent, r.rule_type, r.value)
        for r in robots.robots_rules(df).collect()
    }
    assert got == {
        ("*", "disallow", "/private"),
        ("*", "allow", "/private/ok"),
        ("*", "crawl-delay", "5"),
        ("botA", "disallow", "/"),
        ("botB", "disallow", "/"),
        (None, "sitemap", "http://h.example/sitemap.xml"),
    }


def test_is_allowed_longest_match_and_ties(spark):
    rdf = robots.robots_rules(
        spark.createDataFrame(
            [(1, ROBOTS)], "doc_id long, robots_txt string"
        )
    )
    urls = spark.createDataFrame(
        [
            (1, "/private/secret"),   # disallowed (prefix /private)
            (1, "/private/ok/page"),  # allowed (longer Allow wins)
            (1, "/public/x"),         # no match -> allowed
            (1, "/privateer"),        # plain prefix: /private matches
        ],
        "doc_id long, path string",
    )
    got = {
        r.path: (r.allowed, r.matched_rule)
        for r in robots.robots_is_allowed(rdf, urls, agent="*").collect()
    }
    assert got["/private/secret"] == (False, "/private")
    assert got["/private/ok/page"] == (True, "/private/ok")
    assert got["/public/x"] == (True, None)
    assert got["/privateer"] == (False, "/private")
    # exclusive group: botA gets ITS group only (everything disallowed)
    gotA = {
        r.path: r.allowed
        for r in robots.robots_is_allowed(
            rdf, urls, agent="botA"
        ).collect()
    }
    assert gotA == {
        "/private/secret": False,
        "/private/ok/page": False,
        "/public/x": False,
        "/privateer": False,
    }
    # unknown agent falls back to the * group
    gotC = {
        r.path: r.allowed
        for r in robots.robots_is_allowed(
            rdf, urls, agent="botC"
        ).collect()
    }
    assert gotC["/private/ok/page"] is True and gotC["/public/x"] is True


def test_equal_length_tie_prefers_allow(spark):
    txt = "User-agent: *\nDisallow: /a/b\nAllow: /a/c\n"
    rdf = robots.robots_rules(
        spark.createDataFrame([(1, txt)], "doc_id long, robots_txt string")
    )
    # craft a tie: both rules length 4; only one can prefix-match a
    # given path, so plant a genuine tie via duplicate-length rules on
    # the same path
    txt2 = "User-agent: *\nDisallow: /dir\nAllow: /dir\n"
    rdf2 = robots.robots_rules(
        spark.createDataFrame([(1, txt2)], "doc_id long, robots_txt string")
    )
    urls = spark.createDataFrame([(1, "/dir/x")], "doc_id long, path string")
    r = robots.robots_is_allowed(rdf2, urls).collect()[0]
    assert r.allowed is True and r.matched_len == 4
    # /dir/x matches neither /a/b nor /a/c -> allowed by default
    r1 = robots.robots_is_allowed(rdf, urls).collect()[0]
    assert r1.allowed is True and r1.matched_rule is None


def test_sitemap_entries(spark):
    urlset = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<url><loc>http://h.example/a</loc>"
        "<lastmod>2024-01-02</lastmod><changefreq>daily</changefreq>"
        "<priority>0.8</priority></url>"
        "<url><loc>http://h.example/b</loc></url>"
        "</urlset>"
    )
    index = (
        '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<sitemap><loc>http://h.example/s1.xml</loc>"
        "<lastmod>2024-02-01</lastmod></sitemap>"
        "</sitemapindex>"
    )
    df = spark.createDataFrame(
        [(1, urlset), (2, index), (3, "<notxml")],
        "doc_id long, sitemap_xml string",
    )
    got = sorted(
        robots.sitemap_entries(df).collect(),
        key=lambda r: (r.doc_id, r.ordinal),
    )
    as_t = [
        (r.doc_id, r.kind, r.ordinal, r.loc, r.lastmod, r.changefreq,
         r.priority)
        for r in got
    ]
    assert as_t == [
        (1, "url", 0, "http://h.example/a", "2024-01-02", "daily", 0.8),
        (1, "url", 1, "http://h.example/b", None, None, None),
        (2, "sitemap", 0, "http://h.example/s1.xml", "2024-02-01",
         None, None),
    ]
