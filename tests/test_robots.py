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


WILD = """User-agent: WiLdBot
Disallow: /*.pdf$
Allow: /pub*.pdf$
Disallow: /tmp/*
Disallow: /exact$

User-agent: *
Disallow: /
"""


def test_wildcard_rules_rfc9309(spark):
    """RFC 9309 §2.2.3: '*' spans any octets, trailing '$' anchors;
    most-pattern-octets wins; the anchor must NOT match extensions."""
    rules = robots.robots_rules(
        spark.createDataFrame([(1, WILD)], "doc_id long, robots_txt string")
    )
    paths = [
        "/doc1.pdf", "/pub3.pdf", "/tmp/x", "/exact", "/exactly", "/ok",
    ]
    urls = spark.createDataFrame(
        [(1, p) for p in paths], "doc_id long, path string"
    )
    got = {
        r.path: (r.allowed, r.matched_rule, r.matched_len)
        for r in robots.robots_is_allowed(
            rules, urls, agent="wildbot"
        ).collect()
    }
    assert got == {
        "/doc1.pdf": (False, "/*.pdf$", 7),
        "/pub3.pdf": (True, "/pub*.pdf$", 10),  # longer pattern wins
        "/tmp/x": (False, "/tmp/*", 6),
        "/exact": (False, "/exact$", 7),
        "/exactly": (True, None, None),  # $ anchor refuses extension
        "/ok": (True, None, None),
    }


def test_agent_matching_case_insensitive(spark):
    """RFC 9309 §2.2.1: product tokens compare case-insensitively —
    agent='wildbot' must select the 'WiLdBot' group, NOT fall back to
    the '*' group (which disallows everything here)."""
    rules = robots.robots_rules(
        spark.createDataFrame([(1, WILD)], "doc_id long, robots_txt string")
    )
    urls = spark.createDataFrame([(1, "/ok")], "doc_id long, path string")
    assert robots.robots_is_allowed(
        rules, urls, agent="WILDBOT"
    ).collect()[0].allowed is True
    # an unknown agent falls back to '*' → disallowed
    assert robots.robots_is_allowed(
        rules, urls, agent="nobody"
    ).collect()[0].allowed is False
    # regex metachars in plain rules stay literal under the wildcard
    # compiler (a '.'-bearing rule must not match as regex-any)
    r2 = robots.robots_rules(
        spark.createDataFrame(
            [(1, "User-agent: *\nDisallow: /a.b*\n")],
            "doc_id long, robots_txt string",
        )
    )
    u2 = spark.createDataFrame(
        [(1, "/a.bc"), (1, "/aXbc")], "doc_id long, path string"
    )
    got = {
        r.path: r.allowed
        for r in robots.robots_is_allowed(r2, u2).collect()
    }
    assert got == {"/a.bc": False, "/aXbc": True}


def test_sitemap_gzip_and_index_chase(spark):
    import gzip as _gzip

    ns = "http://www.sitemaps.org/schemas/sitemap/0.9"
    idx = (
        f'<sitemapindex xmlns="{ns}">'
        "<sitemap><loc>http://s.example/a.xml</loc></sitemap>"
        "<sitemap><loc>http://s.example/missing.xml</loc></sitemap>"
        "</sitemapindex>"
    ).encode()
    child = _gzip.compress(
        (
            f'<urlset xmlns="{ns}">'
            "<url><loc>http://s.example/p1</loc>"
            "<priority>0.7</priority></url>"
            "<url><loc>http://s.example/p2</loc></url>"
            "</urlset>"
        ).encode()
    )
    df = spark.createDataFrame(
        [
            (10, "http://s.example/idx.xml", bytearray(idx)),
            (11, "http://s.example/a.xml", bytearray(child)),
        ],
        "doc_id long, url string, sitemap_xml binary",
    )
    # gzip payloads parse through sitemap_entries directly
    ents = robots.sitemap_entries(df).collect()
    assert {(r.doc_id, r.kind) for r in ents} == {
        (10, "sitemap"), (11, "url"),
    }
    got = sorted(
        (r.root_id, r.child_url, r.ordinal, r.loc, r.priority)
        for r in robots.sitemap_index_chase(df).collect()
    )
    # the missing child drops out via the inner join
    assert got == [
        (10, "http://s.example/a.xml", 0, "http://s.example/p1", 0.7),
        (10, "http://s.example/a.xml", 1, "http://s.example/p2", None),
    ]
    # corrupt gzip member: skipped, never fails
    bad = spark.createDataFrame(
        [(1, "u", bytearray(b"\x1f\x8b broken"))],
        "doc_id long, url string, sitemap_xml binary",
    )
    assert robots.sitemap_entries(bad).count() == 0


def test_crawl_delay_group_selection(spark):
    """RFC 9309 exclusive group selection for Crawl-delay: an exact
    agent group (even without a delay line) blocks the * group's
    delay; multiple delay lines take the max; junk values ignored."""
    from occupation_wage_etl_spark.operators import robots

    texts = [
        # 0: exact group delay wins over *
        (0, "User-agent: bot\nCrawl-delay: 2\n\n"
            "User-agent: *\nCrawl-delay: 9\n"),
        # 1: only * group
        (1, "User-agent: *\nCrawl-delay: 5\nDisallow: /tmp\n"),
        # 2: exact group WITHOUT delay -> * must not leak
        (2, "User-agent: bot\nDisallow: /p\n\n"
            "User-agent: *\nCrawl-delay: 7\n"),
        # 3: two delay lines in one group -> max; junk ignored
        (3, "User-agent: bot\nCrawl-delay: 3\nCrawl-delay: 4\n"
            "Crawl-delay: fast\n"),
        # 4: no delay anywhere
        (4, "User-agent: *\nDisallow: /x\n"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, robots_txt string")
    rules = robots.robots_rules(df)
    got = {
        r.doc_id: r.crawl_delay
        for r in robots.crawl_delay(rules, agent="Bot").collect()
    }
    assert got[0] == 2.0
    assert got[1] == 5.0
    assert got[2] is None      # exclusive selection
    assert got[3] == 4.0       # max of numeric lines
    assert got[4] is None


def test_crawl_budget_shape(spark):
    """Budget aggregate: allow eval x delay x eTLD+1, with the window
    cap forcing a deferral."""
    from occupation_wage_etl_spark.operators import robots

    df = spark.createDataFrame(
        [
            (0, "User-agent: *\nCrawl-delay: 10\nDisallow: /no\n"),
            (1, "User-agent: *\nDisallow: /no\n"),
        ],
        "doc_id long, robots_txt string",
    )
    rules = robots.robots_rules(df)
    frontier = spark.createDataFrame(
        [
            (0, "http://a.dom.example/no/x"),
            (0, "http://a.dom.example/ok/1"),
            (0, "http://a.dom.example/ok/2"),
            (1, "http://b.dom.example/ok/3"),
        ],
        "doc_id long, url string",
    )
    out = robots.crawl_budget(
        rules, frontier, agent="bot", window_seconds=25,
        default_delay=1.0,
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r.domain == "dom.example"
    assert (r.n_hosts, r.n_urls, r.n_allowed) == (2, 4, 3)
    assert r.delay_s == 10.0
    assert (r.window_cap, r.n_scheduled, r.n_deferred) == (2, 2, 1)
