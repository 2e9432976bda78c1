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
