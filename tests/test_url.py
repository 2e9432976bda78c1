"""URL canonicalization (functions/url.py): fragment/case/port/
tracking-param rules and the decomposition helpers — all codegen
Column expressions, checked through a real Spark plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from occupation_wage_etl_spark.functions import url as U


def _canon(spark, urls):
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)],
                               "i long, u string")
    rows = (
        df.select("i", U.canonicalize_url(F.col("u")).alias("c"))
        .orderBy("i").collect()
    )
    return [r["c"] for r in rows]


def test_canonicalize_rules(spark):
    got = _canon(spark, [
        "HTTP://WWW.Site.EXAMPLE:80/Path/Page?x=1#frag",
        "https://host.example:443/a",
        "http://host.example:8080/a",          # non-default port kept
        "http://h.example/p?utm_source=x&utm_campaign=y",
        "http://h.example/p?id=7&utm_medium=z",
        "http://h.example/p?utm_source=x&id=7",
        "http://h.example/p?gclid=abc&fbclid=def",
        "http://h.example/UPPER/case?Q=Mixed",  # path/query case kept
        "http://h.example/trail/",              # trailing slash kept
    ])
    assert got == [
        "http://www.site.example/Path/Page?x=1",
        "https://host.example/a",
        "http://host.example:8080/a",
        "http://h.example/p",
        "http://h.example/p?id=7",
        "http://h.example/p?id=7",
        "http://h.example/p",
        "http://h.example/UPPER/case?Q=Mixed",
        "http://h.example/trail/",
    ]


def test_variants_collapse_to_one_key(spark):
    variants = [
        "http://Host.Example/page",
        "HTTP://host.example:80/page#sec2",
        "http://host.example/page?utm_source=feed",
    ]
    assert len(set(_canon(spark, variants))) == 1


def test_parts(spark):
    df = spark.createDataFrame(
        [(0, "https://User@Host.Example:8443/a/b?q=1&r=2#f")],
        "i long, u string",
    )
    r = df.select(
        U.url_host(F.col("u")).alias("h"),
        U.url_path(F.col("u")).alias("p"),
        U.url_query(F.col("u")).alias("q"),
    ).collect()[0]
    assert r["h"] == "host.example"
    assert r["p"] == "/a/b"
    assert r["q"] == "q=1&r=2"
    # absent pieces
    r2 = (
        spark.createDataFrame([(0, "http://x.example")], "i long, u string")
        .select(
            U.url_host(F.col("u")).alias("h"),
            U.url_path(F.col("u")).alias("p"),
            U.url_query(F.col("u")).alias("q"),
        )
        .collect()[0]
    )
    assert r2["h"] == "x.example" and r2["p"] == "" and r2["q"] == ""


def test_registrable_domain(spark):
    """eTLD+1: last two labels, except the embedded second-level
    public suffixes (co.uk, com.au, …) which keep three; IP literals
    and single-label hosts pass through; accepts URLs or bare hosts."""
    cases = [
        ("http://www.example.co.uk/p?x=1", "example.co.uk"),
        ("https://a.b.news.example.com/", "example.com"),
        ("cdn.site.com.au", "site.com.au"),
        ("http://deep.sub.host.ne.jp/x", "host.ne.jp"),
        ("http://192.168.0.1:8080/x", "192.168.0.1"),
        ("localhost", "localhost"),
        ("http://EXample.COM/Q", "example.com"),
        ("sub.example.io", "example.io"),
        ("http://user@www.shop.org.uk:8443/a#f", "shop.org.uk"),
    ]
    df = spark.createDataFrame(cases, "u string, want string")
    rows = df.select(
        "u", "want", U.registrable_domain(F.col("u")).alias("got")
    ).collect()
    for r in rows:
        assert r.got == r.want, (r.u, r.got, r.want)


def test_percent_escape_normalization(spark):
    """RFC 3986 §6.2.2: unreserved escapes decode, reserved escapes
    keep uppercased hex, malformed sequences pass through."""
    got = _canon(spark, [
        "http://h.example/%7Euser/page",     # ~ decodes
        "http://h.example/%7euser/page",     # lowercase hex too
        "http://h.example/p?q=%3a%2F",       # reserved: hex uppercased
        "http://h.example/%41%62%30%2D%2e%5F",  # A b 0 - . _
        "http://h.example/100%25sure",       # %25 stays (reserved)
        "http://h.example/bad%zzescape%2",   # malformed: untouched
        "http://h.example/a%",               # trailing % untouched
    ])
    assert got == [
        "http://h.example/~user/page",
        "http://h.example/~user/page",
        "http://h.example/p?q=%3A%2F",
        "http://h.example/Ab0-._",
        "http://h.example/100%25sure",
        "http://h.example/bad%zzescape%2",
        "http://h.example/a%",
    ]
    # the whole point: encoding variants collapse to ONE key
    assert len(set(_canon(spark, [
        "http://h.example/%7Euser?x=%3A",
        "http://h.example/%7euser?x=%3a",
        "http://h.example/~user?x=%3A",
    ]))) == 1


def test_idn_canonical_host(spark):
    """Unicode and xn-- spellings of one host collapse; ASCII URLs
    ride the fast path unchanged; userinfo/port survive the rewrite."""
    rows = [
        (0, "http://münchen.de/pfad?x=1"),
        (1, "http://xn--mnchen-3ya.de/pfad?x=1"),
        (2, "http://MÜNCHEN.DE:8080/pfad"),
        (3, "https://u@bücher.example.co.uk:8443/b"),
        (4, "http://plain.example/ascii"),
        (5, "bücher.de"),  # bare host, no scheme
    ]
    df = spark.createDataFrame(rows, "i long, u string")
    df = df.select(
        "i", U.canonicalize_url(F.col("u")).alias("u")
    )
    got = {
        r.i: r.u
        for r in U.with_idn_canonical_url(df, "u").collect()
    }
    assert got[0] == got[1] == "http://xn--mnchen-3ya.de/pfad?x=1"
    assert got[2] == "http://xn--mnchen-3ya.de:8080/pfad"
    assert got[3] == "https://u@xn--bcher-kva.example.co.uk:8443/b"
    assert got[4] == "http://plain.example/ascii"
    assert got[5] == "xn--bcher-kva.de"
    # registrable_domain composes with the IDN canonical form
    rd = (
        U.with_idn_canonical_url(df, "u")
        .select(U.registrable_domain(F.col("u")).alias("d"))
        .collect()
    )
    assert {r.d for r in rd} >= {"xn--mnchen-3ya.de", "plain.example"}


def test_registrable_domain_edges(spark):
    """ADVICE r10: trailing FQDN dot strips; a bare public suffix is
    its own explicit group."""
    cases = [
        ("example.com.", "example.com"),
        ("http://www.example.co.uk./p", "example.co.uk"),
        ("co.uk", "co.uk"),
        ("com.au", "com.au"),
        ("sub.co.uk", "sub.co.uk"),  # registrant directly under suffix
    ]
    df = spark.createDataFrame(cases, "u string, want string")
    for r in df.select(
        "u", "want", U.registrable_domain(F.col("u")).alias("got")
    ).collect():
        assert r.got == r.want, (r.u, r.got, r.want)
