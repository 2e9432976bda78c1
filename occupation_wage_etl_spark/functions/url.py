"""URL canonicalization + decomposition — pure codegen Column
expressions (zero Python in the hot path), the URL-level half of crawl
dedup: the same page arrives under scheme/host case variants, default
ports, fragments, and tracking-parameter decorations, and the canonical
form is the dedup/domain-cap key.

Canonical form (deterministic subset of the common rules):

1. fragment dropped (``#...``),
2. scheme and authority (host[:port]) lowercased — path/query case is
   semantically significant and preserved,
3. default ports stripped (``http://…:80``, ``https://…:443``),
4. tracking parameters removed (``utm_*``, ``gclid``, ``fbclid``) with
   delimiter artifacts cleaned, trailing ``?``/``&`` dropped,
5. percent-escapes normalized (RFC 3986 §6.2.2.1–2): escapes of
   UNRESERVED characters are decoded (``%7Euser`` → ``~user``) and the
   hex of every remaining escape is uppercased (``%3a`` → ``%3A``) —
   without this rung the dedup/graph key silently splits on encoding
   variants of the same URL.  Implemented as ``split('%')`` +
   ``transform`` + ``array_join``: higher-order functions stay
   JVM-side (no Python, no shuffle) even though they sit outside
   whole-stage codegen.

IDN hosts are a separate, gated rung (:func:`with_idn_canonical_url`):
the canonical host form is the ASCII/punycode form (``münchen.de`` →
``xn--mnchen-3ya.de``), which needs the RFC 3492 algorithm — an
Arrow-batched pass with an ASCII fast path, applied after the codegen
rungs.  Almost every host on a real crawl is already ASCII, so the
Python cost is paid only on the IDN tail.

``www.`` is NOT stripped and trailing path slashes are preserved —
both change server-side semantics often enough that aggressive
canonicalizers lose real pages; the conservative form is the right
dedup key at 100 TB (false merges are unrecoverable, false splits just
cost a little recall).

Reference analogue: none; LLM-training-data extension surface (the
operator that feeds q54-style domain caps and URL-level dedup).
"""

from __future__ import annotations

import unicodedata

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_AUTH_RE = "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)"
_TRACK_RE = "([?&])(utm_[A-Za-z0-9_]*|gclid|fbclid)=[^&#]*"


def normalize_percent_escapes(c: Column) -> Column:
    """RFC 3986 §6.2.2 percent-encoding normalization, JVM-side:
    escapes of unreserved characters (ALPHA / DIGIT / ``-._~``) decode
    to the character; every other escape keeps ``%`` with UPPERCASED
    hex; malformed ``%`` sequences pass through untouched.  ``%25``
    (the escaped percent itself) is reserved, so decoding introduces no
    re-join ambiguity."""
    parts = F.split(c, "%")

    def _fix(frag: Column) -> Column:
        hexpair = F.upper(F.substring(frag, 1, 2))
        is_hex = hexpair.rlike("^[0-9A-F]{2}$")
        code = F.conv(hexpair, 16, 10).cast("int")
        unreserved = (
            ((code >= 65) & (code <= 90))
            | ((code >= 97) & (code <= 122))
            | ((code >= 48) & (code <= 57))
            | code.isin(45, 46, 95, 126)  # - . _ ~
        )
        rest = F.substring(frag, 3, 2147483647)
        return (
            F.when(is_hex & unreserved, F.concat(F.char(code), rest))
            .when(is_hex, F.concat(F.lit("%"), hexpair, rest))
            .otherwise(F.concat(F.lit("%"), frag))
        )

    fixed = F.transform(
        parts, lambda x, i: F.when(i == F.lit(0), x).otherwise(_fix(x))
    )
    return F.when(c.isNull(), F.lit(None)).otherwise(
        F.array_join(fixed, "")
    )


def canonicalize_url(c: Column) -> Column:
    """The canonical form per the module rules — one JVM expression
    tree (regexp_replace/extract chain + the higher-order percent
    rung; zero Python)."""
    u = F.regexp_replace(c, "#.*$", "")
    # lowercase ONLY scheme://host[:port]; keep path/query case.  The
    # percent rung runs on the post-authority part only — pct-escapes
    # in a reg-name are rare enough that conservative pass-through
    # (never a wrong merge) beats case-interaction subtleties with the
    # authority lowercasing; IDN hosts have their own rung.
    u = F.concat(
        F.lower(F.regexp_extract(u, _AUTH_RE, 1)),
        normalize_percent_escapes(F.regexp_replace(u, _AUTH_RE, "")),
    )
    u = F.regexp_replace(u, "^(http://[^/:?#]+):80(?=[/?#]|$)", "$1")
    u = F.regexp_replace(u, "^(https://[^/:?#]+):443(?=[/?#]|$)", "$1")
    u = F.regexp_replace(u, _TRACK_RE, "$1")
    u = F.regexp_replace(u, r"\?&+", "?")
    u = F.regexp_replace(u, "&&+", "&")
    u = F.regexp_replace(u, "[?&]+$", "")
    return u


def idn_encode_host(host: str) -> str:
    """The ASCII/punycode canonical form of one host (pure Python,
    deterministic): ASCII labels pass through; a non-ASCII label is
    NFC-normalized, lowercased, and RFC 3492-encoded as ``xn--…``
    (stdlib ``punycode`` codec — the same transform as IDNA minus
    nameprep's prohibited-codepoint table, so hostnames with
    underscores or other IDNA-invalid-but-real characters never
    raise).  A label that fails to encode passes through unchanged
    (conservative: never a wrong merge)."""
    labels = host.split(".")
    out = []
    for lab in labels:
        if lab.isascii():
            out.append(lab)
            continue
        norm = unicodedata.normalize("NFC", lab.lower())
        try:
            out.append("xn--" + norm.encode("punycode").decode("ascii"))
        except UnicodeError:
            out.append(lab)
    return ".".join(out)


def with_idn_canonical_url(
    df: DataFrame, url_col: str, out_col: str | None = None
) -> DataFrame:
    """Rewrite the authority of ``url_col`` to its IDN/punycode ASCII
    canonical form (``münchen.de`` → ``xn--mnchen-3ya.de``), in place
    or into ``out_col`` — the rung that makes the Unicode and xn--
    spellings of one host collapse to one dedup/graph key.

    Arrow-batched ``pandas_udf`` with an ASCII fast path: an
    all-ASCII URL (the overwhelming crawl majority) is returned by
    reference without parsing, so the Python cost is paid only on the
    IDN tail.  Apply AFTER :func:`canonicalize_url` (which lowercases
    the authority, including Unicode case)."""
    def _idn_series(urls):
        def one(u):
            if u is None or u.isascii():
                return u
            # scheme://authority/rest — rewrite host labels only
            i = u.find("://")
            if i < 0:
                return idn_encode_host(u)
            j = len(u)
            for stop in "/?#":
                k = u.find(stop, i + 3)
                if k >= 0:
                    j = min(j, k)
            auth = u[i + 3 : j]
            if auth.isascii():
                return u
            userinfo, _, hostport = auth.rpartition("@")
            host, colon, port = hostport.partition(":")
            new_auth = (
                (userinfo + "@" if userinfo else "")
                + idn_encode_host(host)
                + (colon + port if colon else "")
            )
            return u[: i + 3] + new_auth + u[j:]

        return urls.map(one)

    _idn = F.pandas_udf(_idn_series, "string")
    return df.withColumn(out_col or url_col, _idn(F.col(url_col)))


def url_host(c: Column) -> Column:
    """Lowercased host (authority minus userinfo/port)."""
    auth = F.lower(F.regexp_extract(c, _AUTH_RE, 1))
    auth = F.regexp_replace(auth, "^[a-z][a-z0-9+.-]*://", "")
    auth = F.regexp_replace(auth, "^[^@]*@", "")
    return F.regexp_replace(auth, ":[0-9]+$", "")


def url_path(c: Column) -> Column:
    """Path component ('' when absent), query/fragment excluded."""
    no_frag = F.regexp_replace(c, "#.*$", "")
    rest = F.regexp_replace(no_frag, _AUTH_RE, "")
    return F.regexp_replace(rest, r"\?.*$", "")


def url_query(c: Column) -> Column:
    """Query string without the '?' ('' when absent)."""
    no_frag = F.regexp_replace(c, "#.*$", "")
    return F.regexp_extract(no_frag, r"\?(.*)$", 1)


# Multi-label public suffixes where the registrable domain needs THREE
# labels (host = x.<sld>.<tld>).  A deterministic, documented subset of
# the well-known second-level registries — the full Mozilla Public
# Suffix List is external data this engine does not vendor; at 100 TB
# the cost of the approximation is a slightly coarser domain cap on the
# long tail of ccTLD registries, never a wrong merge of two registrable
# domains in this set.
_SECOND_LEVEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "co.nz", "net.nz", "org.nz",
    "com.br", "net.br", "org.br", "gov.br",
    "co.in", "net.in", "org.in", "gen.in", "firm.in",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn",
    "com.mx", "org.mx", "net.mx",
    "co.za", "org.za", "net.za", "web.za",
    "com.tr", "net.tr", "org.tr",
    "com.ar", "net.ar", "org.ar",
    "co.kr", "ne.kr", "or.kr", "re.kr", "go.kr",
    "com.sg", "net.sg", "org.sg", "edu.sg",
    "com.hk", "net.hk", "org.hk",
    "com.tw", "net.tw", "org.tw",
    "co.il", "org.il", "net.il", "ac.il",
    "com.pl", "net.pl", "org.pl",
    "com.ru", "net.ru", "org.ru",
    "com.ua", "net.ua",
)

_SLS_ALT = "|".join(s.replace(".", r"\.") for s in _SECOND_LEVEL_SUFFIXES)


def registrable_domain(c: Column) -> Column:
    """The registrable domain (eTLD+1) of a URL or bare host — the key
    domain caps and per-site politeness budgets group by at corpus
    scale (grouping by raw host over-splits: www/m/cdn subdomains of
    one site would each get their own budget).

    Heuristic, deterministic, pure codegen: last TWO labels, except
    hosts ending in a known second-level public suffix (co.uk,
    com.au, …, the embedded `_SECOND_LEVEL_SUFFIXES` subset of the
    public-suffix concept) which keep THREE.  IP-literal hosts and
    single-label hosts pass through unchanged; a trailing FQDN root
    dot is stripped first (``example.com.`` groups with
    ``example.com``); a host that IS a bare public suffix (``co.uk``)
    has no registrant and passes through as its own group — explicit,
    so rollups keep those rows rather than dropping them on NULL.
    Accepts either a full URL (host extracted first) or a bare host
    column."""
    host = F.when(
        c.rlike("^[A-Za-z][A-Za-z0-9+.-]*://"), url_host(c)
    ).otherwise(F.lower(F.trim(c)))
    host = F.regexp_replace(host, r"\.$", "")
    # IPv4 literals are not registrable domains: pass through
    is_ip = host.rlike(r"^[0-9.]+$")
    is_bare_suffix = host.isin(*_SECOND_LEVEL_SUFFIXES)
    three = F.regexp_extract(host, r"([^.]+\.(?:" + _SLS_ALT + r"))$", 1)
    two = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    return F.when(is_ip | is_bare_suffix, host).otherwise(
        F.when(three != "", three).otherwise(
            F.when(two != "", two).otherwise(host)
        )
    )
