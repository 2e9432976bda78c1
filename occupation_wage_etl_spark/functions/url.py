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
   delimiter artifacts cleaned, trailing ``?``/``&`` dropped.

``www.`` is NOT stripped and trailing path slashes are preserved —
both change server-side semantics often enough that aggressive
canonicalizers lose real pages; the conservative form is the right
dedup key at 100 TB (false merges are unrecoverable, false splits just
cost a little recall).

Reference analogue: none; LLM-training-data extension surface (the
operator that feeds q54-style domain caps and URL-level dedup).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_AUTH_RE = "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)"
_TRACK_RE = "([?&])(utm_[A-Za-z0-9_]*|gclid|fbclid)=[^&#]*"


def canonicalize_url(c: Column) -> Column:
    """The canonical form per the module rules — one codegen expression
    tree (regexp_replace/extract chain, whole-stage-codegen friendly)."""
    u = F.regexp_replace(c, "#.*$", "")
    # lowercase ONLY scheme://host[:port]; keep path/query case
    u = F.concat(
        F.lower(F.regexp_extract(u, _AUTH_RE, 1)),
        F.regexp_replace(u, _AUTH_RE, ""),
    )
    u = F.regexp_replace(u, "^(http://[^/:?#]+):80(?=[/?#]|$)", "$1")
    u = F.regexp_replace(u, "^(https://[^/:?#]+):443(?=[/?#]|$)", "$1")
    u = F.regexp_replace(u, _TRACK_RE, "$1")
    u = F.regexp_replace(u, r"\?&+", "?")
    u = F.regexp_replace(u, "&&+", "&")
    u = F.regexp_replace(u, "[?&]+$", "")
    return u


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
# host tail: label '.' (known 2-level suffix)  |  label '.' tld
_REG_DOMAIN_RE = (
    r"([^.]+\.(?:" + _SLS_ALT + r"))$"
    r"|([^.]+\.[^.]+)$"
)


def registrable_domain(c: Column) -> Column:
    """The registrable domain (eTLD+1) of a URL or bare host — the key
    domain caps and per-site politeness budgets group by at corpus
    scale (grouping by raw host over-splits: www/m/cdn subdomains of
    one site would each get their own budget).

    Heuristic, deterministic, pure codegen: last TWO labels, except
    hosts ending in a known second-level public suffix (co.uk,
    com.au, …, the embedded `_SECOND_LEVEL_SUFFIXES` subset of the
    public-suffix concept) which keep THREE.  IP-literal hosts and
    single-label hosts pass through unchanged.  Accepts either a full
    URL (host extracted first) or a bare host column."""
    host = F.when(
        c.rlike("^[A-Za-z][A-Za-z0-9+.-]*://"), url_host(c)
    ).otherwise(F.lower(F.trim(c)))
    # IPv4 literals are not registrable domains: pass through
    is_ip = host.rlike(r"^[0-9.]+$")
    three = F.regexp_extract(host, r"([^.]+\.(?:" + _SLS_ALT + r"))$", 1)
    two = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    return F.when(is_ip, host).otherwise(
        F.when(three != "", three).otherwise(
            F.when(two != "", two).otherwise(host)
        )
    )
