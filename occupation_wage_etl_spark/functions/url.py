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
