"""PII detection/redaction expressions for corpus scrubbing.

All patterns are native ``regexp_replace`` / ``regexp_count`` column
expressions (JVM-side, whole-stage codegen — no UDFs), restricted to
regex syntax that Java and RE2 interpret identically (character
classes, bounded repeats, non-capturing groups, ``\\b``) so the DuckDB
oracle replays them verbatim.

Redaction order matters and is fixed EMAIL → PHONE → IP: emails
contain dots and digits that the later patterns could otherwise
mangle.

Reference analogue: none (the reference scrubs footnote markers, not
PII — ``load_data.py:112-123``); this is training-data extension
surface.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9]{1,2}-[0-9]{3}-[0-9]{3}-[0-9]{4}"
IPV4_RE = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"

_ORDERED = [(EMAIL_RE, "<EMAIL>"), (PHONE_RE, "<PHONE>"), (IPV4_RE, "<IP>")]


def redact_pii(col: Column) -> Column:
    """Replace emails, then phones, then IPv4 literals with typed tags."""
    out = col
    for pattern, tag in _ORDERED:
        out = F.regexp_replace(out, pattern, tag)
    return out


def pii_counts(col: Column) -> tuple[Column, Column, Column]:
    """(n_emails, n_phones, n_ips) found in the raw column.

    Counted on the SAME progressively-redacted text the replacement
    sees, so a digit-run inside an email is never double-counted as a
    phone.
    """
    n_email = F.regexp_count(col, F.lit(EMAIL_RE))
    after_email = F.regexp_replace(col, EMAIL_RE, "<EMAIL>")
    n_phone = F.regexp_count(after_email, F.lit(PHONE_RE))
    after_phone = F.regexp_replace(after_email, PHONE_RE, "<PHONE>")
    n_ip = F.regexp_count(after_phone, F.lit(IPV4_RE))
    return n_email, n_phone, n_ip
