"""Cleaning expression library — the reference's cell grammar as native Columns.

The reference cleans scraped OEWS cells with a row-at-a-time Python
``applymap`` (reference ``pipeline/load_data.py:112-123,138``).  Here the same
semantics are pure Catalyst Column expressions, so they vectorize inside
whole-stage codegen and never leave the JVM — at 100 TB this is the
difference between a scan-speed transform and a Python-serde bottleneck.

Grammar reproduced (reference ``pipeline/load_data.py``):
- F1 suppressed-value detect: full-match ``\\(\\d+\\)-`` → NULL  (``:114``)
- F2 footnote-prefix strip: drop through the first ``)``          (``:116-119``)
- F3 currency/thousands strip: remove ``$`` and ``,``             (``:120``)
- F4 numeric cast, null-on-error (pandas ``to_numeric(errors='coerce')``,
  nullable ``Int64``)                                             (``:126-132``)
- F5 month-year parse ``MM/YYYY`` → month-start date              (``:231``)

Column-name rules (driver-side, pure python — names are metadata, not data):
- P1 OEWS header normalize                                         (``:92-103``)
- P2 O*NET header normalize                                        (``:224-230``)
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# full-cell suppressed-value marker, e.g. "(5)-", "(8)-"   (load_data.py:114)
SUPPRESSED_RE = r"^\(\d+\)-$"
# leading footnote marker, e.g. "()", "(2)"                 (load_data.py:116-119)
FOOTNOTE_PREFIX_RE = r"^\([^)]*\)"


def null_if_suppressed(col: Column) -> Column:
    """F1 — OEWS suppressed cells (``(N)-``) become NULL."""
    return F.when(col.rlike(SUPPRESSED_RE), F.lit(None)).otherwise(col)


def strip_footnote_prefix(col: Column) -> Column:
    """F2 — drop a leading ``(...)`` footnote marker.

    The reference splits on the first ``)`` and keeps the remainder
    (load_data.py:116-119); for cells that always start with ``(...)``
    this equals stripping the leading parenthesized group.
    """
    return F.regexp_replace(col, FOOTNOTE_PREFIX_RE, "")


def strip_currency(col: Column) -> Column:
    """F3 — remove ``$`` and thousands commas."""
    return F.translate(col, "$,", "")


def clean_cell(col: Column) -> Column:
    """F1∘F2∘F3 composed — the full per-cell grammar of the reference's
    ``Cleaner.clean_data`` (load_data.py:112-123), minus the numeric cast."""
    return strip_currency(strip_footnote_prefix(null_if_suppressed(col)))


def to_double(col: Column) -> Column:
    """F4 — numeric cast with null-on-error, matching
    ``pd.to_numeric(errors='coerce')``.  ``try_cast`` (not ``cast``)
    because Spark 4 defaults to ANSI mode, where a plain cast THROWS on
    malformed input instead of yielding NULL."""
    return clean_cell(col).try_cast("double")


def to_long(col: Column) -> Column:
    """F4 — nullable integer cast (pandas ``Int64`` ≙ Spark nullable long).

    The reference routes int columns through ``to_numeric`` (float) before
    ``astype('Int64')`` (load_data.py:129-130), i.e. "1234.0" → 1234; a
    direct string→long cast would NULL that, so cast via double.
    """
    return to_double(col).try_cast("long")


def parse_month_year(col: Column) -> Column:
    """F5 — ``MM/YYYY`` → month-start date, NULL on malformed input
    (``pd.to_datetime(format='%m/%Y', errors='coerce')``, load_data.py:231).

    ``to_date`` raises under ANSI for malformed input, so pre-validate the
    shape and null out non-conforming strings first.
    """
    valid = col.rlike(r"^(0[1-9]|1[0-2])/\d{4}$")
    return F.when(valid, F.to_date(col, "MM/yyyy")).otherwise(F.lit(None).cast("date"))


def soc_prefix(col: Column) -> Column:
    """F6 — ``split_part(code, '.', 1)``: SOC prefix of an O*NET code
    (``11-1011.00`` → ``11-1011``; views.sql:5,20)."""
    return F.split_part(col, F.lit("."), F.lit(1))


# ---------------------------------------------------------------------------
# Column-NAME normalization (driver-side: names are plan metadata).
# ---------------------------------------------------------------------------

def clean_oews_column_name(name: str) -> str:
    """P1 — reference ``Cleaner.clean_columns`` (load_data.py:92-103).

    Drop a trailing ``(...)`` footnote suffix unless the name mentions
    'occupation'; spaces→underscores; strip ``,()``; ``standard_error``→
    ``std_error``; lowercase; trim.
    """
    col = name
    if "occupation" not in col.lower():
        col = re.sub(r"\([^)]*\)\s*$", "", col)
    col = col.strip().replace(" ", "_")
    col = col.replace(",", "").replace("(", "").replace(")", "")
    col = col.replace("standard_error", "std_error")
    return col.lower().strip()


def clean_onet_column_name(name: str) -> str:
    """P2 — reference ``SkillsDataLoader.clean_skills_data`` (load_data.py:224-230):
    trim; spaces→``_``; ``-``→``_``; drop ``*``; lowercase
    (``O*NET-SOC Code`` → ``onet_soc_code``)."""
    return name.strip().replace(" ", "_").replace("-", "_").replace("*", "").lower()
