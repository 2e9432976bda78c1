"""OEWS cleaning pipeline — the reference's transform chain as ONE lazy plan.

Reference: ``Cleaner.get_cleaned_df`` (``pipeline/load_data.py:135-144``)
runs five eager whole-table pandas passes (clean_columns →
split_occupation_soc → applymap(clean_data) → clean_data_types →
null-normalize → reorder).  Here the whole chain is a single Catalyst
plan: one projection node whose expressions fuse into one codegen stage —
a single pass over the scan regardless of data size.

Schema contract (FIXTURES.md §1→§2): 18 string columns in, 19 typed
columns out, ordered ``[soc_code, occupation, *rest]``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from occupation_wage_etl_spark.functions import cleaning

# Columns the reference coerces to nullable Int64 (load_data.py:127-130);
# after P1 name-cleaning.  Everything else numeric becomes double.
INT_COLUMNS = frozenset(
    {
        "employment",
        "annual_mean_wage",
        "annual_10th_percentile_wage",
        "annual_25th_percentile_wage",
        "annual_median_wage",
        "annual_75th_percentile_wage",
        "annual_90th_percentile_wage",
    }
)

# P1 output names that stay string.
STRING_COLUMNS = frozenset({"soc_code", "occupation", "occupation_soc_code"})

# soc_code validity: replaces the reference's positional footer-row drop
# (``all_rows[:-2]``, load_data.py:79) — see SURVEY.md §2.2 P5.
SOC_CODE_RE = r"^\d{2}-\d{4}$"


def _typed(col_name: str) -> Column:
    c = F.col(col_name)
    if col_name in STRING_COLUMNS:
        return c
    if col_name in INT_COLUMNS:
        return cleaning.to_long(c).alias(col_name)
    return cleaning.to_double(c).alias(col_name)


def clean_oews(raw: DataFrame, drop_footer: bool = True) -> DataFrame:
    """Raw scraped OEWS table (18 string cols, verbatim headers) → cleaned.

    Steps (all fused into one projection):
      P1 header normalize → P3 occupation/soc split → F1–F4 cell cleaning +
      typing → P5 validity filter (footer rows) → P4 reorder.
    """
    # P1 — rename (plan metadata, no data pass)
    renamed = raw.toDF(*[cleaning.clean_oews_column_name(c) for c in raw.columns])

    # P3 — split "Title (XX-XXXX)" into occupation + soc_code, drop source
    src = F.col("occupation_soc_code")
    split_cols = [
        F.trim(F.regexp_extract(src, r"^(.*?)\s*\(", 1)).alias("occupation"),
        F.regexp_extract(src, r"\(([^)]*)\)\s*$", 1).alias("soc_code"),
    ]
    rest = [c for c in renamed.columns if c != "occupation_soc_code"]

    # F1–F4 — cell grammar + typing, one expression per column
    cleaned = renamed.select(*split_cols, *[_typed(c) for c in rest])

    # P5 — validity filter in place of positional footer drop
    if drop_footer:
        cleaned = cleaned.filter(F.col("soc_code").rlike(SOC_CODE_RE))

    # P4 — reorder [soc_code, occupation, *rest]
    return cleaned.select("soc_code", "occupation", *rest)
